"""Multi-process `jax.distributed` worker for tests/test_multiprocess.py.

Usage: python tests/mp_worker.py <nproc> <pid> <port> <outdir>

With nproc=1 it runs the single-process reference on 8 local CPU devices;
with nproc=2 each of the two processes owns 4 of the 8 global devices and
they rendezvous through the coordination service at 127.0.0.1:<port>.
Both modes run the same global workload on the same seeds over the same
1-D ('data',) mesh, so every psum'd counter must come out identical
(SURVEY.md section 4: "same seeds, 1 chip vs N chips => identical pooled
FER counts"), and the harvested uncorrected-word rows must be the same
multiset (single-process: one Uncor file; multi-process: per-host
`.part{i}` files, sim/harvest.py).
"""

import json
import os
import sys


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    nproc, pid, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    local_dev = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_dev}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                                   process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from ldpc_error_floor_tpu.channel import AWGNChannel, mix_sigma_lanes
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights)
    from ldpc_error_floor_tpu.parallel.mesh import data_mesh, replicate
    from ldpc_error_floor_tpu.sim import FERSimulator, UncorHarvester
    from ldpc_error_floor_tpu.training.train import (make_optimizer,
                                                     make_train_step)

    assert jax.device_count() == 8, jax.devices()
    assert jax.local_device_count() == local_dev
    mesh = data_mesh()

    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    T = 4
    spec = WeightSpec(sharing=(3, 3, 3), n_iters=T)
    params = init_weights(spec, graph)
    ch = AWGNChannel(code, decoding_type=2, q_bit=5)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=2, q_bit=5), spec,
                     graph=graph)
    out = {}

    # 1) Monte-Carlo counters psum'd over the mesh
    sim = FERSimulator(dec, ch, batch=64, mesh=mesh, inner_steps=2)
    pt = sim.run_point(params, 2.0, jax.random.PRNGKey(11),
                       max_frames=256, target_frame_errors=10 ** 9)
    out["frames"] = int(pt.frames)
    out["bit_errors"] = int(round(pt.ber_last * pt.frames *
                                  code.N * code.z))
    out["frame_errors"] = int(round(pt.fer_last * pt.frames))
    out["genie_errors"] = int(round(pt.fer_genie * pt.frames))

    # 2) one sharded training step (grads all-reduced by GSPMD)
    opt = make_optimizer(1e-2)
    tparams = replicate(mesh, init_weights(spec, graph))
    opt_state = replicate(mesh, opt.init(tparams))
    step = make_train_step(dec, spec, loss_type=2, train_start=0,
                           train_end=T, optimizer=opt, donate=False,
                           mesh=mesh)
    sig = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0, 3.0]), 64))
    llr = ch.sample(jax.random.PRNGKey(5), sig)
    labels = jnp.zeros((code.n_full, 64), jnp.float32)
    (tparams, opt_state), loss = step(tparams, opt_state, llr, labels,
                                      jnp.float32(0.0))
    out["loss"] = float(loss)
    out["cn_after"] = np.asarray(tparams["cn"]).ravel().tolist()

    # 3) harvest: per-host .part{i} files in multi-process mode
    harv = UncorHarvester(dec, ch, batch=64, mesh=mesh, cap=16)
    uncor_path = os.path.join(outdir, f"uncor_{nproc}.txt")
    harv.collect(params, 1.5, jax.random.PRNGKey(3), target_words=12,
                 max_frames=512, out_file=uncor_path)

    # 4) deploy-mode (syndrome early termination) counters over the mesh
    sim_d = FERSimulator(dec, ch, batch=64, mesh=mesh, inner_steps=2,
                         stop="syndrome")
    pt_d = sim_d.run_point(params, 2.0, jax.random.PRNGKey(17),
                           max_frames=256, target_frame_errors=10 ** 9)
    out["d_frames"] = int(pt_d.frames)
    out["d_frame_errors"] = int(round(pt_d.fer_last * pt_d.frames))
    out["d_undetected"] = int(round(pt_d.fer_undetected * pt_d.frames))
    out["d_iters_sum"] = int(round(pt_d.avg_iters * pt_d.frames))

    # 5) mid-run kill + resume of a sharded run_point: a run checkpointed
    # and "killed" at 128 frames then resumed to 256 must pool to the same
    # counters as the uninterrupted 256-frame run (per-process ckpt files —
    # the RNG/counter state is replicated, so any host's copy restores all)
    pt_u = sim.run_point(params, 2.5, jax.random.PRNGKey(23),
                         max_frames=256, target_frame_errors=10 ** 9)
    ck = os.path.join(outdir, f"resume_{nproc}_{pid}.json")
    sim.run_point(params, 2.5, jax.random.PRNGKey(23), max_frames=128,
                  target_frame_errors=10 ** 9, ckpt_path=ck)
    pt_r = sim.run_point(params, 2.5, jax.random.PRNGKey(23), max_frames=256,
                         target_frame_errors=10 ** 9, ckpt_path=ck)
    for tag, pt_x in (("u", pt_u), ("r", pt_r)):
        out[f"{tag}_frames"] = int(pt_x.frames)
        out[f"{tag}_bit_errors"] = int(round(pt_x.ber_last * pt_x.frames *
                                             code.N * code.z))
        out[f"{tag}_frame_errors"] = int(round(pt_x.fer_last * pt_x.frames))
        out[f"{tag}_genie_errors"] = int(round(pt_x.fer_genie * pt_x.frames))

    with open(os.path.join(outdir, f"res_{nproc}_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"mp_worker nproc={nproc} pid={pid}: ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
