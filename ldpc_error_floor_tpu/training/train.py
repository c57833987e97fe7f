"""Jitted training step: Adam over the current training block's weights.

Design notes vs the reference (`Main_Functions.py:360-378`,
`main_Base.py:143-164`):

* The reference rebuilds the whole TF graph per training block and gives
  Adam a var_list restricted to the block's variables.  Here the parameter
  pytree always spans the full decode depth; block selection is a boolean
  row mask applied to the gradients.  With a fresh optimizer state per block
  (as the reference's graph rebuild implies) the two are exactly equivalent:
  masked rows keep zero moments and never move.
* The [min_w, max_w] box constraint is applied after every update, matching
  the TF variable constraint (`Main_Functions.py:434`).
* Learning rate is a runtime input (optax.inject_hyperparams), so epoch-wise
  lr decay (`main_Base.py:194-195`) does not recompile.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ldpc_error_floor_tpu.models.nms import NMSDecoder
from ldpc_error_floor_tpu.models.weights import (Params, WeightSpec, clip_weights,
                                                 trainable_mask)
from ldpc_error_floor_tpu.parallel.mesh import batch_constraint
from ldpc_error_floor_tpu.training.losses import multi_iteration_loss


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def _make_step_body(decoder: NMSDecoder, spec: WeightSpec, loss_type: int,
                    train_start: int, train_end: int, fixed_init: int,
                    optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    data_axis: str = "data",
                    static_etha: Optional[float] = None) -> Callable:
    """Un-jitted (params, opt_state, llr, labels, etha) -> (state, loss).

    ``static_etha``: a compile-time eta (the pipeline passes 0.0 when the
    config's eta is identically zero — the reference recipe's default) so
    the loss takes its exact last-iteration-only fast path instead of
    evaluating every unrolled iteration's term (losses.py)."""
    masks = trainable_mask(spec, train_start, train_end, fixed_init)
    mask_arrays: Dict[str, Optional[jnp.ndarray]] = {
        k: (None if v is None else jnp.asarray(v[:, None], jnp.float32))
        for k, v in masks.items()}
    t_lo = max(train_start - fixed_init, spec.fixed_iter)
    shard = batch_constraint(mesh, data_axis)

    # fused-train APP emission window (DecoderConfig.pallas_app_t0): the
    # apps stack starts at that iteration, so the loss window shifts with
    # it.  A nonzero offset is only legal under the static last-iter loss.
    t_off = getattr(decoder.cfg, "pallas_app_t0", 0)
    if t_off:
        assert static_etha == 0.0, \
            "pallas_app_t0 requires the static etha == 0 loss"
    t_lo_eff = max(0, t_lo - t_off)

    def step(params: Params, opt_state, llr, labels, etha):
        # data-parallel: batch lanes over the mesh; params replicated,
        # gradients all-reduced by GSPMD (SURVEY.md section 5.8)
        llr = shard(llr)
        labels = shard(labels)
        def loss_fn(p):
            res = decoder.apply(p, llr, labels=labels, collect="apps")
            e = static_etha if static_etha is not None else etha
            return multi_iteration_loss(res.apps, labels, loss_type, e,
                                        t_start=t_lo_eff)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {k: (None if g is None else g * mask_arrays[k])
                 for k, g in grads.items()}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # clip only trainable rows: frozen-prefix rows loaded from a file
        # must pass through untouched (reference attaches the box constraint
        # per trainable variable only, Main_Functions.py:434)
        params = clip_weights(spec, params, masks=mask_arrays)
        return TrainState(params, opt_state), loss

    return step


def make_train_step(decoder: NMSDecoder, spec: WeightSpec, loss_type: int,
                    train_start: int, train_end: int, fixed_init: int = 0,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    donate: bool = True, mesh: Optional[Mesh] = None,
                    data_axis: str = "data",
                    static_etha: Optional[float] = None) -> Callable:
    """Build a jitted (params, opt_state, llr, labels, etha) -> (state, loss)
    step for the training block [train_start, train_end).  With `mesh`, the
    batch is sharded over `data_axis` (params replicated)."""
    if optimizer is None:
        optimizer = make_optimizer()
    step = _make_step_body(decoder, spec, loss_type, train_start, train_end,
                           fixed_init, optimizer, mesh=mesh,
                           data_axis=data_axis, static_etha=static_etha)
    donate_args = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_epoch_step(decoder: NMSDecoder, spec: WeightSpec, loss_type: int,
                    train_start: int, train_end: int, fixed_init: int,
                    optimizer: optax.GradientTransformation,
                    n_steps: int, labels: jnp.ndarray,
                    channel=None, sigmas: Optional[jnp.ndarray] = None,
                    data_mode: bool = False, mesh: Optional[Mesh] = None,
                    data_axis: str = "data", encoder=None,
                    static_etha: Optional[float] = None) -> Callable:
    """On-device epoch runner: `n_steps` train steps under one `lax.scan`,
    sampling the channel (or slicing an uploaded dataset) inside jit.

    The reference dispatches one session.run per batch
    (`main_Base.py:151-162`); over a remote/tunneled accelerator the
    per-dispatch host round-trip then dominates, so here the whole epoch is
    one dispatch.  Step semantics are identical to `make_train_step` —
    the key schedule matches `jax.random.split(key, n_steps)`.

    Returns a jitted callable:
      data_mode=False: (params, opt_state, key, etha)  -> (params, opt_state, mean_loss)
      data_mode=True:  (params, opt_state, data, etha) -> (params, opt_state, mean_loss)
        where data is [n_steps*B, nbits] host-uploaded rows.
    """
    body = _make_step_body(decoder, spec, loss_type, train_start, train_end,
                           fixed_init, optimizer, mesh=mesh,
                           data_axis=data_axis, static_etha=static_etha)
    batch = labels.shape[-1]

    if data_mode:
        def epoch(params, opt_state, data, etha):
            def scan_body(carry, i):
                p, o = carry
                llr = jax.lax.dynamic_slice_in_dim(data, i * batch, batch,
                                                   axis=0).T
                (p, o), loss = body(p, o, llr, labels, etha)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                scan_body, (params, opt_state), jnp.arange(n_steps))
            return params, opt_state, jnp.mean(losses)
    else:
        nbits = labels.shape[0]

        def epoch(params, opt_state, key, etha):
            subs = jax.random.split(key, n_steps)

            def scan_body(carry, sub):
                p, o = carry
                if encoder is None:
                    llr = channel.sample(sub, sigmas)
                    lab = labels
                else:
                    # non-zero-codeword training (the reference's
                    # train_on_zero_word=False switch, main_Base.py:70, made
                    # real): encode fresh random messages, transmit them,
                    # and train BCE against the true bits
                    kb, kn = jax.random.split(sub)
                    bits = encoder.random_codewords(kb, batch)
                    llr = channel.sample_codewords(kn, sigmas, bits)
                    lab = bits[:nbits]
                (p, o), loss = body(p, o, llr, lab, etha)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                scan_body, (params, opt_state), subs)
            return params, opt_state, jnp.mean(losses)

    return jax.jit(epoch, donate_argnums=(0, 1))
