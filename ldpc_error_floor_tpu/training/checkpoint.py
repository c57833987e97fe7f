"""Full training-state checkpoint/resume.

The reference's only persistence is per-epoch text weight dumps — no
optimizer moments, no RNG state, no epoch counter, so an interrupted run
cannot resume (SURVEY.md section 5, "Checkpoint / resume": a `tf.train.Saver`
is created but never used, `main_Base.py:140`).  Long error-floor runs need
better: this module snapshots the complete train state (params, Adam state,
PRNG key, epoch, training block) with Orbax, and `run_training` restores it
transparently when `ExperimentConfig.resume` is set.

Layout: {out_dir}/ckpt/{prefix}_block{start}_{end}/step_{epoch}/ managed by
an Orbax CheckpointManager (keeps the most recent snapshots only).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _manager(ckpt_dir: str, keep: int = 2):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True))


def block_ckpt_dir(out_dir: str, prefix: str, start: int, end: int) -> str:
    return os.path.join(out_dir, "ckpt", f"{prefix}_block{start}_{end}")


def save_train_state(ckpt_dir: str, epoch: int, params, opt_state, key,
                     extra: Optional[Dict[str, Any]] = None,
                     keep: int = 2) -> None:
    """Snapshot the full training state after `epoch`."""
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir, keep)
    state = {"params": params, "opt_state": opt_state,
             "key": np.asarray(key),  # raw uint32 PRNGKey data
             "extra": dict(extra or {})}
    mgr.save(epoch, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_train_state(ckpt_dir: str, params_like, opt_state_like,
                        ) -> Optional[Tuple[int, Any, Any, jax.Array, Dict]]:
    """Restore the latest snapshot, or None if the directory has none.

    `params_like` / `opt_state_like` provide the pytree structure (build them
    exactly as a fresh run would)."""
    import orbax.checkpoint as ocp
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    template = {"params": params_like, "opt_state": opt_state_like,
                "key": np.asarray(jax.random.PRNGKey(0)),
                "extra": {"etha": 0.0, "lr": 0.0, "opt_valid": 0.0}}
    state = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    key = jax.numpy.asarray(np.asarray(state["key"], np.uint32))
    return step, state["params"], state["opt_state"], key, state.get("extra", {})
