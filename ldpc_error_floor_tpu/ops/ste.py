"""Straight-through-estimator quantization and sign surrogates.

Semantics-parity targets in the reference:
* `Cal_MSA_Q_TF` / `QMS_clipping` (`Main_Functions.py:463-494`): in-graph QMS
  quantization — forward rounds to a q_bit-dependent grid and clips;
  backward is identity on the *clipped* value (gradient 1 inside the clip
  range, 0 outside).
* `Cal_MSA_Q` (`Print_Functions.py:12-25`): the same grids without STE, used
  on channel LLRs at sampling time.
* `sign_through` (`Main_Functions.py:457-460`): forward sign(x), backward the
  derivative of the smooth surrogate `inv_exp(x) = 2 sigmoid(x) - 1`.

Grids (step, clip): q=6 -> (1, 15.5); q=5 -> (0.5, 7.5); q=-5 -> (1, 15);
q=4 -> (1, 7); q=3 -> (2, 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_GRIDS = {6: (1.0, 15.5), 5: (0.5, 7.5), -5: (1.0, 15.0), 4: (1.0, 7.0), 3: (2.0, 6.0)}


def qms_grid(q_bit: int):
    if q_bit not in _GRIDS:
        raise ValueError(f"unsupported q_bit {q_bit}; supported: {sorted(_GRIDS)}")
    return _GRIDS[q_bit]


def qms_clip_limit(q_bit: int) -> float:
    return qms_grid(q_bit)[1]


def quantize_llr(x, q_bit: int):
    """Round-to-grid + clip, no STE (channel-LLR quantization).

    Works on jnp or np arrays.
    """
    step, clip = qms_grid(q_bit)
    return jnp.clip(jnp.round(x / step) * step, -clip, clip)


def clip_tf_grad(x, lo: float, hi: float):
    """clip with TensorFlow's `clip_by_value` gradient: 1 for lo <= x <= hi
    INCLUSIVE, 0 outside.  jnp.clip lowers to min/max whose gradient at an
    exact tie is 0.5 — and quantized values sit exactly on clip boundaries
    all the time, so the half-gradient is a systematic training-parity
    break (caught by tests/test_reference_trace.py)."""
    clipped = jnp.clip(x, lo, hi)
    inside = jnp.logical_and(x >= lo, x <= hi).astype(x.dtype)
    lin = x * inside
    return lin + lax.stop_gradient(clipped - lin)


def quantize_ste(x, q_bit: int):
    """STE quantizer: forward = round-to-grid + clip, backward = identity
    inside [-clip, clip] inclusive, zero outside (matches `Cal_MSA_Q_TF`,
    whose backward is TF's clip_by_value gradient)."""
    step, clip = qms_grid(q_bit)
    q = jnp.clip(jnp.round(x / step) * step, -clip, clip)
    inside = (jnp.abs(x) <= clip).astype(x.dtype)
    lin = x * inside
    return lin + lax.stop_gradient(q - lin)


def inv_exp(x):
    """Smooth sign surrogate 2*sigmoid(x) - 1 (reference `inv_exp`)."""
    return 2.0 * jax.nn.sigmoid(x) - 1.0


def sign_ste(x):
    """Forward sign(x); backward gradient of `inv_exp` (reference
    `sign_through`, used by the soft-FER loss)."""
    surrogate = inv_exp(x)
    return surrogate + lax.stop_gradient(jnp.sign(x) - surrogate)
