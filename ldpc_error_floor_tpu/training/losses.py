"""Multi-iteration training losses with STE surrogates.

Parity targets: reference `Main_Functions.py:337-356` —

* the loss sums per-iteration terms for t in [t_start, T) weighted by
  eta^(T-1-t), with the convention 0^0 = 1 (eta=0 means last-iteration-only),
  normalized by the sum of the coefficients;
* loss_type 0 — BCE-with-logits vs the label bits;
* loss_type 1 — soft BER: mean sigmoid(APP) (valid for the all-zero word);
* loss_type 2 — soft FER: 1/2 (1 - sign_through(min over bits of -APP)),
  with the `inv_exp` surrogate gradient for sign (all-zero word only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldpc_error_floor_tpu.ops.ste import sign_ste

BCE = 0
SOFT_BER = 1
SOFT_FER = 2


def multi_iteration_loss(apps: jnp.ndarray, labels: jnp.ndarray,
                         loss_type: int, etha, t_start: int = 0) -> jnp.ndarray:
    """apps: [T, target*z, B] per-iteration APP LLRs; labels: [target*z, B].

    A STATIC python ``etha == 0.0`` takes the exact last-iteration-only
    fast path (0^0 = 1, every other coefficient is 0, the normalizer is
    1): the per-iteration loss terms for t < T-1 are never evaluated,
    which removes the dominant non-kernel fusions from the fused train
    step (measured ~6 ms of a 34 ms step at batch 32768).  Bit-exact vs
    the general path — zero coefficients contribute exactly 0 to the
    normalized sum.  Pass a traced etha for the general (decaying) case."""
    T = apps.shape[0]
    if isinstance(etha, float) and etha == 0.0 and t_start <= T - 1:
        etha = None
    if etha is None:  # static last-iteration-only
        if loss_type == BCE:
            lab = labels.astype(jnp.float32)
            return jnp.mean(jax.nn.softplus(apps[T - 1])
                            - apps[T - 1] * lab)
        if loss_type == SOFT_BER:
            return jnp.mean(jax.nn.sigmoid(apps[T - 1]))
        if loss_type == SOFT_FER:
            worst = jnp.min(-apps[T - 1], axis=0)
            return jnp.mean(0.5 * (1.0 - sign_ste(worst)))
        raise ValueError(f"bad loss_type {loss_type}")
    tt = jnp.arange(T)
    expo = (T - 1 - tt).astype(jnp.float32)
    etha = jnp.asarray(etha, jnp.float32)
    coeff = jnp.where(expo == 0.0, 1.0, etha ** expo)
    coeff = coeff * (tt >= t_start)

    if loss_type == BCE:
        lab = labels.astype(jnp.float32)[None]
        # softplus form: gradient is exactly sigmoid(apps) - lab everywhere,
        # including apps == 0.0 (which QMS hits constantly) — matching TF's
        # registered analytic gradient for sigmoid_cross_entropy_with_logits
        per_elem = jax.nn.softplus(apps) - apps * lab
        per_t = jnp.mean(per_elem, axis=(1, 2))
    elif loss_type == SOFT_BER:
        per_t = jnp.mean(jax.nn.sigmoid(apps), axis=(1, 2))
    elif loss_type == SOFT_FER:
        worst = jnp.min(-apps, axis=1)            # [T, B]; <0 iff any bit wrong
        per_t = jnp.mean(0.5 * (1.0 - sign_ste(worst)), axis=1)
    else:
        raise ValueError(f"bad loss_type {loss_type}")

    return jnp.sum(coeff * per_t) / jnp.sum(coeff)
