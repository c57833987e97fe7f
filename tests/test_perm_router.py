"""_perm_router: the scatter-free routing VJP must equal JAX's autodiff of
the plain gather on the real decoder index maps (the custom backward is an
inverse-permutation gather; the default is a scatter-add)."""

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models.nms import _perm_router


def _maps(code_name):
    g = TannerGraph(get_code(code_name))
    cn_in = jnp.asarray(g.cn_in_idx)
    vn_in = jnp.asarray(g.vn_in_idx)
    return g, cn_in, vn_in


def test_router_vjp_matches_autodiff_both_directions():
    for code_name in ("MACKAY_N96_K48", "wman_N0576_R34_z24"):
        g, cn_in, vn_in = _maps(code_name)
        B = 4
        rng = np.random.default_rng(0)
        for idx_fwd, idx_bwd, n_in in (
                (cn_in, vn_in, g.n_v2c_rows),
                (vn_in, cn_in, g.n_c2v_rows)):
            x = jnp.asarray(rng.normal(size=(n_in, B)), jnp.float32)
            cot = jnp.asarray(rng.normal(size=(len(idx_fwd), B)), jnp.float32)

            def with_pad(fn, x):
                # the router is only valid with the constant-zero sentinel
                # row appended (as the decoder uses it)
                zero = jnp.zeros((1, B), jnp.float32)
                return fn(jnp.concatenate([x, zero], axis=0))

            route = _perm_router(idx_fwd, idx_bwd)
            ref = lambda x: with_pad(lambda xp: xp[idx_fwd], x)
            ours = lambda x: with_pad(route, x)

            y_ref, vjp_ref = jax.vjp(ref, x)
            y_ours, vjp_ours = jax.vjp(ours, x)
            np.testing.assert_array_equal(y_ref, y_ours)
            np.testing.assert_array_equal(vjp_ref(cot)[0], vjp_ours(cot)[0])


def test_router_grad_through_decoder_matches_reference_scatter():
    """End-to-end: gradient of a scalar through one route must match the
    scatter-add formulation on the real wman map."""
    g, cn_in, vn_in = _maps("wman_N0576_R34_z24")
    route = _perm_router(cn_in, vn_in)
    B = 2
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(g.n_v2c_rows + 1, B)), jnp.float32)
    x = x.at[-1].set(0.0)
    w = jnp.asarray(np.random.default_rng(2).normal(
        size=(len(cn_in), B)), jnp.float32)
    g1 = jax.grad(lambda x: jnp.sum(jnp.tanh(route(x)) * w))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.tanh(x[cn_in]) * w))(x)
    # sentinel row cotangent is deliberately dropped by the custom VJP
    np.testing.assert_allclose(g1[:-1], g2[:-1], rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(g1[-1], jnp.zeros((B,)))
