"""Loss + STE gradient tests (finite-difference where meaningful)."""

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.ops.ste import inv_exp, quantize_ste, sign_ste
from ldpc_error_floor_tpu.training.losses import multi_iteration_loss


def test_quantize_ste_forward_and_grad():
    x = jnp.asarray([-9.0, -7.3, -0.26, 0.24, 3.14, 7.6, 100.0])
    y = quantize_ste(x, 5)
    np.testing.assert_allclose(y, [-7.5, -7.5, -0.5, 0.0, 3.0, 7.5, 7.5])
    g = jax.grad(lambda v: jnp.sum(quantize_ste(v, 5)))(x)
    # gradient is identity inside the clip range, zero outside
    np.testing.assert_allclose(g, [0, 1, 1, 1, 1, 0, 0])


def test_sign_ste_forward_and_grad():
    x = jnp.asarray([-2.0, -0.1, 0.5, 3.0])
    np.testing.assert_allclose(sign_ste(x), jnp.sign(x))
    g = jax.grad(lambda v: jnp.sum(sign_ste(v)))(x)
    # surrogate gradient = d/dx inv_exp = 2*sigmoid'(x)
    sig = jax.nn.sigmoid(x)
    np.testing.assert_allclose(g, 2 * sig * (1 - sig), rtol=1e-6)
    # and inv_exp itself matches 2/(1+e^-x) - 1
    np.testing.assert_allclose(inv_exp(x), 2 / (1 + jnp.exp(-x)) - 1, rtol=1e-6)


def _rand_apps(T=4, nb=12, B=6, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((T, nb, B)) * 3, jnp.float32)


def test_etha_zero_is_last_iteration_only():
    apps = _rand_apps()
    labels = jnp.zeros(apps.shape[1:], jnp.float32)
    for lt in (0, 1, 2):
        full = multi_iteration_loss(apps, labels, lt, etha=0.0)
        last = multi_iteration_loss(apps[-1:], labels, lt, etha=0.0)
        np.testing.assert_allclose(full, last, rtol=1e-6)


def test_etha_one_is_uniform_average():
    apps = _rand_apps(seed=1)
    labels = jnp.zeros(apps.shape[1:], jnp.float32)
    got = multi_iteration_loss(apps, labels, 1, etha=1.0)
    per_t = [multi_iteration_loss(apps[t:t + 1], labels, 1, etha=0.0)
             for t in range(apps.shape[0])]
    np.testing.assert_allclose(got, np.mean(per_t), rtol=1e-6)


def test_t_start_restricts_range():
    apps = _rand_apps(seed=2)
    labels = jnp.zeros(apps.shape[1:], jnp.float32)
    got = multi_iteration_loss(apps, labels, 1, etha=1.0, t_start=2)
    want = multi_iteration_loss(apps[2:], labels, 1, etha=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bce_matches_manual():
    apps = _rand_apps(T=1, seed=3)
    rng = np.random.default_rng(4)
    labels = jnp.asarray(rng.integers(0, 2, apps.shape[1:]), jnp.float32)
    got = multi_iteration_loss(apps, labels, 0, etha=0.0)
    p = jax.nn.sigmoid(apps[0])
    want = -jnp.mean(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_soft_fer_value_and_grad():
    """Forward: fraction of frames with any bit wrong (all-zero word).
    Backward: finite differences of the surrogate (replace sign by inv_exp)."""
    apps = _rand_apps(T=1, seed=5)
    labels = jnp.zeros(apps.shape[1:], jnp.float32)
    got = multi_iteration_loss(apps, labels, 2, etha=0.0)
    frames_wrong = np.any(np.asarray(apps[0]) >= 0, axis=0)
    np.testing.assert_allclose(got, frames_wrong.mean(), atol=1e-6)

    def surrogate(a):
        worst = jnp.min(-a, axis=1)
        return jnp.mean(0.5 * (1.0 - inv_exp(worst)))

    g = jax.grad(lambda a: multi_iteration_loss(a, labels, 2, etha=0.0))(apps)
    eps = 1e-3
    rng = np.random.default_rng(6)
    for _ in range(5):
        i = (0, rng.integers(apps.shape[1]), rng.integers(apps.shape[2]))
        da = np.zeros(apps.shape, np.float32)
        da[i] = eps
        fd = (surrogate(apps + da) - surrogate(apps - da)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, atol=2e-3)


def test_static_etha_zero_fast_path_exact():
    """A python etha == 0.0 takes the last-iteration-only fast path; it
    must equal the general (traced-coefficient) path bit-for-bit for every
    loss type (zero coefficients contribute exactly zero)."""
    import jax.numpy as jnp
    from ldpc_error_floor_tpu.training.losses import multi_iteration_loss

    key = jax.random.PRNGKey(3)
    apps = 8.0 * jax.random.normal(key, (5, 96, 16))
    labels = (jax.random.uniform(jax.random.PRNGKey(4), (96, 16)) < 0.3)
    labels = labels.astype(jnp.float32)
    for lt in (0, 1, 2):
        a = multi_iteration_loss(apps, labels, lt, 0.0)
        b = multi_iteration_loss(apps, labels, lt, jnp.float32(0.0))
        assert float(a) == float(b), (lt, float(a), float(b))
        # gradients agree too
        ga = jax.grad(lambda x: multi_iteration_loss(x, labels, lt, 0.0))(apps)
        gb = jax.grad(lambda x: multi_iteration_loss(
            x, labels, lt, jnp.float32(0.0)))(apps)
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
