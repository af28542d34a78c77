"""Pallas GRU kernels (interpreted on CPU in CI) vs the lax.scan path:
forward equality and full gradient equality of the handwritten backward."""

import numpy as np
import jax
import jax.numpy as jnp

from umpr_tpu.ops.gru import init_bigru, bigru_scan
from umpr_tpu.ops.gru_pallas import bigru_pallas


def _setup(seed, N=24, L=11, E=9, H=8):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((N, L, E)).astype(np.float32)
    lengths = rng.integers(1, L + 1, size=N).astype(np.int32)
    lengths[0], lengths[1] = L, 1
    params = init_bigru(jax.random.PRNGKey(seed), E, H)
    return params, jnp.asarray(x), jnp.asarray(lengths)


def test_forward_matches_scan():
    params, x, lengths = _setup(0)
    y_p = bigru_pallas(params, x, lengths)
    y_s = bigru_scan(params, x, lengths)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                               rtol=1e-5, atol=1e-6)


def test_backward_matches_scan_grads():
    params, x, lengths = _setup(1)

    def loss_pallas(p, xx):
        y = bigru_pallas(p, xx, lengths)
        return jnp.sum(jnp.sin(y) * jnp.cos(y * 0.5))

    def loss_scan(p, xx):
        y = bigru_scan(p, xx, lengths)
        return jnp.sum(jnp.sin(y) * jnp.cos(y * 0.5))

    (gp, gx_p) = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    (gs, gx_s) = jax.grad(loss_scan, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-5)
    for d in ("fwd", "bwd"):
        for k in ("w_ih", "w_hh", "bias_ih", "bias_hh"):
            np.testing.assert_allclose(
                np.asarray(gp[d][k]), np.asarray(gs[d][k]),
                rtol=1e-4, atol=1e-5, err_msg=f"{d}/{k}")


def test_backward_under_jit_and_row_tiling():
    # exercise N > one MXU tile and jit compilation of the custom vjp
    params, x, lengths = _setup(2, N=40, L=6, E=5, H=4)

    @jax.jit
    def g(p, xx):
        return jax.grad(
            lambda p_, x_: jnp.sum(bigru_pallas(p_, x_, lengths) ** 2),
            argnums=0)(p, xx)

    @jax.jit
    def g_ref(p, xx):
        return jax.grad(
            lambda p_, x_: jnp.sum(bigru_scan(p_, x_, lengths) ** 2),
            argnums=0)(p, xx)

    gp, gs = g(params, x), g_ref(params, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
