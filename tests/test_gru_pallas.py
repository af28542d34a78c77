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


def test_proj_mode_selection():
    """Default mode is fused while the stacked contraction fits one MXU lane
    tile (2E <= 128), wide beyond; env hooks override (trace-time)."""
    import os
    from umpr_tpu.ops.gru_pallas import _proj_mode
    assert _proj_mode(50) == "fused" and _proj_mode(64) == "fused"
    assert _proj_mode(72) == "wide"
    os.environ["UMPR_GRU_PROJ"] = "stacked"
    try:
        assert _proj_mode(50) == "stacked"
        assert _proj_mode(72) == "wide"  # precondition still binds
    finally:
        del os.environ["UMPR_GRU_PROJ"]


def test_stacked_mode_matches_scan():
    """The pre-fused xg path (UMPR_GRU_PROJ=stacked) stays correct: values
    and all gradients against the scan.  Distinct shapes from the fused
    tests so no jit cache can alias traces across env settings."""
    import os
    os.environ["UMPR_GRU_PROJ"] = "stacked"
    try:
        params, x, lengths = _setup(7, N=17, L=9, E=7, H=8)
        y_p = bigru_pallas(params, x, lengths)
        y_s = bigru_scan(params, x, lengths)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                                   rtol=1e-5, atol=1e-6)

        def loss(fn):
            return lambda p, xx: jnp.sum(jnp.sin(fn(p, xx, lengths)))
        (gp, gx_p) = jax.grad(loss(bigru_pallas), argnums=(0, 1))(params, x)
        (gs, gx_s) = jax.grad(loss(bigru_scan), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                                   rtol=1e-4, atol=1e-5)
        for d in ("fwd", "bwd"):
            for k in ("w_ih", "w_hh", "bias_ih", "bias_hh"):
                np.testing.assert_allclose(
                    np.asarray(gp[d][k]), np.asarray(gs[d][k]),
                    rtol=1e-4, atol=1e-5, err_msg=f"{d}/{k}")
    finally:
        del os.environ["UMPR_GRU_PROJ"]


def test_wide_embedding_per_direction_projection():
    """E > 64 routes the input projection through the per-direction path
    (the stacked/fused (2E, 6H) form would double the useful MACs past one
    MXU lane tile); forward and all gradients must still match the scan."""
    from umpr_tpu.ops.gru_pallas import _use_stacked_proj
    params, x, lengths = _setup(4, N=12, L=5, E=72, H=8)
    assert not _use_stacked_proj(72) and _use_stacked_proj(64)

    y_p = bigru_pallas(params, x, lengths)
    y_s = bigru_scan(params, x, lengths)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        return lambda p, xx: jnp.sum(jnp.sin(fn(p, xx, lengths)))
    (gp, gx_p) = jax.grad(loss(bigru_pallas), argnums=(0, 1))(params, x)
    (gs, gx_s) = jax.grad(loss(bigru_scan), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-5)
    for d in ("fwd", "bwd"):
        for k in ("w_ih", "w_hh", "bias_ih", "bias_hh"):
            np.testing.assert_allclose(
                np.asarray(gp[d][k]), np.asarray(gs[d][k]),
                rtol=1e-4, atol=1e-5, err_msg=f"{d}/{k}")


def test_bf16_io_matches_f32_scan_loosely():
    """Mixed-precision path: bf16 IO / f32 state.  Values track the f32 scan
    at bf16 tolerances and masked positions are EXACTLY zero."""
    params, x, lengths = _setup(3, N=16, L=7, E=8, H=8)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    xb = x.astype(jnp.bfloat16)

    y_b = bigru_pallas(pb, xb, lengths)
    assert y_b.dtype == jnp.bfloat16
    y_s = bigru_scan(params, x, lengths)
    np.testing.assert_allclose(np.asarray(y_b, np.float32), np.asarray(y_s),
                               rtol=0.05, atol=0.05)
    # exact zeros past each row's length (packed-sequence contract)
    t = np.arange(y_b.shape[1])[None, :, None]
    dead = t >= np.asarray(lengths)[:, None, None]
    masked = np.asarray(y_b, np.float32) * dead
    np.testing.assert_array_equal(masked, np.zeros_like(masked))


def test_bf16_io_gradients_track_f32():
    params, x, lengths = _setup(4, N=16, L=6, E=8, H=8)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    xb = x.astype(jnp.bfloat16)

    def loss(fn, p, xx):
        y = fn(p, xx, lengths)
        return jnp.sum((y.astype(jnp.float32)) ** 2)

    gb = jax.grad(lambda p: loss(bigru_pallas, p, xb))(pb)
    gs = jax.grad(lambda p: loss(bigru_scan, p, x))(params)
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gs)):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        # relative error in the l2 sense (elementwise bf16 comparisons are
        # too noisy for accumulated gradients)
        denom = np.linalg.norm(b) + 1e-6
        assert np.linalg.norm(a - b) / denom < 0.05, np.linalg.norm(a - b) / denom


def test_nodx_variant_matches_param_grads():
    """bigru_pallas_nodx (frozen-embedding fast path) must produce identical
    parameter gradients and zero dx, in every projection mode."""
    import os
    from umpr_tpu.ops.gru_pallas import bigru_pallas, bigru_pallas_nodx

    rng = np.random.default_rng(3)
    N, L, E, H = 24, 7, 10, 64
    params = init_bigru(jax.random.PRNGKey(0), E, H)
    x = jnp.asarray(rng.standard_normal((N, L, E)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, N).astype(np.int32))

    def loss(fn):
        return lambda p, xx: jnp.sum(fn(p, xx, lengths) ** 2)

    for mode in ("fused", "stacked", "wide"):
        os.environ["UMPR_GRU_PROJ"] = mode
        try:
            dp_ref, dx_ref = jax.grad(loss(bigru_pallas), (0, 1))(params, x)
            dp_new, dx_new = jax.grad(loss(bigru_pallas_nodx), (0, 1))(params, x)
        finally:
            del os.environ["UMPR_GRU_PROJ"]
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
                     dp_ref, dp_new)
        assert float(jnp.abs(dx_new).max()) == 0.0
        assert float(jnp.abs(dx_ref).max()) > 0.0  # the dead grad it replaces


def test_split_api_matches_scan_layouts_and_grads():
    """bigru_pallas_split: the repack kernels' Y_pos/Y_sent must equal the
    scan path's reshaped outputs, and parameter grads through BOTH outputs
    must match (the dy-combine kernel is the VJP)."""
    from umpr_tpu.ops.gru import bigru_scan
    from umpr_tpu.ops.gru_pallas import (bigru_pallas_split,
                                         bigru_pallas_split_nodx)

    rng = np.random.default_rng(5)
    B2, S, L, E, H = 6, 3, 7, 10, 64
    N = B2 * S
    params = init_bigru(jax.random.PRNGKey(1), E, H)
    x = jnp.asarray(rng.standard_normal((N, L, E)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, N).astype(np.int32))
    y_ref = bigru_scan(params, x, lengths)
    pos, sent = bigru_pallas_split(params, x, lengths, S)
    np.testing.assert_allclose(sent, y_ref, atol=1e-5)
    np.testing.assert_allclose(pos, y_ref.reshape(B2, S * L, 2 * H), atol=1e-5)

    def loss_split(p, xx):
        a, b = bigru_pallas_split(p, xx, lengths, S)
        return jnp.sum(a ** 2) + jnp.sum(jnp.tanh(b)).astype(jnp.float32)

    def loss_scan(p, xx):
        y = bigru_scan(p, xx, lengths)
        return (jnp.sum(y.reshape(B2, S * L, 2 * H) ** 2)
                + jnp.sum(jnp.tanh(y)).astype(jnp.float32))

    dp, dx = jax.grad(loss_split, (0, 1))(params, x)
    dp_ref, dx_ref = jax.grad(loss_scan, (0, 1))(params, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=2e-4,
                                                         rtol=1e-4),
                 dp, dp_ref)
    np.testing.assert_allclose(dx, dx_ref, atol=2e-4)

    # nodx variant: same param grads, zero dx
    dp2, dx2 = jax.grad(
        lambda p, xx: sum(jnp.sum(o ** 2) for o in
                          bigru_pallas_split_nodx(p, xx, lengths, S)),
        (0, 1))(params, x)
    assert float(jnp.abs(dx2).max()) == 0.0
    jax.tree.map(np.ndim, dp2)  # structure intact
