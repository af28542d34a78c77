"""Fused bias+relu+maxpool Pallas kernel vs its composite oracle
(interpreted on CPU in CI; tools/validate_kernels_tpu.py re-checks the
compiled kernel on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from umpr_tpu.ops.pool_pallas import (fused_bias_relu_pool,
                                      reference_bias_relu_pool)


@pytest.mark.parametrize("shape", [(2, 16, 16, 64), (1, 28, 8, 128),
                                   (3, 8, 12, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_composite(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    b = jnp.asarray(rng.standard_normal(shape[-1]) * 0.1, dtype)
    got = fused_bias_relu_pool(x, b)
    want = reference_bias_relu_pool(x, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grads_match_composite(dtype):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 64)), dtype)
    b = jnp.asarray(rng.standard_normal(64) * 0.1, dtype)
    g = jnp.asarray(rng.standard_normal((2, 8, 6, 64)), dtype)

    def loss(fn):
        def f(x_, b_):
            return jnp.sum(fn(x_, b_).astype(jnp.float32)
                           * g.astype(jnp.float32))
        return jax.grad(f, argnums=(0, 1))

    dx_f, db_f = loss(fused_bias_relu_pool)(x, b)
    dx_c, db_c = loss(reference_bias_relu_pool)(x, b)
    tol = 0 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(np.asarray(dx_f, np.float32),
                               np.asarray(dx_c, np.float32), atol=tol)
    # db: the kernel accumulates in f32 (like the production
    # _bias_relu_bwd); the naive composite's autodiff sums the bias grad in
    # the input dtype, so in bf16 the COMPOSITE carries ~0.3 absolute
    # accumulation error over ~100 summands and the tolerance reflects its
    # error, not the kernel's
    np.testing.assert_allclose(np.asarray(db_f, np.float32),
                               np.asarray(db_c, np.float32),
                               rtol=1e-5, atol=max(tol * 50, 1e-5))


def test_relu_zero_windows_get_no_gradient():
    """Windows whose pooled output is exactly 0 (all-negative pre-relu) must
    route zero gradient -- the composite path's y > 0 mask semantics."""
    x = jnp.full((1, 4, 4, 128), -1.0, jnp.float32)
    b = jnp.zeros(128, jnp.float32)

    def f(x_):
        return jnp.sum(fused_bias_relu_pool(x_, b))

    dx = jax.grad(f)(x)
    assert float(jnp.abs(dx).max()) == 0.0


def test_vgg_forward_fused_pool_matches_composite():
    """End-to-end vgg16 with fused_pool=True equals the composite path
    (unfolded; blocks 1-2 take the fused kernel, deep blocks unchanged)."""
    from umpr_tpu.models.visual_net import init_vgg16, vgg16

    # H >= 56 gate needs a real-ish image size; 64px keeps CI fast
    params = init_vgg16(jax.random.PRNGKey(0), img_size=64)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    base = vgg16(params, img, fold_w=False)
    fused = vgg16(params, img, fold_w=False, fused_pool=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_vgg_grads_fused_pool_match_composite():
    from umpr_tpu.models.visual_net import init_vgg16, vgg16

    params = init_vgg16(jax.random.PRNGKey(0), img_size=64)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)

    def loss(fused_pool):
        def f(p):
            return jnp.sum(vgg16(p, img, fold_w=False,
                                 fused_pool=fused_pool) ** 2)
        return jax.grad(f)

    g_base = loss(False)(params)
    g_fused = loss(True)(params)
    for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
