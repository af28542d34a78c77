"""Width-folded VGG block 1 (visual_net._fold_kernel) computes the identical
function: values and gradients match the plain NHWC path.

The fold is a pure layout transform — zero-embedded kernels on the W-folded
tensor — so equality holds up to f32 summation-order noise (the reference
conv parity tolerance, tests/test_model_parity.py, is looser than this).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umpr_tpu.models.visual_net import init_vgg16, vgg16


@pytest.mark.parametrize("img", [32, 64])
def test_fold_matches_unfolded_values_and_grads(img):
    rng = np.random.default_rng(0)
    params = init_vgg16(jax.random.PRNGKey(0), img_size=img)
    x = jnp.asarray(rng.random((2, img, img, 3), np.float32))

    def loss(p, fold):
        out = vgg16(p, x, fold_w=fold)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    v_plain, g_plain = jax.value_and_grad(lambda p: loss(p, False))(params)
    v_fold, g_fold = jax.value_and_grad(lambda p: loss(p, True))(params)

    np.testing.assert_allclose(v_fold, v_plain, rtol=2e-5)
    flat_p, _ = jax.tree.flatten(g_plain)
    flat_f, _ = jax.tree.flatten(g_fold)
    for a, b in zip(flat_p, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


