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


@pytest.mark.slow
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




@pytest.mark.slow
def test_remat_vgg_matches_values_and_grads():
    """remat_vgg (jax.checkpoint per conv block) must be numerically
    invisible: same loss and same gradients as the plain forward, folded
    and unfolded."""
    import jax
    import jax.numpy as jnp
    from tests.ref_oracle import random_batch
    from umpr_tpu.models.umpr import ModelDims, init_umpr, umpr_forward
    from umpr_tpu.train.optim import split_frozen

    rng = np.random.default_rng(6)
    batch = random_batch(rng, B=2, S=3, L=8, S_ui=2, with_photos=True, img=32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    emb = rng.standard_normal((40, 16)).astype(np.float32)

    results = []
    for remat in (False, True):
        dims = ModelDims(review_net_only=False, view_size=1, photo_size=32,
                         remat_vgg=remat)
        params = init_umpr(jax.random.PRNGKey(3), dims, emb)
        trainable, frozen = split_frozen(params)

        def loss_fn(t):
            _, loss, _ = umpr_forward({**t, **frozen}, batch, dims, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        results.append((float(loss), grads))

    (l0, g0), (l1, g1) = results
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), g0, g1)
