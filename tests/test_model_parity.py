"""End-to-end forward parity: our JAX model vs the actual reference
implementation with identical weights and batches.

This is the strongest correctness check in the suite: it exercises the full
static-shape + runtime-exists-mask machinery against the reference's
dynamic per-batch padding (see umpr_tpu/ops/masking.py).
"""

import numpy as np
import pytest
import jax

from umpr_tpu.models.umpr import ModelDims, init_umpr, umpr_forward
from tests.ref_oracle import (
    import_reference_model, patch_improved_rnn, load_umpr,
    batch_to_reference, RefConfig, random_batch,
)

torch = pytest.importorskip("torch")


def run_ours(params, batch, dims):
    b = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    pred, loss, aux = umpr_forward(params, b, dims, train=False)
    return np.asarray(pred), float(loss)


def run_reference(ref, params, batch, review_net_only):
    cfg = RefConfig(review_net_only=review_net_only)
    model = load_umpr(ref, params, cfg)
    model.eval()
    with torch.no_grad():
        pred, loss = model(*batch_to_reference(batch))
    return pred.numpy(), float(loss)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_review_net_only_parity(seed):
    """Random variable lengths; bug-fixed oracle (see ref_oracle docstring)."""
    ref = import_reference_model()
    patch_improved_rnn(ref)
    rng = np.random.default_rng(seed)
    batch = random_batch(rng, B=5, S=7, L=13, S_ui=3)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(seed), dims, rng.standard_normal((40, 16)).astype(np.float32))

    ours_pred, ours_loss = run_ours(params, batch, dims)
    ref_pred, ref_loss = run_reference(ref, params, batch, review_net_only=True)
    np.testing.assert_allclose(ours_pred, ref_pred, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_loss, ref_loss, rtol=1e-4, atol=1e-5)


def test_review_net_only_parity_unpatched_equal_lengths():
    """With all lengths equal, the reference's double-unsort quirk is a
    no-op, so the UNPATCHED reference must match too."""
    ref = import_reference_model()
    import importlib
    import src.model
    importlib.reload(src.model)  # undo any patching from other tests
    rng = np.random.default_rng(3)
    batch = random_batch(rng, B=4, S=5, L=10, S_ui=2, equal_lengths=True)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(7), dims, rng.standard_normal((40, 16)).astype(np.float32))

    ours_pred, ours_loss = run_ours(params, batch, dims)
    ref_pred, ref_loss = run_reference(src.model, params, batch, review_net_only=True)
    np.testing.assert_allclose(ours_pred, ref_pred, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_loss, ref_loss, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_full_umpr_parity():
    """Full model: ReviewNet + ControlNet + VisualNet (VGG16) + both losses."""
    ref = import_reference_model()
    patch_improved_rnn(ref)
    rng = np.random.default_rng(11)
    batch = random_batch(rng, B=2, S=5, L=11, S_ui=3, V=2, P=1,
                         with_photos=True, img=224)
    dims = ModelDims(review_net_only=False, view_size=2)
    params = init_umpr(jax.random.PRNGKey(5), dims, rng.standard_normal((40, 16)).astype(np.float32))

    ours_pred, ours_loss = run_ours(params, batch, dims)
    cfg = RefConfig(review_net_only=False, views=["a", "b"])
    model = load_umpr(ref, params, cfg)
    model.eval()
    with torch.no_grad():
        ref_pred, ref_loss = model(*batch_to_reference(batch))
    np.testing.assert_allclose(ours_pred, ref_pred.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours_loss, float(ref_loss), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("case", [
    dict(B=3, S=3, L=7, S_ui=1, seed=10),
    dict(B=8, S=10, L=20, S_ui=5, seed=11),
    dict(B=2, S=12, L=9, S_ui=4, seed=12),
    dict(B=6, S=5, L=16, S_ui=2, seed=13),
])
def test_review_parity_shape_fuzz(case):
    """Exists-mask machinery across assorted shapes and runtime batch
    maxima: forward parity with the (bug-fixed) reference must hold for
    every configuration, not just the defaults."""
    ref = import_reference_model()
    patch_improved_rnn(ref)
    seed = case.pop("seed")
    rng = np.random.default_rng(seed)
    batch = random_batch(rng, vocab=60, emb=12, **case)
    dims = ModelDims(review_net_only=True, gru_size=32, self_atte_size=16)
    params = init_umpr(jax.random.PRNGKey(seed), dims,
                       rng.standard_normal((60, 12)).astype(np.float32))

    ours_pred, ours_loss = run_ours(params, batch, dims)
    cfg = RefConfig(review_net_only=True, gru_size=32, self_atte_size=16)
    model = load_umpr(ref, params, cfg)
    model.eval()
    with torch.no_grad():
        ref_pred, ref_loss = model(*batch_to_reference(batch))
    np.testing.assert_allclose(ours_pred, ref_pred.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_loss, float(ref_loss), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bf16_mixed_precision_tracks_f32():
    """compute_dtype='bfloat16' runs the whole model (GRU kernel path
    included) in bf16 IO with f32 loss; values and gradients track the f32
    model at bf16 tolerances.  Guards the mixed-precision plumbing the TPU
    benches rely on (visual-net dtype detection, kernel bf16 IO, f32 loss)."""
    import jax.numpy as jnp
    from umpr_tpu.train.optim import split_frozen, merge_params

    rng = np.random.default_rng(11)
    batch = random_batch(rng, B=4, S=5, L=10, S_ui=2, V=1, P=1, vocab=60,
                         emb=16, with_photos=True, img=32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    word_emb = rng.standard_normal((60, 16)).astype(np.float32)

    dims32 = ModelDims(review_net_only=False, view_size=1, photo_size=32,
                       use_pallas=True)
    dims16 = ModelDims(review_net_only=False, view_size=1, photo_size=32,
                       use_pallas=True, compute_dtype="bfloat16")
    params = init_umpr(jax.random.PRNGKey(3), dims32, word_emb)
    trainable, frozen = split_frozen(params)

    def loss_fn(dims):
        def f(tr):
            p = merge_params(tr, frozen)
            pred, loss, _ = umpr_forward(p, batch, dims, train=False)
            return loss, pred
        return f

    (l32, p32), g32 = jax.value_and_grad(loss_fn(dims32), has_aux=True)(trainable)
    (l16, p16), g16 = jax.value_and_grad(loss_fn(dims16), has_aux=True)(trainable)

    assert l16.dtype == jnp.float32 and p16.dtype == jnp.float32
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32),
                               rtol=0.08, atol=0.08)
    # gradients exist for every trainable leaf, are finite, f32, and track
    # f32 in the l2 sense (elementwise bf16 comparisons are too noisy)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g16),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g32),
                   key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb)
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        assert np.all(np.isfinite(a)), ka
        denom = np.linalg.norm(b)
        if denom > 1e-3:  # skip near-zero grads (dead ReLU head paths)
            # 0.3: the affinity M grad routes through argmax positions of a
            # bf16-rounded tanh -- small-norm grads legitimately wobble ~0.2
            assert np.linalg.norm(a - b) / denom < 0.3, (ka, np.linalg.norm(a - b) / denom)
