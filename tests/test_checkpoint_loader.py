"""Checkpoint roundtrip (params + optimizer state), loader shuffling /
dead-sample padding, and photo-cache behavior."""

import os
import numpy as np
import jax
import jax.numpy as jnp

from umpr_tpu.models.umpr import ModelDims, init_umpr
from umpr_tpu.train import checkpoint as ckpt
from umpr_tpu.train.optim import make_optimizer, split_frozen, merge_params
from umpr_tpu.data.dataset import UMPRDataset
from umpr_tpu.data.loader import BatchLoader


def small_dataset(n=10, S=4, L=8, S_ui=2, V=1, P=1):
    rng = np.random.default_rng(0)
    return UMPRDataset(
        u_tokens=rng.integers(0, 20, (n, S, L)).astype(np.int32),
        u_lengths=rng.integers(1, L + 1, (n, S)).astype(np.int32),
        u_counts=rng.integers(1, S + 1, n).astype(np.int32),
        i_tokens=rng.integers(0, 20, (n, S, L)).astype(np.int32),
        i_lengths=rng.integers(1, L + 1, (n, S)).astype(np.int32),
        i_counts=rng.integers(1, S + 1, n).astype(np.int32),
        ui_tokens=rng.integers(0, 20, (n, S_ui, L)).astype(np.int32),
        ui_lengths=rng.integers(1, L + 1, (n, S_ui)).astype(np.int32),
        ui_counts=rng.integers(1, S_ui + 1, n).astype(np.int32),
        ratings=rng.uniform(1, 5, n).astype(np.float32),
        photo_paths=np.full((n, V, P), "", dtype=np.str_),
    )


def test_checkpoint_roundtrip_params_and_opt_state(tmp_path):
    rng = np.random.default_rng(1)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(0), dims,
                       rng.standard_normal((30, 8)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    tx = make_optimizer(1e-3)
    opt_state = tx.init(trainable)
    # one update so moments are nonzero
    grads = jax.tree.map(jnp.ones_like, trainable)
    _, opt_state = tx.update(grads, opt_state, trainable)

    root = str(tmp_path / "run")
    ckpt.save_best(root, merge_params(trainable, frozen))
    ckpt.save_last(root, trainable, opt_state, epoch=3, batch_counter=42,
                   best_loss=1.25)

    params2 = ckpt.restore_best(root, merge_params(trainable, frozen))
    for a, b in zip(jax.tree.leaves(params2),
                    jax.tree.leaves(merge_params(trainable, frozen))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tr2, os2, meta = ckpt.restore_last(root, trainable, opt_state)
    assert meta == {"epoch": 3, "batch_counter": 42, "best_loss": 1.25}
    for a, b in zip(jax.tree.leaves(os2), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_renamed_key_fails_loudly(tmp_path):
    """Path-keyed format: a renamed/reordered params dict must not silently
    load weights into the wrong parameters (round-1 advisor finding)."""
    import json
    import pytest

    tree = {"a": np.ones((2, 3), np.float32), "b": np.zeros((2, 3), np.float32)}
    path = str(tmp_path / "ck")
    ckpt.save_pytree(path, tree)

    renamed = {"a": np.ones((2, 3), np.float32), "c": np.zeros((2, 3), np.float32)}
    with pytest.raises(ValueError, match="missing keys"):
        ckpt.restore_pytree(path, renamed)

    # reordered-but-same-keys is fine: leaves resolve by path, not position
    swapped = {"b": np.full((2, 3), 7.0, np.float32),
               "a": np.full((2, 3), 9.0, np.float32)}
    out = ckpt.restore_pytree(path, swapped)
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])

    # legacy v0 (order-based) checkpoints: readable only with an exactly
    # matching treedef fingerprint
    meta_path = tmp_path / "ck" / "structure.json"
    meta = json.loads(meta_path.read_text())
    v0 = {"n": meta["n"], "fingerprint": meta["fingerprint"]}
    meta_path.write_text(json.dumps(v0))
    out = ckpt.restore_pytree(path, tree)
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])
    with pytest.raises(ValueError, match="different pytree structure"):
        ckpt.restore_pytree(path, {"x": tree["a"], "y": tree["b"]})


def test_dataset_npz_roundtrip(tmp_path):
    ds = small_dataset()
    path = str(tmp_path / "cache.npz")
    ds.save(path)
    ds2 = UMPRDataset.load(path)
    np.testing.assert_array_equal(ds.u_tokens, ds2.u_tokens)
    np.testing.assert_array_equal(ds.photo_paths, ds2.photo_paths)


def test_loader_padding_and_shuffle():
    ds = small_dataset(n=10)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches[:-1]:
        assert b["sample_mask"].sum() == 4
    last = batches[-1]
    assert last["sample_mask"].tolist() == [1, 1, 0, 0]
    assert (last["u_counts"][2:] == 0).all()  # dead rows can't raise maxima

    # same seed -> same order; different seed -> different order
    again = list(BatchLoader(ds, batch_size=4, shuffle=True, seed=7))
    np.testing.assert_array_equal(batches[0]["ratings"], again[0]["ratings"])
    other = list(BatchLoader(ds, batch_size=4, shuffle=True, seed=8))
    assert any((a["ratings"] != b["ratings"]).any()
               for a, b in zip(batches, other))


def test_photo_cache_lru_eviction(tmp_path):
    cv2 = __import__("cv2")
    from umpr_tpu.data.images import PhotoCache
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (50, 50, 3)).astype(np.uint8))
        paths.append(p)

    one = PhotoCache(1)  # capacity below one image -> always evicts, never breaks
    for p in paths:
        img = one.get(p, (32, 32))
        assert img.shape == (32, 32, 3)
    assert one.misses == 4

    big = PhotoCache(10 << 20)
    for p in paths * 3:
        big.get(p, (32, 32))
    assert big.misses == 4 and big.hits == 8


def test_orbax_backend_roundtrip_and_autodetect(tmp_path):
    """save with the orbax backend; restore_pytree auto-detects the format."""
    rng = np.random.default_rng(3)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(2), dims,
                       rng.standard_normal((30, 8)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    tx = make_optimizer(1e-3)
    opt_state = tx.init(trainable)
    root = str(tmp_path / "run")

    ckpt.save_best(root, params, backend="orbax")
    ckpt.save_last(root, trainable, opt_state, backend="orbax",
                   epoch=3, batch_counter=42, best_loss=1.5)

    like = init_umpr(jax.random.PRNGKey(9), dims,
                     np.zeros((30, 8), np.float32))
    restored = ckpt.restore_best(root, like)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tr2, opt2, meta = ckpt.restore_last(root, trainable, opt_state)
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(opt2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta == {"epoch": 3, "batch_counter": 42, "best_loss": 1.5}

    # a second save overwrites cleanly (same semantics as npz)
    ckpt.save_best(root, restored, backend="orbax")
    ckpt.restore_best(root, like)


def test_orbax_backend_rejects_renamed_tree(tmp_path):
    import pytest
    root = str(tmp_path / "run")
    tree = {"a": np.ones((2, 2), np.float32), "b": np.zeros(3, np.float32)}
    ckpt.save_pytree(root, tree, backend="orbax")
    renamed = {"a": np.ones((2, 2), np.float32), "c": np.zeros(3, np.float32)}
    with pytest.raises(Exception):
        ckpt.restore_pytree(root, renamed)


def test_interrupted_save_preserves_previous_checkpoint(tmp_path, monkeypatch):
    """A crash mid-save (preemption/OOM-kill) must never destroy the only
    good checkpoint: saves write to a temp name and os.replace into place."""
    import pytest
    root = str(tmp_path / "run")
    tree_v1 = {"w": np.full((4, 4), 1.0, np.float32)}
    tree_v2 = {"w": np.full((4, 4), 2.0, np.float32)}
    ckpt.save_pytree(root, tree_v1)

    real_savez = np.savez

    def exploding_savez(path, **arrays):
        real_savez(path, **arrays)  # tmp file fully written...
        raise RuntimeError("preempted")  # ...but we die before the swap

    monkeypatch.setattr(np, "savez", exploding_savez)
    with pytest.raises(RuntimeError):
        ckpt.save_pytree(root, tree_v2)
    monkeypatch.setattr(np, "savez", real_savez)

    restored = ckpt.restore_pytree(root, {"w": np.zeros((4, 4), np.float32)})
    np.testing.assert_array_equal(restored["w"], tree_v1["w"])  # v1 intact

    # orbax: kill after the tmp dir is written but before the swap
    ckpt.save_pytree(root, tree_v1, backend="orbax")
    import umpr_tpu.train.checkpoint as ckpt_mod
    real_rename = os.rename
    monkeypatch.setattr(ckpt_mod.os, "rename",
                        lambda *a: (_ for _ in ()).throw(RuntimeError("preempted")))
    with pytest.raises(RuntimeError):
        ckpt.save_pytree(root, tree_v2, backend="orbax")
    monkeypatch.setattr(ckpt_mod.os, "rename", real_rename)
    restored = ckpt.restore_pytree(root, {"w": np.zeros((4, 4), np.float32)})
    np.testing.assert_array_equal(restored["w"], tree_v1["w"])


def test_orbax_save_after_crashed_swap_keeps_old(tmp_path, monkeypatch):
    """After a crash between the two swap renames (live dir missing, .old
    holding the only copy), the NEXT save must not delete .old before its
    tmp is promoted -- a second crash there used to lose every checkpoint."""
    import pytest
    import umpr_tpu.train.checkpoint as ckpt_mod
    root = str(tmp_path / "run")
    v1 = {"w": np.full((4, 4), 1.0, np.float32)}
    v2 = {"w": np.full((4, 4), 2.0, np.float32)}
    ckpt.save_pytree(root, v1, backend="orbax")

    # simulate the crashed swap: live -> .old, live gone
    target = ckpt_mod._orbax_dir(root)
    os.rename(target, target + ".old")
    like = {"w": np.zeros((4, 4), np.float32)}
    np.testing.assert_array_equal(  # .old fallback works
        ckpt.restore_pytree(root, like)["w"], v1["w"])

    # next save crashes again at the final promote
    real_rename = os.rename
    def exploding_rename(src, dst):
        if dst == target:
            raise RuntimeError("preempted")
        return real_rename(src, dst)
    monkeypatch.setattr(ckpt_mod.os, "rename", exploding_rename)
    with pytest.raises(RuntimeError):
        ckpt.save_pytree(root, v2, backend="orbax")
    monkeypatch.setattr(ckpt_mod.os, "rename", real_rename)

    # v1 must still be restorable from .old
    np.testing.assert_array_equal(
        ckpt.restore_pytree(root, like)["w"], v1["w"])


def test_npz_roundtrips_bf16_opt_state(tmp_path):
    """bfloat16 Adam moments survive the npz backend bit-exactly (numpy
    would otherwise degrade them to raw void bytes)."""
    import jax.numpy as jnp
    from umpr_tpu.train import checkpoint as ckpt
    tree = {"mu": jnp.asarray([1.5, -2.25, 3.0], jnp.bfloat16),
            "w": jnp.asarray([0.5, 0.25], jnp.float32)}
    ckpt.save_pytree(str(tmp_path / "c"), tree)
    like = {"mu": jnp.zeros(3, jnp.bfloat16), "w": jnp.zeros(2, jnp.float32)}
    out = ckpt.restore_pytree(str(tmp_path / "c"), like)
    assert out["mu"].dtype == jnp.bfloat16
    assert out["w"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out["mu"], np.float32),
                                  np.asarray(tree["mu"], np.float32))


def test_restore_prefers_newer_format_after_crashed_clear(tmp_path, monkeypatch):
    """Crash window: orbax save completed but _clear_other_format never ran,
    leaving a stale npz beside it.  Restore must pick the NEWER (orbax)
    checkpoint, not silently resurrect the stale npz params."""
    import time
    import jax.numpy as jnp
    from umpr_tpu.train import checkpoint as ckpt
    path = str(tmp_path / "c")
    ckpt.save_pytree(path, {"w": jnp.asarray([1.0, 2.0], jnp.float32)})
    # backdate the npz marker instead of sleeping: sub-second sleeps are
    # below some filesystems mtime granularity (1s overlay/NFS ticks)
    stale = os.path.join(path, "structure.json")
    old = time.time() - 10
    os.utime(stale, (old, old))
    monkeypatch.setattr(ckpt, "_clear_other_format", lambda *a, **k: None)
    ckpt.save_pytree(path, {"w": jnp.asarray([5.0, 6.0], jnp.float32)},
                     backend="orbax")
    assert os.path.exists(os.path.join(path, "structure.json"))  # stale npz
    out = ckpt.restore_pytree(path, {"w": jnp.zeros(2, jnp.float32)})
    np.testing.assert_array_equal(np.asarray(out["w"]), [5.0, 6.0])


def test_npz_restore_rejects_real_dtype_mismatch(tmp_path):
    """A genuine dtype mismatch (e.g. resuming f32 Adam moments into a
    bf16-moment optimizer) must raise, not silently cast: the widened-bf16
    disk format makes silent casts indistinguishable from data loss."""
    import pytest
    import jax.numpy as jnp
    from umpr_tpu.train import checkpoint as ckpt
    tree = {"mu": jnp.asarray([1.5, -2.25, 3.0], jnp.float32)}
    ckpt.save_pytree(str(tmp_path / "c"), tree)
    like = {"mu": jnp.zeros(3, jnp.bfloat16)}
    with pytest.raises(ValueError, match="saved as float32"):
        ckpt.restore_pytree(str(tmp_path / "c"), like)
