"""Device-resident corpus mode (--device_dataset): bit-exact equivalence
with the streaming loader path, order parity of the index stream, and the
auto-gating rules.

The mode exists because host->device batch transfer dominates real
Trainer.fit wall on relay/network-attached hosts (BENCH_DETAILS.md
"Through-trainer attribution"); correctness bar is exact equality --
the gathered batches are the same int32/float32 values, so the jitted
math must produce identical results."""

import numpy as np
import pytest

from umpr_tpu.config import Config
from umpr_tpu.data.dataset import UMPRDataset
from umpr_tpu.data.loader import BatchLoader
from umpr_tpu.train.trainer import Trainer
from umpr_tpu.utils.logging import get_logger

S, L, S_UI, VOCAB, EMB = 6, 7, 3, 200, 12


def packed_dataset(n, seed=0):
    rng = np.random.default_rng(seed)

    def lengths(count_max, n_sent):
        c = rng.integers(1, count_max + 1, n).astype(np.int32)
        l = rng.integers(2, L + 1, (n, n_sent)).astype(np.int32)
        l[np.arange(n_sent)[None, :] >= c[:, None]] = 1
        return c, l

    u_c, u_l = lengths(S, S)
    i_c, i_l = lengths(S, S)
    ui_c, ui_l = lengths(S_UI, S_UI)
    return UMPRDataset(
        u_tokens=rng.integers(3, VOCAB, (n, S, L)).astype(np.int32),
        u_lengths=u_l, u_counts=u_c,
        i_tokens=rng.integers(3, VOCAB, (n, S, L)).astype(np.int32),
        i_lengths=i_l, i_counts=i_c,
        ui_tokens=rng.integers(3, VOCAB, (n, S_UI, L)).astype(np.int32),
        ui_lengths=ui_l, ui_counts=ui_c,
        ratings=rng.uniform(1, 5, n).astype(np.float32),
        photo_paths=np.full((n, 1, 1), "", dtype=np.str_),
    )


class _W2v:
    embedding = np.random.default_rng(1).standard_normal(
        (VOCAB, EMB)).astype(np.float32)


def _mk_trainer(tmp_path, mode, k=2, epochs=2, metrics=None):
    cfg = Config(argv=[
        "--device", "cpu", "--multi_gpu", "False",
        "--review_net_only", "True", "--batch_size", "8",
        "--train_epochs", str(epochs), "--eval_every", "4",
        "--steps_per_dispatch", str(k), "--learning_rate", "0.01",
        "--min_sent_count", "1", "--seed", "2",
        "--device_dataset", mode]
        + (["--metrics_jsonl", metrics] if metrics else []))
    return Trainer(cfg, get_logger(logger_name=f"devds-{mode}"), _W2v())


def test_index_stream_matches_loader_order():
    """_index_stream must reproduce the streaming loader's batch order and
    dead-padding exactly (same RNG, same start_batch fast-forward)."""
    ds = packed_dataset(52)
    for (B, k, start, shuffle, seed) in [(8, 2, 0, True, 7), (8, 3, 2, True, 3),
                                         (8, 1, 0, False, 0), (16, 2, 1, True, 5)]:
        cfg = Config(argv=["--device", "cpu", "--multi_gpu", "False",
                           "--review_net_only", "True",
                           "--batch_size", str(B),
                           "--steps_per_dispatch", str(k),
                           "--eval_every", str(k * 500),
                           "--min_sent_count", "1"])
        t = Trainer.__new__(Trainer)  # order logic needs only config+k
        t.config, t.k_dispatch = cfg, k
        loader = BatchLoader(ds, B, shuffle=shuffle, ignore_photos=True,
                             seed=seed, start_batch=start)
        stream_batches = list(loader)
        idx_batches = []
        for kind, payload in t._index_stream(len(ds), seed, start,
                                             shuffle=shuffle):
            if kind == "rchunk":
                idxs, n_reals = payload
                idx_batches += [(idxs[j], int(n_reals[j]))
                                for j in range(idxs.shape[0])]
            else:
                idx, n_real = payload
                idx_batches.append((idx, int(n_real)))
        assert len(stream_batches) == len(idx_batches)
        for hb, (idx, n_real) in zip(stream_batches, idx_batches):
            ref_rows = ds.u_tokens[idx]
            assert np.array_equal(hb["u_tokens"], ref_rows)
            assert np.array_equal(hb["sample_mask"],
                                  (np.arange(len(idx)) < n_real).astype(np.float32))
            # dead-padding parity: counts 0, lengths 1 past n_real
            assert np.array_equal(hb["u_counts"][n_real:],
                                  np.zeros(len(idx) - n_real, np.int32))
            assert (hb["ui_lengths"][n_real:] == 1).all()


@pytest.mark.slow
def test_resident_fit_bit_exact_vs_streaming(tmp_path):
    """Same data, same seed: --device_dataset on must produce EXACTLY the
    params, metrics, and eval MSEs of the streaming path (incl. an epoch
    whose batch count is not a multiple of steps_per_dispatch, so both
    rchunk and rsingle dispatches run, and a dead-padded final batch)."""
    import jax

    train, valid = packed_dataset(52, seed=0), packed_dataset(12, seed=1)
    results = {}
    for mode in ("off", "on"):
        metrics = str(tmp_path / f"m_{mode}.jsonl")
        t = _mk_trainer(tmp_path, mode, k=2, epochs=2, metrics=metrics)
        t.fit(train, valid, str(tmp_path / f"model_{mode}"))
        results[mode] = (jax.tree.map(np.asarray, t.trainable),
                         open(metrics).read())
        if mode == "on":
            assert t._resident, "resident mode should engage on 1 device"
        else:
            assert not t._resident

    p_off, m_off = results["off"]
    p_on, m_on = results["on"]
    leaves_off = jax.tree.leaves(p_off)
    leaves_on = jax.tree.leaves(p_on)
    assert len(leaves_off) == len(leaves_on)
    for a, b in zip(leaves_off, leaves_on):
        np.testing.assert_array_equal(a, b)
    # metrics lines identical up to timestamps/elapsed
    import json
    for la, lb in zip(m_off.splitlines(), m_on.splitlines()):
        da, db = json.loads(la), json.loads(lb)
        for d in (da, db):
            d.pop("ts", None), d.pop("elapsed_s", None)
        assert da == db


@pytest.mark.slow
def test_resident_fit_multi_device_matches_streaming(tmp_path):
    """On the default 8-virtual-device mesh the resident mode replicates
    the data arrays and shards the (k, B) index matrices over 'dp'
    (Trainer._place_idx) -- the gathered batch lands in the same
    dp-sharded layout put_global produces, so the fit must stay exactly
    equal to the streaming path on the same mesh."""
    import jax

    train, valid = packed_dataset(52, seed=0), packed_dataset(12, seed=1)
    results = {}
    for mode in ("off", "on"):
        cfg = Config(argv=[
            "--device", "cpu", "--review_net_only", "True",
            "--batch_size", "8", "--train_epochs", "2", "--eval_every", "4",
            "--steps_per_dispatch", "2", "--learning_rate", "0.01",
            "--min_sent_count", "1", "--seed", "2",
            "--device_dataset", mode])
        t = Trainer(cfg, get_logger(logger_name=f"devmd-{mode}"), _W2v())
        assert t._n_dev == 8
        t.fit(train, valid, str(tmp_path / f"mdl_{mode}"))
        assert t._resident == (mode == "on")
        results[mode] = jax.tree.map(np.asarray, t.trainable)
    for a, b in zip(jax.tree.leaves(results["off"]),
                    jax.tree.leaves(results["on"])):
        np.testing.assert_array_equal(a, b)


def _photo_dataset(n, photo_dir, seed=0, V=1, P=1, write_photos=True):
    """Packed dataset whose samples reference real (tiny) JPEGs, plus one
    missing path and some '' padding -- the decode-failure/zero-fill
    parity cases.

    write_photos=False builds only the path table (the JPEG bytes then come
    from whoever wrote them last).  Multi-process callers MUST use it: the
    files are shared, and a peer rewriting p0..p3.jpg (O_TRUNC) while this
    process decodes them races truncated/stale bytes into the photo bank."""
    rng = np.random.default_rng(seed)
    ds = packed_dataset(n, seed=seed)
    paths = np.full((n, V, P), "", dtype="<U128")
    files = []
    for j in range(4):
        p = str(photo_dir / f"p{j}.jpg")
        if write_photos:
            import cv2
            cv2.imwrite(p, rng.integers(0, 255, (40, 50, 3)).astype(np.uint8))
        files.append(p)
    for i in range(n):
        if i % 5 == 4:
            continue  # '' photos (zero-filled by both paths)
        if i % 7 == 6:
            paths[i, 0, 0] = str(photo_dir / "missing.jpg")  # decode failure
        else:
            paths[i, 0, 0] = files[i % len(files)]
    return UMPRDataset(**{f: getattr(ds, f) for f in
                          ("u_tokens", "u_lengths", "u_counts", "i_tokens",
                           "i_lengths", "i_counts", "ui_tokens", "ui_lengths",
                           "ui_counts", "ratings")},
                       photo_paths=paths)


@pytest.mark.slow
def test_resident_full_umpr_with_photo_bank_bit_exact(tmp_path):
    """Full multi-modal UMPR: the resident photo bank (distinct photos in
    HBM, per-sample bank rows gathered on device) must reproduce the
    streaming loader's decoded batches exactly -- including '' photos,
    decode failures (zeros), and dead-sample rows."""
    import jax

    train = _photo_dataset(12, tmp_path, seed=3)
    valid = _photo_dataset(6, tmp_path, seed=4)
    results = {}
    for mode in ("off", "on"):
        cfg = Config(argv=[
            "--device", "cpu", "--multi_gpu", "False",
            "--review_net_only", "False", "--photo_size", "32",
            "--views", "['unknown']", "--photo_count", "1",
            "--batch_size", "4", "--train_epochs", "1", "--eval_every", "2",
            "--steps_per_dispatch", "2", "--learning_rate", "0.01",
            "--min_sent_count", "1", "--seed", "2",
            "--device_dataset", mode])
        t = Trainer(cfg, get_logger(logger_name=f"devph-{mode}"), _W2v())
        t.fit(train, valid, str(tmp_path / f"model_{mode}"))
        if mode == "on":
            assert t._resident and t._bank_uniq is not None
            assert t._bank_uniq[0] == ""
        results[mode] = jax.tree.map(np.asarray, t.trainable)
    for a, b in zip(jax.tree.leaves(results["off"]),
                    jax.tree.leaves(results["on"])):
        np.testing.assert_array_equal(a, b)


def test_auto_gating(tmp_path):
    """'auto' declines photos, oversized corpora, and multi-device meshes;
    'on' falls back with a log line instead of crashing."""
    train, valid = packed_dataset(20), packed_dataset(8)

    t = _mk_trainer(tmp_path, "auto", k=1, epochs=1)
    assert t._resident_mode(train, valid)

    # size gate
    t.config.device_dataset_mb = 0
    assert not t._resident_mode(train, valid)
    t.config.device_dataset_mb = 4096

    # photo configs are residable when the distinct-photo bank also fits
    # the budget ('' paths only -> a 1-row zero bank here) ...
    t.config.review_net_only = False
    assert t._resident_mode(train, valid)
    assert t._bank_uniq is not None and t._bank_uniq[0] == ""
    # ... and decline when bank + arrays exceed the budget
    t.config.device_dataset_mb = 0
    assert not t._resident_mode(train, valid)
    t.config.device_dataset_mb = 4096
    t.config.review_net_only = True

    # multi-device single-process meshes ARE residable: the data arrays
    # replicate and the per-dispatch index matrices shard over 'dp'
    cfg = Config(argv=["--device", "cpu", "--review_net_only", "True",
                       "--batch_size", "8", "--min_sent_count", "1",
                       "--device_dataset", "on", "--eval_every", "500"])
    t8 = Trainer(cfg, get_logger(logger_name="devds-8"), _W2v())
    assert t8._n_dev > 1
    assert t8._resident_mode(train, valid)

    # off gate
    t.config.device_dataset = "off"
    assert not t._resident_mode(train, valid)


def test_second_fit_rebuilds_photo_bank(tmp_path):
    """A second fit() on the same Trainer with DIFFERENT photo datasets
    must rebuild the resident photo bank and device-array cache: round 4
    cached both forever, so the new datasets' photo_idx silently gathered
    from the stale bank (ADVICE r4 #2).  Equivalence oracle: the same two
    fits through the streaming path."""
    import jax

    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    results = {}
    for mode in ("off", "on"):
        cfg = Config(argv=[
            "--device", "cpu", "--multi_gpu", "False",
            "--review_net_only", "False", "--photo_size", "32",
            "--views", "['unknown']", "--photo_count", "1",
            "--batch_size", "4", "--train_epochs", "1", "--eval_every", "1000",
            "--learning_rate", "0.01", "--min_sent_count", "1", "--seed", "2",
            "--device_dataset", mode])
        t = Trainer(cfg, get_logger(logger_name=f"refit-{mode}"), _W2v())
        t.fit(_photo_dataset(8, d1, seed=3), _photo_dataset(4, d1, seed=4),
              str(tmp_path / f"m1_{mode}"))
        # second corpus: photo files with DIFFERENT content and more rows
        t.fit(_photo_dataset(8, d2, seed=11), _photo_dataset(4, d2, seed=12),
              str(tmp_path / f"m2_{mode}"))
        if mode == "on":
            assert t._resident
        results[mode] = jax.tree.map(np.asarray, t.trainable)
    for a, b in zip(jax.tree.leaves(results["off"]),
                    jax.tree.leaves(results["on"])):
        np.testing.assert_array_equal(a, b)


def test_all_dead_batch_eval_finite_without_jit():
    """An ALL-dead gathered batch (the pad_final_chunk eval path) carries
    NaN predictions -- zeroed counts NaN the masked softmax -- and its
    (sq, n) contribution must still be exactly (0, 0).  Run both jitted
    and eagerly: the old `mask * err**2` form only survived because XLA's
    bool-mul rewrite dropped the 0 * NaN under jit; eager mode (and any
    backend without the rewrite) got NaN, which poisoned the split MSE and
    made save-best never fire (best > nan is always False)."""
    import jax
    import jax.numpy as jnp

    from umpr_tpu.train.step import gather_batch, make_eval_step_resident

    ds = packed_dataset(12, seed=0)
    t = _mk_trainer(None, "on", k=2, epochs=1)
    data = t._device_data(ds)
    eval1 = make_eval_step_resident(t.dims)
    idx = jnp.zeros(t.config.batch_size, jnp.int32)

    sq, n = eval1(t.trainable, t.frozen, data, idx, jnp.int32(0))
    assert float(n) == 0.0 and float(sq) == 0.0

    with jax.disable_jit():
        batch = gather_batch(data, idx, jnp.int32(0))
        # the hazard is real: dead rows DO predict NaN eagerly
        from umpr_tpu.models.umpr import umpr_forward
        pred, _, _ = umpr_forward(
            jax.tree.map(jnp.asarray, {**t.trainable, **t.frozen}),
            batch, t.dims, train=False)
        assert np.isnan(np.asarray(pred)).all()
        sq_e, n_e = eval1(t.trainable, t.frozen, data, idx, jnp.int32(0))
        assert float(n_e) == 0.0 and float(sq_e) == 0.0, \
            "eager all-dead batch must contribute (0, 0), not NaN"
