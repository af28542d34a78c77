"""Smaller subsystems: photo downloader validation logic, profiler hook,
ABAE aspect evaluation, hard-label pair mining, review-level tokenization."""

import os

import numpy as np
import pytest
import jax

from umpr_tpu.data.download import is_valid_jpg


def test_is_valid_jpg(tmp_path):
    good = tmp_path / "good.jpg"
    good.write_bytes(b"\xff\xd8some jpeg data\xff\xd9")
    assert is_valid_jpg(str(good))
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8truncated")
    assert not is_valid_jpg(str(bad))
    assert not is_valid_jpg(str(tmp_path / "missing.jpg"))


def test_download_photos_end_to_end(tmp_path, capsys):
    """The threaded downloader against a local HTTP server: success,
    retry-then-success (reference down_photos.py:30-37), permanent failure,
    and skip-if-already-valid (down_photos.py:57)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from umpr_tpu.data import download

    JPEG = b"\xff\xd8 jpeg body \xff\xd9"
    flaky_hits = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            if self.path == "/good.jpg":
                body = JPEG
            elif self.path == "/flaky.jpg":
                flaky_hits.append(1)
                if len(flaky_hits) == 1:  # first attempt fails -> retry
                    self.send_error(503)
                    return
                body = JPEG
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rows = [{"photo_id": "good", "imUrl": f"{base}/good.jpg"},
                {"photo_id": "flaky", "imUrl": f"{base}/flaky.jpg"},
                {"photo_id": "gone", "imUrl": f"{base}/missing.jpg"},
                {"photo_id": "have", "imUrl": f"{base}/missing.jpg"}]
        pj = tmp_path / "photos.json"
        with open(pj, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        photo_dir = tmp_path / "photos"
        photo_dir.mkdir()
        # pre-existing valid file whose URL 404s: must be skipped untouched
        (photo_dir / "have.jpg").write_bytes(b"\xff\xd8 old \xff\xd9")

        download.download_photo.__defaults__ = (2,)  # cap retries: fast test
        try:
            download.download_photos(str(pj))
        finally:
            download.download_photo.__defaults__ = (10,)

        assert download.is_valid_jpg(str(photo_dir / "good.jpg"))
        assert download.is_valid_jpg(str(photo_dir / "flaky.jpg"))
        assert len(flaky_hits) == 2  # retried exactly once
        assert (photo_dir / "have.jpg").read_bytes() == b"\xff\xd8 old \xff\xd9"
        assert not download.is_valid_jpg(str(photo_dir / "gone.jpg"))
        out = capsys.readouterr().out
        assert "1 failed" in out
    finally:
        srv.shutdown()


def test_profiler_hook(tmp_path):
    """jax.profiler trace wrapping a jitted step (the trainer's profile_dir
    path uses exactly this API)."""
    out = str(tmp_path / "trace")
    f = jax.jit(lambda x: (x * x).sum())
    f(jax.numpy.ones(8))
    jax.profiler.start_trace(out)
    f(jax.numpy.ones(8))
    jax.profiler.stop_trace()
    import glob
    assert glob.glob(out + "/**/*.xplane.pb", recursive=True)


def test_evaluate_aspects_noninteractive():
    from umpr_tpu.pretrain.abae import init_abae, evaluate_aspects
    from tests.test_native import FakeW2v, WORDS
    w2v = FakeW2v(WORDS)
    params = init_abae(jax.random.PRNGKey(0), w2v.embedding, 3)
    tests = ["great sound quality album", "terrible mix production bass"]
    labels = ["Food", "Staff"]
    acc = evaluate_aspects(params, w2v, tests, labels,
                           aspect_mapping=[0, 1, 2])
    assert 0.0 <= acc <= 1.0


def test_mine_pairs_hard():
    from umpr_tpu.pretrain.rnet import mine_pairs_hard
    rng = np.random.default_rng(0)
    data = rng.integers(0, 30, (40, 10)).astype(np.int32)
    probs = rng.random((40, 3)).astype(np.float32)
    s1, s2, y = mine_pairs_hard(data, probs, rng)
    assert len(s1) == len(s2) == len(y) and len(y) > 0
    assert set(np.unique(y)) <= {0.0, 1.0}
    # labels alternate pos/neg per anchor
    assert y[0] == 1.0 and y[1] == 0.0


def test_review_level_tokenization():
    """review_level='review': the whole review becomes one 'sentence' with
    '.' treated as whitespace (reference dataset.py:24)."""
    from umpr_tpu.data.dataset import _tokenize_reviews
    from tests.test_native import FakeW2v, WORDS
    import pandas as pd

    class Cfg:
        max_sent_length = 50
        review_level = "review"

    w2v = FakeW2v(WORDS)
    df = pd.DataFrame({"review": ["great sound. quality album loved melody production"]})
    out = _tokenize_reviews(df, w2v, Cfg)
    docs = out[0] if isinstance(out, tuple) else out  # native path returns (docs, flat)
    assert len(docs[0]) == 1 and len(docs[0][0]) == 7  # one unit, 7 tokens


def test_prefetch_iter_propagates_errors():
    from umpr_tpu.data.loader import prefetch_iter

    def boom():
        yield 1
        yield 2
        raise RuntimeError("worker exploded")

    it = prefetch_iter(boom(), depth=1)
    assert next(it) == 1 and next(it) == 2
    import pytest as _p
    with _p.raises(RuntimeError, match="worker exploded"):
        list(it)


def test_masking_primitives():
    import jax.numpy as jnp
    from umpr_tpu.ops.masking import masked_max, masked_softmax, exists_mask

    x = jnp.asarray([[1.0, 5.0, 3.0], [4.0, 2.0, 9.0]])
    m = jnp.asarray([[True, False, True], [True, True, False]])
    mx = masked_max(x, m, axis=1)
    np.testing.assert_allclose(np.asarray(mx), [3.0, 4.0])

    sm = masked_softmax(x, m, axis=1)
    np.testing.assert_allclose(np.asarray(sm.sum(1)), [1.0, 1.0], rtol=1e-6)
    assert float(sm[0, 1]) == 0.0 and float(sm[1, 2]) == 0.0

    e = exists_mask(jnp.int32(2), jnp.int32(3), 4, 5)
    expect = np.zeros((4, 5), bool)
    expect[:2, :3] = True
    np.testing.assert_array_equal(np.asarray(e), expect)


@pytest.mark.slow
def test_convert_vgg16_roundtrip(tmp_path):
    """tools/convert_vgg16.py on a synthetic torchvision-layout state_dict:
    converted weights load into our VGG16 and the forward matches a torch
    reference built from the same weights."""
    import sys
    torch = __import__("pytest").importorskip("torch")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.convert_vgg16 import convert
    from umpr_tpu.models.visual_net import init_vgg16, vgg16, VGG16_CFG
    from umpr_tpu.train.checkpoint import restore_pytree
    from tests.ref_oracle import _fake_torchvision
    import types

    # synthetic torchvision-layout state_dict (tiny random weights)
    _fake_torchvision()
    tv = sys.modules["torchvision"]
    model = tv.models.vgg16()
    pth = str(tmp_path / "vgg16.pth")
    torch.save(model.state_dict(), pth)

    out = str(tmp_path / "converted")
    convert(pth, out)

    params = init_vgg16(jax.random.PRNGKey(0))
    params = restore_pytree(out, params)

    rng = np.random.default_rng(0)
    img = rng.random((1, 224, 224, 3)).astype(np.float32)
    ours = vgg16(params, jax.numpy.asarray(img))
    model.eval()
    with torch.no_grad():
        theirs = model(torch.tensor(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_resolve_photos_nan_item_ids(tmp_path):
    """Rows with NaN/missing itemID must be DROPPED, exactly like an id with
    no manifest entry (reference dataset.py:110-113) — pd.factorize encodes
    them as code -1, which must not wrap around onto resolved[-1]."""
    import json
    from umpr_tpu.data.dataset import _resolve_photos

    pj = tmp_path / "photos.json"
    with open(pj, "w") as f:
        f.write(json.dumps({"business_id": "B1", "photo_id": "p1"}) + "\n")

    item_ids = ["B1", float("nan"), "B1", None, "B2"]
    retain = np.ones(5, dtype=bool)
    paths = _resolve_photos(str(pj), str(tmp_path), item_ids, retain,
                            views=["unknown"], photo_count=1)
    assert retain.tolist() == [True, False, True, False, False]
    assert paths[0] is not None and paths[2] == paths[0]
    assert paths[1] is None and paths[3] is None and paths[4] is None
    assert "p1.jpg" in paths[0][0][0]

    # all-missing ids: no unique entries at all — must drop all, not crash
    retain2 = np.ones(2, dtype=bool)
    paths2 = _resolve_photos(str(pj), str(tmp_path), [None, float("nan")],
                             retain2, views=["unknown"], photo_count=1)
    assert retain2.tolist() == [False, False]
    assert paths2 == [None, None]
