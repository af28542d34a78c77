"""Serving path: Predictor over a trained checkpoint; unscorable rows."""

import numpy as np
import jax

from umpr_tpu.config import Config
from umpr_tpu.models.umpr import ModelDims, init_umpr
from umpr_tpu.train import checkpoint as ckpt
from umpr_tpu.serve import Predictor
from tests.test_checkpoint_loader import small_dataset


class FakeW2v:
    def __init__(self, emb):
        self.embedding = emb


def test_predictor_roundtrip(tmp_path):
    cfg = Config(argv=["--device", "cpu", "--review_net_only", "True",
                       "--batch_size", "8"])  # divisible over the 8 CPU devices
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((25, 8)).astype(np.float32)
    dims = ModelDims.from_config(cfg)
    params = init_umpr(jax.random.PRNGKey(2), dims, emb)
    root = str(tmp_path / "m")
    ckpt.save_best(root, params)

    ds = small_dataset(n=10)
    predictor = Predictor(cfg, FakeW2v(emb), root)
    preds, rows = predictor.predict_dataset(ds)
    assert preds.shape == (10,) and np.isfinite(preds).all()
    assert (preds >= 0).all()  # ReLU head
    np.testing.assert_array_equal(rows, np.arange(10))

    # deterministic across calls
    preds2, _ = predictor.predict_dataset(ds)
    np.testing.assert_array_equal(preds, preds2)


def test_http_pipeline_overlaps_build_and_predict(tmp_path, monkeypatch):
    """Two concurrent /predict requests must pipeline: request B's dataset
    BUILD (host) overlaps request A's PREDICT (device) because the two
    stages hold separate locks.  Stages are stubbed with sleeps so the
    assertion is structural, not hardware-timing-dependent: serialized
    end-to-end handling would take 2*(BUILD+PREDICT); the pipeline takes
    BUILD + 2*PREDICT."""
    import json
    import threading
    import time
    import urllib.request

    from umpr_tpu import serve

    BUILD = PREDICT = 0.6

    class StubDS:
        source_rows = np.arange(2)

    def fake_build(path, pj, pd_, w2v, cfg, df=None):
        time.sleep(BUILD)
        return StubDS()

    class StubPredictor:
        def predict_dataset(self, ds):
            time.sleep(PREDICT)
            return np.zeros(2, np.float32), np.asarray(ds.source_rows)

    monkeypatch.setattr(serve, "build_dataset", fake_build)
    cfg = Config(argv=["--device", "cpu", "--data_dir", str(tmp_path)])
    server = serve.make_http_server(StubPredictor(), cfg, None, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        rows = [{"userID": "u1", "itemID": "i1", "review": "a b c"},
                {"userID": "u2", "itemID": "i2", "review": "d e f"}]

        def post():
            req = urllib.request.Request(
                f"{base}/predict", data=json.dumps({"rows": rows}).encode(),
                headers={"Content-Type": "application/json"})
            return json.load(urllib.request.urlopen(req, timeout=60))

        assert post()["predictions"] == [0.0, 0.0]  # warm single request

        t0 = time.perf_counter()
        results = [None, None]

        def worker(i):
            results[i] = post()

        threads = [threading.Thread(target=worker, args=(i,)) for i in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert all(r["predictions"] == [0.0, 0.0] for r in results)
        serial = 2 * (BUILD + PREDICT)               # 2.4s
        pipelined = BUILD + 2 * PREDICT              # 1.8s
        assert wall < (serial + pipelined) / 2, (
            f"two concurrent requests took {wall:.2f}s -- not pipelined "
            f"(serial would be ~{serial:.1f}s, pipelined ~{pipelined:.1f}s)")
    finally:
        server.shutdown()
