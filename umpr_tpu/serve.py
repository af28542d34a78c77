"""Batch serving: rating predictions from a trained checkpoint.

The reference only exposes test() (MSE over a labeled split, main.py:88-99);
production deployment needs predictions for (user, item) pairs.  This module
adds a jitted no-grad predict path (the composite XLA attention -- measured
fastest for serving too, see umpr_tpu/ops/attention.py) and a CLI:

    python -m umpr_tpu.serve --data_dir data/music \
        --word2vec_file embedding/glove.6B.50d.txt \
        --model_path model/<run-dir> --input data/music/test.csv \
        --output predictions.csv

The input CSV has the training-CSV schema; a `rating` column is optional
(ignored for prediction; filled with 0 when absent).  Output columns:
userID, itemID, prediction.  Rows dropped by the reference's sample filters
(insufficient history / missing photos, see umpr_tpu/data/dataset.py) are
emitted with an empty prediction -- the reference model cannot score them
either.

Online mode (--server --port N) runs a JSON-over-HTTP batch scorer on the
same Predictor instead of a one-shot CSV pass:

    POST /predict  {"rows": [{"userID": ..., "itemID": ..., "review": ...,
                              ("rating": ...)}, ...]}
      -> {"predictions": [float | null, ...]}   (null = unscorable row)
    GET /health    -> {"status": "ok"}

Requests follow the CSV semantics: histories are built from the rows of
the request itself (the reference's Dataset does the same for test.csv,
reference main.py:90), so a request should carry the user's/item's review
context alongside the pair being scored.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from umpr_tpu.config import Config
from umpr_tpu.data.dataset import build_dataset
from umpr_tpu.data.loader import BatchLoader, prefetch_to_device
from umpr_tpu.models.umpr import init_umpr, umpr_forward
from umpr_tpu.parallel.mesh import setup_runtime
from umpr_tpu.train import checkpoint as ckpt
from umpr_tpu.text.vocab import Word2vec


class Predictor:
    def __init__(self, config, word2vec, model_path):
        self.config = config
        # the SAME bring-up as the Trainer (one implementation: the VGG fold
        # gate must reason in per-device rows identically in both)
        self.mesh, self.rep, self.dp, self.dims, _ = setup_runtime(config)
        # persistent decoded-photo cache: per-request loaders would allocate
        # and discard a fresh cache, re-decoding every JPEG on every request
        from umpr_tpu.data.images import PhotoCache
        self._photo_cache = (PhotoCache(config.photo_cache_mb << 20)
                             if (config.photo_cache_mb > 0
                                 and not config.review_net_only) else None)

        like = init_umpr(jax.random.PRNGKey(0), self.dims, word2vec.embedding)
        params = ckpt.restore_best(model_path, like)
        self.params = jax.device_put(params, self.rep)

        dims = self.dims

        def _full_pad(batch):
            """Pin pad_maxima to the FULL static padding (the packed arrays'
            own config-sized dims).  Training/eval compute runtime batch
            maxima for reference numerics parity (the reference pads each
            batch to its own maxima, so its predictions depend on batch
            composition); serving instead must be DETERMINISTIC per row --
            the same row scores the same whether it arrives alone, packed
            with other rows, or merged by the request coalescer."""
            return dict(batch,
                        pad_maxima=(batch["u_tokens"].shape[1],
                                    batch["u_tokens"].shape[2],
                                    batch["ui_tokens"].shape[1],
                                    batch["ui_tokens"].shape[2]))

        @jax.jit
        def _predict(params, batch):
            pred, _, _ = umpr_forward(params, _full_pad(batch), dims,
                                      train=False)
            return pred

        self._predict = _predict

        def _with_bank_photos(bank, b):
            b = dict(b)
            b["photos"] = bank[b.pop("photo_idx")]
            return b

        @jax.jit
        def _predict_bank(params, bank, batch):
            pred, _, _ = umpr_forward(params,
                                      _full_pad(_with_bank_photos(bank, batch)),
                                      dims, train=False)
            return pred

        self._predict_bank = _predict_bank
        # --steps_per_dispatch k > 1: k batches per device call via an
        # on-device scan.  Serving is dispatch-bound on remote-attached
        # TPUs exactly like training (see train/step.make_multi_eval_step);
        # predictions are identical to k single dispatches.
        self._k = max(1, getattr(config, "steps_per_dispatch", 1))
        if self._k > 1:
            @jax.jit
            def _predict_k(params, batches):
                def body(_, b):
                    pred, _, _ = umpr_forward(params, _full_pad(b), dims,
                                              train=False)
                    return None, pred

                _, preds = jax.lax.scan(body, None, batches)
                return preds  # (k, B)

            self._predict_k = _predict_k

            @jax.jit
            def _predict_bank_k(params, bank, batches):
                def body(_, b):
                    pred, _, _ = umpr_forward(
                        params, _full_pad(_with_bank_photos(bank, b)), dims,
                        train=False)
                    return None, pred

                _, preds = jax.lax.scan(body, None, batches)
                return preds  # (k, B)

            self._predict_bank_k = _predict_bank_k
            from jax.sharding import NamedSharding, PartitionSpec as P
            # stacked chunks are (k, B, ...): batch axis is axis 1
            self._dp_stacked = NamedSharding(self.mesh, P(None, "dp"))

        # Resident photo bank (--device_dataset != off, photo configs):
        # every distinct photo is decoded ONCE across the Predictor's
        # lifetime and lives in HBM as a (C, H, W, 3) uint8 bank; requests
        # then ship (B, V, P) int32 bank rows instead of decoded pixel
        # tensors.  Repeated-item scoring (the common serving pattern:
        # items recur across requests) stops paying both the host JPEG
        # decode (beyond the LRU cache) and the per-request photo upload
        # -- the wire cost drops from ~B*V*P*H*W*3 bytes to ~B*V*P*4.
        # Row 0 is zeros ('' paths, decode failures, dead samples), the
        # same bytes the streaming loader ships (predictions equal to f32
        # rounding -- the gather fuses with the normalize differently
        # than the photos-as-input graph: tests/test_serve.py).  Growth
        # is capped by --device_dataset_mb;
        # overflow logs once and falls back to streaming photos.
        self._bank_enabled = (not config.review_net_only
                              and getattr(config, "device_dataset", "off")
                              != "off")
        if self._bank_enabled:
            H = config.photo_size
            self._bank_rows = {"": 0}
            self._bank_dev = jax.device_put(
                np.zeros((1, H, H, 3), np.uint8), self.rep)

    def _chunk_stream(self, loader):
        """(device_payload, [host sample masks], chunked?) triples — the
        trainer's chunked-dispatch protocol (data.loader.chunk_stream)
        driven with plain device_put (serving is single-process)."""
        from umpr_tpu.data.loader import chunk_stream

        # extract: only the small liveness masks survive the prefetch queue
        # -- the full host batches (decoded photos included) are released as
        # soon as each transfer is issued
        yield from chunk_stream(
            loader, self._k,
            put_chunk=lambda s: jax.device_put(s, self._dp_stacked),
            put_single=lambda b: jax.device_put(b, self.dp),
            depth=self.config.prefetch_depth,
            extract=lambda hb: hb["sample_mask"] > 0)

    def predict_dataset(self, dataset):
        """-> (predictions (N,), source_rows (N,)) over retained samples."""
        return self._predict_packed(dataset), np.asarray(dataset.source_rows)

    def _bank_idx(self, dataset):
        """Grow the resident photo bank with the dataset's unseen photos
        (decoded once, via the same machinery the streaming loader uses)
        and return its (n, V, P) int32 bank rows -- or None when the bank
        is disabled / has overflowed --device_dataset_mb (streaming
        fallback; logged once)."""
        if not self._bank_enabled:
            return None
        cfg = self.config
        new = [p for p in np.unique(dataset.photo_paths.ravel())
               if p not in self._bank_rows]
        if new:
            total = len(self._bank_rows) + len(new)
            # Budget the ALLOCATED capacity (the next power of two), not the
            # logical count: the bank is allocated at capacity, so gating on
            # `total` would let a doubling blow past the cap by up to 2x on
            # exactly the HBM-tight devices the flag protects.  (During a
            # growth step the old bank and the new concatenate coexist, so
            # the transient peak is still <= 1.5x the budget; steady state
            # is <= the budget.)
            cap_after = self._bank_dev.shape[0]
            while cap_after < total:
                cap_after *= 2
            if cap_after * cfg.photo_size * cfg.photo_size * 3 > \
                    (cfg.device_dataset_mb << 20):
                print(f"serve: resident photo bank capacity {cap_after} rows "
                      f"would exceed device_dataset_mb="
                      f"{cfg.device_dataset_mb} at {total} photos; "
                      f"streaming photos from here on.")
                self._bank_enabled = False
                return None
            from umpr_tpu.data.images import load_photo_batch
            imgs = load_photo_batch(
                np.asarray(new, dtype=np.str_).reshape(-1, 1, 1),
                (cfg.photo_size, cfg.photo_size), None,
                self._photo_cache)[:, 0, 0]
            logical = len(self._bank_rows)
            for p in new:
                self._bank_rows[p] = len(self._bank_rows)
            # power-of-two CAPACITY (zero rows past the logical end): the
            # bank's shape is baked into the predict jit, so per-request
            # exact growth would recompile on every new photo; capacity
            # doubling bounds that at ~log2(n) compiles
            need = logical + len(new)
            cap = self._bank_dev.shape[0]
            while cap < need:
                cap *= 2
            parts = [self._bank_dev[:logical],
                     jax.device_put(imgs, self.rep)]
            if cap > need:
                parts.append(jnp.zeros(
                    (cap - need,) + imgs.shape[1:], jnp.uint8))
            self._bank_dev = jnp.concatenate(parts)
        lut = self._bank_rows
        flat = dataset.photo_paths.ravel()
        return np.fromiter((lut[p] for p in flat), np.int32,
                           len(flat)).reshape(dataset.photo_paths.shape)

    def _predict_packed(self, dataset):
        """Predictions (N,) over a packed dataset's retained samples, in
        dataset order.  Shared by the per-request path and the coalescer
        (which concatenates several requests' datasets into one)."""
        cfg = self.config
        pidx = self._bank_idx(dataset)
        use_bank = pidx is not None
        loader = BatchLoader(dataset, cfg.batch_size,
                             ignore_photos=cfg.review_net_only or use_bank,
                             resize=(cfg.photo_size, cfg.photo_size),
                             workers=cfg.data_workers,
                             photo_cache=self._photo_cache)

        def with_idx(it):
            # sequential loader order: batch i covers dataset rows
            # [off, off + n_real); dead-padded rows gather bank row 0,
            # the zeros the streaming loader ships for dead samples
            off = 0
            for b in it:
                B = b["sample_mask"].shape[0]
                n_real = int(b["sample_mask"].sum())
                rows = np.zeros((B,) + pidx.shape[1:], np.int32)
                rows[:n_real] = pidx[off:off + n_real]
                off += n_real
                yield dict(b, photo_idx=rows)

        it = with_idx(iter(loader)) if use_bank else iter(loader)
        outs = []  # (device preds, [host masks]); readbacks deferred past
        #            the last dispatch so nothing blocks the device queue
        if self._k > 1:
            for dev, masks, chunked in self._chunk_stream(it):
                fn = ((self._predict_bank_k if chunked else self._predict_bank)
                      if use_bank else
                      (self._predict_k if chunked else self._predict))
                args = (self.params, self._bank_dev, dev) if use_bank \
                    else (self.params, dev)
                outs.append((fn(*args), masks))
        else:
            for batch in prefetch_to_device(it, self.dp,
                                            depth=cfg.prefetch_depth):
                mask = np.asarray(batch["sample_mask"]) > 0
                pred = (self._predict_bank(self.params, self._bank_dev, batch)
                        if use_bank else self._predict(self.params, batch))
                outs.append((pred, [mask]))
        preds = []
        for dev, masks in outs:
            arr = np.asarray(dev)
            for row, mask in zip(arr if arr.ndim == 2 else arr[None], masks):
                preds.append(row[mask])
        return np.concatenate(preds) if preds else np.zeros(0, np.float32)


class _ConcatDatasets:
    """Read-only concatenation of packed datasets (see data.dataset
    UMPRDataset) along the sample axis: exactly the loader-facing surface
    (field arrays + __len__).  All parts share one Config, so the padded
    (S, L, V, P) dims already agree; np.concatenate is pure slicing."""

    _FIELDS = ("u_tokens", "u_lengths", "u_counts", "i_tokens", "i_lengths",
               "i_counts", "ui_tokens", "ui_lengths", "ui_counts", "ratings",
               "photo_paths")

    def __init__(self, parts):
        for f in self._FIELDS:
            setattr(self, f, np.concatenate([getattr(p, f) for p in parts]))

    def __len__(self):
        return self.u_tokens.shape[0]


class Coalescer:
    """Micro-batch coalescing for HTTP serving: concurrent /predict requests
    submitted within a `window_s` window are merged into ONE device dispatch
    (their packed samples concatenated into one padded batch) instead of
    each paying a full batch_size dispatch.  A single daemon thread owns the
    device, so callers need no device lock.  Predictions come back through
    per-request futures in dataset order -- identical to what each request's
    solo predict_dataset would return (same padded shapes, same kernel)."""

    def __init__(self, predictor, window_s):
        import queue
        import threading
        self._p = predictor
        self._window = window_s
        self._q = queue.Queue()
        threading.Thread(target=self._run, daemon=True,
                         name="serve-coalescer").start()

    def predict(self, dataset, timeout=None):
        """Blocking: -> (predictions (N,), source_rows (N,))."""
        from concurrent.futures import Future
        fut = Future()
        self._q.put((dataset, fut))
        return fut.result(timeout=timeout), np.asarray(dataset.source_rows)

    def _run(self):
        import queue
        while True:
            pending = [self._q.get()]
            # collect everything that arrives inside the window, up to one
            # device batch worth of samples (a bigger merge would not save
            # dispatches, and latecomers start their own window instead of
            # waiting on a long dispatch queue)
            deadline = time.monotonic() + self._window
            cap = self._p.config.batch_size
            total = len(pending[0][0])
            while total < cap:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                pending.append(item)
                total += len(item[0])
            try:
                merged = (_ConcatDatasets([ds for ds, _ in pending])
                          if len(pending) > 1 else pending[0][0])
                preds = self._p._predict_packed(merged)
                off = 0
                for ds, fut in pending:
                    n = len(ds)
                    fut.set_result(preds[off:off + n])
                    off += n
            except BaseException as e:
                for _, fut in pending:
                    if not fut.done():
                        fut.set_exception(e)


def make_http_server(predictor, config, word2vec, port, host="127.0.0.1"):
    """JSON-over-HTTP batch scorer around a Predictor.  Returns the (not yet
    serving) ThreadingHTTPServer; call .serve_forever() (the CLI does) or
    drive it from a thread (tests do).

    Two-stage pipeline: request dataset-BUILD (host CPU: tokenize, pack,
    decode) and device PREDICT hold separate locks, so request B's build
    overlaps request A's device time instead of queueing end-to-end behind
    it (each stage stays serialized: builds share the native tokenizer and
    photo cache; the device runs one dispatch stream)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    photo_json = os.path.join(config.data_dir, "photos.json")
    photo_dir = os.path.join(config.data_dir, "photos")
    build_lock = threading.Lock()
    device_lock = threading.Lock()
    # --serve_coalesce_ms > 0: concurrent requests inside the window merge
    # into one device dispatch; the coalescer's thread owns the device, so
    # device_lock is bypassed on that path
    coalesce_ms = max(0, getattr(config, "serve_coalesce_ms", 0))
    coalescer = (Coalescer(predictor, coalesce_ms / 1000.0)
                 if coalesce_ms > 0 else None)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass  # quiet: the application logger owns stdout

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                return self._json(200, {"status": "ok"})
            return self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                return self._json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                df = pd.DataFrame(req["rows"])
                for col in ("userID", "itemID", "review"):
                    if col not in df.columns:
                        raise ValueError(f"rows are missing column {col!r}")
                    if df[col].isna().any():
                        # client-data error (e.g. a null userID would
                        # factorize to -1 and blow up deep in the dataset
                        # builder as a 500): reject up front
                        raise ValueError(f"column {col!r} contains null values")
                if "rating" not in df.columns:
                    df["rating"] = 0.0
                # the dataset builder keys histories on the preprocessor's
                # integer ids (reference data_process.py:31-32); derive them
                # per-request when the client sends only the string ids
                # (histories are request-local, so request-local ids are
                # exactly equivalent)
                for col, src in (("user_num", "userID"),
                                 ("item_num", "itemID")):
                    if col not in df.columns:
                        df[col] = pd.factorize(df[src])[0]
            except Exception as e:
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})
            try:
                with build_lock:
                    # the DataFrame goes to the builder directly: a CSV
                    # round trip would NA-coerce legitimate review strings
                    # ("NA", "None", "") back into NaN after validation
                    df["review"] = df["review"].astype(str)
                    ds = build_dataset(None, photo_json, photo_dir,
                                       word2vec, config, df=df)
                if coalescer is not None:
                    preds, rows = coalescer.predict(ds)
                else:
                    with device_lock:
                        preds, rows = predictor.predict_dataset(ds)
                import math
                out = [None] * len(df)
                for p, r in zip(preds.tolist(), rows.tolist()):
                    # non-finite scores (diverged/corrupt checkpoint) map to
                    # null: a bare NaN token is not valid JSON and breaks
                    # strict client parsers (same rule as trainer._metric)
                    out[r] = p if math.isfinite(p) else None
                return self._json(200, {"predictions": out})
            except Exception as e:
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--input", default=None, help="CSV of pairs to score")
    parser.add_argument("--output", default="predictions.csv")
    parser.add_argument("--server", action="store_true",
                        help="serve POST /predict over HTTP instead of a "
                             "one-shot CSV pass")
    parser.add_argument("--port", type=int, default=8500)
    parser.add_argument("--host", default="127.0.0.1")
    args, rest = parser.parse_known_args(argv)
    config = Config(rest)
    assert config.model_path, "--model_path is required for serving"
    if config.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.server:
        w2v = Word2vec(config.word2vec_file)
        server = make_http_server(Predictor(config, w2v, config.model_path),
                                  config, w2v, args.port, args.host)
        print(f"Serving on http://{args.host}:{server.server_address[1]} "
              f"(POST /predict, GET /health)")
        server.serve_forever()
        return

    assert args.input, "--input is required (or pass --server)"
    df = pd.read_csv(args.input)
    build_df = None
    if "rating" not in df.columns:
        df = df.copy()
        df["rating"] = 0.0
        build_df = df  # rating-less inputs go to the builder in memory

    w2v = Word2vec(config.word2vec_file)
    photo_json = os.path.join(config.data_dir, "photos.json")
    photo_dir = os.path.join(config.data_dir, "photos")
    ds = build_dataset(args.input, photo_json, photo_dir, w2v, config,
                       df=build_df)

    predictor = Predictor(config, w2v, config.model_path)
    preds, rows = predictor.predict_dataset(ds)

    out = df[["userID", "itemID"]].copy()
    out["prediction"] = np.nan
    out.loc[out.index[rows], "prediction"] = preds
    out.to_csv(args.output, index=False)
    print(f"Wrote {len(preds)} predictions ({len(out) - len(preds)} rows "
          f"unscorable by the model's sample filters) to {args.output}")


if __name__ == "__main__":
    main()
