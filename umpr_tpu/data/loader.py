"""Batch loader: packed dataset -> static-shape numpy batches -> device.

Replaces the reference's torch DataLoader + dynamic collate function
(src/dataset.py:146-182, main.py:76-79).  Differences, all TPU-motivated:

- batches are contiguous fancy-indexed slices of pre-packed arrays (no
  per-sample python work in the steady state);
- every batch has the SAME shape: the final partial batch is padded with
  dead samples carrying ``sample_mask=0`` so one compiled executable serves
  the whole epoch (the reference's smaller last batch is reproduced
  numerically because dead samples have sentence count 0 and never raise the
  runtime batch maxima);
- photos are decoded by a look-ahead prefetch thread and shipped as uint8;
- ``prefetch_to_device`` overlaps host->HBM transfer with TPU compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from umpr_tpu.data.images import load_photo_batch, PhotoCache


class BatchLoader:
    def __init__(self, dataset, batch_size, shuffle=False, ignore_photos=True,
                 seed=0, resize=(224, 224), workers=0, pad_to_full=True,
                 photo_cache=None, photo_cache_bytes=2 << 30, photo_rows=None,
                 start_batch=0):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.ignore_photos = ignore_photos
        self.resize = resize
        self.pad_to_full = pad_to_full
        # multi-host: decode photos only for this process's row slice of the
        # global batch (other hosts' rows are never read from this process's
        # shard assembly; their slots stay zero)
        assert photo_rows is None or pad_to_full, (
            "photo_rows indexes the full padded batch; with pad_to_full="
            "False a final partial batch would silently mis-slice it")
        self.photo_rows = photo_rows
        # skip the first start_batch batches of this (seed-deterministic)
        # epoch order: mid-epoch resume fast-forwards to the saved offset
        # without decoding the skipped batches' photos
        self.start_batch = start_batch
        self._rng = np.random.default_rng(seed)
        self._executor = ThreadPoolExecutor(max_workers=workers) if workers > 0 else None
        if photo_cache is None and not ignore_photos and photo_cache_bytes > 0:
            photo_cache = PhotoCache(photo_cache_bytes)
        self.photo_cache = photo_cache

    def __len__(self):
        n = len(self.ds)
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, idx):
        ds = self.ds
        n_real = len(idx)
        b = self.batch_size if self.pad_to_full else n_real
        if n_real < b:
            # Dead padding: sample 0 repeated, then neutralized below.
            idx = np.concatenate([idx, np.zeros(b - n_real, dtype=idx.dtype)])
        batch = {
            "u_tokens": ds.u_tokens[idx], "u_lengths": ds.u_lengths[idx], "u_counts": ds.u_counts[idx],
            "i_tokens": ds.i_tokens[idx], "i_lengths": ds.i_lengths[idx], "i_counts": ds.i_counts[idx],
            "ui_tokens": ds.ui_tokens[idx], "ui_lengths": ds.ui_lengths[idx], "ui_counts": ds.ui_counts[idx],
            "ratings": ds.ratings[idx],
            "sample_mask": np.ones(b, dtype=np.float32),
        }
        if n_real < b:
            batch["sample_mask"][n_real:] = 0.0
            for k in ("u_counts", "i_counts", "ui_counts"):
                batch[k] = batch[k].copy()
                batch[k][n_real:] = 0  # dead samples never raise batch maxima
            for k in ("u_lengths", "i_lengths", "ui_lengths"):
                batch[k] = batch[k].copy()
                batch[k][n_real:] = 1
        if not self.ignore_photos:
            # fancy indexing already made `paths` a private copy; the masking
            # branches below may mutate it in place
            paths = ds.photo_paths[idx]
            if n_real < b:
                paths[n_real:] = ""
            if self.photo_rows is not None:
                keep = np.zeros(b, dtype=bool)
                keep[self.photo_rows] = True
                paths[~keep] = ""
            batch["photos"] = load_photo_batch(paths, self.resize, self._executor,
                                               self.photo_cache)
        return batch

    def __iter__(self):
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(self.start_batch * self.batch_size, n, self.batch_size):
            yield self._make_batch(order[start:start + self.batch_size])


def chunk_stream(loader, k, put_chunk, put_single, depth=2,
                 extract=lambda hb: hb):
    """Stack runs of `k` host batches on a NEW leading axis and ship each run
    to the device in one transfer (the multi-step dispatch protocol shared by
    the trainer's train/eval paths and the serving Predictor — one place so
    the stack/ship/remainder semantics cannot fork).  Remainder batches that
    cannot fill a chunk ship individually.  Yields prefetched
    (device_payload, [extract(host batch) per batch in the payload], chunked?)
    triples; `put_chunk`/`put_single` provide the transfer (device_put vs
    multihost put_global).

    `extract` picks what survives the prefetch queue per host batch.  The
    default keeps whole batches, but callers should keep only what they need:
    the queue holds up to depth*k host batches (decoded photos included), so
    a trainer that never reads them back passes ``lambda hb: None`` and a
    server that only needs liveness passes ``lambda hb: hb["sample_mask"] > 0``
    — the full arrays are then released as soon as the transfer is issued."""
    def gen():
        buf = []
        for hb in iter(loader):
            buf.append(hb)
            if len(buf) == k:
                stacked = {key: np.stack([b[key] for b in buf])
                           for key in buf[0]}
                yield (put_chunk(stacked), [extract(b) for b in buf], True)
                buf = []
        for hb in buf:
            yield (put_single(hb), [extract(hb)], False)

    return prefetch_iter(gen(), depth=depth)


def prefetch_iter(iterator, depth=2):
    """Run `iterator` in a background thread, `depth` items ahead.

    Abandonment-safe: when the consumer stops early (break / GC closes this
    generator), the worker notices the stop flag at its next bounded put and
    exits, releasing the queued batches -- otherwise a max_batches break
    would pin depth+1 decoded photo batches for the rest of the process."""
    q = queue.Queue(maxsize=depth)
    sentinel = object()
    err = []
    stop = threading.Event()

    def put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not put(item):
                    return
        except BaseException as e:  # surface worker errors in the consumer
            err.append(e)
        finally:
            put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def prefetch_to_device(batches, sharding=None, depth=2):
    """Move host batches to device ahead of compute (double buffering).

    With a NamedSharding over the batch axis this also *shards* each batch
    across the mesh -- the TPU analogue of DataParallel scatter
    (reference: main.py:82), minus the per-shard length pitfalls
    (reference readme.md:154-160) because shapes are globally static.
    Under a multi-host runtime each process contributes only its local rows
    (see umpr_tpu.parallel.multihost).
    """
    import jax
    from umpr_tpu.parallel.multihost import put_global

    def put(batch):
        if sharding is None:
            return {k: jax.device_put(v) for k, v in batch.items()}
        return put_global(batch, sharding)

    return prefetch_iter((put(b) for b in batches), depth=depth)
