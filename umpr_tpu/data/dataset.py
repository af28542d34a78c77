"""Dataset construction: CSV -> filtered samples -> static-shape arrays.

Sample *selection* must match the reference exactly, because it changes the
effective train/valid/test sets and therefore MSE.  The reference applies an
order-dependent sequence of filters over a shared ``retain_idx`` list
(src/dataset.py:11-119); this module reproduces that sequence:

1. tokenize the review column; drop sentences with <=5 tokens
   (dataset.py:21-27); mark samples with zero surviving sentences
   (dataset.py:29);
2. resolve per-view photo paths, dropping any sample whose item lacks at
   least one photo in any configured view (dataset.py:87-119);
3. build user histories (all sentences by the user EXCLUDING the target
   item), dropping samples with < min_sent_count history sentences and
   keeping the *longest* max_sent_count sentences otherwise
   (dataset.py:50-73);
4. the same for item histories (dataset.py:33);
5. truncate the u->i review to the longest max_ui_sent_count sentences
   (dataset.py:75-85).

Steps run in exactly this order; a sample dropped by an earlier step is
skipped (not re-examined) by later ones, as in the reference.

The TPU-first departure is in *representation*: instead of ragged python
lists collated per batch (reference: dataset.py:146-182), everything is
packed once into dense, statically shaped numpy arrays -- tokens
``(N, S, L)``, lengths ``(N, S)``, sentence counts ``(N,)`` -- so a batch is
a contiguous slice and every training step hits one compiled executable.
Per-batch dynamic-padding numerics are recovered at run time from the
lengths/counts via "exists" masks (see umpr_tpu/ops/masking.py).
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict
from dataclasses import dataclass

import numpy as np
import pandas as pd

_log = logging.getLogger("umpr_tpu.data")


@dataclass
class UMPRDataset:
    """Packed dataset. All arrays are static-shape numpy."""

    u_tokens: np.ndarray   # (N, S, L) int32 word ids of user-history sentences
    u_lengths: np.ndarray  # (N, S) int32 token counts, pad sentences -> 1
    u_counts: np.ndarray   # (N,) int32 real sentence count per sample
    i_tokens: np.ndarray   # (N, S, L)
    i_lengths: np.ndarray  # (N, S)
    i_counts: np.ndarray   # (N,)
    ui_tokens: np.ndarray  # (N, S_ui, L)
    ui_lengths: np.ndarray # (N, S_ui)
    ui_counts: np.ndarray  # (N,)
    ratings: np.ndarray    # (N,) float32
    photo_paths: np.ndarray  # (N, V, P) unicode paths; '' means "no file, use zeros"
    source_rows: np.ndarray = None  # (N,) int64 original CSV row per sample
                                    # (sample filters drop rows; serving maps
                                    # predictions back through this)

    def __post_init__(self):
        if self.source_rows is None:
            self.source_rows = np.arange(len(self.u_tokens), dtype=np.int64)

    def __len__(self):
        return self.u_tokens.shape[0]

    def save(self, path):
        """Directory path -> one .npy per field + a completeness marker (the
        memmap-friendly format: load() maps token arrays instead of reading
        31 GB into RSS at Yelp scale).  A .npz path keeps the legacy
        single-file format."""
        if str(path).endswith(".npz"):
            # uncompressed: ~10x faster save/load than savez_compressed at
            # Yelp/CSJ scale
            np.savez(path, **{k: getattr(self, k) for k in self.__dataclass_fields__})
            return
        os.makedirs(path, exist_ok=True)
        for k in self.__dataclass_fields__:
            np.save(os.path.join(path, f"{k}.npy"), getattr(self, k))
        with open(os.path.join(path, "complete.marker"), "w") as f:
            f.write("1")

    @classmethod
    def load(cls, path):
        if os.path.isdir(path):
            if not os.path.exists(os.path.join(path, "complete.marker")):
                raise FileNotFoundError(f"incomplete dataset cache at {path}")
            fields = {}
            for k in cls.__dataclass_fields__:
                p = os.path.join(path, f"{k}.npy")
                if os.path.exists(p):
                    fields[k] = np.load(p, mmap_mode="r")
            return cls(**fields)
        with np.load(path, allow_pickle=False) as z:
            fields = {k: z[k] for k in cls.__dataclass_fields__ if k in z}
            return cls(**fields)  # older caches lack source_rows -> default


def _tokenize_reviews(df, word2vec, config):
    """Reference dataset.py:21-27: split into sentences, id-map, truncate to
    max_sent_length, drop sentences with <=5 tokens.

    Uses the native C++ tokenizer when available (umpr_tpu/native; byte-
    exact, 1-2 orders of magnitude faster on large corpora), falling back
    to the python path."""
    max_len = config.max_sent_length
    sentence_level = config.review_level == "sentence"

    try:
        from umpr_tpu.native import fast_tokenize_reviews
        fast = fast_tokenize_reviews(df["review"], word2vec, max_len,
                                     sentence_level, return_flat=True)
        if fast is not None and fast[0] is not None:
            return fast  # (per-doc lists, flat arrays or None)
        # Loud fallback (both arms): silently degrading to the python
        # tokenizer turns a minutes-scale corpus build into hours.  The
        # common miss is a returned None (library not built / not loadable),
        # not an exception.
        _log.warning("native tokenizer unavailable; using python path "
                     "(large corpus builds will be much slower)")
    except Exception as e:
        _log.warning("native tokenizer failed (%s: %s); using python path",
                     type(e).__name__, e)

    def tok(x):
        text = str(x)
        parts = text.strip(". ").split(".") if sentence_level else [text]
        out = []
        for sent in parts:
            ids = word2vec.sent2indices(sent)[:max_len]
            if len(ids) > 5:
                out.append(ids)
        return out

    return [tok(x) for x in df["review"]]


def _resolve_photos(photo_json, photo_dir, item_ids, retain, views, photo_count):
    """Reference dataset.py:87-119. Mutates `retain` in place.

    Resolution depends only on the item id, so each UNIQUE id is resolved
    once and rows share the result (corpus rows >> unique items: Yelp is
    8M rows over ~150k businesses; the former per-row path construction
    was the last python hot spot of streaming corpus builds)."""
    photo_df = pd.read_json(photo_json, orient="records", lines=True)
    if "label" not in photo_df.columns:
        photo_df["label"] = views[0]  # amazon manifests carry no label

    groups = defaultdict(dict)
    view_set = set(views)
    for bid, pid, label in zip(photo_df["business_id"].tolist(),
                               photo_df["photo_id"].tolist(),
                               photo_df["label"].tolist()):
        if label in view_set:
            groups[bid].setdefault(label, []).append(pid)

    def resolve(bid):
        """Per-view photo paths for one item, or None to drop its samples."""
        item_photos = []
        for label in views:
            pids = groups[bid].get(label, []) if bid in groups else []
            if len(pids) < 1:  # no photo for this view -> drop the sample
                return None
            sel = [os.path.join(photo_dir, pids[j] + ".jpg") for j in range(min(len(pids), photo_count))]
            # Reference pads missing slots with the sentinel path 'unknown',
            # which cv2 fails to read and yields a zero image
            # (dataset.py:115-116, 142-143). '' is our zero-image sentinel.
            sel.extend([""] * (photo_count - len(sel)))
            item_photos.append(sel)
        return item_photos

    # factorize rows -> unique ids, resolve each unique once, fan results
    # back out with one vectorized drop-mask update (per-row numpy scalar
    # reads were ~3.4 us/row -- half a minute at Yelp's 8M rows)
    codes, uniques = pd.factorize(np.asarray(item_ids, dtype=object))
    resolved = [resolve(bid) for bid in uniques]
    entry = np.asarray(retain, dtype=bool)  # retain snapshot at entry
    # factorize encodes NaN/missing ids as -1 (no unique entry): such rows
    # have no photos and must be dropped, never wrapped onto resolved[-1]
    paths = [resolved[c] if (r and c >= 0) else None
             for c, r in zip(codes.tolist(), entry.tolist())]
    row_ok = np.zeros(len(codes), dtype=bool)
    if len(codes):
        valid = codes >= 0
        ok = np.asarray([r is not None for r in resolved], dtype=bool)
        row_ok[valid] = ok[codes[valid]] if len(resolved) else False
    bad = entry & ~row_ok
    if isinstance(retain, np.ndarray):
        retain[bad] = 0
    else:
        for i in np.flatnonzero(bad):
            retain[i] = False
    return paths


def _build_histories(df, reviews, retain, lead, costar, min_count, max_count):
    """Reference dataset.py:50-73. Mutates `retain` in place.

    Histories are grouped over ALL rows (including already-dropped ones):
    sentences from dropped samples still count toward other samples'
    histories, exactly as in the reference (groups built before filtering).
    """
    groups = defaultdict(list)
    for lead_id, costar_id, review in zip(df[lead], df[costar], reviews):
        groups[lead_id].append((costar_id, review))

    results = []
    for i, (lead_id, costar_id) in enumerate(zip(df[lead], df[costar])):
        if not retain[i]:
            results.append(None)
            continue
        sentences = [s for cid, r in groups[lead_id] if cid != costar_id for s in r]
        if len(sentences) < min_count:
            retain[i] = False
            results.append(None)
            continue
        if len(sentences) > max_count:
            # keep the longest sentences; python sort is stable, matching the
            # reference's list.sort(key=lambda x: -len(x)) tie-breaking
            sentences = sorted(sentences, key=lambda x: -len(x))[:max_count]
        results.append(sentences)
    return results


def _build_ui(reviews, retain, max_count):
    """Reference dataset.py:75-85."""
    out = []
    for i, sentences in enumerate(reviews):
        if not retain[i]:
            out.append(None)
            continue
        if len(sentences) > max_count:
            sentences = sorted(sentences, key=lambda x: -len(x))[:max_count]
        out.append(sentences)
    return out


def _pack_reviews(review_lists, max_count, max_len):
    """Ragged [[ids...], ...] per sample -> (N, max_count, max_len) tokens,
    (N, max_count) lengths and (N,) counts.

    Pad sentences get length 1 of <PAD> tokens: this mirrors the reference's
    length clamp max(1, len) (dataset.py:127) so they flow through the GRU
    the same way.

    Vectorized scatter: one flat concatenation of all sentence ids + a
    single fancy-indexed store (the per-sentence python loop was the
    hottest stage of corpus-scale dataset builds).
    """
    n = len(review_lists)
    tokens = np.zeros((n, max_count, max_len), dtype=np.int32)
    lengths = np.ones((n, max_count), dtype=np.int32)
    counts = np.fromiter((len(s) for s in review_lists), np.int32, n) \
        if n else np.zeros(0, np.int32)

    flat_sents = [np.asarray(ids[:max_len], dtype=np.int32)
                  for sents in review_lists for ids in sents]
    if not flat_sents:
        return tokens, lengths, counts
    lens = np.fromiter((len(s) for s in flat_sents), np.int64, len(flat_sents))
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    sent_idx = np.concatenate([np.arange(c, dtype=np.int64) for c in counts])

    lengths[rows, sent_idx] = np.maximum(lens, 1)

    flat_ids = np.concatenate(flat_sents) if flat_sents else np.zeros(0, np.int32)
    total = int(lens.sum())
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    tokens[np.repeat(rows, lens), np.repeat(sent_idx, lens), pos] = flat_ids
    return tokens, lengths, counts


_PACK_CHUNK_BYTES = 2 << 30  # token-slab bytes per C++ fill call


def _flush_drop(arr):
    """Flush a memmap's dirty pages and drop them from RSS (no-op for plain
    arrays).  This is what bounds build RSS: without it every written page
    stays resident until memory pressure."""
    if isinstance(arr, np.memmap):
        import mmap as _mmap
        arr.flush()
        try:
            arr._mmap.madvise(_mmap.MADV_DONTNEED)
        except (AttributeError, ValueError):
            pass


def _build_dataset_streaming(data_path, photo_json, photo_dir, word2vec,
                             config, chunk_rows, mmap_dir=None) -> UMPRDataset:
    """Low-RSS corpus-scale build: chunked CSV read + flat-only native
    tokenization (no per-doc python lists) + compact C++ packing.  Exactly
    equivalent to the full-memory path (CI: test_dataset_streaming.py,
    test_dataset_oracle.py); peak memory is bounded by one CSV chunk plus
    the compact flat/token arrays instead of the whole corpus' strings,
    per-doc lists and byte-sized tokenizer buffers.

    With mmap_dir set, the packed token arrays are written straight into
    .npy memmaps under that directory in slabs (flushed + madvise-dropped),
    so peak RSS excludes the ~4x-corpus-size outputs entirely AND the
    result doubles as the on-disk dataset cache."""
    from umpr_tpu.native import (fast_build_histories, fast_pack_ui,
                                 group_index, histories_retain_pass,
                                 tokenize_flat)

    S, L, S_ui = (config.max_sent_count, config.max_sent_length,
                  config.max_ui_sent_count)
    sentence_level = config.review_level == "sentence"

    id_parts, slen_parts, dcount_parts = [], [], []
    users_p, items_p, ratings_p, itemid_p = [], [], [], []
    usecols = ["itemID", "review", "rating", "user_num", "item_num"]
    for chunk in pd.read_csv(data_path, chunksize=chunk_rows, usecols=usecols):
        flat = tokenize_flat(chunk["review"], word2vec, L, sentence_level)
        if flat is None:
            raise RuntimeError("native tokenizer unavailable")
        fids, sstarts, dss = flat
        id_parts.append(fids)
        slen_parts.append(np.diff(sstarts))
        dcount_parts.append(np.diff(dss))
        users_p.append(chunk["user_num"].to_numpy(np.int64))
        items_p.append(chunk["item_num"].to_numpy(np.int64))
        ratings_p.append(chunk["rating"].to_numpy(np.float32))
        itemid_p.append(chunk["itemID"].to_numpy())

    def cat(parts, dtype=None):
        return (np.concatenate(parts) if parts
                else np.zeros(0, dtype or np.int64))

    flat_ids = cat(id_parts, np.int32); del id_parts
    sent_lens = cat(slen_parts); del slen_parts
    doc_counts = cat(dcount_parts); del dcount_parts
    sent_starts = np.zeros(len(sent_lens) + 1, np.int64)
    np.cumsum(sent_lens, out=sent_starts[1:])
    doc_sent_start = np.zeros(len(doc_counts) + 1, np.int64)
    np.cumsum(doc_counts, out=doc_sent_start[1:])
    flat = (flat_ids, sent_starts, doc_sent_start)

    users, items = cat(users_p), cat(items_p)
    ratings = cat(ratings_p, np.float32)
    item_ids = cat(itemid_p, object)
    del users_p, items_p, ratings_p, itemid_p
    n = len(doc_counts)

    # the C++ count pass packs (lead, costar) into one 64-bit key; exact
    # only for non-negative ids < 2^31 (always true for ngroup ids)
    if n and not (users.min() >= 0 and items.min() >= 0
                  and users.max() < 2 ** 31 and items.max() < 2 ** 31):
        raise RuntimeError("group ids outside the composite-key range")

    # same filter order as the reference (dataset.py:29,31,50-73,75-85):
    # empty-review -> photos -> user histories -> item histories -> ui
    retain = (doc_counts > 0).astype(np.uint8)
    photos = _resolve_photos(photo_json, photo_dir, item_ids, retain,
                             config.views, config.photo_count)
    if not histories_retain_pass(users, items, doc_sent_start, retain,
                                 config.min_sent_count):
        raise RuntimeError("native history builder unavailable")
    histories_retain_pass(items, users, doc_sent_start, retain,
                          config.min_sent_count)
    keep_arr = np.flatnonzero(retain)
    n_out = len(keep_arr)

    def alloc(field, shape):
        if mmap_dir is None:
            return np.zeros(shape, np.int32)
        return np.lib.format.open_memmap(
            os.path.join(mmap_dir, f"{field}.npy"), mode="w+",
            dtype=np.int32, shape=shape)

    # slab size: bound the dirty-page footprint of each C++ fill call
    # (max(1, ...) also keeps range()'s step nonzero when every row was
    # filtered out -- an empty split must build an empty dataset, not crash)
    step = max(1, n_out) if mmap_dir is None else max(
        1, _PACK_CHUNK_BYTES // (S * L * 4))

    def fill_histories(lead, costar, prefix):
        tok = alloc(f"{prefix}_tokens", (n_out, S, L))
        lng = alloc(f"{prefix}_lengths", (n_out, S))
        cnt = alloc(f"{prefix}_counts", (n_out,))
        index = group_index(lead)  # once per direction, not per slab
        for lo in range(0, n_out, step):
            hi = min(lo + step, n_out)
            lng[lo:hi] = 1
            r = fast_build_histories(
                lead, costar, flat, retain, config.min_sent_count, S, L,
                rows=keep_arr[lo:hi],
                out=(tok[lo:hi], lng[lo:hi], cnt[lo:hi]), index=index)
            if r is None:
                raise RuntimeError("native history builder unavailable")
            _flush_drop(tok)
            _flush_drop(lng)
        return tok, lng, cnt

    def fill_ui():
        tok = alloc("ui_tokens", (n_out, S_ui, L))
        lng = alloc("ui_lengths", (n_out, S_ui))
        cnt = alloc("ui_counts", (n_out,))
        ui_step = max(1, n_out) if mmap_dir is None else max(
            1, _PACK_CHUNK_BYTES // (S_ui * L * 4))
        for lo in range(0, n_out, ui_step):
            hi = min(lo + ui_step, n_out)
            lng[lo:hi] = 1
            r = fast_pack_ui(flat, keep_arr[lo:hi], S_ui, L,
                             out=(tok[lo:hi], lng[lo:hi], cnt[lo:hi]))
            if r is None:
                raise RuntimeError("native ui packer unavailable")
            _flush_drop(tok)
            _flush_drop(lng)
        return tok, lng, cnt

    u_tok, u_len, u_cnt = fill_histories(users, items, "u")
    i_tok, i_len, i_cnt = fill_histories(items, users, "i")
    ui_tok, ui_len, ui_cnt = fill_ui()

    photos = [photos[i] for i in keep_arr]
    photo_arr = np.asarray(photos, dtype=np.str_) if photos else \
        np.zeros((0, len(config.views), config.photo_count), dtype=np.str_)
    ds = UMPRDataset(
        u_tokens=u_tok, u_lengths=u_len, u_counts=u_cnt,
        i_tokens=i_tok, i_lengths=i_len, i_counts=i_cnt,
        ui_tokens=ui_tok, ui_lengths=ui_len, ui_counts=ui_cnt,
        ratings=ratings[keep_arr], photo_paths=photo_arr,
        source_rows=keep_arr,
    )
    if mmap_dir is not None:
        # the token fields are already on disk; persist the small ones and
        # mark the cache complete so UMPRDataset.load(dir) accepts it
        for field in ("ratings", "photo_paths", "source_rows"):
            np.save(os.path.join(mmap_dir, f"{field}.npy"), getattr(ds, field))
        with open(os.path.join(mmap_dir, "complete.marker"), "w") as f:
            f.write("1")
    return ds


def build_dataset(data_path, photo_json, photo_dir, word2vec, config,
                  mmap_dir=None, df=None) -> UMPRDataset:
    """mmap_dir: optional cache directory; the streaming build then writes
    the packed arrays straight into .npy memmaps there (the directory
    becomes a complete, loadable dataset cache).

    df: optional in-memory DataFrame used INSTEAD of reading data_path --
    for callers whose rows never lived in a CSV (the HTTP scorer), where a
    CSV round trip would NA-coerce legitimate review strings like "NA".
    In-memory inputs take the full-memory path (they are request-sized)."""
    chunk_rows = getattr(config, "build_chunk_rows", 0)
    if df is None and chunk_rows and chunk_rows > 0:
        try:
            if mmap_dir is not None:
                os.makedirs(mmap_dir, exist_ok=True)
            return _build_dataset_streaming(
                data_path, photo_json, photo_dir, word2vec, config,
                chunk_rows, mmap_dir)
        except Exception as e:
            _log.warning("streaming dataset build failed (%s: %s); "
                         "using the full-memory path", type(e).__name__, e)

    if df is None:
        df = pd.read_csv(data_path)
    tokenized = _tokenize_reviews(df, word2vec, config)
    reviews, flat = tokenized if isinstance(tokenized, tuple) else (tokenized, None)

    retain = [len(x) > 0 for x in reviews]

    # The reference resolves photos FIRST (dataset.py:31), then user, item,
    # and ui reviews; the order matters because each step skips samples
    # already dropped by earlier steps.
    photos = _resolve_photos(photo_json, photo_dir, list(df["itemID"]), retain,
                             config.views, config.photo_count)

    S, L, S_ui = config.max_sent_count, config.max_sent_length, config.max_ui_sent_count
    packed = None
    try:
        # C++ fast path: history grouping + packing fused (same retain
        # mutation order as the python path; equivalence-tested).  Two
        # phases: count-only retain passes settle the final sample set, then
        # the packed outputs are written COMPACTLY (one slot per retained
        # row) -- at Yelp/CSJ scale this halves peak RSS vs. full-size
        # outputs + a fancy-index copy.
        from umpr_tpu.native import (fast_build_histories, flatten_tokenized,
                                     histories_retain_pass)
        if flat is None:
            flat = flatten_tokenized(reviews)
        retain_arr = np.asarray(retain, np.uint8)
        users = df["user_num"].to_numpy(np.int64)
        items = df["item_num"].to_numpy(np.int64)
        dss = flat[2]
        # the C++ count pass packs (lead, costar) into one 64-bit key;
        # exact only for non-negative ids < 2^31 (always true for the
        # preprocessor's ngroup ids -- guard for exotic user CSVs)
        ids_ok = (users.min() >= 0 and items.min() >= 0
                  and users.max() < 2 ** 31 and items.max() < 2 ** 31)
        if ids_ok and histories_retain_pass(users, items, dss, retain_arr,
                                            config.min_sent_count):
            histories_retain_pass(items, users, dss, retain_arr,
                                  config.min_sent_count)
            keep_arr = np.flatnonzero(retain_arr)
            u_pack = fast_build_histories(users, items, flat, retain_arr,
                                          config.min_sent_count, S, L,
                                          rows=keep_arr)
            i_pack = fast_build_histories(items, users, flat, retain_arr,
                                          config.min_sent_count, S, L,
                                          rows=keep_arr)
            retain = retain_arr.astype(bool).tolist()
            packed = (u_pack, i_pack)
    except Exception as e:
        _log.warning("native history builder failed (%s: %s); "
                     "using python path", type(e).__name__, e)
        packed = None

    if packed is None:
        user_hist = _build_histories(df, reviews, retain, "user_num", "item_num",
                                     config.min_sent_count, config.max_sent_count)
        item_hist = _build_histories(df, reviews, retain, "item_num", "user_num",
                                     config.min_sent_count, config.max_sent_count)

    ui = _build_ui(reviews, retain, config.max_ui_sent_count)

    keep = [i for i, r in enumerate(retain) if r]
    ui = [ui[i] for i in keep]
    photos = [photos[i] for i in keep]
    ratings = df["rating"].to_numpy(np.float32)[keep]

    if packed is not None:
        u_tok, u_len, u_cnt = packed[0]  # already compact (one slot per keep)
        i_tok, i_len, i_cnt = packed[1]
    else:
        u_tok, u_len, u_cnt = _pack_reviews([user_hist[i] for i in keep], S, L)
        i_tok, i_len, i_cnt = _pack_reviews([item_hist[i] for i in keep], S, L)
    ui_tok, ui_len, ui_cnt = _pack_reviews(ui, S_ui, L)

    photo_arr = np.asarray(photos, dtype=np.str_) if photos else \
        np.zeros((0, len(config.views), config.photo_count), dtype=np.str_)

    return UMPRDataset(
        u_tokens=u_tok, u_lengths=u_len, u_counts=u_cnt,
        i_tokens=i_tok, i_lengths=i_len, i_counts=i_cnt,
        ui_tokens=ui_tok, ui_lengths=ui_len, ui_counts=ui_cnt,
        ratings=ratings, photo_paths=photo_arr,
        source_rows=np.asarray(keep, dtype=np.int64),
    )
