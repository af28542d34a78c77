"""Training / evaluation driver.

Same observable surface as the reference driver (main.py:16-99): the same
log lines at the same cadence (initial validation MSE, per-500-batch train
loss + valid MSE, save-on-best, per-epoch summary, 50k-batch hard stop,
wall-clock summary), with the TPU-native machinery underneath: jitted steps,
mesh-sharded batches, host-side prefetch, device double buffering.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from umpr_tpu.data.loader import BatchLoader, prefetch_to_device
from umpr_tpu.models.umpr import init_umpr
from umpr_tpu.parallel import multihost
from umpr_tpu.parallel.mesh import setup_runtime
from umpr_tpu.train import checkpoint as ckpt
from umpr_tpu.train.optim import (make_optimizer, split_frozen, merge_params,
                                  lr_at_epoch)
from umpr_tpu.train.step import (make_train_step, make_multi_train_step,
                                 make_train_step_accum, make_eval_step,
                                 make_multi_eval_step, evaluate_mse,
                                 mse_from_parts, RESIDENT_FIELDS,
                                 make_train_step_resident,
                                 make_multi_train_step_resident,
                                 make_eval_step_resident,
                                 make_multi_eval_step_resident)


class Trainer:
    def __init__(self, config, logger, word2vec):
        self.config = config
        self.logger = logger
        self.w2v = word2vec
        if config.checkpoint_backend == "orbax" and jax.process_count() > 1:
            # Orbax's Checkpointer runs cross-process sync barriers inside
            # save(); a primary-only call would block at the barrier.  The
            # npz backend is pure host-side numpy and safe to gate.
            logger.info("checkpoint_backend=orbax is single-host only; "
                        "using npz for this multi-host run.")
            config.checkpoint_backend = "npz"

        self.mesh, self.rep, self.dp, self.dims, n_dev = setup_runtime(config)

        key = jax.random.PRNGKey(config.seed)
        params = init_umpr(key, self.dims, word2vec.embedding)
        if config.rnet_pretrained:
            # Warm-start the R-Net from the pretrainer's checkpoint
            # (reference analogue: RNet(pretrained=...), model.py:30-34 --
            # load failures are swallowed with a message there; same here).
            try:
                params["review_net"]["rnet"] = ckpt.restore_pytree(
                    config.rnet_pretrained, params["review_net"]["rnet"])
                logger.info(f"Loaded R-Net pre-trained weights from "
                            f'"{config.rnet_pretrained}"')
            except Exception:
                logger.info(f"Failed to load R-Net pre-trained weights from "
                            f'"{config.rnet_pretrained}"')
        if config.vgg16_weights and not config.review_net_only:
            try:
                params["visual_net"]["vgg16"] = ckpt.restore_pytree(
                    config.vgg16_weights, params["visual_net"]["vgg16"])
                logger.info(f"Loaded VGG16 pretrained weights from "
                            f'"{config.vgg16_weights}"')
            except Exception:
                logger.info(f"Failed to load VGG16 weights from "
                            f'"{config.vgg16_weights}"')
        self.trainable, self.frozen = split_frozen(params)
        self.trainable = jax.device_put(self.trainable, self.rep)
        # original vocab row count, BEFORE any shard-padding: checkpoints
        # must be mesh-independent (loadable for serving / other meshes);
        # the host copy backs checkpoint saves when the device table is
        # sharded across processes (frozen, so always identical)
        self._vocab_rows = int(self.frozen["embedding"].shape[0])
        self._host_embedding = np.asarray(word2vec.embedding, np.float32)
        self._n_dev = n_dev
        self.frozen = self._place_frozen(self.frozen)

        self.tx = make_optimizer(config.l2_regularization,
                                 getattr(config, "adam_moment_dtype", "float32"),
                                 getattr(config, "adam_factored_nu", False))
        self.opt_state = jax.device_put(self.tx.init(self.trainable), self.rep)
        k_accum = max(1, getattr(config, "grad_accum_steps", 1))
        if k_accum > 1:
            assert config.batch_size % k_accum == 0
            self.train_step = make_train_step_accum(self.dims, k_accum, self.tx)
        else:
            self.train_step = make_train_step(self.dims, self.tx)
        self.eval_step = make_eval_step(self.dims)
        # dropout-rng derivation as ONE jitted call per dispatch: eagerly
        # rebuilding PRNGKey + k fold_ins + stack cost ~k+2 small device
        # round-trips per chunk on remote-attached TPUs, eating the
        # per-dispatch-latency win steps_per_dispatch exists for.  Values
        # are bit-identical: fold_in(PRNGKey(seed), batch_counter + j).
        self._base_rng = jax.random.PRNGKey(config.seed)
        self._fold1 = jax.jit(jax.random.fold_in)
        self.k_dispatch = max(1, config.steps_per_dispatch)
        if self.k_dispatch > 1:
            # chunk rng derivation lives INSIDE multi_step since round 5
            # (base_rng + uint32 start args): one fewer device dispatch
            # per chunk, bit-identical fold_in values (step.py docstring)
            assert config.eval_every % self.k_dispatch == 0, (
                "steps_per_dispatch must divide eval_every (keeps the "
                "per-500-batch eval cadence exact)")
            self.multi_step = make_multi_train_step(self.dims, self.tx)
            self.multi_eval_step = make_multi_eval_step(self.dims)
            from jax.sharding import NamedSharding, PartitionSpec as P
            # stacked chunks are (k, B, ...): batch axis is axis 1
            self.dp_stacked = NamedSharding(self.mesh, P(None, "dp"))

        self.batch_counter = 0
        self.start_epoch = 0
        self.start_batch_in_epoch = 0
        self.best_loss = 100.0
        # async checkpoint writes (--async_checkpoint): single-host only --
        # the multi-host save paths barrier on durability, which a
        # background write would make a lie
        self._saver = (ckpt.AsyncSaver()
                       if getattr(config, "async_checkpoint", True)
                       and jax.process_count() == 1 else None)
        if config.resume_path:
            if jax.process_count() > 1:
                # Only the primary reads the checkpoint (hosts need not
                # share a filesystem); arrays and meta are broadcast.  A
                # primary-side restore failure must be broadcast BEFORE the
                # pytree collective: otherwise the other hosts are already
                # blocked inside it when the primary dies, and the job wedges
                # until the runtime heartbeat timeout instead of erroring.
                import json as _json
                meta = {}
                err = ""
                if multihost.is_primary():
                    try:
                        self.trainable, self.opt_state, meta = ckpt.restore_last(
                            config.resume_path, self.trainable, self.opt_state)
                    except Exception as e:
                        err = f"{type(e).__name__}: {e}"
                err = multihost.broadcast_str(err)
                if err:
                    raise RuntimeError(
                        f"resume from {config.resume_path} failed on the "
                        f"primary process: {err}")
                self.trainable = multihost.broadcast_pytree(self.trainable)
                self.opt_state = multihost.broadcast_pytree(self.opt_state)
                meta = _json.loads(multihost.broadcast_str(_json.dumps(meta)))
            else:
                self.trainable, self.opt_state, meta = ckpt.restore_last(
                    config.resume_path, self.trainable, self.opt_state)
            self.trainable = jax.device_put(self.trainable, self.rep)
            self.opt_state = jax.device_put(self.opt_state, self.rep)
            self.batch_counter = meta["batch_counter"]
            self.start_epoch = meta["epoch"]
            # mid-epoch checkpoints (--save_every_batches) record the batch
            # offset within the epoch; fit() fast-forwards the deterministic
            # loader order to it, making the resumed run bit-identical to an
            # uninterrupted one (older checkpoints lack the key -> 0)
            self.start_batch_in_epoch = meta.get("batch_in_epoch", 0)
            self.best_loss = meta["best_loss"]
            self.logger.info(
                f"Resumed from {config.resume_path} at epoch "
                f"{self.start_epoch}, batch {self.batch_counter}"
                + (f" (+{self.start_batch_in_epoch} into the epoch)"
                   if self.start_batch_in_epoch else "") + ".")

    # ------------------------------------------------------------------
    def _place_frozen(self, frozen):
        """Device placement for the frozen embedding: replicated, or -- with
        --shard_embedding -- rows padded to a device-count multiple and
        sharded over the mesh axis (tensor parallel; XLA turns lookups into
        dynamic-gathers + collectives).  Used by both __init__ and test()
        so eval never silently replicates a table sharded for size."""
        if not self.config.shard_embedding:
            return jax.device_put(frozen, self.rep)
        from jax.sharding import NamedSharding, PartitionSpec as P
        emb = jax.numpy.asarray(frozen["embedding"])
        # n_dev-multiple padding is valid for either axis choice below
        # (n_dev = dp*mp); pad rows are stripped again by _checkpoint_params
        pad = (-emb.shape[0]) % self._n_dev
        if pad:
            emb = jax.numpy.concatenate(
                [emb, jax.numpy.zeros((pad, emb.shape[1]), emb.dtype)])
        # on a 2-D (dp x mp) --mesh_shape the table shards over the model
        # axis, orthogonal to the batch -- the large-vocab TP layout (the
        # same one __graft_entry__.dryrun_multichip validates)
        axis = "mp" if "mp" in self.mesh.axis_names else "dp"
        vocab_sharded = NamedSharding(self.mesh, P(axis, None))
        return {"embedding": jax.device_put(emb, vocab_sharded)}

    def _checkpoint_params(self):
        """Merged params with the embedding always taken from the original
        host-side table (identical to the device copy by construction: it
        is frozen).  The device table may be shard-padded -- saving it
        verbatim would make best/ checkpoints depend on the training mesh
        -- and under multi-host sharding it is not even addressable from
        one process; the host copy avoids both plus the device->host
        transfer on every save."""
        frozen = {"embedding": self._host_embedding[: self._vocab_rows]}
        return merge_params(self.trainable, frozen)

    # ---- checkpoint writes (sync or --async_checkpoint overlap) --------
    def _ckpt_wait(self):
        """Join any in-flight background checkpoint write.  Every READER
        of checkpoint files (test(), fit-end has_best, the _stop_after
        test hook's return) must pass through here first."""
        if self._saver is not None:
            self._saver.wait()

    def _save_best(self, model_path):
        if self._saver is None:
            ckpt.save_best(model_path, self._checkpoint_params(),
                           self.config.checkpoint_backend)
            return
        # transfer on the MAIN thread (the next step's donation of these
        # buffers is not dispatched yet, so the values are stable); only
        # the host-side serialization + write runs in the worker thread
        host_t = jax.device_get(self.trainable)
        frozen = {"embedding": self._host_embedding[: self._vocab_rows]}
        backend = self.config.checkpoint_backend
        self._saver.submit(
            lambda: ckpt.save_best(model_path, merge_params(host_t, frozen),
                                   backend))

    def _save_last(self, model_path, **meta):
        if self._saver is None:
            ckpt.save_last(model_path, self.trainable, self.opt_state,
                           backend=self.config.checkpoint_backend, **meta)
            return
        host = jax.device_get({"t": self.trainable, "o": self.opt_state})
        backend = self.config.checkpoint_backend
        self._saver.submit(
            lambda: ckpt.save_last(model_path, host["t"], host["o"],
                                   backend=backend, **meta))

    def _loader(self, dataset, shuffle=False, seed=0, start_batch=0):
        cfg = self.config
        if not hasattr(self, "_photo_cache"):
            from umpr_tpu.data.images import PhotoCache
            self._photo_cache = (PhotoCache(cfg.photo_cache_mb << 20)
                                 if cfg.photo_cache_mb > 0 else None)
        # multi-host: every process builds the same deterministic loader but
        # decodes photos only for its own row slice of each global batch
        photo_rows = (multihost.local_rows(cfg.batch_size)
                      if jax.process_count() > 1 else None)
        return BatchLoader(dataset, cfg.batch_size, shuffle=shuffle,
                           ignore_photos=cfg.review_net_only, seed=seed,
                           resize=(cfg.photo_size, cfg.photo_size),
                           workers=cfg.data_workers,
                           photo_cache=self._photo_cache,
                           photo_cache_bytes=cfg.photo_cache_mb << 20,
                           photo_rows=photo_rows, start_batch=start_batch)

    def _device_batches(self, loader):
        return prefetch_to_device(iter(loader), self.dp,
                                  depth=self.config.prefetch_depth)

    def _dispatch_stream(self, loader):
        """Yields ("single", device_batch) or ("chunk", (stacked, k)) items;
        chunks are k host batches stacked on a new leading axis and shipped
        in one transfer for the multi-step dispatch paths (train AND eval).
        Remainders that cannot fill a chunk run as single steps (a dead
        batch inside a train scan would still apply weight decay)."""
        k = self.k_dispatch
        if k == 1:
            for b in self._device_batches(loader):
                yield ("single", b)
            return

        from umpr_tpu.data.loader import chunk_stream

        # stacked chunks are (k, B, ...): batch axis is axis 1.  extract=None
        # drops each host batch (decoded photos included) as soon as its
        # transfer is issued -- the prefetch queue would otherwise pin up to
        # depth*k complete host batches nobody reads back.
        for dev, _none, chunked in chunk_stream(
                loader, k,
                put_chunk=lambda s: multihost.put_global(
                    s, self.dp_stacked, batch_axis=1),
                put_single=lambda b: multihost.put_global(b, self.dp),
                depth=self.config.prefetch_depth,
                extract=lambda hb: None):
            yield ("chunk", (dev, k)) if chunked else ("single", dev)

    def _progress(self, it, desc, total):
        """tqdm progress like the reference (main.py:31, evaluate.py:10);
        silent when stderr is not a terminal."""
        return tqdm(it, desc=desc, total=total, leave=False,
                    disable=not sys.stderr.isatty())

    # ---- device-resident corpus mode (--device_dataset) ---------------
    @staticmethod
    def _dataset_nbytes(dataset):
        return sum(getattr(dataset, f).nbytes for f in RESIDENT_FIELDS)

    def _resident_mode(self, *datasets):
        """Decide the device-resident corpus mode for this fit: ship the
        packed text arrays to HBM once and dispatch (k, B) index matrices
        instead of batch arrays.  Motivation + measurements:
        BENCH_DETAILS.md "Through-trainer attribution" (host->device batch
        transfer is ~9 of 16.8 ms/step on this relay-attached host)."""
        cfg = self.config
        mode = getattr(cfg, "device_dataset", "off")
        self._bank_uniq = None
        if mode == "off":
            return False
        reasons = []
        if max(1, getattr(cfg, "grad_accum_steps", 1)) > 1:
            reasons.append("grad_accum_steps uses the streaming micro-batch "
                           "step")
        total = sum(self._dataset_nbytes(d) for d in datasets)
        if not reasons and mode == "auto" and \
                total > (cfg.device_dataset_mb << 20):
            reasons.append(f"packed arrays {total >> 20} MB exceed "
                           f"device_dataset_mb={cfg.device_dataset_mb}")
        bank_note = ""
        if not reasons and not cfg.review_net_only:
            # photo configs: resident only when a bank of every distinct
            # decoded photo ALSO fits the budget (uint8, row 0 = zeros) --
            # the text-size gate above runs first so huge corpora never pay
            # this unique() pass
            uniq = np.unique(np.concatenate(
                [d.photo_paths.ravel() for d in datasets]))
            if uniq.size == 0 or uniq[0] != "":
                uniq = np.concatenate([np.array([""], dtype=uniq.dtype),
                                       uniq])
            bank_bytes = uniq.size * cfg.photo_size * cfg.photo_size * 3
            idx_bytes = sum(d.photo_paths.size * 4 for d in datasets)
            total += bank_bytes + idx_bytes
            if mode == "auto" and total > (cfg.device_dataset_mb << 20):
                reasons.append(
                    f"packed arrays + {uniq.size - 1}-photo bank = "
                    f"{total >> 20} MB exceed "
                    f"device_dataset_mb={cfg.device_dataset_mb}")
            else:
                self._bank_uniq = uniq
                bank_note = (f" (incl. a {uniq.size - 1}-photo "
                             f"{bank_bytes >> 20} MB bank)")
        if reasons:
            if mode == "on":
                self.logger.info("device_dataset=on not honored ("
                                 + "; ".join(reasons) + "); streaming.")
            return False
        self.logger.info(f"Device-resident dataset mode: {total >> 20} MB "
                         f"of packed arrays in HBM{bank_note}, "
                         f"index-only dispatch.")
        return True

    def _device_data(self, dataset):
        """Upload (once) and return the dataset's packed arrays on device.
        The cache holds a strong reference to the dataset so the id() key
        cannot be recycled while its device copy is alive.  When
        _resident_mode approved a photo bank (self._bank_uniq), the arrays
        include the shared bank plus this dataset's (n, V, P) bank-row
        indices (np.searchsorted is exact: the bank rows are the sorted
        unique paths with '' pinned to row 0)."""
        if not hasattr(self, "_dev_data_cache"):
            self._dev_data_cache = {}
        key = id(dataset)
        if key not in self._dev_data_cache:
            # multi-host: every process holds the same packed arrays
            # (deterministic builds) and provides the full array as its
            # local replica shard -- resident dispatch then works exactly
            # as on a single-host multi-device mesh
            arrs = {f: multihost.put_replicated(
                        np.ascontiguousarray(getattr(dataset, f)), self.rep)
                    for f in RESIDENT_FIELDS}
            if getattr(self, "_bank_uniq", None) is not None:
                arrs["photo_bank"] = self._photo_bank_dev()
                pidx = np.searchsorted(
                    self._bank_uniq, dataset.photo_paths).astype(np.int32)
                arrs["photo_idx"] = multihost.put_replicated(pidx, self.rep)
            self._dev_data_cache[key] = (dataset, arrs)
        return self._dev_data_cache[key][1]

    def _photo_bank_dev(self):
        """Decode every distinct photo once (same decode + zero-fill
        machinery the streaming loader uses, so failures and '' rows are
        byte-identical) and upload the (C, H, W, 3) uint8 bank.

        Multi-host: only the PRIMARY decodes and the bank is broadcast --
        decoded bytes must agree exactly across processes for a
        replicated array, and non-primary hosts may not even have the
        photo files (the streaming path only ever decodes local rows)."""
        if getattr(self, "_bank_dev", None) is None:
            cfg = self.config
            if multihost.is_primary():
                from umpr_tpu.data.images import load_photo_batch
                uniq = self._bank_uniq
                imgs = load_photo_batch(uniq.reshape(-1, 1, 1),
                                        (cfg.photo_size, cfg.photo_size),
                                        self._loader_executor(),
                                        getattr(self, "_photo_cache", None))
                imgs = imgs[:, 0, 0]
            else:
                imgs = np.zeros((self._bank_uniq.size, cfg.photo_size,
                                 cfg.photo_size, 3), np.uint8)
            if jax.process_count() > 1:
                imgs = np.asarray(multihost.broadcast_pytree(imgs))
            self._bank_dev = multihost.put_replicated(imgs, self.rep)
        return self._bank_dev

    def _loader_executor(self):
        from concurrent.futures import ThreadPoolExecutor
        w = self.config.data_workers
        if w <= 0:
            return None
        if not hasattr(self, "_bank_executor"):
            self._bank_executor = ThreadPoolExecutor(max_workers=w)
        return self._bank_executor

    def _place_idx(self, arr, stacked):
        """Shard a resident-dispatch index matrix over the mesh's batch
        axis (rows of idx == rows of the gathered batch), so GSPMD
        partitions the on-device gather and the batch lands in exactly
        the dp-sharded layout the streaming put_global path produces.
        The resident data arrays themselves are replicated (self.rep).
        Multi-host: each process provides its local row block of the
        (identical, deterministic) global index matrix -- the only
        per-step cross-host agreement resident mode needs."""
        if self._n_dev == 1 and jax.process_count() == 1:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(None, "dp") if stacked else P("dp")
        sharding = NamedSharding(self.mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(arr, sharding)
        return multihost.put_global({"i": arr}, sharding,
                                    batch_axis=1 if stacked else 0)["i"]

    def _resident_steps(self):
        if not hasattr(self, "_res_steps"):
            mt = (make_multi_train_step_resident(self.dims, self.tx)
                  if self.k_dispatch > 1 else None)
            me = (make_multi_eval_step_resident(self.dims)
                  if self.k_dispatch > 1 else None)
            self._res_steps = (make_train_step_resident(self.dims, self.tx),
                               make_eval_step_resident(self.dims), mt, me)
        return self._res_steps

    def _index_stream(self, n, seed, start_batch, shuffle=True,
                      pad_final_chunk=False):
        """The resident-mode twin of BatchLoader + chunk_stream: yields
        ("rchunk", (idxs (k,B) int32, n_reals (k,))) for full chunks and
        ("rsingle", (idx (B,), n_real)) for remainders, over exactly the
        batch order the streaming loader would produce (same RNG, same
        start_batch fast-forward, same dead-padding row 0).

        pad_final_chunk (EVAL ONLY): pad the remainder batches into one
        final chunk with n_real=0 rows instead of yielding them as
        singles.  All-dead batches contribute (sq=0, n=0) to the MSE --
        exact -- and the remainder stops paying one dispatch latency per
        batch.  Train must NOT use this: a dead batch inside the scan
        would still apply the weight-decay part of the update."""
        B, k = self.config.batch_size, self.k_dispatch
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        buf = []
        for start in range(start_batch * B, n, B):
            rows = order[start:start + B]
            n_real = len(rows)
            if n_real < B:
                rows = np.concatenate(
                    [rows, np.zeros(B - n_real, dtype=rows.dtype)])
            buf.append((rows.astype(np.int32), n_real))
            if k > 1 and len(buf) == k:
                yield ("rchunk",
                       (np.stack([r for r, _ in buf]),
                        np.asarray([nr for _, nr in buf], np.int32)))
                buf = []
        if pad_final_chunk and k > 1 and len(buf) > 1:
            dead = (np.zeros(B, np.int32), 0)
            buf += [dead] * (k - len(buf))
            yield ("rchunk",
                   (np.stack([r for r, _ in buf]),
                    np.asarray([nr for _, nr in buf], np.int32)))
            return
        for rows, n_real in buf:
            yield ("rsingle", (rows, np.int32(n_real)))

    def _evaluate_resident(self, dataset, trainable, frozen):
        data = self._device_data(dataset)
        step1, eval1, _mt, multi_eval = self._resident_steps()
        parts = []
        n_batches = (len(dataset) + self.config.batch_size - 1) \
            // self.config.batch_size
        for kind, payload in self._progress(
                self._index_stream(len(dataset), 0, 0, shuffle=False,
                                   pad_final_chunk=True),
                "Evaluate", None if self.k_dispatch > 1 else n_batches):
            if kind == "rchunk":
                idxs, n_reals = payload
                parts.append(multi_eval(trainable, frozen, data,
                                        self._place_idx(idxs, True), n_reals))
            else:
                idx, n_real = payload
                parts.append(eval1(trainable, frozen, data,
                                   self._place_idx(idx, False), n_real))
        return mse_from_parts(parts)

    def _evaluate(self, loader, trainable=None, frozen=None):
        """MSE over `loader` with the live training params by default;
        test() passes restored best-checkpoint params through the SAME
        dispatch machinery (single or --steps_per_dispatch chunked)."""
        trainable = self.trainable if trainable is None else trainable
        frozen = self.frozen if frozen is None else frozen
        # resident twin: datasets fit() uploaded evaluate via index-only
        # dispatch; others (e.g. a test() split) stream as before
        if getattr(self, "_resident", False) and \
                id(loader.ds) in getattr(self, "_dev_data_cache", {}):
            return self._evaluate_resident(loader.ds, trainable, frozen)
        if self.k_dispatch == 1:
            return evaluate_mse(self.eval_step, trainable, frozen,
                                self._progress(self._device_batches(loader),
                                               "Evaluate", len(loader)))
        # chunked eval dispatch: k batches per device call; every float()
        # readback is deferred past the last dispatch so nothing blocks the
        # queue, then the per-batch (sq, n) pairs are summed on host in
        # batch order -- the same values in the same order as the unchunked
        # reference semantics (evaluate_mse / src/evaluate.py:6-14)
        parts = []
        for kind, payload in self._progress(self._dispatch_stream(loader),
                                            "Evaluate", None):
            if kind == "chunk":
                dev, _k = payload
                sqs, ns = self.multi_eval_step(trainable, frozen, dev)
            else:
                sqs, ns = self.eval_step(trainable, frozen, payload)
            parts.append((sqs, ns))
        return mse_from_parts(parts)

    def _metric(self, event, **kv):
        """Append one JSON metrics line (--metrics_jsonl; primary only).
        The log-line surface matches the reference; this is the
        machine-readable channel for dashboards / run comparisons."""
        path = getattr(self.config, "metrics_jsonl", "")
        if not path or not multihost.is_primary():
            return
        import json
        import math
        # non-finite floats (empty valid split / diverged run) -> null:
        # bare NaN tokens are not valid JSON and break strict parsers
        kv = {k: (None if isinstance(v, float) and not math.isfinite(v) else v)
              for k, v in kv.items()}
        kv = {"event": event, "ts": round(time.time(), 3), **kv}
        try:
            with open(path, "a") as f:
                f.write(json.dumps(kv) + "\n")
        except OSError as e:
            self.logger.info(f"metrics_jsonl write failed: {e}")

    # ------------------------------------------------------------------
    def fit(self, train_data, valid_data, model_path, _stop_after_batches=0):
        """_stop_after_batches: test-only hook -- return after this many
        batches (counted this call), simulating an interruption at an exact
        point so mid-epoch resume can be asserted bit-identical."""
        cfg, logger = self.config, self.logger
        logger.info("Start to train!")
        # A second fit() on the same Trainer may bring different datasets:
        # drop any previous fit's device-resident arrays and photo bank so
        # a fresh _bank_uniq cannot index into a stale bank (and so the
        # old datasets' HBM copies are released).  (ADVICE r4 #2.)
        self._bank_dev = None
        self._dev_data_cache = {}
        # device-resident corpus mode: upload train+valid packed arrays to
        # HBM once; every dispatch below then ships indices only
        self._resident = self._resident_mode(train_data, valid_data)
        dev_train = None
        if self._resident:
            dev_train = self._device_data(train_data)
            self._device_data(valid_data)
        valid_loader = self._loader(valid_data)
        valid_mse = self._evaluate(valid_loader)
        logger.info(f"Initial validation mse is {valid_mse:.6f}")
        self._metric("eval", epoch=self.start_epoch, batch=self.batch_counter,
                     valid_mse=valid_mse)
        start_time = time.perf_counter()
        batches_this_call = 0

        profiled = False
        for epoch in range(self.start_epoch, cfg.train_epochs):
            lr = lr_at_epoch(cfg.learning_rate, cfg.lr_decay, epoch)
            # a mid-epoch resume fast-forwards the FIRST epoch's
            # deterministic order to the saved offset
            epoch_offset = (self.start_batch_in_epoch
                            if epoch == self.start_epoch else 0)
            batch_in_epoch = epoch_offset
            if self._resident:
                # index-only twin of the loader/stream below: same seed,
                # same order, same chunk grouping (bit-exact, CI-tested)
                stream = self._index_stream(len(train_data),
                                            cfg.seed + epoch, epoch_offset)
                n_loader_batches = (len(train_data) + cfg.batch_size - 1) \
                    // cfg.batch_size
            else:
                train_loader = self._loader(train_data, shuffle=True,
                                            seed=cfg.seed + epoch,
                                            start_batch=epoch_offset)
                stream = self._dispatch_stream(train_loader)
                n_loader_batches = len(train_loader)
            # Accumulate per-dispatch (loss_sum, n) device scalars in a HOST
            # list and reduce them in ONE jitted stack-sum only at logging
            # points.  Reading per step would synchronize the pipeline (the
            # reference's loss.item(), main.py:39); but even LAZY chained
            # device adds cost two extra dispatches per chunk, measured at
            # 3.2 ms/step on this relay (BENCH_DETAILS.md "Through-trainer"
            # -- bare resident loop 2.5 ms/step, +chained-adds 5.7).
            # Appending is free; the deferred tree-sum differs from a
            # sequential fold only in f32 rounding of a LOGGING value.
            total_parts = []

            def totals():
                """Stack-sum the parts accumulated since the last logging
                point, then COMPACT the list to the single summed pair:
                unbounded growth would both re-reduce O(n^2) scalars over
                the epoch and compile a fresh stack shape at every logging
                point (~12.5k dispatches per Yelp-8M epoch; ADVICE r4 #3).
                The stack is zero-padded to a power-of-two bucket so only
                ~log(n) distinct shapes ever compile: the relay serializes
                compiles at ~0.5-1 s each, and an exact-length stack was
                measured costing ~1.1 s at EVERY eval point of a fresh run
                (round-5 protocol-wall chase, BENCH_DETAILS.md)."""
                if not total_parts:
                    return 0.0, 0.0
                m = 1
                while m < len(total_parts):
                    m *= 2
                zero = np.float32(0.0)
                pad = [zero] * (m - len(total_parts))
                ls = jnp.sum(jnp.stack([p[0] for p in total_parts] + pad))
                ns = jnp.sum(jnp.stack([p[1] for p in total_parts] + pad))
                total_parts[:] = [(ls, ns)]
                return float(ls), float(ns)

            def after_steps(n_steps):
                nonlocal profiled, batch_in_epoch
                nonlocal batches_this_call
                before = self.batch_counter
                self.batch_counter += n_steps
                batch_in_epoch += n_steps
                batches_this_call += n_steps
                # stop only a trace this run actually started, once it has
                # covered >= 4 steps (with steps_per_dispatch > 4 that is
                # one chunk; the old absolute >= 6 gate never started a
                # trace at all for k >= 6, then "stopped" it)
                if (started_profile and not profiled
                        and self.batch_counter >= profile_start_count + 4):
                    try:
                        jax.profiler.stop_trace()
                    except Exception:
                        pass
                    profiled = True
                # "crossed an eval_every multiple" (not ==0): epoch-end chunk
                # remainders can misalign the counter from multiples of k
                if self.batch_counter // cfg.eval_every > before // cfg.eval_every:
                    valid_mse = self._evaluate(valid_loader)
                    t_loss, t_n = totals()
                    train_loss = t_loss / t_n
                    logger.info(f"\rEpoch {epoch:2d}; batch {self.batch_counter:5d}; "
                                f"train loss {train_loss:.6f}; "
                                f"valid mse {valid_mse:.6f}")
                    self._metric("eval", epoch=epoch, batch=self.batch_counter,
                                 train_loss=train_loss, valid_mse=valid_mse,
                                 lr=lr, elapsed_s=round(
                                     time.perf_counter() - start_time, 3))
                    if self.best_loss > valid_mse:
                        if multihost.is_primary():  # one writer per run
                            self._save_best(model_path)
                        # every process tracks best_loss from the same
                        # (collective) valid_mse, so all reach this barrier;
                        # it makes the write durable before any host can
                        # move on to a read (test()/resume)
                        multihost.barrier(f"save_best_{self.batch_counter}")
                        self.best_loss = valid_mse
                # mid-epoch durability (--save_every_batches): the saved
                # batch_in_epoch offset lets resume fast-forward this
                # epoch's deterministic order and continue bit-exactly
                if (cfg.save_every_batches and
                        self.batch_counter // cfg.save_every_batches
                        > before // cfg.save_every_batches):
                    if multihost.is_primary():
                        self._save_last(model_path, epoch=epoch,
                                        batch_counter=self.batch_counter,
                                        best_loss=self.best_loss,
                                        batch_in_epoch=batch_in_epoch)
                    multihost.barrier(f"save_mid_{self.batch_counter}")

            started_profile = False
            profile_start_count = 0
            # chunked dispatch yields one stream item per k batches (plus
            # remainder singles); tqdm's total must count items, not batches
            # (a mid-epoch resume skips epoch_offset batches)
            n_batches = n_loader_batches - epoch_offset
            n_items = (n_batches // self.k_dispatch
                       + n_batches % self.k_dispatch)
            stop_now = False
            for item in self._progress(stream,
                                       f"Training epoch {epoch}", n_items):
                if (cfg.profile_dir and not profiled and not started_profile
                        and self.batch_counter >= 2):
                    jax.profiler.start_trace(cfg.profile_dir)
                    started_profile = True
                    profile_start_count = self.batch_counter
                kind, payload = item
                if kind == "chunk":
                    batches, k = payload
                    self.trainable, self.opt_state, loss_sum, n_sum = self.multi_step(
                        self.trainable, self.frozen, self.opt_state, batches,
                        lr, self._base_rng, np.uint32(self.batch_counter))
                    total_parts.append((loss_sum, n_sum))
                    after_steps(k)
                elif kind == "rchunk":
                    idxs, n_reals = payload
                    _t, _e, multi_res, _me = self._resident_steps()
                    self.trainable, self.opt_state, loss_sum, n_sum = multi_res(
                        self.trainable, self.frozen, self.opt_state, dev_train,
                        self._place_idx(idxs, True), n_reals, lr,
                        self._base_rng, np.uint32(self.batch_counter))
                    total_parts.append((loss_sum, n_sum))
                    after_steps(self.k_dispatch)
                elif kind == "rsingle":
                    idx, n_real = payload
                    rng = self._fold1(self._base_rng, self.batch_counter)
                    step_res, _e, _mt, _me = self._resident_steps()
                    self.trainable, self.opt_state, loss, aux = step_res(
                        self.trainable, self.frozen, self.opt_state, dev_train,
                        self._place_idx(idx, False), n_real, lr, rng)
                    total_parts.append((loss * aux["n_real"], aux["n_real"]))
                    after_steps(1)
                else:
                    batch = payload
                    rng = self._fold1(self._base_rng, self.batch_counter)
                    self.trainable, self.opt_state, loss, aux = self.train_step(
                        self.trainable, self.frozen, self.opt_state, batch,
                        lr, rng)
                    total_parts.append((loss * aux["n_real"], aux["n_real"]))
                    after_steps(1)
                if (_stop_after_batches
                        and batches_this_call >= _stop_after_batches):
                    stop_now = True
                    break

            if stop_now:
                # simulated interruption (test hook): leave exactly as a
                # crash would -- whatever checkpoints exist, no epoch-end
                # bookkeeping.  (The join is not part of the simulation:
                # a real crash loses at most the in-flight write, which
                # the atomic swap already makes safe; the tests that use
                # this hook READ the files next.)
                self._ckpt_wait()
                return

            if started_profile and not profiled:
                # short epoch: close the trace rather than leaving it open
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
                profiled = True

            t_loss, t_n = totals()
            logger.info(f"Epoch {epoch:3d} done; train loss "
                        f"{t_loss / max(t_n, 1.0):.6f}")
            self._metric("epoch", epoch=epoch, batch=self.batch_counter,
                         train_loss=t_loss / max(t_n, 1.0),
                         lr=lr, elapsed_s=round(time.perf_counter() - start_time, 3))
            # --save_last_every_epochs N thins the epoch-boundary
            # durability write (full params + opt state, ~0.7 s on this
            # host -- it dominates short-epoch walls); the final epoch
            # always saves so fit() ends resumable-from-the-end
            every = max(1, getattr(cfg, "save_last_every_epochs", 1))
            if (epoch + 1) % every == 0 or epoch + 1 == cfg.train_epochs \
                    or self.batch_counter > cfg.max_batches:
                if multihost.is_primary():
                    self._save_last(model_path, epoch=epoch + 1,
                                    batch_counter=self.batch_counter,
                                    best_loss=self.best_loss, batch_in_epoch=0)
                multihost.barrier(f"save_last_{epoch}")
            if self.batch_counter > cfg.max_batches:
                break

        # A run shorter than eval_every never reaches an eval point, so no
        # best/ checkpoint exists; main.py's fit->test flow (and a later
        # --test_only run) still needs one.  Evaluate once at end of
        # training and save it.  Primary decides (non-primary hosts may not
        # share its filesystem); the eval itself is collective.
        self._ckpt_wait()  # has_best below READS what a background save writes
        need_best = "1" if (multihost.is_primary()
                            and not ckpt.has_best(model_path)) else "0"
        if multihost.broadcast_str(need_best) == "1":
            valid_mse = self._evaluate(valid_loader)
            logger.info(f"Final validation mse is {valid_mse:.6f}")
            self._metric("eval", epoch=cfg.train_epochs,
                         batch=self.batch_counter, valid_mse=valid_mse)
            if multihost.is_primary():
                ckpt.save_best(model_path, self._checkpoint_params(),
                               cfg.checkpoint_backend)
            multihost.barrier("save_best_final")
            self.best_loss = min(self.best_loss, valid_mse)

        self._ckpt_wait()  # fit() returns only with durable checkpoints
        second = int(time.perf_counter() - start_time)
        logger.info(f"End of training! Time used {second // 3600}:{second % 3600 // 60}:{second % 60}.")

    # ------------------------------------------------------------------
    def test(self, test_data, model_path):
        logger = self.logger
        logger.info("Start to test.")
        self._ckpt_wait()  # restore_best reads what a background save writes
        like = self._checkpoint_params()
        if jax.process_count() > 1:
            # primary-only read + broadcast: non-primary hosts may not share
            # the primary's filesystem, and even on shared storage a read
            # racing the primary's atomic swap could see the previous save.
            # Failures broadcast before the pytree collective (see the
            # resume path above: a dead primary would wedge the others).
            params, err = like, ""
            if multihost.is_primary():
                try:
                    params = ckpt.restore_best(model_path, like)
                except Exception as e:
                    err = f"{type(e).__name__}: {e}"
            err = multihost.broadcast_str(err)
            if err:
                raise RuntimeError(f"restore_best from {model_path} failed "
                                   f"on the primary process: {err}")
            params = multihost.broadcast_pytree(params)
        else:
            params = ckpt.restore_best(model_path, like)
        trainable, frozen = split_frozen(params)
        trainable = jax.device_put(trainable, self.rep)
        # same placement as training: keeps --shard_embedding sharded at
        # eval (a table sharded for size must not replicate here)
        frozen = self._place_frozen(frozen)
        loader = self._loader(test_data)
        # same dispatch machinery as validation: --steps_per_dispatch k > 1
        # chunks the test pass too (k batches per device call)
        mse = self._evaluate(loader, trainable, frozen)
        logger.info(f"Test end, test mse is {mse:.6f}")
        self._metric("test", test_mse=mse)
        return mse
