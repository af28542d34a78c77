"""Config / flag system.

Reproduces the reference's reflection-argparse surface (reference:
config.py:7-64): every public class attribute is a hyperparameter default and
automatically becomes a ``--<name>`` CLI flag.  ``bool``/``int``/``float``/
``list``-typed attributes are parsed with ``ast.literal_eval`` so that e.g.
``--views "['food','inside','outside','drink']"`` and ``--multi_gpu False``
work exactly as in the reference (rationale documented in the reference's
readme.md:167-173: plain ``type=bool`` would treat any non-empty string as
True).

TPU-specific additions are grouped at the bottom of the attribute list; they
only *add* flags and never change the meaning of a reference flag.
"""

from __future__ import annotations

import ast
import argparse


class Config:
    # ----- training schedule (reference: config.py:8-15) -----
    device = "tpu"  # JAX platform to run on: "tpu" | "cpu". Replaces torch.device("cuda:0").
    multi_gpu = True  # Use every visible device (data parallel over the mesh). Reference: DataParallel toggle.
    train_epochs = 20
    batch_size = 64  # Global batch size (split across devices when multi_gpu).
    learning_rate = 1e-6
    l2_regularization = 1e-3  # torch-style Adam L2 (added to the gradient), not AdamW.
    lr_decay = 0.99  # Exponential decay applied once per epoch.

    # ----- paths (reference: config.py:17-20) -----
    word2vec_file = "embedding/glove.6B.50d.txt"
    data_dir = "data/music"
    log_path = ""
    model_path = ""

    # ----- mode switches (reference: config.py:22-23) -----
    test_only = False  # If true, model_path must point at a saved checkpoint.
    review_net_only = False  # If true, only the review network runs (UMPR-R).

    # ----- dataset shaping (reference: config.py:25-32) -----
    review_level = "sentence"  # 'sentence' or 'review'
    max_sent_count = 20  # max sentences per user/item history
    min_sent_count = 5
    max_ui_sent_count = 5  # max sentences in the u->i target review
    max_sent_length = 20  # max tokens per sentence
    views = ["unknown"]  # amazon: ['unknown'];  yelp: ['food','inside','outside','drink']
    photo_count = 1  # photos per view

    # ----- model sizes (reference: config.py:34-39) -----
    gru_size = 64  # R-Net GRU hidden size (u in the paper)
    self_atte_size = 64  # S-Net attention size (u_s in the paper)
    kernel_count = 120  # C-Net CNN filters
    kernel_size = 3  # C-Net CNN kernel width
    threshold = 0.35  # C-Net view-probability threshold (eq. 15)
    loss_v_rate = 0.1  # weight of the auxiliary visual loss

    # ----- TPU-native additions (new; no reference counterpart) -----
    seed = 0  # PRNG seed for parameter init and batch shuffling.
    compute_dtype = "float32"  # 'float32' | 'bfloat16' matmul/activation dtype.
    eval_every = 500  # validation cadence in batches (reference hard-codes 500, main.py:43).
    max_batches = 50000  # stop once total batches exceed this, checked at epoch
                         # boundaries exactly like the reference (main.py:56-57
                         # breaks the EPOCH loop, so a run can overshoot by up
                         # to one epoch; parity-preserved).
    prefetch_depth = 2  # host pipeline look-ahead batches (device double buffering).
    save_every_batches = 0  # mid-epoch last/-checkpoint cadence (0 = epoch
                            # boundaries only, the prior behavior).  At corpus
                            # scale (Yelp: ~125k batches/epoch) epoch-only
                            # durability loses hours on a crash; resume
                            # fast-forwards the epoch's deterministic batch
                            # order to the saved offset, so an interrupted run
                            # continues BIT-EXACTLY (dropout keys derive from
                            # the global batch counter, not loop state).
                            # Each save writes full params + opt state --
                            # pick a cadence that amortizes that host cost.
    save_last_every_epochs = 1  # epoch-boundary last/-checkpoint cadence
                                # (1 = every epoch, the prior behavior; N
                                # saves on epochs N-1, 2N-1, ... and always
                                # on the final epoch).  The write is full
                                # params + opt state (~0.7 s on this host)
                                # -- at small epoch sizes it dominates the
                                # epoch wall (BENCH_DETAILS "Through-
                                # trainer"), so short-epoch jobs can trade
                                # resume granularity for throughput.
    steps_per_dispatch = 1  # train steps per jit dispatch (lax.scan over stacked
                            # batches); amortizes per-dispatch host latency.
                            # Bit-exact vs k=1 (CI-tested).  Must divide
                            # eval_every.  On THIS host the B=64 single-step
                            # path already saturates after the round-3 kernel
                            # work (27.7k k=10 vs 27.9k k=1, BENCH_r03) -- the
                            # win case is remote-attached TPUs with higher
                            # per-dispatch latency than this relay.
    grad_accum_steps = 1  # micro-batches per optimizer update (gradient
                          # accumulation inside one jit via lax.scan): peak
                          # activation memory drops to one micro-batch's,
                          # enabling large effective batches on fixed HBM.
                          # Must divide batch_size; update equals the
                          # single-step one up to fp summation order.
    data_workers = 0  # image-decode worker threads (0 = synchronous).
    device_dataset = 'auto'  # keep the packed text corpus resident in HBM and
                             # dispatch (k, B) index matrices instead of batch
                             # arrays ('auto'/'on'/'off').  Kills the
                             # host->device transfer that dominates real
                             # Trainer.fit wall on relay/network-attached
                             # hosts (measured: ~9 of 16.8 ms/step,
                             # BENCH_DETAILS.md "Through-trainer").  'auto'
                             # engages when the packed arrays (plus, for
                             # photo configs, a distinct-photo uint8 bank)
                             # fit device_dataset_mb; on multi-device meshes
                             # the arrays replicate and the index matrices
                             # shard over dp, and under multi-host each
                             # process holds a full replica and ships its
                             # local index-row block (the photo bank is
                             # decoded on the primary and broadcast).
                             # grad_accum_steps is the one remaining
                             # exclusion (streaming micro-batch step).
                             # Bit-exact vs streaming: 1-dev, 8-dev, and
                             # 2-real-process (tests/test_device_dataset.py,
                             # tests/test_multihost.py).  Serving reuses the
                             # photo-bank idea per request (serve.py).
    device_dataset_mb = 4096  # 'auto' size gate for the resident corpus (the
                              # Music-small packed arrays are ~230 MB; Yelp-8M
                              # ~29 GB streams regardless).
    serve_coalesce_ms = 0  # HTTP serving: window (ms) during which concurrent
                           # /predict requests are merged into one device
                           # batch (0 = every request dispatches alone).
                           # Small concurrent requests then share a single
                           # padded dispatch instead of each paying the full
                           # batch_size compute + dispatch latency.
    photo_cache_mb = 2048  # decoded-photo LRU cache (0 disables); item photos
                           # recur in every sample of that item, so the cache
                           # removes the JPEG-decode bottleneck after epoch 1.
    use_pallas = True  # use the fused Pallas GRU kernel on TPU (False = pure lax.scan).
    mesh_shape = []  # explicit device mesh, e.g. [8] for 8-way DP; [] = all devices on one axis.
    shard_embedding = False  # tensor-parallel: shard the (frozen) vocab table's rows
                             # across the mesh -- for large-vocab configs (Amazon CSJ
                             # 5.7M reviews / Yelp) where a replicated table wastes HBM.
    resume_path = ""  # optional checkpoint dir to resume training from (params + opt state).
    rnet_pretrained = ""  # optional R-Net warm-start checkpoint from umpr_tpu.pretrain.rnet
                          # (the analogue of RNet(pretrained=...) at reference model.py:30-34).
    vgg16_weights = ""  # optional converted torchvision VGG16 checkpoint dir
                        # (tools/convert_vgg16.py; reference model.py:204-207 downloads it).
    photo_size = 224  # photo edge length fed to the visual net (reference
                      # hard-codes 224 at dataset.py:137); must be a multiple
                      # of 32 (VGG16's five 2x2 pools).  Non-224 sizes size
                      # fc1 to the true conv output (torchvision instead
                      # adaptive-pools every size to 7x7) -- pretrained
                      # classifier weights and reference parity hold only
                      # at 224.
    vgg_fold_w = True  # width-folded VGG block 1 (identical math; fills the
                       # 128-lane TPU tiles that block 1's C=64 half-wastes).
    vgg_fused_pool = False  # Pallas fused bias+relu+pool at the UNFOLDED
                            # large VGG pool boundaries (blocks 1-2): the
                            # block's closing full-size tensor never
                            # materializes post-bias and the backward's
                            # full-size traffic drops ~2x at those
                            # boundaries (umpr_tpu/ops/pool_pallas.py).
                            # Requires use_pallas.
    remat_vgg = False  # rematerialize VGG conv blocks in the backward
                       # (jax.checkpoint): saves only post-pool block outputs,
                       # trading ~1 extra forward's conv FLOPs for most of the
                       # activation HBM -- combine with grad_accum_steps /
                       # larger batch_size on tight HBM budgets.
    adam_moment_dtype = "float32"  # 'bfloat16' stores Adam m rounded (f32
                                   # math; v stays f32 -- its EMA change is
                                   # below bf16's ULP): cuts optimizer HBM
                                   # traffic over VGG16's 138M params;
                                   # resume-exact.
    adam_factored_nu = False  # Adafactor-style factored second moment for
                              # >=2-D params (Shazeer & Stern 2018): cuts the
                              # nu state/traffic over VGG16's 138M params from
                              # 552 MB to ~0.3 MB. NOT torch-parity; opt-in.
    profile_dir = ""  # if set, write a jax.profiler trace of a few steps here.
    metrics_jsonl = ""  # if set, append machine-readable run metrics (one
                        # JSON object per line: eval points, epoch summaries,
                        # test results) to this file; primary process only.
    cache_dataset = True  # cache the packed dataset arrays next to the CSVs (reference: main.py:66-73).
    checkpoint_backend = "npz"  # 'npz' (path-keyed arrays, no deps) | 'orbax'
                                # (standard JAX checkpoint library; interop with
                                # the wider ecosystem). Restore auto-detects.
    async_checkpoint = True  # overlap checkpoint writes with training: the
                             # trainer snapshots the params with an on-device
                             # copy (~ms) and a worker thread does the
                             # device->host transfer + write (~0.7 s for full
                             # UMPR) off the step loop.  Single-host only
                             # (multi-host keeps synchronous saves: its
                             # durability barriers must see the file).
    coordinator_address = ""  # multi-host: coordinator "host:port". Empty = single-host,
                              # unless a TPU-pod launcher already set JAX_COORDINATOR_ADDRESS.
    num_processes = 0  # multi-host: total process count (0 = single-host / pod auto-detect).
    process_id = -1  # multi-host: this process's id (-1 = auto-detect).
    build_chunk_rows = 1000000  # CSV rows per chunk for the streaming (low-RSS)
                                # dataset build; 0 = full-memory build.

    def __init__(self, argv=None):
        parser = argparse.ArgumentParser()
        for key, val in self._attributes():
            receive_type = type(val)
            if receive_type in (bool, int, float, list):
                # ast.literal_eval turns the CLI string into a real python
                # value; this is what makes `--multi_gpu False` and
                # `--views "['food']"` behave correctly.
                receive_type = ast.literal_eval
            parser.add_argument("--" + key, dest=key, type=receive_type, default=val)
        for key, val in vars(parser.parse_args(argv)).items():
            setattr(self, key, val)

        if self.test_only:
            assert self.model_path != "", "You must give model_path on testing!"
        assert self.review_level in ("sentence", "review"), (
            '"review_level" must be equal to "sentence" or "review"!'
        )
        assert self.compute_dtype in ("float32", "bfloat16")
        assert self.adam_moment_dtype in ("float32", "bfloat16")
        assert self.checkpoint_backend in ("npz", "orbax")
        assert self.photo_size % 32 == 0 and self.photo_size > 0, (
            '"photo_size" must be a positive multiple of 32!')
        assert self.grad_accum_steps >= 1 and \
            self.batch_size % self.grad_accum_steps == 0, (
            '"grad_accum_steps" must divide batch_size!')
        assert self.grad_accum_steps == 1 or self.steps_per_dispatch == 1, (
            "grad_accum_steps and steps_per_dispatch are mutually exclusive!")

    @classmethod
    def _attributes(cls):
        items = []
        for klass in reversed(cls.__mro__):
            for key, val in vars(klass).items():
                if key.startswith("_") or callable(val) or isinstance(val, (classmethod, staticmethod, property)):
                    continue
                items.append((key, val))
        # Keep deterministic, alphabetical order like inspect.getmembers does.
        seen = {}
        for key, val in items:
            seen[key] = val
        return sorted(seen.items())

    @property
    def view_size(self) -> int:
        return len(self.views)

    def __str__(self):
        out = []
        for key, _ in self._attributes():
            out.append("{} = {}\n".format(key, getattr(self, key)))
        return "".join(out)
