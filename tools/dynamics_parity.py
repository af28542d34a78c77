"""Training-dynamics parity: our framework vs the reference torch code,
same data, same init, same hyperparameters, per-epoch MSE trajectory.

Usage (from the repo root; make a corpus first with
tools/make_synthetic_corpus.py + umpr_tpu.text.preprocess):

    # UMPR-R (review net only)
    python tools/dynamics_parity.py --data_dir /tmp/corpus \
        --glove /tmp/corpus/glove.txt [--epochs 6] [--batch 64] [--seed 2]

    # FULL multi-modal UMPR (ControlNet + VisualNet + loss_v through the
    # optimizer over epochs) -- needs a corpus with decodable photos, e.g.
    #   python tools/make_synthetic_corpus.py --out /tmp/yc --style yelp \
    #       --photos --users 120 --items 16 --reviews_per_user 8
    #   python -m umpr_tpu.text.preprocess --data_type yelp \
    #       --data_path /tmp/yc/reviews.json --save_dir /tmp/yc
    python tools/dynamics_parity.py --data_dir /tmp/yc --glove /tmp/yc/glove.txt \
        --full --views "['food','inside','outside','drink']" [--photo_size 64]

The two sides can run in SEPARATE processes (the torch-CPU side takes
hours at full-UMPR scale while ours takes minutes on the chip; holding
the TPU relay through the torch half would block every other device user
on this host):

    python tools/dynamics_parity.py ... --tpu --side ours --out dyn_ours.json
    python tools/dynamics_parity.py ...       --side ref  --out dyn_ref.json

`--side both` (the default) keeps the original single-process behavior and
prints the comparison table.  `--out` writes {"side", "epochs", "mse",
...} JSON for offline comparison.

`--unpatched` runs the reference side WITHOUT the double-unsort bug fix
(reference src/model.py:21 re-indexes rows that pad_packed_sequence
already restored, scrambling GRU outputs across the flattened batch
whenever sentence lengths differ).  The reference's published MSEs were
produced WITH that re-index, so this mode measures the deviation's effect
on published-number comparability (PARITY.md deviation #1).

Dropout is disabled on BOTH sides in full mode (torch Dropout.p=0, ours
dropout_rng=None): the frameworks draw from unrelated RNG streams, so any
dropout would turn a numerics comparison into noise.  photo_size < 224 is
exact on both sides (the VGG adaptive pool absorbs it) and keeps the torch
oracle tractable on CPU.

Round-1 result (2,400-sample corpus, B=64, seed 2): per-epoch MSE identical
to 4 decimals for all 6 epochs (see PARITY.md).  NOTE: ~50% of seeds are
dead at birth through the reference's ReLU head -- pick one whose initial
predictions are alive (seed 2 on the round-1 corpora).
"""
import argparse, ast, json, sys, numpy as np
sys.path.insert(0, ".")  # run from repo root

ap = argparse.ArgumentParser()
ap.add_argument("--data_dir", required=True)
ap.add_argument("--glove", required=True)
ap.add_argument("--epochs", type=int, default=6)
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--lr", type=float, default=0.003)
ap.add_argument("--seed", type=int, default=2)
ap.add_argument("--min_sent_count", type=int, default=5)
ap.add_argument("--full", action="store_true",
                help="full multi-modal UMPR (photos + ControlNet + "
                     "VisualNet + loss_v)")
ap.add_argument("--views", default="['food']")
ap.add_argument("--photo_size", type=int, default=64)
ap.add_argument("--side", choices=["both", "ours", "ref"], default="both",
                help="run one side only (separate processes; see docstring)")
ap.add_argument("--out", default=None,
                help="write the per-epoch MSE trajectory as JSON")
ap.add_argument("--unpatched", action="store_true",
                help="reference side keeps its double-unsort quirk "
                     "(src/model.py:21) -- the as-published configuration")
ap.add_argument("--tpu", action="store_true",
                help="run OUR side on the default jax platform (the TPU "
                     "chip) at jax_default_matmul_precision=highest "
                     "instead of pinning CPU -- the scale_parity.py "
                     "arrangement; the torch side stays on CPU either way. "
                     "Full-UMPR trajectories on 1 CPU core take ~10 min/"
                     "epoch; the chip makes the ours side minutes total.")
args = ap.parse_args()

import jax

if args.tpu and args.side != "ref":
    # f32 matmuls on TPU default to bf16 operands; 'highest' is the
    # exact-parity configuration (PARITY.md "TPU matmul precision")
    jax.config.update("jax_default_matmul_precision", "highest")
    from umpr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
else:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, torch
from torch import nn
from umpr_tpu.config import Config
from umpr_tpu.text.vocab import Word2vec
from umpr_tpu.data.dataset import build_dataset
from umpr_tpu.data.loader import BatchLoader
from umpr_tpu.models.umpr import ModelDims, init_umpr
from umpr_tpu.train.optim import make_optimizer, split_frozen, lr_at_epoch
from umpr_tpu.train.step import make_train_step, make_eval_step, evaluate_mse
from tests.ref_oracle import import_reference_model, patch_improved_rnn, load_umpr, batch_to_reference, RefConfig

views = ast.literal_eval(args.views)
cfg_args = ["--min_sent_count", str(args.min_sent_count),
            "--review_net_only", str(not args.full)]
if args.full:
    cfg_args += ["--views", args.views, "--photo_size", str(args.photo_size)]
cfg = Config(argv=cfg_args)
w2v = Word2vec(args.glove)
train_ds = build_dataset(f"{args.data_dir}/train.csv",
                         f"{args.data_dir}/photos.json",
                         f"{args.data_dir}/photos", w2v, cfg)
print(f"{len(train_ds)} samples ({'full UMPR' if args.full else 'UMPR-R'}, "
      f"views={views if args.full else 'n/a'})")
dims = ModelDims(review_net_only=not args.full, view_size=len(views),
                 photo_size=args.photo_size)
params0 = init_umpr(jax.random.PRNGKey(args.seed), dims, w2v.embedding)

LR, WD, EPOCHS, BS = args.lr, 1e-3, args.epochs, args.batch
resize = (args.photo_size, args.photo_size)
from umpr_tpu.data.images import PhotoCache
_cache = None if not args.full else PhotoCache(2 << 30)


def loader(shuffle=False, seed=0, pad_to_full=True):
    return BatchLoader(train_ds, BS, shuffle=shuffle, seed=seed,
                       ignore_photos=not args.full, resize=resize,
                       pad_to_full=pad_to_full, photo_cache=_cache)


def run_ours():
    trainable, frozen = split_frozen(params0)
    tx = make_optimizer(WD)
    opt_state = tx.init(trainable)
    step = make_train_step(dims, tx, donate=False)
    eval_step = make_eval_step(dims)
    # dropout disabled (None rng): see module docstring
    drng = None if args.full else jax.random.PRNGKey(0)
    ours_mse = []
    for epoch in range(EPOCHS):
        lr = lr_at_epoch(LR, 0.99, epoch)
        for b in loader(shuffle=True, seed=epoch):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            trainable, opt_state, loss, _ = step(trainable, frozen, opt_state, b, lr, drng)
        mse = evaluate_mse(eval_step, trainable, frozen,
                           ({k: jnp.asarray(v) for k, v in bb.items()} for bb in loader()))
        ours_mse.append(mse)
        print(f"ours epoch {epoch}: train-set mse {mse:.4f}", flush=True)
    return ours_mse


def run_ref():
    # reference torch, same params0 and same batch order
    import tests.ref_oracle as ref_oracle
    ref_oracle.FAKE_VGG_IMG_SIZE = args.photo_size  # match our classifier sizing
    ref = import_reference_model()
    if not args.unpatched:
        patch_improved_rnn(ref)
    model = load_umpr(ref, params0,
                      RefConfig(review_net_only=not args.full, views=views))
    for m in model.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0  # see module docstring
    opt, sch = ref_oracle.make_reference_optimizer(model, LR, WD, 0.99)
    ref_mse = []
    for epoch in range(EPOCHS):
        model.train()
        for b in loader(shuffle=True, seed=epoch, pad_to_full=False):
            targs = batch_to_reference(b)
            _, loss = model(*targs)
            opt.zero_grad(); loss.backward(); opt.step()
        sch.step()
        ref_mse.append(ref_oracle.reference_dataset_mse(model, loader(pad_to_full=False)))
        print(f"ref  epoch {epoch}: train-set mse {ref_mse[-1]:.4f}", flush=True)
    return ref_mse


ours_mse = run_ours() if args.side in ("both", "ours") else None
ref_mse = run_ref() if args.side in ("both", "ref") else None

if args.side == "both":
    print("epoch  ours-mse  torch-ref-mse")
    for e in range(EPOCHS):
        print(f"{e:5d}  {ours_mse[e]:8.4f}  {ref_mse[e]:8.4f}")
    print(f"final: ours {ours_mse[-1]:.4f} vs reference {ref_mse[-1]:.4f} "
          f"(rel diff {abs(ours_mse[-1]-ref_mse[-1])/ref_mse[-1]*100:.1f}%)")

if args.out:
    record = {"side": args.side, "seed": args.seed, "epochs": EPOCHS,
              "batch": BS, "lr": LR, "full": args.full,
              "views": views if args.full else None,
              "photo_size": args.photo_size if args.full else None,
              "unpatched": args.unpatched, "n_samples": len(train_ds)}
    if ours_mse is not None:
        record["ours_mse"] = [float(x) for x in ours_mse]
    if ref_mse is not None:
        record["ref_mse"] = [float(x) for x in ref_mse]
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out}", flush=True)
