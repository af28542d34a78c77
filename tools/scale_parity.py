"""Matched-conditions MSE parity at Music-small scale (VERDICT r2 item #2).

Runs the full reference training protocol (reference main.py:16-61: B=64,
lr decay 0.99/epoch, Adam with no weight decay on biases, valid-MSE
eval -> save-best -> final test MSE on the best model) on a ~65k-review
corpus under MATCHED conditions across frameworks:

- same initial parameters (our init_umpr(seed) pushed into the torch
  reference via tests.ref_oracle.load_umpr);
- same batch membership and order every epoch (BatchLoader(shuffle=True,
  seed=epoch) on both sides);
- per-EPOCH valid-MSE checkpoints (the 500-batch cadence of the production
  trainers is per-step noise, not a protocol difference);
- no dropout anywhere (the UMPR-R path has none in either framework;
  in --full mode the VGG classifier's Dropout is disabled on BOTH sides
  -- unrelated RNG streams would otherwise turn a numerics comparison
  into noise, the tools/dynamics_parity.py convention).

``--full`` runs the complete multi-modal UMPR (ControlNet + VisualNet +
loss_v -- reference src/model.py:246-278) instead of UMPR-R: the
0.925538-row analogue of readme.md:100.  Needs a corpus with decodable
photos; photo_size < 224 is exact on both sides (the VGG adaptive pool
absorbs it) and keeps the torch oracle tractable on CPU.

The two sides run as separate processes because the torch-CPU side takes
hours on this host while ours takes minutes on one TPU chip:

    python tools/scale_parity.py --data_dir /tmp/rc65k \
        --glove /tmp/rc65k/glove.txt --side ours --out /tmp/sp_ours.json
    python tools/scale_parity.py --data_dir /tmp/rc65k \
        --glove /tmp/rc65k/glove.txt --side ref  --out /tmp/sp_ref.json

Each writes JSON: {"side", "seed", "epochs", "valid_mse": [...],
"best_epoch", "best_valid_mse", "test_mse"}.  Compare test_mse across the
two files; the BASELINE.json criterion is agreement within 1%.

Reference protocol being matched: /root/reference/main.py:16-61 (training
loop, save-best) and main.py:88-99 (test on best); reference defaults
/root/reference/config.py (batch_size 64, learning_rate via CLI,
lr_decay 0.99, l2_regularization 1e-3, epochs 20).
"""
import argparse
import json
import sys

sys.path.insert(0, ".")  # run from repo root

ap = argparse.ArgumentParser()
ap.add_argument("--data_dir", required=True)
ap.add_argument("--glove", required=True)
ap.add_argument("--side", choices=["ours", "ref"], required=True)
ap.add_argument("--out", required=True)
ap.add_argument("--epochs", type=int, default=20)
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--lr", type=float, default=0.003)
ap.add_argument("--seed", type=int, default=5)
ap.add_argument("--min_sent_count", type=int, default=5)
ap.add_argument("--full", action="store_true",
                help="full multi-modal UMPR (photos + ControlNet + "
                     "VisualNet + loss_v) instead of UMPR-R")
ap.add_argument("--views", default="['food','inside']")
ap.add_argument("--photo_size", type=int, default=32)
ap.add_argument("--cpu", action="store_true",
                help="force jax onto CPU even for --side ours")
args = ap.parse_args()

import jax

if args.side == "ref" or args.cpu:
    # the torch side must not touch the TPU relay (one device process at
    # a time on this host); init_umpr's threefry draws are bit-identical
    # across platforms, so params0 still matches the ours-side run
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU matmuls default to bf16 inputs; a cross-framework trajectory
    # comparison needs f32 (the tools/dynamics_parity.py --tpu
    # convention).  UMPR-R tolerates the default (round-3 65k run:
    # 0.016% final agreement) but full-UMPR's 20-conv VGG tower
    # accumulates bf16 rounding into a visibly different trajectory
    # (measured: epoch-0 valid 0.8483 default vs 0.8704 torch-f32 on
    # the yp5k corpus).
    jax.config.update("jax_default_matmul_precision", "highest")

import ast

import jax.numpy as jnp

from umpr_tpu.config import Config
from umpr_tpu.data.dataset import build_dataset
from umpr_tpu.data.images import PhotoCache
from umpr_tpu.data.loader import BatchLoader
from umpr_tpu.models.umpr import ModelDims, init_umpr
from umpr_tpu.text.vocab import Word2vec
from umpr_tpu.train.optim import lr_at_epoch, make_optimizer, split_frozen
from umpr_tpu.train.step import evaluate_mse, make_eval_step, make_train_step

views = ast.literal_eval(args.views)
cfg_args = ["--review_net_only", str(not args.full),
            "--min_sent_count", str(args.min_sent_count),
            "--batch_size", str(args.batch)]
if args.full:
    cfg_args += ["--views", args.views, "--photo_size", str(args.photo_size)]
cfg = Config(argv=cfg_args)
w2v = Word2vec(args.glove)
splits = {}
for name in ("train", "valid", "test"):
    splits[name] = build_dataset(f"{args.data_dir}/{name}.csv",
                                 f"{args.data_dir}/photos.json",
                                 f"{args.data_dir}/photos", w2v, cfg)
print(f"{args.side}: train {len(splits['train'])} valid {len(splits['valid'])} "
      f"test {len(splits['test'])}", flush=True)

dims = ModelDims(review_net_only=not args.full, view_size=len(views),
                 photo_size=args.photo_size)
params0 = init_umpr(jax.random.PRNGKey(args.seed), dims, w2v.embedding)
LR, WD, EPOCHS, BS = args.lr, cfg.l2_regularization, args.epochs, args.batch
resize = (args.photo_size, args.photo_size)
# one decode cache shared by every epoch's loaders (train/valid/test revisit
# the same JPEGs; in --full mode the torch oracle is already CPU-bound)
_cache = PhotoCache(2 << 30) if args.full else None


def loader(split, shuffle=False, seed=0, pad_to_full=True):
    return BatchLoader(splits[split], BS, shuffle=shuffle, seed=seed,
                       ignore_photos=not args.full, resize=resize,
                       pad_to_full=pad_to_full, photo_cache=_cache)


result = {"side": args.side, "seed": args.seed, "epochs": EPOCHS,
          "batch": BS, "lr": LR, "full": args.full,
          "views": views if args.full else None,
          "photo_size": args.photo_size if args.full else None,
          "valid_mse": []}

if args.side == "ours":
    trainable, frozen = split_frozen(params0)
    tx = make_optimizer(WD)
    opt_state = tx.init(trainable)
    step = make_train_step(dims, tx)
    eval_step = make_eval_step(dims)
    # UMPR-R has no dropout; full mode disables it on both sides (docstring)
    drng = None if args.full else jax.random.PRNGKey(0)
    best = (float("inf"), -1, None)
    for epoch in range(EPOCHS):
        lr = lr_at_epoch(LR, cfg.lr_decay, epoch)
        for b in loader("train", shuffle=True, seed=epoch):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            trainable, opt_state, loss, _ = step(trainable, frozen, opt_state,
                                                 b, lr, drng)
        mse = evaluate_mse(eval_step, trainable, frozen,
                           ({k: jnp.asarray(v) for k, v in bb.items()}
                            for bb in loader("valid")))
        result["valid_mse"].append(mse)
        if mse < best[0]:
            best = (mse, epoch, jax.device_get(trainable))
        print(f"ours epoch {epoch:2d}: valid mse {mse:.6f}"
              f"{'  (best)' if best[1] == epoch else ''}", flush=True)
    result["best_valid_mse"], result["best_epoch"] = best[0], best[1]
    best_trainable = jax.device_put(best[2])
    result["test_mse"] = evaluate_mse(
        eval_step, best_trainable, frozen,
        ({k: jnp.asarray(v) for k, v in bb.items()}
         for bb in loader("test")))
else:
    import copy

    import torch
    from torch import nn

    import tests.ref_oracle as ref_oracle
    from tests.ref_oracle import (RefConfig, batch_to_reference,
                                  import_reference_model, load_umpr,
                                  make_reference_optimizer,
                                  patch_improved_rnn, reference_dataset_mse)
    torch.manual_seed(0)  # inconsequential: all params come from params0
    ref_oracle.FAKE_VGG_IMG_SIZE = args.photo_size  # match our classifier sizing
    ref = import_reference_model()
    patch_improved_rnn(ref)
    model = load_umpr(ref, params0,
                      RefConfig(review_net_only=not args.full, views=views))
    for m in model.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0  # see module docstring
    opt, sch = make_reference_optimizer(model, LR, WD, cfg.lr_decay)

    def torch_mse(split):
        return reference_dataset_mse(model, loader(split, pad_to_full=False))

    best = (float("inf"), -1, None)
    for epoch in range(EPOCHS):
        model.train()
        for b in loader("train", shuffle=True, seed=epoch, pad_to_full=False):
            _, loss = model(*batch_to_reference(b))
            opt.zero_grad()
            loss.backward()
            opt.step()
        sch.step()
        mse = torch_mse("valid")
        result["valid_mse"].append(mse)
        if mse < best[0]:
            best = (mse, epoch, copy.deepcopy(model.state_dict()))
        print(f"ref  epoch {epoch:2d}: valid mse {mse:.6f}"
              f"{'  (best)' if best[1] == epoch else ''}", flush=True)
    result["best_valid_mse"], result["best_epoch"] = best[0], best[1]
    model.load_state_dict(best[2])
    result["test_mse"] = torch_mse("test")

print(f"{args.side}: best valid {result['best_valid_mse']:.6f} "
      f"(epoch {result['best_epoch']}), test mse {result['test_mse']:.6f}",
      flush=True)
with open(args.out, "w") as f:
    json.dump(result, f, indent=1)
print(f"wrote {args.out}", flush=True)
