"""Training-dynamics parity: our framework vs the reference torch code,
same data, same init, same hyperparameters, per-epoch MSE trajectory.

Usage (from the repo root; make a corpus first with
tools/make_synthetic_corpus.py + umpr_tpu.text.preprocess):

    python tools/dynamics_parity.py --data_dir /tmp/corpus \
        --glove /tmp/corpus/glove.txt [--epochs 6] [--batch 64] [--seed 2]

Round-1 result (2,400-sample corpus, B=64, seed 2): per-epoch MSE identical
to 4 decimals for all 6 epochs (see PARITY.md).  NOTE: ~50% of seeds are
dead at birth through the reference's ReLU head -- pick one whose initial
predictions are alive (seed 2 on the round-1 corpora).
"""
import argparse, sys, types, numpy as np
sys.path.insert(0, ".")  # run from repo root
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, torch
from umpr_tpu.config import Config
from umpr_tpu.text.vocab import Word2vec
from umpr_tpu.data.dataset import build_dataset
from umpr_tpu.data.loader import BatchLoader
from umpr_tpu.models.umpr import ModelDims, init_umpr
from umpr_tpu.train.optim import make_optimizer, split_frozen, lr_at_epoch
from umpr_tpu.train.step import make_train_step, make_eval_step, evaluate_mse
from tests.ref_oracle import import_reference_model, patch_improved_rnn, load_umpr, batch_to_reference, RefConfig

ap = argparse.ArgumentParser()
ap.add_argument("--data_dir", required=True)
ap.add_argument("--glove", required=True)
ap.add_argument("--epochs", type=int, default=6)
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--lr", type=float, default=0.003)
ap.add_argument("--seed", type=int, default=2)
ap.add_argument("--min_sent_count", type=int, default=5)
args = ap.parse_args()

cfg = Config(argv=["--min_sent_count", str(args.min_sent_count),
                   "--review_net_only", "True"])
w2v = Word2vec(args.glove)
train_ds = build_dataset(f"{args.data_dir}/train.csv",
                         f"{args.data_dir}/photos.json",
                         f"{args.data_dir}/photos", w2v, cfg)
print(f"{len(train_ds)} samples")
dims = ModelDims(review_net_only=True)
params0 = init_umpr(jax.random.PRNGKey(args.seed), dims, w2v.embedding)

LR, WD, EPOCHS, BS = args.lr, 1e-3, args.epochs, args.batch
# ---- ours ----
trainable, frozen = split_frozen(params0)
tx = make_optimizer(WD)
opt_state = tx.init(trainable)
step = make_train_step(dims, tx, donate=False)
eval_step = make_eval_step(dims)
ours_mse = []
for epoch in range(EPOCHS):
    lr = lr_at_epoch(LR, 0.99, epoch)
    loader = BatchLoader(train_ds, BS, shuffle=True, seed=epoch)
    for b in loader:
        b = {k: jnp.asarray(v) for k, v in b.items()}
        trainable, opt_state, loss, _ = step(trainable, frozen, opt_state, b, lr, jax.random.PRNGKey(0))
    mse = evaluate_mse(eval_step, trainable, frozen,
                       ({k: jnp.asarray(v) for k, v in bb.items()} for bb in BatchLoader(train_ds, BS)))
    ours_mse.append(mse)

# ---- reference torch, same params0 and same batch order ----
ref = import_reference_model(); patch_improved_rnn(ref)
model = load_umpr(ref, params0, RefConfig(review_net_only=True))
opt = torch.optim.Adam([
    {"params": [p for n,p in model.named_parameters() if "bias" not in n and p.requires_grad]},
    {"params": [p for n,p in model.named_parameters() if "bias" in n and p.requires_grad], "weight_decay": 0.0},
], LR, weight_decay=WD)
sch = torch.optim.lr_scheduler.ExponentialLR(opt, 0.99)
ref_mse = []
for epoch in range(EPOCHS):
    model.train()
    loader = BatchLoader(train_ds, BS, shuffle=True, seed=epoch, pad_to_full=False)
    for b in loader:
        args = batch_to_reference(b)
        _, loss = model(*args)
        opt.zero_grad(); loss.backward(); opt.step()
    sch.step()
    model.eval(); tot, cnt = 0.0, 0
    with torch.no_grad():
        for b in BatchLoader(train_ds, BS, pad_to_full=False):
            pred, _ = model(*batch_to_reference(b))
            tot += float(((pred - torch.tensor(b["ratings"]))**2).sum()); cnt += len(b["ratings"])
    ref_mse.append(tot/cnt)

print("epoch  ours-mse  torch-ref-mse")
for e in range(EPOCHS):
    print(f"{e:5d}  {ours_mse[e]:8.4f}  {ref_mse[e]:8.4f}")
print(f"final: ours {ours_mse[-1]:.4f} vs reference {ref_mse[-1]:.4f} "
      f"(rel diff {abs(ours_mse[-1]-ref_mse[-1])/ref_mse[-1]*100:.1f}%)")
