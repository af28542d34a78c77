"""Headline benchmark: UMPR-R train throughput, samples/sec/chip.

Matches the BASELINE.json metric: "train+eval samples/sec/chip on Amazon
Music small" with the >=10x PyTorch-CPU north star.  Shapes follow the
reference's Music-small defaults (batch 64, S=20 sentences x L=20 tokens
histories, S_ui=5, GloVe-50d, GRU 64); data is synthetic at those exact
shapes (the real corpus is not shipped in this environment).

Prints ONE json line:
  {"metric": ..., "value": <tpu samples/sec/chip>, "unit": "samples/sec",
   "vs_baseline": <tpu / pytorch-cpu ratio, target >= 10>}

Note: on this machine block_until_ready() does not block through the axon
relay, so completion is forced by reading back the (scalar) loss.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or ".")


def _enable_compile_cache():
    """Persistent XLA compilation cache: the full train step takes minutes
    to compile through this machine's remote-compile tunnel; repeat runs
    (e.g. the driver's) should hit the cache."""
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


_enable_compile_cache()

B, S, L, S_UI, EMB, VOCAB = 64, 20, 20, 5, 50, 5000
STEPS = 100        # train steps per cycle
EVAL_BATCHES = 20  # Music-small valid is ~1/10 of train; scaled to STEPS


def make_batch(rng):
    from tests.ref_oracle import random_batch
    return random_batch(rng, B=B, S=S, L=L, S_ui=S_UI, vocab=VOCAB, emb=EMB)


def bench_tpu(batch_np):
    """Train+eval cycle throughput at the reference cadence: STEPS train
    steps followed by an eval pass over EVAL_BATCHES validation batches
    (the reference evaluates every 500 train batches, main.py:43)."""
    import jax
    import jax.numpy as jnp
    from umpr_tpu.models.umpr import ModelDims, init_umpr
    from umpr_tpu.train.optim import make_optimizer, split_frozen
    from umpr_tpu.train.step import make_train_step, make_eval_step

    on_tpu = jax.default_backend() == "tpu"
    dims = ModelDims(review_net_only=True, use_pallas=on_tpu)
    rng = np.random.default_rng(0)
    params = init_umpr(jax.random.PRNGKey(0), dims,
                       rng.standard_normal((VOCAB, EMB)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    tx = make_optimizer(1e-3)
    opt_state = tx.init(trainable)
    step = make_train_step(dims, tx)
    eval_step = make_eval_step(dims)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)

    # warmup / compile both graphs
    trainable, opt_state, loss, _ = step(trainable, frozen, opt_state, batch, 1e-6, key)
    float(loss)
    sq, n = eval_step(trainable, frozen, batch)
    float(sq)

    best = 0.0
    for _ in range(2):  # two rounds; report the best (tunnel-stutter guard)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            trainable, opt_state, loss, _ = step(trainable, frozen, opt_state,
                                                 batch, 1e-6, key)
        for _ in range(EVAL_BATCHES):
            sq, n = eval_step(trainable, frozen, batch)
        float(loss) + float(sq)  # force completion of the whole chain
        samples = B * (STEPS + EVAL_BATCHES)
        best = max(best, samples / (time.perf_counter() - t0))
    return best


def bench_torch_cpu(batch_np, steps=3):
    """Reference-equivalent PyTorch-CPU training step on identical shapes,
    using the actual reference implementation from /root/reference."""
    import torch
    from tests.ref_oracle import (import_reference_model, load_umpr,
                                  batch_to_reference, RefConfig)
    from umpr_tpu.models.umpr import ModelDims, init_umpr
    import jax

    ref = import_reference_model()
    rng = np.random.default_rng(0)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(0), dims,
                       rng.standard_normal((VOCAB, EMB)).astype(np.float32))
    model = load_umpr(ref, params, RefConfig(review_net_only=True))
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-6, weight_decay=1e-3)
    args = batch_to_reference(batch_np)

    # warmup
    _, loss = model(*args)
    loss.backward()
    opt.step()

    evals = max(steps // 5, 1)  # same 5:1 train:eval mix as the TPU cycle
    best = 0.0
    for _ in range(2):  # best-of-2: this 1-vCPU host has 25%+ timing noise
        model.train()
        t0 = time.perf_counter()
        for _ in range(steps):
            opt.zero_grad()
            _, loss = model(*args)
            loss.backward()
            opt.step()
        model.eval()
        with torch.no_grad():
            for _ in range(evals):
                model(*args)
        best = max(best, B * (steps + evals) / (time.perf_counter() - t0))
    return best


def main():
    rng = np.random.default_rng(42)
    batch_np = make_batch(rng)
    tpu_sps = bench_tpu(batch_np)
    try:
        cpu_sps = bench_torch_cpu(batch_np)
    except Exception:
        cpu_sps = float("nan")
    print(json.dumps({
        "metric": "UMPR-R train+eval samples/sec/chip (Music-small shapes, B=64)",
        "value": round(tpu_sps, 1),
        "unit": "samples/sec",
        "vs_baseline": round(tpu_sps / cpu_sps, 2) if cpu_sps == cpu_sps else None,
    }))


if __name__ == "__main__":
    main()
