"""A/B the Pallas fused bias+relu+pool epilogue on the full-UMPR train step.

Measures ms/step at B=64 (width-fold ON: only block 2's pool is unfolded,
so the fused kernel serves one boundary) and at B=128 with the fold's
row-gate exceeded (blocks 1-2 both unfolded -> two fused boundaries).
VERDICT r3 #6: the last untried B=64 MFU lever.

    python tools/bench_fused_pool.py [--iters 15]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umpr_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def step_time(B, fused, iters, rounds=3):
    import jax
    import jax.numpy as jnp
    from umpr_tpu.models.umpr import ModelDims, init_umpr
    from umpr_tpu.train.optim import make_optimizer, split_frozen
    from umpr_tpu.train.step import make_train_step
    from tests.ref_oracle import random_batch

    dims = ModelDims(review_net_only=False, view_size=1, use_pallas=True,
                     photo_size=224, compute_dtype="bfloat16",
                     vgg_fused_pool=fused)
    rng = np.random.default_rng(0)
    params = init_umpr(jax.random.PRNGKey(0), dims,
                       rng.standard_normal((5000, 50)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    tx = make_optimizer(1e-3, "bfloat16")
    opt_state = tx.init(trainable)
    step = make_train_step(dims, tx)
    b = random_batch(np.random.default_rng(3), B=B, S=20, L=20, S_ui=5,
                     vocab=5000, emb=50, with_photos=True, img=224)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    key = jax.random.PRNGKey(0)
    trainable, opt_state, loss, _ = step(trainable, frozen, opt_state,
                                         b, 1e-6, key)
    float(loss)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            trainable, opt_state, loss, _ = step(trainable, frozen,
                                                 opt_state, b, 1e-6, key)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()
    import jax
    print("backend:", jax.default_backend())
    for B in (64, 128):
        for fused in (False, True):
            ms = step_time(B, fused, args.iters)
            print(f"B={B:4d} fused_pool={fused}: {ms:7.2f} ms/step "
                  f"({B / ms * 1e3:7.1f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
