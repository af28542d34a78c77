"""Micro-benchmarks for the Pallas kernels vs their XLA composite paths.

Shapes follow the Music-small review-net call: N = 2*B*S = 2560 GRU rows of
L=20 tokens (E=50 -> H=64), and the affinity attention at B=64, P=S*L=400.

Usage: python tools/bench_kernels.py [--iters 30] [--which gru,attn]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, iters, rounds=3):
    sync(fn())
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--which", default="gru,attn")
    ap.add_argument("--N", type=int, default=2560)
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--P", type=int, default=400)
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--impls", default="",
                    help="comma list of attn impls: pallas,xla,tiled")
    ap.add_argument("--L", type=int, default=20)
    ap.add_argument("--E", type=int, default=50)
    ap.add_argument("--H", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from umpr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    def sync_scalar(x):
        return float(jax.tree.leaves(x)[0].ravel()[0])

    which = set(args.which.split(","))

    if "gru" in which:
        from umpr_tpu.ops.gru import init_bigru, bigru_scan
        from umpr_tpu.ops.gru_pallas import bigru_pallas
        N, L, E, H = args.N, args.L, args.E, args.H
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((N, L, E)), jnp.float32)
        lengths = jnp.asarray(rng.integers(1, L + 1, size=N), jnp.int32)
        params = init_bigru(jax.random.PRNGKey(0), E, H)

        for dt, name in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
            xd = x.astype(dt)
            pd = jax.tree.map(lambda a: a.astype(dt), params)
            for fn, label in ((bigru_pallas, "pallas"), (bigru_scan, "scan  ")):
                fwd = jax.jit(lambda p, xx, _f=fn: jnp.sum(
                    _f(p, xx, lengths).astype(jnp.float32)))
                g = jax.jit(jax.grad(lambda p, xx, _f=fn: jnp.sum(
                    _f(p, xx, lengths).astype(jnp.float32) ** 2), argnums=(0, 1)))
                tf = timeit(lambda: fwd(pd, xd), sync_scalar, args.iters)
                tg = timeit(lambda: g(pd, xd), sync_scalar, args.iters)
                print(f"gru {label} {name} N={N}: fwd {tf*1e3:6.2f} ms   "
                      f"fwd+bwd {tg*1e3:6.2f} ms")

    if "attn" in which:
        from umpr_tpu.ops.attention import affinity_attention
        B, P, D = args.B, args.P, 2 * args.H
        rng = np.random.default_rng(1)
        gu = jnp.asarray(rng.standard_normal((B, P, D)), jnp.float32)
        gi = jnp.asarray(rng.standard_normal((B, P, D)), jnp.float32)
        M = jnp.asarray(rng.standard_normal((D, D)), jnp.float32)
        e = jnp.asarray((np.arange(P) < int(P * 0.9)).astype(np.float32))

        from umpr_tpu.ops.attention import affinity_attention_composite
        from umpr_tpu.ops.attention_pallas import affinity_attention_tiled
        impls = {
            "pallas": lambda *a: affinity_attention(*a, use_pallas=True),
            # un-routed composite: affinity_attention would auto-route to
            # the tiled kernel above the memory threshold, making the
            # comparison measure the same kernel twice
            "xla   ": affinity_attention_composite,
            "tiled ": affinity_attention_tiled,
        }
        which_impls = (args.impls.split(",") if args.impls
                       else ["pallas", "xla   "])
        dts = {"f32": (jnp.float32, "f32 "), "bf16": (jnp.bfloat16, "bf16")}
        for dt, name in (dts[k] for k in args.dtypes.split(",")):
            for label in which_impls:
                impl = impls[label.ljust(6)]
                def loss(gu_, gi_, M_):
                    su, si, au, ai = impl(
                        gu_.astype(dt), gi_.astype(dt), M_.astype(dt), e)
                    return (jnp.sum(au.astype(jnp.float32) ** 2)
                            + jnp.sum(ai.astype(jnp.float32) ** 2)
                            + jnp.sum(su.astype(jnp.float32))
                            + jnp.sum(si.astype(jnp.float32)))
                fwd = jax.jit(loss)
                g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
                tf = timeit(lambda: fwd(gu, gi, M), sync_scalar, args.iters)
                tg = timeit(lambda: g(gu, gi, M), sync_scalar, args.iters)
                print(f"attn {label} {name} B={B} P={P}: fwd {tf*1e3:6.2f} ms   "
                      f"fwd+bwd {tg*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
