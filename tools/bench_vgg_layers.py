"""Per-stage VGG16 timing on TPU: find which convs run below MXU peak.

Times each conv (with bias+relu), each pool, and each classifier matmul in
isolation at B=64 bf16, fwd and fwd+bwd, and prints achieved TFLOP/s per
stage.  Isolated numbers exclude cross-layer fusion but bound the intrinsic
conv efficiency.

Usage: python tools/bench_vgg_layers.py [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from umpr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from umpr_tpu.models.visual_net import VGG16_CFG

    B = args.batch
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    stages = []  # (name, fn, args, flops)
    h, in_ch = 224, 3
    for li, v in enumerate(VGG16_CFG):
        if v == "M":
            x = jnp.asarray(rng.standard_normal((B, h, h, in_ch)), dt)
            def pool(x):
                return jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            stages.append((f"pool@{h}x{in_ch}", pool, (x,), 0.0))
            h //= 2
            continue
        x = jnp.asarray(rng.standard_normal((B, h, h, in_ch)), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, in_ch, v)) * 0.05, dt)
        b = jnp.zeros((v,), dt)
        def conv(x, k, b):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.relu(y + b)
        flops = 2.0 * B * h * h * 9 * in_ch * v
        stages.append((f"conv{li}@{h} {in_ch}->{v}", conv, (x, k, b), flops))
        in_ch = v

    spatial = 224 // 32
    fcs = [(512 * spatial * spatial, 4096), (4096, 4096), (4096, 1000)]
    for i, (a, o) in enumerate(fcs):
        x = jnp.asarray(rng.standard_normal((B, a)) * 0.05, dt)
        w = jnp.asarray(rng.standard_normal((a, o)) * 0.01, dt)
        def fc(x, w):
            return x @ w
        stages.append((f"fc{i} {a}->{o}", fc, (x, w), 2.0 * B * a * o))

    def timeit(fn, iters):
        out = fn()
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / iters

    tot_f, tot_g = 0.0, 0.0
    for name, fn, fargs, flops in stages:
        jfn = jax.jit(lambda *a, _f=fn: jnp.sum(_f(*a).astype(jnp.float32)))
        gfn = jax.jit(jax.grad(lambda *a, _f=fn: jnp.sum(_f(*a).astype(jnp.float32)),
                               argnums=tuple(range(len(fargs)))))
        tf = timeit(lambda: jfn(*fargs), args.iters)
        tg = timeit(lambda: gfn(*fargs), args.iters)
        tot_f += tf; tot_g += tg
        eff_f = flops / tf / V5E_BF16_PEAK if flops else 0
        # grad graph re-does fwd + both transposed convs ~= 3x flops
        eff_g = 3 * flops / tg / V5E_BF16_PEAK if flops else 0
        print(f"{name:24s} fwd {tf*1e3:7.2f} ms ({eff_f:5.1%})   "
              f"fwd+bwd {tg*1e3:7.2f} ms ({eff_g:5.1%})")
    print(f"{'SUM':24s} fwd {tot_f*1e3:7.2f} ms            fwd+bwd {tot_g*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
