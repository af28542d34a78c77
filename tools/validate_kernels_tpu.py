"""On-REAL-TPU numerics validation of the Pallas kernels vs their XLA
reference paths (CI runs the same comparisons interpreted on CPU; this tool
re-checks them against actual Mosaic compilation on hardware).

Covers: the GRU kernels in every projection mode x dtype (values, full
parameter/input gradients, exact masked zeros) and the affinity-attention
kernels (whole-tile + column-tiled) vs the composite.  Exit code 0 iff every
check passes.  Results of the 2026-08-18 run are recorded in PARITY.md.

Usage: python tools/validate_kernels_tpu.py [--N 2560]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def check(name, val, bound):
    ok = val <= bound
    print(f"{'PASS' if ok else 'FAIL'}  {name}: {val:.3e} (bound {bound:g})")
    if not ok:
        FAILURES.append(name)


def validate_gru(N, L=20, E=50, H=64):
    import jax
    import jax.numpy as jnp
    from umpr_tpu.ops.gru import init_bigru, bigru_scan
    from umpr_tpu.ops.gru_pallas import bigru_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, L, E)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, size=N).astype(np.int32))
    params = init_bigru(jax.random.PRNGKey(0), E, H)
    dead = np.arange(L)[None, :, None] >= np.asarray(lengths)[:, None, None]

    def loss(fn, p_, x_):
        y = fn(p_, x_, lengths)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    for mode in ("fused", "stacked"):
        os.environ["UMPR_GRU_PROJ"] = mode
        jax.clear_caches()
        for dt, y_tol, g_tol in ((jnp.float32, 1e-5, 1e-3),
                                 (jnp.bfloat16, 5e-2, 5e-2)):
            p = jax.tree.map(lambda a: a.astype(dt), params)
            xx = x.astype(dt)
            # the exact-parity precision config: the scan's own default f32
            # matmuls are otherwise the LESS accurate side on TPU
            with jax.default_matmul_precision("highest" if dt == jnp.float32
                                              else "default"):
                y_p = bigru_pallas(p, xx, lengths)
                y_s = bigru_scan(p, xx, lengths)
                gp = jax.grad(lambda p_: loss(bigru_pallas, p_, xx))(p)
                gs = jax.grad(lambda p_: loss(bigru_scan, p_, xx))(p)
            name = f"gru {mode} {np.dtype(dt).name}"
            dy = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)
                                       - y_s.astype(jnp.float32))))
            check(f"{name} values", dy, y_tol)
            rel = max(
                float(np.linalg.norm(np.asarray(a, np.float32).ravel()
                                     - np.asarray(b, np.float32).ravel())
                      / (np.linalg.norm(np.asarray(b, np.float32)) + 1e-6))
                for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)))
            check(f"{name} grads (l2-rel)", rel, g_tol)
            mz = float(np.abs(np.asarray(y_p, np.float32) * dead).max())
            check(f"{name} masked-zero", mz, 0.0)
    os.environ.pop("UMPR_GRU_PROJ", None)


def validate_gru_split(N=2560, S=20, L=20, E=50, H=64):
    """The production review-net path since round 3: bigru_pallas_split's
    repack kernels emit BOTH consumer layouts; its VJP combines dys."""
    import jax
    import jax.numpy as jnp
    from umpr_tpu.ops.gru import init_bigru, bigru_scan
    from umpr_tpu.ops.gru_pallas import bigru_pallas_split

    rng = np.random.default_rng(2)
    N = max(S, (N // S) * S)  # split layout views (N, L, .) as (N/S, S*L, .)
    B2 = N // S
    x = jnp.asarray(rng.standard_normal((N, L, E)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, size=N).astype(np.int32))
    params = init_bigru(jax.random.PRNGKey(0), E, H)
    dead = np.arange(L)[None, :, None] >= np.asarray(lengths)[:, None, None]

    with jax.default_matmul_precision("highest"):
        y_ref = bigru_scan(params, x, lengths)
        pos, sent = bigru_pallas_split(params, x, lengths, S)

        def loss_split(p_):
            a, b = bigru_pallas_split(p_, x, lengths, S)
            return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(b))

        def loss_scan(p_):
            y = bigru_scan(p_, x, lengths)
            return (jnp.sum(jnp.sin(y.reshape(B2, S * L, 2 * H)))
                    + jnp.sum(jnp.cos(y)))

        gp = jax.grad(loss_split)(params)
        gs = jax.grad(loss_scan)(params)
    check("gru split sent values",
          float(jnp.max(jnp.abs(sent - y_ref))), 1e-5)
    check("gru split pos values",
          float(jnp.max(jnp.abs(pos - y_ref.reshape(B2, S * L, 2 * H)))), 1e-5)
    rel = max(
        float(np.linalg.norm(np.asarray(a, np.float32).ravel()
                             - np.asarray(b, np.float32).ravel())
              / (np.linalg.norm(np.asarray(b, np.float32)) + 1e-6))
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)))
    check("gru split grads (l2-rel)", rel, 1e-3)
    check("gru split masked-zero",
          float(np.abs(np.asarray(sent, np.float32) * dead).max()), 0.0)


def validate_attention(B=64, P=400, D=128):
    import jax
    import jax.numpy as jnp
    from umpr_tpu.ops.attention import affinity_attention_composite
    from umpr_tpu.ops.attention_pallas import (affinity_attention_pallas,
                                               affinity_attention_tiled)

    rng = np.random.default_rng(1)
    gu = jnp.asarray(rng.standard_normal((B, P, D)).astype(np.float32))
    gi = jnp.asarray(rng.standard_normal((B, P, D)).astype(np.float32))
    M = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)) * 0.05
    e = jnp.asarray((np.arange(P) < P - 7).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        ref = affinity_attention_composite(gu, gi, M, e)
        for name, fn in (("attn whole-tile", affinity_attention_pallas),
                         ("attn column-tiled", affinity_attention_tiled)):
            out = fn(gu, gi, M, e)
            d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(out, ref))
            check(f"{name} values", d, 2e-4)


def validate_fused_pool(N=8, H=112, W=112, C=128):
    import jax
    import jax.numpy as jnp
    from umpr_tpu.ops.pool_pallas import (fused_bias_relu_pool,
                                          reference_bias_relu_pool)

    rng = np.random.default_rng(2)
    for dt, y_tol, g_tol in ((jnp.float32, 0.0, 1e-5),
                             (jnp.bfloat16, 0.0, 5e-2)):
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), dt)
        b = jnp.asarray(rng.standard_normal(C) * 0.1, dt)
        g = jnp.asarray(rng.standard_normal((N, H // 2, W // 2, C)), dt)
        yp = fused_bias_relu_pool(x, b)
        yr = reference_bias_relu_pool(x, b)
        check(f"fused pool values {dt.__name__}",
              float(jnp.max(jnp.abs(yp.astype(jnp.float32)
                                    - yr.astype(jnp.float32)))), y_tol)

        def loss(fn):
            return lambda x_, b_: jnp.sum(
                fn(x_, b_).astype(jnp.float32) * g.astype(jnp.float32))

        dxf, dbf = jax.grad(loss(fused_bias_relu_pool), (0, 1))(x, b)
        dxr, dbr = jax.grad(loss(reference_bias_relu_pool), (0, 1))(x, b)
        check(f"fused pool dx {dt.__name__}",
              float(jnp.max(jnp.abs(dxf.astype(jnp.float32)
                                    - dxr.astype(jnp.float32)))), g_tol)
        # db: kernel accumulates f32; bf16 composite's own accumulation
        # error dominates the bound (see tests/test_pool_pallas.py)
        check(f"fused pool db l2-rel {dt.__name__}",
              float(np.linalg.norm(np.asarray(dbf, np.float32)
                                   - np.asarray(dbr, np.float32))
                    / (np.linalg.norm(np.asarray(dbr, np.float32)) + 1e-6)),
              max(g_tol, 1e-4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=2560)
    args = ap.parse_args()
    import jax
    print("backend:", jax.default_backend())
    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU; kernels will run interpreted "
              "(CI already covers that mode)")
    validate_gru(args.N)
    validate_gru_split(args.N)
    validate_attention()
    validate_fused_pool()
    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    print("\nall kernel validations passed")


if __name__ == "__main__":
    main()
