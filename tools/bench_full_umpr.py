"""Microbenchmark the full multi-modal UMPR step and its VGG16 hot spot.

The flagship config (reference src/model.py:201-229 is the FLOPs hot spot,
SURVEY.md §3): B=64, 224px photos, V=P=1, bf16 compute.  Reports ms/step,
samples/sec, achieved TFLOP/s and MFU vs the v5e bf16 peak, for:

  - full UMPR train step (fwd+bwd+adam)
  - VGG16 alone, fwd and fwd+bwd
  - full UMPR minus photos (text nets only) for attribution

Timings sync via scalar readback (block_until_ready is a no-op through this
machine's TPU relay; NOTES.md).

Usage:  python tools/bench_full_umpr.py [--batch 64] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12  # TFLOP/s, one v5e chip


def enable_cache():
    import jax
    from umpr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()


def vgg16_flops(img=224, batch=1, train=True):
    """Analytic conv+fc FLOPs (2*MACs); train counts fwd + 2x bwd (dW & dx),
    minus the first conv's dx (images are not differentiated)."""
    from umpr_tpu.models.visual_net import VGG16_CFG
    h = img
    in_ch = 3
    fwd = 0.0
    first_conv = None
    for v in VGG16_CFG:
        if v == "M":
            h //= 2
            continue
        f = 2.0 * h * h * 9 * in_ch * v
        if first_conv is None:
            first_conv = f
        fwd += f
        in_ch = v
    spatial = img // 32
    fc = [(512 * spatial * spatial, 4096), (4096, 4096), (4096, 1000)]
    fwd += sum(2.0 * a * b for a, b in fc)
    if not train:
        return fwd * batch
    return (3.0 * fwd - first_conv) * batch


def timeit(fn, sync, iters=20, rounds=3):
    fn(); sync()  # warm
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--photo_size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--donate", action="store_true",
                    help="donate params/opt state (the real trainer does)")
    ap.add_argument("--moment_dtype", default="float32",
                    help="Adam m/v storage dtype (float32 | bfloat16)")
    ap.add_argument("--factored_nu", action="store_true",
                    help="Adafactor-style factored second moment")
    ap.add_argument("--no_fold", action="store_true",
                    help="disable the width-folded VGG block 1")
    ap.add_argument("--only", default="", help="comma list: step,vgg,text")
    args = ap.parse_args()

    enable_cache()
    import jax
    import jax.numpy as jnp
    from umpr_tpu.models.umpr import ModelDims, init_umpr, umpr_forward
    from umpr_tpu.models.visual_net import init_vgg16, vgg16
    from umpr_tpu.train.optim import make_optimizer, split_frozen
    from umpr_tpu.train.step import make_train_step
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_batch

    B, IMG = args.batch, args.photo_size
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} B={B} img={IMG} dtype={args.dtype}")
    only = set(args.only.split(",")) if args.only else None

    dims = ModelDims(review_net_only=False, view_size=1, use_pallas=on_tpu,
                     photo_size=IMG, compute_dtype=args.dtype,
                     vgg_fold_w=not args.no_fold)
    rng = np.random.default_rng(0)
    # Music-small text shapes (S=20, L=20, S_ui=5), real photo size.
    batch = _tiny_batch(rng, B=B, S=20, L=20, S_ui=5, V=1, P=1, img=IMG)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_umpr(jax.random.PRNGKey(0), dims,
                       rng.standard_normal((5000, 50)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    tx = make_optimizer(1e-3, args.moment_dtype, args.factored_nu)
    opt_state = tx.init(trainable)
    key = jax.random.PRNGKey(0)

    step_flops = vgg16_flops(IMG, B, train=True)  # VGG dominates; text nets ~1%

    if only is None or "step" in only:
        step = make_train_step(dims, tx, donate=args.donate)
        state = {"t": trainable, "o": opt_state}
        def run_step():
            state["t"], state["o"], loss, _ = step(state["t"], frozen, state["o"],
                                                   batch, 1e-6, key)
            return loss
        dt = timeit(run_step, lambda *a: float(a[0]) if a else float(run_step()),
                    iters=args.iters)
        print(f"full UMPR train step: {dt*1e3:.2f} ms  {B/dt:.0f} samples/s  "
              f"{step_flops/dt/1e12:.1f} TFLOP/s  MFU={step_flops/dt/V5E_BF16_PEAK:.1%}")

    if only is None or "text" in only:
        dims_t = ModelDims(review_net_only=False, view_size=1, use_pallas=on_tpu,
                           photo_size=IMG, compute_dtype=args.dtype)
        def loss_text(tr):
            from umpr_tpu.train.optim import merge_params
            p = merge_params(tr, frozen)
            # text-only attribution: control net + review net, skip visual
            from umpr_tpu.models.review_net import review_net
            from umpr_tpu.models.control_net import control_net
            from umpr_tpu.ops import masking
            u_tok, i_tok, ui_tok = batch["u_tokens"], batch["i_tokens"], batch["ui_tokens"]
            dtype = jnp.dtype(dims_t.compute_dtype)
            pc = jax.tree.map(lambda x: x.astype(dtype)
                              if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
            emb = pc["embedding"]
            Sb = masking.batch_max_count(batch["u_counts"], batch["i_counts"])
            Lb = masking.batch_max_length(batch["u_lengths"], batch["i_lengths"])
            exists = masking.exists_mask(Sb, Lb, u_tok.shape[1], u_tok.shape[2])
            ui_exists = masking.exists_mask(batch["ui_counts"].max(),
                                            batch["ui_lengths"].max(),
                                            ui_tok.shape[1], ui_tok.shape[2])
            both_emb = emb[jnp.concatenate([u_tok, i_tok], axis=0)]
            rn = review_net(pc["review_net"], both_emb,
                            batch["u_lengths"], batch["i_lengths"], exists,
                            dims_t.use_pallas, attention_pallas=False)
            c_u, c_i, pp, pn = control_net(
                pc["control_net"], both_emb, emb[ui_tok],
                batch["u_lengths"], batch["i_lengths"], batch["ui_lengths"],
                exists, ui_exists, dims_t.threshold, dims_t.use_pallas)
            return (jnp.sum(rn.astype(jnp.float32) ** 2)
                    + jnp.sum(c_u.astype(jnp.float32)) + jnp.sum(pp))
        g_text = jax.jit(jax.grad(loss_text))
        def run_text():
            return g_text(trainable)
        dt = timeit(run_text, lambda *a: float(jax.tree.leaves(
            a[0] if a else run_text())[0].ravel()[0]), iters=args.iters)
        print(f"text nets fwd+bwd:    {dt*1e3:.2f} ms")

    if only is None or "vgg" in only:
        dtype = jnp.dtype(args.dtype)
        vp = init_vgg16(jax.random.PRNGKey(1), img_size=IMG)
        vp = jax.tree.map(lambda x: x.astype(dtype), vp)
        imgs = jnp.asarray(rng.integers(0, 256, (B, IMG, IMG, 3)).astype(np.uint8))

        @jax.jit
        def vfwd(vp):
            x = imgs.astype(dtype) / 255.0
            return jnp.sum(vgg16(vp, x, fold_w=not args.no_fold)
                           .astype(jnp.float32))
        fwd_flops = vgg16_flops(IMG, B, train=False)
        dt = timeit(lambda: vfwd(vp), lambda *a: float(a[0]) if a else None,
                    iters=args.iters)
        print(f"VGG16 fwd:            {dt*1e3:.2f} ms  "
              f"{fwd_flops/dt/1e12:.1f} TFLOP/s  MFU={fwd_flops/dt/V5E_BF16_PEAK:.1%}")

        vgrad = jax.jit(jax.value_and_grad(vfwd))
        def run_g():
            v, g = vgrad(vp)
            return v
        dt = timeit(run_g, lambda *a: float(a[0]) if a else float(run_g()),
                    iters=args.iters)
        print(f"VGG16 fwd+bwd:        {dt*1e3:.2f} ms  "
              f"{step_flops/dt/1e12:.1f} TFLOP/s  MFU={step_flops/dt/V5E_BF16_PEAK:.1%}")


if __name__ == "__main__":
    main()
