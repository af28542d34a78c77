"""Fused bias + ReLU + 2x2/2 max-pool Pallas kernel for the VGG pool
boundaries (reference: torchvision VGG16 features, consumed at
src/model.py:204-207).

Why a kernel: at the pool boundaries of VGG blocks 1-2 the composite path
is  conv -(epilogue-fused bias+relu)-> y (full 224^2/112^2 tensor, HBM)
-> reduce_window max -> y/4,  and the backward reads y AGAIN through
SelectAndScatter plus keeps y as the ReLU-mask residual.  The full-size
tensor y therefore round-trips HBM three times beyond the conv itself and
is pinned as an autodiff residual (at B=128/224px block 1's y alone is
~822 MB of bf16).  This kernel consumes the conv's raw output once:

    fwd: read x, write pooled y_p (1/4) + window-argmax idx (1/4, bf16)
    bwd: read dy_p + idx + y_p, write dx (scattered) and accumulate db

so the full-size tensor is never materialized post-bias at all, the
autodiff residual shrinks from T to T/2 (y_p + idx), and the backward's
full-size traffic drops from ~3T to ~1.5T.

Numerics: identical to relu(x + b) -> max-pool (max and relu commute; the
same input dtype is used throughout).  Gradient ties inside a window route
to the first position in (2h, 2w), (2h, 2w+1), (2h+1, 2w), (2h+1, 2w+1)
order -- the same first-match convention as XLA's SelectAndScatter -- and
positions whose pooled output is exactly 0 get no gradient (the ReLU mask,
matching ops/visual_net._bias_relu_bwd's y > 0 rule).

The folded block-1 layout (visual_net._fold_w) keeps its own composite
pool; this kernel serves the UNFOLDED pools: block 2 always, and blocks
1-2 in the unfolded configurations (B > fold_rows, e.g. the B=128
throughput mode).  Deep blocks (H <= 28) are too small to matter and keep
the composite path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def _h_tile(H2, W, C, itemsize):
    """Rows of pooled output per grid step: the largest divisor of H2
    (112/56/28/14/7 in VGG) whose working set fits scoped VMEM.  The block
    itself is 2d*W*C elements, but the corner split + masks keep ~9 block
    copies live (measured: hT=16 at W=112/C=128 f32 wanted 16.25 MB), so
    budget 11 MB across 9 copies."""
    itemsize = max(itemsize, 4)  # the kernel interior runs in f32
    # lanes are 128-wide: C < 128 tiles are padded to 128 in VMEM (measured:
    # hT=8 at W=224/C=64 allocated 16.42 MB -- 2x the unpadded model)
    c_pad = -(-C // 128) * 128
    for d in (16, 14, 8, 7, 4, 2, 1):
        if H2 % d == 0 and 2 * d * W * c_pad * itemsize * 9 <= (11 << 20):
            return d
    return 1


def _fwd_kernel(x_ref, b_ref, yp_ref, idx_ref):
    # x: (1, 2hT, W, C) raw conv output; b: (1, C)
    x = x_ref[0]
    # the add rounds in the INPUT dtype (matches the composite epilogue);
    # everything after max/compare runs in f32 -- exact for bf16 values,
    # and f32 comparisons sidestep a Mosaic bf16-mask relayout bug
    y = jnp.maximum(x + b_ref[0][None, None, :], 0).astype(jnp.float32)
    two_h, W, C = y.shape
    # window corners via reshape + STATIC indexing (strided slices on >2-D
    # arrays lower to gathers Mosaic rejects; static indexes are lax.slice)
    y4 = y.reshape(two_h // 2, 2, W // 2, 2, C)
    v0, v1 = y4[:, 0, :, 0], y4[:, 0, :, 1]   # (hT, W/2, C) top corners
    v2, v3 = y4[:, 1, :, 0], y4[:, 1, :, 1]   # bottom corners
    yp = jnp.maximum(jnp.maximum(v0, v1), jnp.maximum(v2, v3))
    # first-match argmax in window order 0..3 (ties -> lowest index)
    idx = jnp.where(
        v0 >= yp, 0.0,
        jnp.where(v1 >= yp, 1.0, jnp.where(v2 >= yp, 2.0, 3.0)))
    yp_ref[0] = yp.astype(yp_ref.dtype)
    idx_ref[0] = idx.astype(jnp.bfloat16)


def _bwd_kernel(dyp_ref, idx_ref, yp_ref, dx_ref, db_ref, db_acc):
    h = pl.program_id(0)
    n = pl.program_id(1)

    @pl.when(jnp.logical_and(h == 0, n == 0))
    def _():
        db_acc[:] = jnp.zeros_like(db_acc)

    # all-f32 interior: f32 comparisons sidestep the Mosaic bf16-mask
    # relayout bug (see _fwd_kernel); dx casts back on the final store
    dyp = dyp_ref[0].astype(jnp.float32)
    idx = idx_ref[0].astype(jnp.float32)
    yp = yp_ref[0].astype(jnp.float32)
    g = jnp.where(yp > 0, dyp, jnp.zeros_like(dyp))  # ReLU mask
    parts = [jnp.where(idx == p, g, jnp.zeros_like(g)) for p in range(4)]
    hT, W2, C = g.shape
    # scatter to window corners: (hT, 2, W/2, 2, C) -> (2hT, W, C); stacks
    # lower to concatenate (no gather), reshape merges the phase axes
    dx = jnp.stack(
        [jnp.stack([parts[0], parts[1]], axis=2),
         jnp.stack([parts[2], parts[3]], axis=2)],
        axis=1).reshape(2 * hT, 2 * W2, C)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    db_acc[:] += jnp.sum(g, axis=(0, 1), dtype=jnp.float32)

    @pl.when(jnp.logical_and(h == pl.num_programs(0) - 1,
                             n == pl.num_programs(1) - 1))
    def _():
        db_ref[:] = db_acc[:]


def _forward(x, b):
    N, H, W, C = x.shape
    H2, W2 = H // 2, W // 2
    hT = _h_tile(H2, W, C, x.dtype.itemsize)
    x_spec = pl.BlockSpec((1, 2 * hT, W, C), lambda h, n: (n, h, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, C), lambda h, n: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, hT, W2, C), lambda h, n: (n, h, 0, 0),
                            memory_space=pltpu.VMEM)
    yp, idx = pl.pallas_call(
        _fwd_kernel,
        grid=(H2 // hT, N),
        in_specs=[x_spec, b_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((N, H2, W2, C), x.dtype),
                   jax.ShapeDtypeStruct((N, H2, W2, C), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=5 * N * H * W * C,
            bytes_accessed=x.size * x.dtype.itemsize
            + N * H2 * W2 * C * (x.dtype.itemsize + 2),
            transcendentals=0),
        interpret=_interpret(),
    )(x, b.reshape(1, C))
    return yp, idx


def _backward(dyp, idx, yp, x_dtype):
    N, H2, W2, C = dyp.shape
    hT = _h_tile(H2, 2 * W2, C, dyp.dtype.itemsize)
    small = pl.BlockSpec((1, hT, W2, C), lambda h, n: (n, h, 0, 0),
                         memory_space=pltpu.VMEM)
    dx_spec = pl.BlockSpec((1, 2 * hT, 2 * W2, C), lambda h, n: (n, h, 0, 0),
                           memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((C,), lambda h, n: (0,), memory_space=pltpu.VMEM)
    dx, db = pl.pallas_call(
        _bwd_kernel,
        grid=(H2 // hT, N),
        in_specs=[small, small, small],
        out_specs=[dx_spec, db_spec],
        out_shape=[jax.ShapeDtypeStruct((N, 2 * H2, 2 * W2, C), x_dtype),
                   jax.ShapeDtypeStruct((C,), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((C,), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * N * H2 * W2 * C,
            bytes_accessed=3 * N * H2 * W2 * C * 2
            + N * 4 * H2 * W2 * C * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(dyp, idx, yp)
    return dx, db


@jax.custom_vjp
def fused_bias_relu_pool(x, b):
    """relu(x + b) -> 2x2/2 max-pool, in one pass over x.

    x: (N, H, W, C) raw conv output (pre-bias); b: (C,).
    Returns (N, H/2, W/2, C)."""
    yp, _ = _forward(x, b)
    return yp


def _vjp_fwd(x, b):
    yp, idx = _forward(x, b)
    return yp, (yp, idx)


def _vjp_bwd(res, dyp):
    yp, idx = res
    # x and yp share a dtype (the forward is dtype-preserving)
    dx, db = _backward(dyp, idx, yp, yp.dtype)
    return dx, db.astype(dyp.dtype)


fused_bias_relu_pool.defvjp(_vjp_fwd, _vjp_bwd)


def reference_bias_relu_pool(x, b):
    """Composite oracle: the exact op sequence the fused kernel replaces
    (visual_net._bias_relu + _maxpool2x2)."""
    y = jax.nn.relu(x + b)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID")
