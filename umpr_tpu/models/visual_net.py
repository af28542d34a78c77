"""Visual network: VGG16 feature extractor + per-view positive/negative
matching (paper eqs. 10-11).

Reference: src/model.py:201-229 uses torchvision's pretrained VGG16 with its
full 1000-logit classifier, fed /255 RGB images WITHOUT ImageNet mean/std
normalization (a reference quirk preserved by the data pipeline), and keeps
VGG16 *trainable* (no requires_grad_(False) in the reference).

TPU-first details:
- NHWC layout and lax.conv_general_dilated (XLA tiles these convs onto the
  MXU directly);
- pixels arrive as uint8 and are converted to float on device, fusing the
  /255 into the first conv's prologue;
- the flatten between features and classifier transposes to NCHW order so
  torchvision-pretrained weights can be loaded verbatim
  (tools/convert_vgg16.py).

Init parity: without a pretrained checkpoint, weights follow torchvision's
_initialize_weights (kaiming-normal fan_out for convs, N(0, 0.01) for
linears, zero biases).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from umpr_tpu.models.layers import init_linear, linear, randn

# VGG16 ("configuration D") feature layout: conv channel widths with 'M' max-pools.
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")
VGG_OUT = 1000


def init_vgg16(key, num_classes=VGG_OUT, img_size=224):
    params = {"features": [], "classifier": []}
    in_ch = 3
    for v in VGG16_CFG:
        if v == "M":
            continue
        key, k_w = jax.random.split(key)
        fan_out = v * 3 * 3
        params["features"].append({
            "kernel": jax.random.normal(k_w, (3, 3, in_ch, v), jnp.float32)
                      * math.sqrt(2.0 / fan_out),
            "bias": jnp.zeros((v,), jnp.float32),
        })
        in_ch = v
    spatial = img_size // 32  # five 2x2 pools
    dims = [(512 * spatial * spatial, 4096), (4096, 4096), (4096, num_classes)]
    for d_in, d_out in dims:
        key, k_w = jax.random.split(key)
        params["classifier"].append({
            "kernel": jax.random.normal(k_w, (d_in, d_out), jnp.float32) * 0.01,
            "bias": jnp.zeros((d_out,), jnp.float32),
        })
    return params


@jax.custom_vjp
def _bias_relu(x, b):
    return jax.nn.relu(x + b)


def _bias_relu_fwd(x, b):
    y = jax.nn.relu(x + b)
    # The barrier pins the saved residual to THIS buffer: without it, XLA's
    # fusion pass re-derives the backward's relu mask from the pre-activation
    # (y's producer), keeping pre-activation AND y live out of the conv
    # fusion -- a second full-tensor store on every pre-pool conv (~1.5 GB of
    # extra writes per B=128 step, measured via the xplane profile's
    # two-output broadcast_maximum fusions).
    return y, jax.lax.optimization_barrier(y)


def _bias_relu_bwd(y, g):
    gx = jnp.where(y > 0, g, jnp.zeros_like(g))
    db = jnp.sum(gx, axis=tuple(range(gx.ndim - 1)), dtype=jnp.float32)
    return gx, db.astype(g.dtype)


# The ReLU mask is recomputed from the OUTPUT (y > 0 == x + b > 0, and both
# give zero gradient at exactly 0), so autodiff keeps only y -- which the
# next conv stores for its dW anyway -- instead of y AND the pre-activation:
# at B=64/224px that is ~1.7 GB of bf16 conv activations per step that no
# longer round-trip HBM.
_bias_relu.defvjp(_bias_relu_fwd, _bias_relu_bwd)


def _maxpool2x2(x):
    # reduce_window + SelectAndScatter backward measured FASTER on v5e than
    # the reshape/reduce_max formulation (57.1 vs 61.1 ms VGG16 fwd+bwd at
    # B=64): XLA fuses the window select well, while reduce_max's
    # tie-splitting backward pays broadcast-compare + count-divide passes.
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1), padding="VALID")


# ---------------------------------------------------------------------------
# Width-folded block 1.
#
# TPU tiles put the minor (channel) dimension in 128-wide lanes; block-1
# tensors (C=64 at 224^2 -- the largest activations in the network) therefore
# waste HALF of every HBM tile and half the MXU lanes.  Profiling the B=64
# bf16 train step attributes ~20 ms of a 61 ms step to block-1 ops alone at
# ~15-20% efficiency.  Folding width pairs into channels ([B,H,W,C] ->
# [B,H,W/2,2C], a pure row-major reshape) makes block-1 tensors exactly
# 128-wide: full tiles, full lanes, half the HBM traffic.  The stride-1 SAME
# convs are computed on the folded layout with zero-embedded kernels
# ([3,3,C,C'] -> [3,3,2C,2C']): identical math (the embedded zeros contribute
# exact zeros), 2x nominal MACs at 2x lane utilization, so MXU time is
# unchanged while every read/write halves.  The 2x2 pool consumes the fold:
# an H-stride-2 window max plus a max over the two width phases, leaving the
# output naturally unfolded for block 2 (whose C>=128 tensors are already
# full-lane).
# ---------------------------------------------------------------------------

def _fold_w(x):
    """[B, H, W, C] -> [B, H, W//2, 2C]; channel block p holds width phase p
    (pure reshape: row-major (w, c) order is preserved)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def _fold_kernel(k):
    """[3, 3, ci, co] -> [3, 3, 2ci, 2co] zero-embedded so a stride-1 SAME
    conv on the W-folded layout computes the identical function.

    Output phase p corresponds to original column w = 2j + p; its 3-tap
    window maps to folded columns {j-1..j} (p=0) / {j..j+1} (p=1), expressed
    in one folded 3-tap kernel with zeros in the unused slots."""
    kh, kw, ci, co = k.shape
    assert kw == 3, "W-folding is specialized to 3-wide stride-1 SAME convs"
    z = jnp.zeros((kh, ci, co), k.dtype)

    def blk(a00, a01, a10, a11):
        # (input-phase, output-phase) blocks -> (kh, 2ci, 2co)
        return jnp.concatenate(
            [jnp.concatenate([a00, a01], axis=-1),
             jnp.concatenate([a10, a11], axis=-1)], axis=-2)

    f0 = blk(z, z, k[:, 0], z)                       # folded offset -1
    f1 = blk(k[:, 1], k[:, 0], k[:, 2], k[:, 1])     # folded offset 0
    f2 = blk(z, k[:, 2], z, z)                       # folded offset +1
    return jnp.stack([f0, f1, f2], axis=1)


@jax.custom_vjp
def _phase_max(a, b):
    return jnp.maximum(a, b)


def _phase_max_fwd(a, b):
    # jnp.maximum in the forward keeps NaN propagation identical to the
    # unfolded pool; the custom bwd replaces maximum's tie-splitting vjp
    # (an extra equality+divide pass over the 224^2 tensors; ~0.4 ms/step
    # end-to-end at B=64) with a plain mask that routes gradient ties to
    # the first width phase, like the select-and-scatter pool path does.
    return jnp.maximum(a, b), a >= b


def _phase_max_bwd(mask, g):
    z = jnp.zeros_like(g)
    return jnp.where(mask, g, z), jnp.where(mask, z, g)


_phase_max.defvjp(_phase_max_fwd, _phase_max_bwd)


def _maxpool2x2_folded(x):
    """2x2/2 pool on a W-folded tensor [B, H, W/2, 2C] -> [B, H/2, W/2, C].

    The width half of the pool is a max over the two phase channel blocks;
    the result is naturally unfolded."""
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 1, 1), window_strides=(1, 2, 1, 1), padding="VALID")
    C = x.shape[-1] // 2
    return _phase_max(x[..., :C], x[..., C:])


def _vgg_blocks():
    """VGG16_CFG split at its pools: each block = some convs + one 'M'."""
    blocks, cur = [], []
    for v in VGG16_CFG:
        cur.append(v)
        if v == "M":
            blocks.append(tuple(cur))
            cur = []
    assert not cur, "VGG16_CFG must end in a pool"
    return tuple(blocks)


def _vgg_block(x, bparams, cfg, folded, fused_pool=False):
    """One conv block.  `folded` (static) = x arrives W-folded; the block's
    closing pool consumes the fold (VGG16_CFG always pools before the first
    >64-channel conv, so folded convs are always 128-wide, 2C <= 128).

    fused_pool (static): close UNFOLDED large blocks (H >= 56, i.e. blocks
    1-2) with the Pallas fused bias+relu+pool kernel instead of the
    composite epilogue+reduce_window -- the block's last full-size tensor
    then never materializes post-bias and the autodiff residual halves
    (ops/pool_pallas.py)."""
    n_convs = sum(1 for v in cfg if v != "M")
    ci = 0
    for v in cfg:
        if v == "M":
            x = _maxpool2x2_folded(x) if folded else _maxpool2x2(x)
            folded = False
            continue
        p = bparams[ci]
        ci += 1
        assert not (folded and v > 64), "fold must not reach >64-channel convs"
        if folded:
            x = jax.lax.conv_general_dilated(
                x, _fold_kernel(p["kernel"]), window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = _bias_relu(x, jnp.concatenate([p["bias"], p["bias"]]))
            continue
        x = jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if (fused_pool and ci == n_convs and not folded
                and x.shape[1] >= 56 and x.shape[1] % 2 == 0):
            from umpr_tpu.ops.pool_pallas import fused_bias_relu_pool
            return fused_bias_relu_pool(x, p["bias"])
        x = _bias_relu(x, p["bias"])
    return x


def vgg16(params, images, train=False, dropout_rng=None, fold_w=True,
          fold_rows=64, remat=False, fused_pool=False):
    """images: (N, 224, 224, 3) float in [0,1] -> (N, 1000) logits.

    Dropout (p=0.5) is active in train mode exactly as torchvision's
    classifier does during reference training.  fold_w enables the
    width-folded block-1 layout (identical math, see _fold_kernel);
    fold_rows is the global-row gate threshold (64 x data-parallel device
    count: the measured crossover is per-DEVICE rows, but jit traces the
    global shape).  remat wraps each conv block in jax.checkpoint: only the
    post-pool block outputs (each 4x smaller than the block's interior) are
    saved for the backward, trading ~1 extra forward's conv FLOPs for the
    bulk of the activation footprint -- the standard TPU HBM/FLOPs trade
    for fitting larger per-chip batches.
    """
    x = images
    conv_idx = 0
    # Measured crossover (BENCH_DETAILS.md): folding wins at VGG batch
    # N<=64 per device (B=64/V=1: 63.0 -> 56.5 ms full step) but loses by
    # N=128 (97.6 -> 105.8 ms) -- with more rows XLA already tiles the C=64
    # convs well and the folded kernels' 2x nominal MACs turn into real MXU
    # time.
    folded = fold_w and x.shape[2] % 2 == 0 and x.shape[0] <= fold_rows
    if folded:
        x = _fold_w(x)
    for cfg in _vgg_blocks():
        n_convs = sum(1 for v in cfg if v != "M")
        bparams = params["features"][conv_idx:conv_idx + n_convs]
        conv_idx += n_convs
        block = _vgg_block
        if remat:
            block = jax.checkpoint(_vgg_block, static_argnums=(2, 3, 4))
        x = block(x, bparams, cfg, folded, fused_pool)
        folded = False
    # (N, 7, 7, 512) -> flatten in NCHW order for torch-weight compatibility
    n = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)

    for i, p in enumerate(params["classifier"]):
        x = linear(p, x)
        if i < 2:
            x = jax.nn.relu(x)
            if train and dropout_rng is not None:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 0.5, x.shape)
                x = jnp.where(keep, x / 0.5, 0.0)
    return x


def init_visual_net(key, view_size, vgg_out=VGG_OUT, img_size=224):
    ks = jax.random.split(key, 4)
    return {
        "vgg16": init_vgg16(ks[0], vgg_out, img_size),
        "pos_v_emb": randn(ks[1], (view_size, vgg_out)),  # torch.randn (model.py:208)
        "neg_v_emb": randn(ks[2], (view_size, vgg_out)),
        "linear": init_linear(ks[3], vgg_out, 1),
    }


def visual_net(p, images_u8, c_u, c_i, train=False, dropout_rng=None,
               fold_w=True, fold_rows=64, remat=False, fused_pool=False):
    """images_u8: (B, V, P, H, W, 3) uint8 -> matching scores (eq. 10-11).

    Reference: model.py:212-229.  Returns pos_match, neg_match, final_pos,
    final_neg, each (B, view_size).
    """
    B, V, P = images_u8.shape[:3]
    compute_dtype = p["linear"]["kernel"].dtype  # follows mixed-precision cast
    images = images_u8.reshape((B * V * P,) + images_u8.shape[3:])
    images = images.astype(compute_dtype) / 255.0  # on-device /255, NO mean/std norm
    img_repr = vgg16(p["vgg16"], images, train, dropout_rng, fold_w=fold_w,
                     fold_rows=fold_rows, remat=remat, fused_pool=fused_pool)
    img_repr = img_repr.reshape(B, V, P, -1).mean(axis=2)  # eq. 10

    img_emb = linear(p["linear"], img_repr)[..., 0]          # (B, V)
    pos_emb = linear(p["linear"], p["pos_v_emb"])[..., 0]    # (V,)
    neg_emb = linear(p["linear"], p["neg_v_emb"])[..., 0]
    pos_match = jnp.tanh(jnp.abs(pos_emb - img_emb))  # eq. 11
    neg_match = jnp.tanh(jnp.abs(neg_emb - img_emb))

    final_pos = c_u * c_i * (1.0 - pos_match)
    final_neg = c_u * c_i * (1.0 - neg_match)
    return pos_match, neg_match, final_pos, final_neg
