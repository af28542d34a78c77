"""UMPR top model: embedding -> ReviewNet [-> ControlNet + VisualNet] ->
fusion -> prediction + loss.

Math parity with reference src/model.py:232-278, including:
- the GloVe embedding table is FROZEN (from_pretrained default freeze,
  model.py:237) -- enforced by the optimizer mask, not here;
- ReLU on the final prediction (model.py:243,254);
- the auxiliary visual loss is the mean of the full (V, V) cross-batch
  matmul prefer^T @ match (model.py:276) -- it SUMS over the batch inside
  the contraction, so it scales with batch size; dead padded samples are
  zeroed out of `prefer` so static batches reproduce the reference's
  smaller final batch exactly;
- total loss = mse + loss_v_rate * loss_v (model.py:277).

The train/eval MSE is a mask-weighted mean, equal to the reference's
reduction='mean' over the real samples of the batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from umpr_tpu.models.layers import init_linear, linear
from umpr_tpu.models.review_net import init_review_net, review_net
from umpr_tpu.models.control_net import init_control_net, control_net
from umpr_tpu.models.visual_net import init_visual_net, visual_net
from umpr_tpu.ops import masking


@dataclass(frozen=True)
class ModelDims:
    """Static model configuration (hashable; safe to close over under jit)."""
    emb_size: int = 50
    gru_size: int = 64
    self_atte_size: int = 64
    kernel_count: int = 120
    kernel_size: int = 3
    threshold: float = 0.35
    view_size: int = 1
    loss_v_rate: float = 0.1
    review_net_only: bool = False
    use_pallas: bool = False
    photo_size: int = 224  # photo edge length (VGG16 classifier input size
                           # depends on it; must be a multiple of 32)
    compute_dtype: str = "float32"  # 'bfloat16' halves MXU time + HBM traffic;
                                    # params stay f32 (mixed precision)
    vgg_fold_w: bool = True  # width-folded VGG block 1 (identical math;
                             # fills the 128-lane tiles that C=64 half-wastes)
    remat_vgg: bool = False  # jax.checkpoint each VGG conv block: save only
                             # post-pool block outputs for the backward,
                             # trading recompute FLOPs for activation HBM
    vgg_fused_pool: bool = False  # Pallas fused bias+relu+pool at the
                                  # unfolded large pool boundaries (blocks
                                  # 1-2): the block's last full-size tensor
                                  # never materializes post-bias
                                  # (ops/pool_pallas.py)
    n_data_devices: int = 1  # devices the batch is sharded over ('dp' mesh
                             # axis).  The fold's measured win/loss crossover
                             # is PER-DEVICE rows (<=64), but under GSPMD jit
                             # the traced shape is global, so the gate scales
                             # its threshold by this count.

    @classmethod
    def from_config(cls, config, use_pallas=None, n_data_devices=1):
        return cls(
            n_data_devices=n_data_devices,
            compute_dtype=config.compute_dtype,
            gru_size=config.gru_size,
            self_atte_size=config.self_atte_size,
            kernel_count=config.kernel_count,
            kernel_size=config.kernel_size,
            threshold=config.threshold,
            view_size=len(config.views),
            loss_v_rate=config.loss_v_rate,
            review_net_only=config.review_net_only,
            use_pallas=config.use_pallas if use_pallas is None else use_pallas,
            photo_size=getattr(config, "photo_size", 224),
            vgg_fold_w=getattr(config, "vgg_fold_w", True),
            remat_vgg=getattr(config, "remat_vgg", False),
            vgg_fused_pool=(getattr(config, "vgg_fused_pool", False)
                            and (config.use_pallas if use_pallas is None
                                 else use_pallas)),
        )


def init_umpr(key, dims: ModelDims, word_emb):
    """word_emb: (vocab, emb_size) numpy/jax array (frozen GloVe table)."""
    word_emb = jnp.asarray(word_emb, jnp.float32)
    emb_size = word_emb.shape[1]
    ks = jax.random.split(key, 4)
    params = {
        "embedding": word_emb,
        "review_net": init_review_net(ks[0], emb_size, dims.gru_size, dims.self_atte_size),
    }
    if dims.review_net_only:
        params["linear_fusion"] = init_linear(ks[1], dims.gru_size * 2, 1)
    else:
        params["control_net"] = init_control_net(
            ks[2], emb_size, dims.gru_size, dims.kernel_count, dims.kernel_size,
            dims.view_size, dims.self_atte_size)
        params["visual_net"] = init_visual_net(ks[3], dims.view_size,
                                               img_size=dims.photo_size)
        params["linear_fusion"] = init_linear(
            ks[1], dims.gru_size * 2 + 2 * dims.view_size, 1)
    return params


def umpr_forward(params, batch, dims: ModelDims, train=False, dropout_rng=None):
    """batch: dict from umpr_tpu.data.loader.BatchLoader (device arrays).

    Returns (prediction (B,), loss scalar, aux dict).
    Reference call stack: model.py:257-278.
    """
    u_tok, i_tok, ui_tok = batch["u_tokens"], batch["i_tokens"], batch["ui_tokens"]
    u_len, i_len, ui_len = batch["u_lengths"], batch["i_lengths"], batch["ui_lengths"]
    labels = batch["ratings"]
    mask = batch.get("sample_mask")
    if mask is None:
        mask = jnp.ones(labels.shape, labels.dtype)

    B, S, L = u_tok.shape
    S_ui = ui_tok.shape[1]

    # Runtime batch maxima -> exists masks (user/item share theirs, as the
    # reference pads them jointly: dataset.py:163-170).  The gradient-
    # accumulation step precomputes them over the FULL batch and carries
    # them into each micro-batch ("pad_maxima": (Sb, Lb, Sb_ui, Lb_ui)) so
    # accumulation reproduces the full batch's padding numerics exactly.
    pm = batch.get("pad_maxima")
    if pm is None:
        Sb = masking.batch_max_count(batch["u_counts"], batch["i_counts"])
        Lb = masking.batch_max_length(u_len, i_len)
        Sb_ui, Lb_ui = batch["ui_counts"].max(), ui_len.max()
    else:
        Sb, Lb, Sb_ui, Lb_ui = pm
    exists = masking.exists_mask(Sb, Lb, S, L)
    ui_exists = masking.exists_mask(Sb_ui, Lb_ui, S_ui, L)

    dtype = jnp.dtype(dims.compute_dtype)
    if dtype != jnp.float32:
        # Mixed precision: cast params + activations once; the loss is
        # computed in f32 below.  bf16 keeps MXU matmuls at 2x rate and
        # halves activation HBM traffic.
        params = jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params)

    emb = params["embedding"]
    eval_scan = (not train) and not (dims.use_pallas
                                     and dims.gru_size % 64 == 0)
    if not eval_scan:
        # ONE gather for user+item histories: concatenating the (tiny,
        # int32) token ids instead of the (B, S, L, E) embeddings saves a
        # full-tensor float concat per step (u and i flow through
        # shared-weight networks stacked on the batch axis downstream)
        both_tok = jnp.concatenate([u_tok, i_tok], axis=0)  # (2B, S, L)
        both_emb = emb[both_tok]                            # (2B, S, L, E)
    else:
        # No-grad eval on the scan-GRU path: the fused (2B, S, L) gather
        # compiles WORSE there than two gathers + a float concat (B=512
        # bf16 serving: 75.0k vs 81.0k samples/s -- the round-5
        # serving-regression bisect, BENCH_DETAILS.md); the layout is
        # identical either way.  review_net routes to the matching
        # slice-reuse eval structure on the same condition.
        both_emb = jnp.concatenate([emb[u_tok], emb[i_tok]], axis=0)
    ui_emb = emb[ui_tok]   # (B, S_ui, L, E)

    # One attention path on merit for train AND eval: the composite XLA
    # attention is measured faster than the fused kernel at every supported
    # shape (umpr_tpu/ops/attention.py); use_pallas governs the GRU kernel.
    rn = review_net(params["review_net"], both_emb, u_len, i_len, exists,
                    dims.use_pallas, train=train)  # (B, 2u)

    if dims.review_net_only:
        prediction = jax.nn.relu(linear(params["linear_fusion"], rn))[:, 0]
        prediction = prediction.astype(jnp.float32)
        loss = _masked_mse(prediction, labels, mask)
        return prediction, loss, {"loss_r": loss}

    c_u, c_i, prefer_pos, prefer_neg = control_net(
        params["control_net"], both_emb, ui_emb, u_len, i_len, ui_len,
        exists, ui_exists, dims.threshold, dims.use_pallas)
    pos_match, neg_match, final_pos, final_neg = visual_net(
        params["visual_net"], batch["photos"], c_u, c_i, train, dropout_rng,
        fold_w=dims.vgg_fold_w, fold_rows=64 * dims.n_data_devices,
        remat=dims.remat_vgg, fused_pool=dims.vgg_fused_pool)

    fused = jnp.concatenate([rn, final_pos, final_neg], axis=-1)
    prediction = jax.nn.relu(linear(params["linear_fusion"], fused))[:, 0]
    prediction = prediction.astype(jnp.float32)
    loss_r = _masked_mse(prediction, labels, mask)
    # Cross-batch (V, B) @ (B, V) visual loss; dead samples zeroed on BOTH
    # operands with a select, not a multiply: dead rows carry NaN matching
    # scores (their zeroed review counts NaN the control-net softmax), and a
    # 0 * NaN product inside the dot accumulation is NaN by IEEE rules --
    # only XLA's bool-mul rewrite makes the multiply form work under jit.
    alive = mask[:, None] > 0
    prefer_pos, prefer_neg, pos_match, neg_match = (
        jnp.where(alive, x.astype(jnp.float32), 0.0)
        for x in (prefer_pos, prefer_neg, pos_match, neg_match))
    loss_v = jnp.mean(prefer_pos.T @ pos_match + prefer_neg.T @ neg_match)
    loss = loss_r + dims.loss_v_rate * loss_v
    return prediction, loss, {"loss_r": loss_r, "loss_v": loss_v}


def masked_sq_sum(pred, labels, mask):
    """Sum of squared errors over real samples.  Dead rows (mask 0) carry
    NaN predictions — their counts are zeroed so the review masked-softmax
    is 0/0 — so the dead branch must be dropped with a select, not a
    multiply: 0 * NaN is NaN unless XLA's mul(convert(bool),x) rewrite
    happens to fire (it does under jit today, but eager/disable_jit and
    future backends get the IEEE answer)."""
    return jnp.sum(jnp.where(mask > 0, (pred - labels) ** 2, 0.0))


def _masked_mse(pred, labels, mask):
    return masked_sq_sum(pred, labels, mask) / jnp.maximum(jnp.sum(mask), 1.0)
