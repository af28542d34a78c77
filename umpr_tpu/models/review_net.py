"""Review network: R-Net word-level cross attention + S-Net sentence
sentiment + textual matching fusion.

Math parity with reference src/model.py:24-81,146-169 (paper eqs. 3-8),
expressed as fused einsum/softmax over static shapes with runtime exists
masks (see umpr_tpu/ops/masking.py for why masks give exact per-batch
dynamic-padding numerics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from umpr_tpu.models.layers import init_linear, randn
from umpr_tpu.ops.attention import affinity_attention
from umpr_tpu.ops.gru import init_bigru, bigru, bigru_split
from umpr_tpu.ops.masking import masked_softmax


def init_rnet(key, emb_size, gru_size):
    k_gru, k_m = jax.random.split(key)
    return {
        "gru": init_bigru(k_gru, emb_size, gru_size),
        # learned affinity bilinear form M (2u, 2u), torch.randn init
        # (reference model.py:29)
        "M": randn(k_m, (2 * gru_size, 2 * gru_size)),
    }


def rnet(p, both_emb, u_lengths, i_lengths, exists, use_pallas=False,
         attention_pallas=None):
    """Word-level cross attention between user and item histories.

    both_emb: (2B, S, L, E) -- user histories stacked over item histories
    on the batch axis (one embedding gather, one GRU launch: the weights
    are shared); *_lengths: (B, S); exists: (S, L) bool runtime mask shared
    by user and item (the reference pads both to one common batch maximum,
    dataset.py:163-170).

    Returns gru_u, gru_i (B, S*L, 2u), y_sent (2*B*S, L, 2u) -- user rows
    stacked over item rows, soft_u, soft_i (B, S*L), atte_u, atte_i
    (B, 2u).  Reference: model.py:36-56 (eq. 3-4).
    """
    B2, S, L, E = both_emb.shape
    B = B2 // 2
    # bigru_split returns BOTH consumer layouts -- positions for the
    # attention, sentences for S-Net -- repacked inside the kernel path so
    # no XLA reverse/concat/regroup copies appear at the boundary;
    # need_dx=False: the inputs are the frozen GloVe table.
    both_len = jnp.concatenate([u_lengths.reshape(-1), i_lengths.reshape(-1)])
    y_pos, y_sent = bigru_split(p["gru"], both_emb.reshape(B2 * S, L, E),
                                both_len, S, use_pallas, need_dx=False)
    gru_u, gru_i = y_pos[:B], y_pos[B:]
    e = exists.reshape(S * L)

    # Affinity attention (eq. 3-4).  The composite XLA path is measured
    # faster than the fused kernel at every supported shape on v5e, for
    # both training and eval (see umpr_tpu/ops/attention.py) -- it is the
    # default; attention_pallas=True opts into the kernel explicitly.
    if attention_pallas is None:
        attention_pallas = False
    soft_u, soft_i, atte_u, atte_i = affinity_attention(
        gru_u, gru_i, p["M"], e, attention_pallas)
    return gru_u, gru_i, y_sent, soft_u, soft_i, atte_u, atte_i


def init_snet(key, self_atte_size, repr_size):
    k1, k2 = jax.random.split(key)
    # torch.randn parameters (reference model.py:63-64)
    return {"Ms": randn(k1, (self_atte_size, repr_size)),
            "Ws": randn(k2, (1, self_atte_size))}


def snet(p, H, word_soft, S, t_exists):
    """Per-sentence self attention -> sentence vectors + sentiment embedding.

    H: (B*S, L, 2u) true-time per-sentence GRU outputs (the layout the GRU
    emits -- no (B, S*L) round trip); word_soft: (B, S*L) or (B, S, W) --
    the per-sentence weight mass is its sum over the last axis after
    reshaping to (B*S, -1), exactly like the reference's
    word_soft.view(B*S, -1).sum(-1) (model.py:79, which ControlNet also
    exploits by passing view_p there); t_exists: (L,) bool runtime token
    mask.

    Returns self_atte (B, S, 2u), sentiment_emb (B, 2u).
    Reference: model.py:71-81 (eq. 5-6).
    """
    B = H.shape[0] // S
    # sent_soft = softmax_t(Ws tanh(Ms H^T))  over existing token positions
    scores = jnp.einsum("oa,nla->nl", p["Ws"], jnp.tanh(jnp.einsum("ae,nle->nla", p["Ms"], H)))
    sent_soft = masked_softmax(scores, t_exists[None, :], axis=-1)  # (B*S, L)
    self_atte = jnp.einsum("nle,nl->ne", H, sent_soft)  # (B*S, 2u)

    mass = word_soft.reshape(B * S, -1).sum(axis=-1)  # per-sentence attention mass
    sentiment = (mass[:, None] * self_atte).reshape(B, S, -1).sum(axis=1)
    return self_atte.reshape(B, S, -1), sentiment


def snet_pair(p_u, p_i, y_sent, soft_u, soft_i, S, t_exists):
    """Both ReviewNet S-Nets in ONE batched pass over the un-sliced
    (2*B*S, L, 2u) GRU output: a 2-valued group axis carries the separate
    user/item parameters, so Y_sent never splits into per-half tensors
    (the u/i slices + their dsent pad-and-add showed up as ~9% of the
    UMPR-R step as layout-churn fusions).  Same math as snet() twice.

    Returns sentiment_u, sentiment_i (B, 2u)."""
    BS2, L, D = y_sent.shape
    B = BS2 // (2 * S)
    Hg = y_sent.reshape(2, BS2 // 2, L, D)
    Ms = jnp.stack([p_u["Ms"], p_i["Ms"]])          # (2, a, D)
    Ws = jnp.stack([p_u["Ws"], p_i["Ws"]])          # (2, 1, a)
    inner = jnp.einsum("gae,gnle->gnla", Ms, Hg)
    scores = jnp.einsum("goa,gnla->gnl", Ws, jnp.tanh(inner))
    sent_soft = masked_softmax(scores, t_exists[None, None, :], axis=-1)
    self_atte = jnp.einsum("gnle,gnl->gne", Hg, sent_soft)  # (2, B*S, D)
    mass = jnp.stack([soft_u, soft_i]).reshape(2, B * S, -1).sum(axis=-1)
    sentiment = (mass[..., None] * self_atte).reshape(2, B, S, D).sum(axis=2)
    return sentiment[0], sentiment[1]


def init_review_net(key, emb_size, gru_size, atte_size):
    ks = jax.random.split(key, 5)
    return {
        "rnet": init_rnet(ks[0], emb_size, gru_size),
        "snet_u": init_snet(ks[1], atte_size, 2 * gru_size),
        "snet_i": init_snet(ks[2], atte_size, 2 * gru_size),
        "linear_u": init_linear(ks[3], 4 * gru_size, 2 * gru_size, bias=False),
        "linear_i": init_linear(ks[4], 4 * gru_size, 2 * gru_size, bias=False),
    }


def _review_net_eval_scan(p, both_emb, u_lengths, i_lengths, exists):
    """Eval-graph structure for the scan-GRU path: one bigru launch whose
    output is sliced into per-half position layouts FIRST, with S-Net
    consuming reshapes of those same slices, and two plain snet() calls.

    Mathematically identical to review_net's paired structure.  In a
    no-grad graph this shape compiles ~18% faster on the scan path
    (B=512 bf16 serving: 81.7k vs 69.2k samples/s): bigru_split's two
    reshape chains of the same GRU output and snet_pair's grouped
    (2, B*S, L, .) einsums each fuse worse than the slice-reuse form
    when there is no backward pass to amortize them against (the
    round-5 serving-regression bisect, BENCH_DETAILS.md).  The paired
    structure exists for the TRAIN backward (dsent pad-and-add churn)
    and for the Pallas repack-kernel layouts, where it also wins at
    eval (104.6k vs 95.3k) -- review_net routes on exactly that."""
    B2, S, L, E = both_emb.shape
    B = B2 // 2
    # The slice + re-concat looks redundant against umpr_forward's
    # upstream concat, but XLA CANCELS the pair back to the two bare
    # embedding gathers, whereas reshaping the concatenated (2B, S, L, E)
    # directly materializes it first (measured: 81.7k vs 75.7k samples/s
    # at B=512 bf16 -- keep the cancellable form).
    user_emb, item_emb = both_emb[:B], both_emb[B:]
    both = jnp.concatenate([user_emb.reshape(B * S, L, E),
                            item_emb.reshape(B * S, L, E)], axis=0)
    both_len = jnp.concatenate([u_lengths.reshape(-1), i_lengths.reshape(-1)])
    gru_ui = bigru(p["rnet"]["gru"], both, both_len, use_pallas=False)
    gru_u = gru_ui[:B * S].reshape(B, S * L, -1)
    gru_i = gru_ui[B * S:].reshape(B, S * L, -1)
    soft_u, soft_i, atte_u, atte_i = affinity_attention(
        gru_u, gru_i, p["rnet"]["M"], exists.reshape(S * L), False)
    t_exists = exists[0]
    _, sent_u = snet(p["snet_u"], gru_u.reshape(B * S, L, -1), soft_u, S,
                     t_exists)
    _, sent_i = snet(p["snet_i"], gru_i.reshape(B * S, L, -1), soft_i, S,
                     t_exists)
    repr_u = jnp.concatenate([atte_u, sent_u], axis=-1)  # eq. 7
    repr_i = jnp.concatenate([atte_i, sent_i], axis=-1)
    return jnp.tanh(repr_u @ p["linear_u"]["kernel"]
                    + repr_i @ p["linear_i"]["kernel"])  # eq. 8


def review_net(p, both_emb, u_lengths, i_lengths, exists,
               use_pallas=False, attention_pallas=None, train=True):
    """Full review network (reference model.py:157-169, eq. 7-8).

    both_emb: (2B, S, L, E) user histories stacked over item histories.
    Returns (B, 2u) textual-matching representation.

    train (static) routes between two mathematically identical graph
    structures: the paired/split-layout form (snet_pair + bigru_split)
    wins for the train backward and on the Pallas repack-kernel path;
    no-grad eval on the scan path compiles faster as the round-2
    slice-reuse form (see _review_net_eval_scan)."""
    kernel_gru = use_pallas and p["rnet"]["gru"]["fwd"]["w_hh"].shape[0] % 64 == 0
    if not train and not kernel_gru:
        return _review_net_eval_scan(p, both_emb, u_lengths, i_lengths,
                                     exists)
    B2, S, L, _ = both_emb.shape
    B = B2 // 2
    gru_u, gru_i, y_sent, soft_u, soft_i, atte_u, atte_i = rnet(
        p["rnet"], both_emb, u_lengths, i_lengths, exists, use_pallas,
        attention_pallas)
    t_exists = exists[0]  # (L,): token mask for row 0 == any existing sentence row
    sent_u, sent_i = snet_pair(p["snet_u"], p["snet_i"], y_sent,
                               soft_u, soft_i, S, t_exists)

    repr_u = jnp.concatenate([atte_u, sent_u], axis=-1)  # eq. 7
    repr_i = jnp.concatenate([atte_i, sent_i], axis=-1)
    return jnp.tanh(repr_u @ p["linear_u"]["kernel"] + repr_i @ p["linear_i"]["kernel"])  # eq. 8
