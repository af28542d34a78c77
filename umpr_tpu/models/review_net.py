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
from umpr_tpu.ops.gru import init_bigru, bigru
from umpr_tpu.ops.masking import masked_softmax


def init_rnet(key, emb_size, gru_size):
    k_gru, k_m = jax.random.split(key)
    return {
        "gru": init_bigru(k_gru, emb_size, gru_size),
        # learned affinity bilinear form M (2u, 2u), torch.randn init
        # (reference model.py:29)
        "M": randn(k_m, (2 * gru_size, 2 * gru_size)),
    }


def rnet(p, user_emb, item_emb, u_lengths, i_lengths, exists, use_pallas=False,
         attention_pallas=None):
    """Word-level cross attention between user and item histories.

    user_emb/item_emb: (B, S, L, E); *_lengths: (B, S); exists: (S, L) bool
    runtime mask shared by user and item (the reference pads both to one
    common batch maximum, dataset.py:163-170).

    Returns gru_u, gru_i (B, S*L, 2u), soft_u, soft_i (B, S*L),
    atte_u, atte_i (B, 2u).  Reference: model.py:36-56 (eq. 3-4).
    """
    B, S, L, E = user_emb.shape
    # One GRU launch for user+item (weights are shared; numerically
    # identical, halves the sequential-scan overhead on TPU).
    both = jnp.concatenate([user_emb.reshape(B * S, L, E),
                            item_emb.reshape(B * S, L, E)], axis=0)
    both_len = jnp.concatenate([u_lengths.reshape(-1), i_lengths.reshape(-1)])
    gru_ui = bigru(p["gru"], both, both_len, use_pallas)
    gru_u = gru_ui[:B * S].reshape(B, S * L, -1)
    gru_i = gru_ui[B * S:].reshape(B, S * L, -1)
    e = exists.reshape(S * L)

    # Affinity attention (eq. 3-4).  The composite XLA path is measured
    # faster than the fused kernel at every supported shape on v5e, for
    # both training and eval (see umpr_tpu/ops/attention.py) -- it is the
    # default; attention_pallas=True opts into the kernel explicitly.
    if attention_pallas is None:
        attention_pallas = False
    soft_u, soft_i, atte_u, atte_i = affinity_attention(
        gru_u, gru_i, p["M"], e, attention_pallas)
    return gru_u, gru_i, soft_u, soft_i, atte_u, atte_i


def init_snet(key, self_atte_size, repr_size):
    k1, k2 = jax.random.split(key)
    # torch.randn parameters (reference model.py:63-64)
    return {"Ms": randn(k1, (self_atte_size, repr_size)),
            "Ws": randn(k2, (1, self_atte_size))}


def snet(p, gru_repr, word_soft, S, L, t_exists):
    """Per-sentence self attention -> sentence vectors + sentiment embedding.

    gru_repr: (B, S*L, 2u); word_soft: (B, S*L) or (B, S, W) -- the per-
    sentence weight mass is its sum over the last axis after reshaping to
    (B*S, -1), exactly like the reference's word_soft.view(B*S, -1).sum(-1)
    (model.py:79, which ControlNet also exploits by passing view_p there);
    t_exists: (L,) bool runtime token mask.

    Returns self_atte (B, S, 2u), sentiment_emb (B, 2u).
    Reference: model.py:71-81 (eq. 5-6).
    """
    B = gru_repr.shape[0]
    H = gru_repr.reshape(B * S, L, -1)
    # sent_soft = softmax_t(Ws tanh(Ms H^T))  over existing token positions
    scores = jnp.einsum("oa,nla->nl", p["Ws"], jnp.tanh(jnp.einsum("ae,nle->nla", p["Ms"], H)))
    sent_soft = masked_softmax(scores, t_exists[None, :], axis=-1)  # (B*S, L)
    self_atte = jnp.einsum("nle,nl->ne", H, sent_soft)  # (B*S, 2u)

    mass = word_soft.reshape(B * S, -1).sum(axis=-1)  # per-sentence attention mass
    sentiment = (mass[:, None] * self_atte).reshape(B, S, -1).sum(axis=1)
    return self_atte.reshape(B, S, -1), sentiment


def init_review_net(key, emb_size, gru_size, atte_size):
    ks = jax.random.split(key, 5)
    return {
        "rnet": init_rnet(ks[0], emb_size, gru_size),
        "snet_u": init_snet(ks[1], atte_size, 2 * gru_size),
        "snet_i": init_snet(ks[2], atte_size, 2 * gru_size),
        "linear_u": init_linear(ks[3], 4 * gru_size, 2 * gru_size, bias=False),
        "linear_i": init_linear(ks[4], 4 * gru_size, 2 * gru_size, bias=False),
    }


def review_net(p, user_emb, item_emb, u_lengths, i_lengths, exists,
               use_pallas=False, attention_pallas=None):
    """Full review network (reference model.py:157-169, eq. 7-8).

    Returns (B, 2u) textual-matching representation."""
    B, S, L, _ = user_emb.shape
    gru_u, gru_i, soft_u, soft_i, atte_u, atte_i = rnet(
        p["rnet"], user_emb, item_emb, u_lengths, i_lengths, exists, use_pallas,
        attention_pallas)
    t_exists = exists[0]  # (L,): token mask for row 0 == any existing sentence row
    _, sent_u = snet(p["snet_u"], gru_u, soft_u, S, L, t_exists)
    _, sent_i = snet(p["snet_i"], gru_i, soft_i, S, L, t_exists)

    repr_u = jnp.concatenate([atte_u, sent_u], axis=-1)  # eq. 7
    repr_i = jnp.concatenate([atte_i, sent_i], axis=-1)
    return jnp.tanh(repr_u @ p["linear_u"]["kernel"] + repr_i @ p["linear_i"]["kernel"])  # eq. 8
