"""Control network: C-Net view classifier, SS-Net sentiment scorer, and the
preference-routing gate (paper eqs. 14-18).

Math parity with reference src/model.py:84-143,172-198, including the
reference's exact quirks:
- the hard threshold zeroes view probabilities < 0.35 (eq. 15, model.py:124);
- eq. 18 uses eps = 1e-4 (model.py:188; the reference readme claims 1e-6 --
  the code wins);
- at view_score == 0.5 exactly, both q_pos and q_neg survive their masks with
  value 0 and q_p is 0 (model.py:189-194).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from umpr_tpu.models.layers import init_linear, linear, init_conv1d, conv1d_same
from umpr_tpu.ops.gru import init_bigru, bigru
from umpr_tpu.ops.masking import NEG_INF
from umpr_tpu.models.review_net import init_snet, snet


def init_cnet(key, emb_size, gru_size, k_count, k_size, view_size):
    ks = jax.random.split(key, 3)
    return {
        "gru": init_bigru(ks[0], emb_size, gru_size),
        "conv": init_conv1d(ks[1], 2 * gru_size, k_count, k_size),
        "linear": init_linear(ks[2], k_count, view_size),
    }


def cnet(p, review_emb, lengths, exists, threshold, use_pallas=False):
    """View-probability classifier (reference model.py:110-126, eq. 14-16).

    review_emb: (B, S, L, E); lengths: (B, S); exists: (S, L) runtime mask.
    Returns gru_repr (B*S, L, 2u), view_p (B, S, V), final_repr (B, V).
    """
    B, S, L, E = review_emb.shape
    gru_repr = bigru(p["gru"], review_emb.reshape(B * S, L, E), lengths.reshape(-1),
                     use_pallas, need_dx=False)  # frozen embedding input

    conv_out = jax.nn.relu(conv1d_same(p["conv"], gru_repr))  # (B*S, L_out, k_count)
    # Max-pool over time, restricted to positions that exist in the
    # reference's dynamically padded batch: with torch padding p=(k-1)//2 the
    # reference output length is Lb + 2p - k + 1 for runtime batch max Lb.
    k = p["conv"]["kernel"].shape[0]
    pad = (k - 1) // 2
    t_exists = exists[0]  # (L,) token mask: arange(L) < Lb
    Lb = t_exists.sum()
    L_out = conv_out.shape[1]
    out_exists = jnp.arange(L_out) < (Lb + 2 * pad - k + 1)
    pooled = jnp.max(jnp.where(out_exists[None, :, None], conv_out, NEG_INF), axis=1)

    view_p = jax.nn.sigmoid(linear(p["linear"], pooled)).reshape(B, S, -1)  # eq. 14
    view_p = jnp.where(view_p < threshold, 0.0, view_p)  # eq. 15
    s_exists = exists[:, 0]  # (S,): sentence mask (t=0 exists whenever s does)
    view_p = view_p * s_exists[None, :, None]  # nonexistent sentences contribute nothing
    final_repr = jnp.sum(view_p ** 2, axis=-2)  # eq. 16, (B, V)
    return gru_repr, view_p, final_repr


def init_ssnet(key, input_size):
    return {"linear": init_linear(key, input_size, 1)}


def ssnet(p, sentiment_emb):
    """Per-sentence sentiment score in (0,1) (reference model.py:142-143, eq. 17)."""
    return jax.nn.sigmoid(linear(p["linear"], sentiment_emb))


def init_control_net(key, emb_size, gru_size, k_count, k_size, view_size, atte_size):
    ks = jax.random.split(key, 3)
    return {
        "cnet": init_cnet(ks[0], emb_size, gru_size, k_count, k_size, view_size),
        "snet": init_snet(ks[1], atte_size, 2 * gru_size),
        "ssnet": init_ssnet(ks[2], 2 * gru_size),
    }


def control_net(p, both_emb, ui_emb, u_lengths, i_lengths, ui_lengths,
                exists, ui_exists, threshold, use_pallas=False):
    """Preference routing (reference model.py:179-198, eq. 17-18).

    both_emb: (2B, S, L, E) user histories stacked over item histories (the
    same single-gather tensor ReviewNet consumes); exists: (S, L) shared
    user/item runtime mask; ui_exists: (S_ui, L).
    Returns c_u, c_i, prefer_pos, prefer_neg, all (B, view_size).
    """
    B, S_ui, L, _ = ui_emb.shape
    gru_repr, view_p, c_net_out = cnet(p["cnet"], ui_emb, ui_lengths, ui_exists,
                                       threshold, use_pallas)
    # One C-Net launch for user+item histories (same shapes, shared weights;
    # numerically identical, halves GRU/conv launch overhead).
    both_len = jnp.concatenate([u_lengths, i_lengths], axis=0)
    _, _, c_both = cnet(p["cnet"], both_emb, both_len, exists, threshold,
                        use_pallas)
    c_u, c_i = c_both[:B], c_both[B:]

    # S-Net over the ui review; per-sentence "mass" weights are view_p sums,
    # exactly as the reference passes view_p as word_soft (model.py:185).
    s, _ = snet(p["snet"], gru_repr, view_p, S_ui, ui_exists[0])
    senti = ssnet(p["ssnet"], s)  # (B, S_ui, 1), broadcast over views below

    vp2 = view_p ** 2
    view_score = jnp.sum(senti * vp2, axis=-2) / (jnp.sum(vp2, axis=-2) + 1e-4)  # eq. 18
    q_p = (view_score > 0.5).astype(view_score.dtype)
    q_pos = jnp.where(view_score < 0.5, 0.0, 4.0 * (view_score - 0.5) ** 2)
    q_neg = jnp.where(view_score > 0.5, 0.0, 4.0 * (0.5 - view_score) ** 2)

    prefer_pos = c_net_out * q_p * q_pos
    prefer_neg = c_net_out * (1.0 - q_p) * q_neg
    return c_u, c_i, prefer_pos, prefer_neg
