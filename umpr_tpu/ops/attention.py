"""R-Net affinity attention (paper eq. 3-4).

    A      = tanh(gru_i @ M @ gru_u^T)            (B, P, P), P = S*L
    soft_u = softmax_q( max_p A[p, q] )           over existing positions
    soft_i = softmax_p( max_q A[p, q] )
    atte_u = gru_u^T @ soft_u,  atte_i = gru_i^T @ soft_i

Reference: src/model.py:50-56.  Two implementations with identical numerics:

- composite XLA path (this file): einsum + masked max/softmax.  XLA fuses
  the tanh+max reductions into the affinity matmul; measured FASTER than
  the Pallas kernel at every supported shape on v5e (fwd+bwd 0.80 ms vs
  2.20 ms at B=64/P=400; 3.48 ms vs 5.51 ms at P=1024 -- BENCH_DETAILS.md),
  so this is the default for BOTH training and eval;
- fused Pallas kernel (umpr_tpu/ops/attention_pallas.py): per-sample tiles
  stay in VMEM, nothing (B, P, P)-shaped ever reaches HBM, argmax-routed
  backward.  Kept as a tested, explicitly-requested alternative
  (use_pallas=True); supports padded P up to its VMEM ceiling.
"""

from __future__ import annotations

import jax.numpy as jnp

from umpr_tpu.ops.masking import masked_max, masked_softmax

# Above this (B, P, P) f32 byte count the composite's HBM materialization
# is routed to the flash-style tiled kernel (measured even at the 4 GB
# handover, B=16/P=4096; the composite OOMs outright at B=64/P=8192).
TILED_BYTES_THRESHOLD = 4 << 30


def affinity_attention(gru_u, gru_i, M, exists, use_pallas=False):
    """gru_u/gru_i: (B, P, D); M: (D, D); exists: (P,) bool.

    Returns soft_u, soft_i (B, P) and atte_u, atte_i (B, D)."""
    B, P, D = gru_u.shape
    if B * P * P * 4 > TILED_BYTES_THRESHOLD:
        # The tiled kernel keeps two (P, D) blocks plus ~8 (P, TQ>=128)
        # stack temporaries live in its 100 MB scoped VMEM; beyond this P
        # even the minimum tile width cannot fit and Mosaic rejects the
        # kernel with an opaque allocation error -- fail early and legibly
        # instead.  (P = max_sent_count * max_sent_length; the reference
        # config is P=400.)
        Dp = -(-D // 128) * 128  # D ceil-padded to the 128-lane tile
        max_p = (90 << 20) // (4 * (2 * Dp + 8 * 128)) // 128 * 128
        if P > max_p:
            raise NotImplementedError(
                f"affinity attention: P={P} exceeds the tiled kernel's "
                f"single-core VMEM ceiling (~{max_p} at D={D}); reduce "
                "max_sent_count/max_sent_length")
        # The composite materializes the (B, P, P) affinity tensor in HBM
        # (plus its tanh residual for the backward): beyond ~4 GB it is the
        # wrong tool and soon cannot compile at all (B=64/P=8192 needs
        # 17 GB and OOMs a 16 GB v5e).  The flash-style column-tiled kernel
        # streams the tensor up to the VMEM ceiling checked above; at the handover
        # point the two are measured even (P=4096: 12.6 vs 12.8 ms fwd+bwd,
        # BENCH_DETAILS.md), so the switch costs nothing.  Non-128-lane D
        # is zero-padded (the padded lanes contribute nothing to A or the
        # attended outputs, which are sliced back).
        from umpr_tpu.ops.attention_pallas import affinity_attention_tiled
        if Dp != D:
            pad = ((0, 0), (0, 0), (0, Dp - D))
            su, si, au, ai = affinity_attention_tiled(
                jnp.pad(gru_u, pad), jnp.pad(gru_i, pad),
                jnp.pad(M, ((0, Dp - D), (0, Dp - D))), exists)
            return su, si, au[:, :D], ai[:, :D]
        return affinity_attention_tiled(gru_u, gru_i, M, exists)
    if use_pallas and D % 128 == 0:
        # kernel blocks are D-wide and must be 128-lane multiples; other
        # widths (gru_size not a multiple of 64) use the composite path,
        # as do P beyond the kernel's scoped-VMEM ceiling
        from umpr_tpu.ops.attention_pallas import (affinity_attention_pallas,
                                                   max_kernel_p)
        if -(-P // 128) * 128 <= max_kernel_p():
            return affinity_attention_pallas(gru_u, gru_i, M, exists)
    return affinity_attention_composite(gru_u, gru_i, M, exists)


def affinity_attention_composite(gru_u, gru_i, M, exists):
    """The XLA composite body, exposed un-routed (benchmarks compare it to
    the kernels at shapes where `affinity_attention` would auto-route)."""
    A = jnp.tanh(jnp.einsum("bpe,ef,bqf->bpq", gru_i, M, gru_u))
    soft_u = masked_softmax(masked_max(A, exists[None, :, None], axis=-2),
                            exists[None, :], axis=-1)
    soft_i = masked_softmax(masked_max(A, exists[None, None, :], axis=-1),
                            exists[None, :], axis=-1)
    atte_u = jnp.einsum("bpe,bp->be", gru_u, soft_u)
    atte_i = jnp.einsum("bpe,bp->be", gru_i, soft_i)
    return soft_u, soft_i, atte_u, atte_i
