"""R-Net affinity attention (paper eq. 3-4).

    A      = tanh(gru_i @ M @ gru_u^T)            (B, P, P), P = S*L
    soft_u = softmax_q( max_p A[p, q] )           over existing positions
    soft_i = softmax_p( max_q A[p, q] )
    atte_u = gru_u^T @ soft_u,  atte_i = gru_i^T @ soft_i

Reference: src/model.py:50-56.  Two implementations with identical numerics:

- composite XLA path (this file): einsum + masked max/softmax; XLA
  materializes the (B, P, P) affinity tensor in HBM (41 MB per direction at
  the Music-small config) and stores it again as the tanh residual for the
  backward pass;
- fused Pallas kernel (umpr_tpu/ops/attention_pallas.py): per-sample tiles
  stay in VMEM, nothing (B, P, P)-shaped ever reaches HBM, and the backward
  rematerializes the affinity tiles instead of loading residuals.
"""

from __future__ import annotations

import jax.numpy as jnp

from umpr_tpu.ops.masking import masked_max, masked_softmax


def affinity_attention(gru_u, gru_i, M, exists, use_pallas=False):
    """gru_u/gru_i: (B, P, D); M: (D, D); exists: (P,) bool.

    Returns soft_u, soft_i (B, P) and atte_u, atte_i (B, D)."""
    if use_pallas and gru_u.shape[-1] % 128 == 0:
        # kernel blocks are D-wide and must be 128-lane multiples; other
        # widths (gru_size not a multiple of 64) use the composite path
        from umpr_tpu.ops.attention_pallas import affinity_attention_pallas
        return affinity_attention_pallas(gru_u, gru_i, M, exists)
    A = jnp.tanh(jnp.einsum("bpe,ef,bqf->bpq", gru_i, M, gru_u))
    soft_u = masked_softmax(masked_max(A, exists[None, :, None], axis=-2),
                            exists[None, :], axis=-1)
    soft_i = masked_softmax(masked_max(A, exists[None, None, :], axis=-1),
                            exists[None, :], axis=-1)
    atte_u = jnp.einsum("bpe,bp->be", gru_u, soft_u)
    atte_i = jnp.einsum("bpe,bp->be", gru_i, soft_i)
    return soft_u, soft_i, atte_u, atte_i
