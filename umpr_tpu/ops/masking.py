"""Runtime "exists" masks: static shapes with per-batch dynamic-padding numerics.

The reference pads every batch to that batch's own maximum sentence count and
sentence length (src/dataset.py:163-171), so the sizes of the attention /
softmax / max-pool axes -- and therefore the numerics -- depend on the batch.
On TPU we want ONE compiled executable, so arrays are padded to the static
config maxima (S=20, L=20, S_ui=5) and the *runtime* batch maxima are carried
as data.  Positions beyond the runtime maxima ("nonexistent": they would not
exist in the reference's dynamically padded batch) are excluded from every
reduction:

- masked to -inf before max / softmax;
- zeroed before sums and matmul contractions.

Positions *within* the runtime maxima but beyond a sample's own count/length
are genuine pad positions in the reference too (pad sentences of length 1,
dataset.py:125-127) and participate normally -- they are deliberately NOT
masked out.

This reproduces the reference batch-for-batch while keeping shapes static.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30  # saturating mask value; avoids -inf NaN edge cases in grads


def batch_max_count(*counts):
    """Runtime max sentence count over the batch.  User and item histories
    share one maximum in the reference (dataset.py:163-166)."""
    m = counts[0].max()
    for c in counts[1:]:
        m = jnp.maximum(m, c.max())
    return m


def batch_max_length(*lengths):
    """Runtime max sentence length over the batch.  Pad sentences have
    length 1 < 6 <= any real sentence, so a plain max is exact."""
    m = lengths[0].max()
    for l in lengths[1:]:
        m = jnp.maximum(m, l.max())
    return m


def exists_mask(max_count, max_len, S, L):
    """(S, L) bool: does position (sentence s, token t) exist in the
    reference's dynamically padded batch?  Shared across the batch."""
    s_ok = jnp.arange(S) < max_count
    t_ok = jnp.arange(L) < max_len
    return s_ok[:, None] & t_ok[None, :]


def masked_max(x, mask, axis=None, keepdims=False):
    """max over `axis` counting only positions where mask is True."""
    return jnp.max(jnp.where(mask, x, NEG_INF), axis=axis, keepdims=keepdims)


def masked_softmax(scores, mask, axis=-1):
    """softmax over `axis`, restricted to mask==True (zeros elsewhere)."""
    scores = jnp.where(mask, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=axis, keepdims=True)
    e = jnp.exp(scores) * mask
    return e / jnp.sum(e, axis=axis, keepdims=True)
