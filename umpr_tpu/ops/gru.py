"""Masked bidirectional GRU over variable-length sequences.

TPU-native replacement for the reference's ``ImprovedRnn`` wrapper around
cuDNN ``pack_padded_sequence`` / ``pad_packed_sequence`` (src/model.py:6-21).
Observable semantics reproduced exactly:

- gate math is PyTorch's GRU formulation:
      r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
      z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
      n = tanh   (x W_in + b_in + r * (h W_hn + b_hn))
      h' = (1 - z) * n + z * h
  (note b_hn sits INSIDE the reset gate -- the two bias vectors are not
  redundant for the candidate gate);
- outputs at positions t >= length are exactly zero, as produced by
  ``pad_packed_sequence(..., total_length=max_len)``;
- the backward direction starts at each sequence's own last valid position
  (t = length-1), not at the padded end;
- lengths are >= 1 (pad sentences carry one <PAD> token, reference
  dataset.py:127) and their step-0 output is computed normally.

NOT reproduced: the reference's double-unsort quirk at model.py:21
(``result[package.unsorted_indices]`` AFTER pad_packed_sequence has already
restored original order), which permutes GRU outputs across the flattened
batch whenever lengths differ.  That is a data-scrambling bug, not a feature;
this implementation keeps rows in their original order.

Two execution paths with identical numerics:
- ``lax.scan`` path (this file): input projections for the whole sequence and
  both directions are hoisted into ONE large MXU matmul; the scan carries only
  the small (N, H) @ (H, 3H) recurrent matmuls;
- fused Pallas kernel (umpr_tpu/ops/gru_pallas.py) selected with
  ``use_pallas=True`` on TPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def init_bigru(key, in_size, hidden):
    """PyTorch-parity init: every tensor ~ U(-k, k), k = 1/sqrt(hidden)
    (torch.nn.GRU.reset_parameters).  Weight layout: (in, 3H) with gate
    order [r | z | n], i.e. the transpose of torch's (3H, in)."""
    k = 1.0 / math.sqrt(hidden)
    keys = jax.random.split(key, 8)

    def u(k_, shape):
        return jax.random.uniform(k_, shape, jnp.float32, -k, k)

    return {
        "fwd": {
            "w_ih": u(keys[0], (in_size, 3 * hidden)),
            "w_hh": u(keys[1], (hidden, 3 * hidden)),
            "bias_ih": u(keys[2], (3 * hidden,)),
            "bias_hh": u(keys[3], (3 * hidden,)),
        },
        "bwd": {
            "w_ih": u(keys[4], (in_size, 3 * hidden)),
            "w_hh": u(keys[5], (hidden, 3 * hidden)),
            "bias_ih": u(keys[6], (3 * hidden,)),
            "bias_hh": u(keys[7], (3 * hidden,)),
        },
    }


def _gru_cell(xg, h, w_hh, b_hh, hidden):
    """One step given precomputed input gates xg = x @ w_ih + b_ih, (N, 3H)."""
    hg = h @ w_hh + b_hh
    xr, xz, xn = xg[:, :hidden], xg[:, hidden:2 * hidden], xg[:, 2 * hidden:]
    hr, hz, hn = hg[:, :hidden], hg[:, hidden:2 * hidden], hg[:, 2 * hidden:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _direction_scan(xg, lengths, w_hh, b_hh, hidden, reverse):
    """Masked scan over time. xg: (L, N, 3H) time-major. Returns (L, N, H)."""
    L, N = xg.shape[0], xg.shape[1]
    ts = jnp.arange(L)
    if reverse:
        xg = xg[::-1]
        ts = ts[::-1]
    h0 = jnp.zeros((N, hidden), xg.dtype)

    def step(h, inp):
        xg_t, t = inp
        valid = (t < lengths)[:, None]
        h_new = _gru_cell(xg_t, h, w_hh, b_hh, hidden)
        # Hidden state freezes past each sequence's end; emitted output is
        # zero there (pad_packed_sequence semantics).
        h = jnp.where(valid, h_new, h)
        return h, jnp.where(valid, h_new, 0.0)

    _, ys = jax.lax.scan(step, h0, (xg, ts))
    if reverse:
        ys = ys[::-1]
    return ys


def bigru_scan(params, x, lengths):
    """x: (N, L, E) float, lengths: (N,) int -> (N, L, 2H) [fwd ; bwd]."""
    hidden = params["fwd"]["w_hh"].shape[0]
    # One fused input projection for both directions: (N*L, E) @ (E, 6H).
    w_ih = jnp.concatenate([params["fwd"]["w_ih"], params["bwd"]["w_ih"]], axis=1)
    bias_ih = jnp.concatenate([params["fwd"]["bias_ih"], params["bwd"]["bias_ih"]], axis=0)
    xg = x @ w_ih + bias_ih  # (N, L, 6H)
    xg = jnp.swapaxes(xg, 0, 1)  # (L, N, 6H) time-major for the scan

    y_f = _direction_scan(xg[..., :3 * hidden], lengths,
                          params["fwd"]["w_hh"], params["fwd"]["bias_hh"], hidden, reverse=False)
    y_b = _direction_scan(xg[..., 3 * hidden:], lengths,
                          params["bwd"]["w_hh"], params["bwd"]["bias_hh"], hidden, reverse=True)
    y = jnp.concatenate([y_f, y_b], axis=-1)  # (L, N, 2H)
    return jnp.swapaxes(y, 0, 1)  # (N, L, 2H)


def bigru(params, x, lengths, use_pallas=False, need_dx=True):
    hidden = params["fwd"]["w_hh"].shape[0]
    # The Pallas kernels' column blocks are 6H / 2H wide and must be
    # 128-lane multiples (gcd(3,128)=1 and gcd(2·odd,128) arguments reduce
    # both conditions to H % 64 == 0); other sizes fall back to the scan.
    # need_dx=False (frozen input embeddings -- every UMPR config) lets the
    # kernel path skip the dead input-stream gradient, which XLA cannot DCE
    # through a Pallas call; the scan path DCEs it naturally.
    if use_pallas and hidden % 64 == 0:
        from umpr_tpu.ops.gru_pallas import bigru_pallas, bigru_pallas_nodx
        return (bigru_pallas if need_dx else bigru_pallas_nodx)(
            params, x, lengths)
    return bigru_scan(params, x, lengths)


def bigru_split(params, x, lengths, S, use_pallas=False, need_dx=True):
    """Bi-GRU returning BOTH true-time consumer layouts:
      Y_pos  (N/S, S*L, 2H) -- the affinity-attention positions layout;
      Y_sent (N, L, 2H)     -- the per-sentence S-Net layout.

    x: (N, L, E) sentence rows -- view an embedding lookup (B, S, L, E)
    with .reshape(B*S, L, E) (a free leading-dim merge).  On the
    fused-projection Pallas path the layout conversions run as single-pass
    VMEM repack kernels (umpr_tpu/ops/gru_pallas.py); elsewhere they are
    the plain XLA reshapes this API replaces."""
    hidden = params["fwd"]["w_hh"].shape[0]
    N, L, E = x.shape
    if use_pallas and hidden % 64 == 0:
        from umpr_tpu.ops import gru_pallas as gp
        if gp._proj_mode(E) == "fused" and N % S == 0:
            f = (gp.bigru_pallas_split if need_dx
                 else gp.bigru_pallas_split_nodx)
            return f(params, x, lengths, S)
    y = bigru(params, x, lengths, use_pallas, need_dx)
    return y.reshape(N // S, S * L, 2 * hidden), y


def torch_gru_params(params):
    """Export to torch nn.GRU state-dict layout (for parity tests/tools)."""
    out = {}
    for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
        p = params[direction]
        out[f"weight_ih_l0{suffix}"] = np.asarray(p["w_ih"]).T
        out[f"weight_hh_l0{suffix}"] = np.asarray(p["w_hh"]).T
        out[f"bias_ih_l0{suffix}"] = np.asarray(p["bias_ih"])
        out[f"bias_hh_l0{suffix}"] = np.asarray(p["bias_hh"])
    return out


def from_torch_gru(state_dict):
    """Import torch nn.GRU weights (bidirectional, single layer)."""
    def grab(suffix):
        return {
            "w_ih": jnp.asarray(np.asarray(state_dict[f"weight_ih_l0{suffix}"]).T),
            "w_hh": jnp.asarray(np.asarray(state_dict[f"weight_hh_l0{suffix}"]).T),
            "bias_ih": jnp.asarray(np.asarray(state_dict[f"bias_ih_l0{suffix}"])),
            "bias_hh": jnp.asarray(np.asarray(state_dict[f"bias_hh_l0{suffix}"])),
        }
    return {"fwd": grab(""), "bwd": grab("_reverse")}
