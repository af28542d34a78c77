"""Fused Pallas TPU kernel for the masked bidirectional GRU.

Design (see /opt/skills/guides/pallas_guide.md):

- Input projections for the whole sequence are two large (N*L, E) @ (E, 3H)
  MXU matmuls done by XLA outside the kernel (the backward direction's on a
  time-flipped copy of x), then gate-interleaved into one (N, L, 6H) block
  with column layout [r_f r_b | z_f z_b | n_f n_b].
- BOTH directions run in the SAME time loop: the backward direction is
  expressed in reversed time (step tau processes original position L-1-tau),
  so the carried state is one (TILE_N, 2H) block and the recurrent matmul is
  a single full-tile (TILE_N, 2H) @ (2H, 6H) MXU op per step against a
  block-diagonal weight (for H=64 that is 128x128 @ 128x384 -- perfectly
  aligned to the MXU/VPU lane width, unlike two separate H=64 halves).
- The kernel tiles N (= batch*sentences); each program keeps its gate block
  and hidden state entirely in VMEM across all L steps (no HBM traffic
  between timesteps).  The time loop is fully unrolled (L is a small static
  bound, 20 in UMPR).
- Variable-length masking reproduces cuDNN packed-sequence semantics
  (umpr_tpu/ops/gru.py documents the exact contract): forward valid at
  tau < len; backward (reversed time) valid at tau >= L - len, which makes
  the backward direction start at each sequence's own last valid token.
- Output y_cat[:, tau] = [h_f(tau) | h_b(L-1-tau)] is written as one aligned
  (TILE_N, 2H) store; XLA un-flips the backward half outside.

Gradients: custom_vjp whose backward recomputes through the lax.scan path
(identical numerics).  A handwritten backward kernel is a planned
optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128


def _interleave_gates(a, b, H):
    """[..., 3H] x2 -> [..., 6H] laid out [r_a r_b z_a z_b n_a n_b]."""
    return jnp.concatenate(
        [a[..., 0:H], b[..., 0:H],
         a[..., H:2 * H], b[..., H:2 * H],
         a[..., 2 * H:], b[..., 2 * H:]], axis=-1)


def _block_diag_whh(w_f, w_b, H):
    """(H, 3H) x2 -> (2H, 6H) block-diagonal with the interleaved layout."""
    z = jnp.zeros((H, H), w_f.dtype)
    cols = []
    for g in range(3):
        f = w_f[:, g * H:(g + 1) * H]
        b = w_b[:, g * H:(g + 1) * H]
        cols.append(jnp.concatenate([f, z], axis=0))
        cols.append(jnp.concatenate([z, b], axis=0))
    return jnp.concatenate(cols, axis=1)


def _bigru_kernel(xg_ref, len_ref, whh_ref, bhh_ref, y_ref, h_scr, *, H, L):
    """One grid step == one timestep tau over the FULL batch.

    The grid axis is time: Pallas streams the (N, 1, 6H) gate slice for step
    tau+1 from HBM while step tau computes (automatic double buffering), and
    the (N, 2H) hidden state lives in a VMEM scratch that persists across
    grid steps.  The recurrent matmul is (N, 2H) @ (2H, 6H) -- full batch
    width, so Mosaic pipelines the row blocks through the MXU.
    """
    tau = pl.program_id(0)

    @pl.when(tau == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    lengths = len_ref[:]          # (N, 1) int32
    h = h_scr[:]                  # (N, 2H)
    xg_t = xg_ref[:]              # (N, 6H) this timestep's gates
    hg = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32) + bhh_ref[:]
    r = jax.nn.sigmoid(xg_t[:, :2 * H] + hg[:, :2 * H])
    z = jax.nn.sigmoid(xg_t[:, 2 * H:4 * H] + hg[:, 2 * H:4 * H])
    ncand = jnp.tanh(xg_t[:, 4 * H:] + r * hg[:, 4 * H:])
    h_new = (1.0 - z) * ncand + z * h

    # Effective original-time position per half: tau for the forward lanes,
    # L-1-tau for the (time-reversed) backward lanes.  Integer select + one
    # compare (Mosaic cannot select between i1 vectors).
    lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    eff_t = jnp.where(lane < H, tau, L - 1 - tau)
    valid = eff_t < lengths       # (N, 2H); bwd starts at len-1
    h = jnp.where(valid, h_new, h)
    h_scr[:] = h
    y_ref[:] = jnp.where(valid, h_new, 0.0)


def _bigru_pallas_fwd_impl(params, x, lengths):
    N, L, E = x.shape
    H = params["fwd"]["w_hh"].shape[0]
    # The kernel computes in f32 (scratch/h state); accept bf16 inputs from
    # the mixed-precision path by promoting here and casting the output back.
    out_dtype = x.dtype
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
        params = jax.tree.map(lambda a: a.astype(jnp.float32), params)

    xg_f = x @ params["fwd"]["w_ih"] + params["fwd"]["bias_ih"]
    xg_b = x[:, ::-1] @ params["bwd"]["w_ih"] + params["bwd"]["bias_ih"]
    # Flatten time into columns: (N, L*6H).  The per-timestep block is then
    # a clean (N, 6H) column slice -- no transpose passes, block dims stay
    # 8/128-aligned, and the reshape is a free bitcast on contiguous memory.
    xg = _interleave_gates(xg_f, xg_b, H).reshape(N, L * 6 * H)

    w_blk = _block_diag_whh(params["fwd"]["w_hh"], params["bwd"]["w_hh"], H)
    b_blk = _interleave_gates(params["fwd"]["bias_hh"], params["bwd"]["bias_hh"], H)

    kernel = functools.partial(_bigru_kernel, H=H, L=L)
    y_cat = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((N, 6 * H), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 2 * H), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L * 2 * H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, 2 * H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * L * 2 * H * 6 * H,
            bytes_accessed=4 * N * L * 8 * H,
            transcendentals=6 * N * L * H,
        ),
        interpret=jax.default_backend() != "tpu",  # CI: interpreted on CPU
    )(xg, lengths.astype(jnp.int32).reshape(N, 1), w_blk, b_blk.reshape(1, -1))

    # Un-flip the backward half (y_cat[:, tau, H:] is h_b at position
    # L-1-tau); the reshape back to (N, L, 2H) is free.
    y_cat = y_cat.reshape(N, L, 2 * H)
    y = jnp.concatenate([y_cat[..., :H], y_cat[:, ::-1, H:]], axis=-1)
    return y.astype(out_dtype)


@jax.custom_vjp
def bigru_pallas(params, x, lengths):
    return _bigru_pallas_fwd_impl(params, x, lengths)


def _fwd(params, x, lengths):
    return _bigru_pallas_fwd_impl(params, x, lengths), (params, x, lengths)


def _bwd(res, dy):
    """Backward via the scan path (identical numerics to the kernel)."""
    from umpr_tpu.ops.gru import bigru_scan
    params, x, lengths = res
    _, vjp = jax.vjp(lambda p, xx: bigru_scan(p, xx, lengths), params, x)
    dparams, dx = vjp(dy)
    return dparams, dx, None


bigru_pallas.defvjp(_fwd, _bwd)
