"""Fused Pallas TPU kernels for the masked bidirectional GRU (fwd + bwd).

Forward design (see /opt/skills/guides/pallas_guide.md):

- Input projection runs in a dedicated PALLAS MATMUL KERNEL (default while
  2E <= 128, see _proj_mode): xg = xc @ W_blk + b over (row tile, timestep)
  blocks of the (N, L*128) stacked-input stream, against a block-structured
  weight (fwd rows feed fwd lanes, bwd rows feed bwd lanes), emitting the
  interleaved gate layout [r_f r_b | z_f z_b | n_f n_b] in the row-major
  {1,0} layout the GRU kernel streams.  XLA's own projection matmul emits
  {0,1} and inserts full-tensor relayout copies at the kernel boundary --
  profiled at ~10% of the UMPR-R bf16 step together with the separate
  backward contractions.  x arrives stacked with its time-flipped copy
  ([x_f | x_b | 0-pad] = _build_xc), so the weight's zero blocks cost only
  the lane padding the MXU pays for anyway.
  (The pre-fusion layout -- ONE (N*L, 2E) @ (2E, 6H) XLA matmul emitting
  (N, L*6H) -- is kept as _proj_mode "stacked" for A/B; wide embeddings
  2E > 128 keep per-direction projections + interleave, where the stacked
  form's zero blocks would cost real MACs.)
- BOTH directions run in the SAME time loop: the backward direction is
  expressed in reversed time (combined step tau processes original position
  L-1-tau for the bwd lanes), so the carried state is one (R, 2H) block and
  the recurrent matmul is a single (R, 2H) @ (2H, 6H) MXU op per step
  against a block-diagonal weight -- for H=64 that is fully lane-aligned
  (128 and 384 wide), unlike two separate H=64 halves.
- Grid = (N tiles, L timesteps), timestep fastest; Pallas streams the next
  timestep's gate slice from HBM while the current one computes, and the
  hidden state lives in a VMEM scratch that persists across the time steps
  of each row tile.  Time is flattened into columns ((N, L*6H)) so the
  per-step block is a clean column slice -- no transpose passes.
- Variable-length masking reproduces cuDNN packed-sequence semantics
  (umpr_tpu/ops/gru.py documents the contract): forward lanes valid at
  tau < len; backward lanes valid at tau >= L - len, which makes the
  backward direction start at each sequence's own last valid token.

Backward: a second kernel sweeps the combined time axis in reverse,
rematerializing the gates from the saved post-step states (one extra
(R, 2H) @ (2H, 6H) matmul per step instead of storing gate tensors),
accumulating dW_hh/db_hh in VMEM scratch across the sweep and emitting the
per-step gate gradients dxg; the projection-backward Pallas kernel then
consumes dxg in its native {1,0} layout -- dxc = dxg @ W^T plus the
dW_ih/db_ih accumulation in one row-tile sweep, so no relayout copies or
separate XLA contractions remain (non-fused modes let XLA do those
contractions outside).  Verified against jax.grad of the lax.scan path to
~1e-5 (tests/test_gru_pallas.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_ROWS = 768  # row-tile cap: keeps the fwd+bwd kernels inside the 16 MB VMEM budget


def _interpret():
    return jax.default_backend() != "tpu"  # CI runs kernels interpreted on CPU


def _interleave_gates(a, b, H):
    """[..., 3H] x2 -> [..., 6H] laid out [r_a r_b z_a z_b n_a n_b]."""
    return jnp.concatenate(
        [a[..., 0:H], b[..., 0:H],
         a[..., H:2 * H], b[..., H:2 * H],
         a[..., 2 * H:], b[..., 2 * H:]], axis=-1)


def _block_diag(w_f, w_b, H):
    """(E, 3H) x2 -> (2E, 6H) block-structured with the interleaved column
    layout: rows [0, E) feed the fwd lanes, rows [E, 2E) the bwd lanes, so
    `concat([x_f, x_b], -1) @ _block_diag(...)` emits [r_f r_b z_f z_b n_f
    n_b] directly.  Used for w_hh (E == H) and, since the xg-layout rework,
    for w_ih (E = embedding dim): one stacked matmul produces xg in the
    kernel's native layout with no big-tensor interleave copies (the zero
    blocks cost nothing -- the contraction dim pads to the 128-lane MXU
    tile either way at these sizes)."""
    E = w_f.shape[0]
    z = jnp.zeros((E, H), w_f.dtype)
    cols = []
    for g in range(3):
        f = w_f[:, g * H:(g + 1) * H]
        b = w_b[:, g * H:(g + 1) * H]
        cols.append(jnp.concatenate([f, z], axis=0))
        cols.append(jnp.concatenate([z, b], axis=0))
    return jnp.concatenate(cols, axis=1)


_block_diag_whh = _block_diag  # (H, 3H) x2 -> (2H, 6H) recurrent case

_MXU_LANES = 128


def _proj_mode(E):
    """How the input projection xg = x @ W_ih + b_ih reaches the kernels.

    - "fused" (default while 2E <= 128): dedicated Pallas matmul kernels
      compute the projection (fwd) and the dxc/dW_ih/db_ih contractions
      (bwd) over (row tile, timestep) blocks of the (N, L*128) stacked
      stream, producing/consuming the GRU kernels' row-major {1,0} layout
      and (N, L*width) shapes directly (row-splitting reshapes are NOT
      bitcasts under TPU tiling -- see _build_xc).  XLA's own projection matmul emits {0,1} and inserts
      full-tensor relayout copies at the kernel boundary (profiled at ~10%
      of the UMPR-R bf16 step together with the separate backward
      contractions); a per-timestep in-kernel projection was also measured
      and is NOT this mode -- its small per-step dots paid ~5us of issue/
      stall latency each, eating exactly what the copies cost.
    - "stacked": the pre-fused-projection layout -- ONE (N*L, 2E) @
      (2E, 6H) XLA matmul emitting the interleaved gate layout (kept as an
      A/B reference; measured on TPU 2026-08-18).
    - "wide" (2E > 128, i.e. GloVe 100/200/300d): per-direction projections
      + explicit interleave; the stacked/fused zero blocks would double the
      useful MACs past one MXU lane tile.

    UMPR_GRU_PROJ=fused/stacked/wide overrides; the legacy
    UMPR_GRU_STACKED_PROJ=0/1 hook still forces wide/stacked.  Both are
    read at trace time: set them before the jitted function first runs."""
    override = os.environ.get("UMPR_GRU_PROJ")
    if override in ("fused", "stacked", "wide"):
        if override != "wide" and 2 * E > _MXU_LANES:
            return "wide"
        return override
    legacy = os.environ.get("UMPR_GRU_STACKED_PROJ")
    if legacy is not None:
        if legacy in ("0", "false", "False") or 2 * E > _MXU_LANES:
            return "wide"
        return "stacked"
    return "fused" if 2 * E <= _MXU_LANES else "wide"


def _use_stacked_proj(E):
    """Legacy predicate: does the xg-based path use the stacked layout?
    (The fused path bypasses xg entirely; see _proj_mode.)"""
    return _proj_mode(E) != "wide"


def _make_valid(lengths, tau, H, L, rows):
    """(rows, 2H) f32 mask: fwd lanes valid at tau < len, bwd lanes at
    original position L-1-tau < len.  Integer select + one compare
    (Mosaic cannot select between i1 vectors)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 2 * H), 1)
    eff_t = jnp.where(lane < H, tau, L - 1 - tau)
    return eff_t < lengths  # bool


# ----------------------------------------------------------------- forward
def _fwd_step(xg_t, h, w, b, lengths, tau, H, L):
    """One recurrent step on values; returns (h, y_t).

    h is always carried in f32; under bf16 IO the recurrent matmul's
    operands are bf16 (2x MXU rate) with f32 accumulation, and the gate
    math stays f32."""
    xg_t = xg_t.astype(jnp.float32)
    hg = jnp.dot(h.astype(w.dtype), w, preferred_element_type=jnp.float32) + b
    r = jax.nn.sigmoid(xg_t[:, :2 * H] + hg[:, :2 * H])
    z = jax.nn.sigmoid(xg_t[:, 2 * H:4 * H] + hg[:, 2 * H:4 * H])
    ncand = jnp.tanh(xg_t[:, 4 * H:] + r * hg[:, 4 * H:])
    h_new = (1.0 - z) * ncand + z * h
    valid = _make_valid(lengths, tau, H, L, h.shape[0])
    h = jnp.where(valid, h_new, h)
    return h, jnp.where(valid, h_new, 0.0)


def _fwd_kernel(xg_ref, len_ref, whh_ref, bhh_ref, y_ref, hs_ref, h_scr,
                *, H, L, T, emit_hs):
    """Grid (row tile, time block); each call advances T timesteps -- the
    per-grid-step overheads (DMA waits, bookkeeping) amortize over T."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    lengths = len_ref[:]          # (R, 1) int32
    h = h_scr[:]                  # (R, 2H) f32
    w, b = whh_ref[:], bhh_ref[:].astype(jnp.float32)
    for k in range(T):
        h, y = _fwd_step(xg_ref[:, k * 6 * H:(k + 1) * 6 * H], h, w, b,
                         lengths, t * T + k, H, L)
        y_ref[:, k * 2 * H:(k + 1) * 2 * H] = y.astype(y_ref.dtype)
        if emit_hs:
            hs_ref[:, k * 2 * H:(k + 1) * 2 * H] = h.astype(hs_ref.dtype)
    h_scr[:] = h


def _time_tile(L):
    # Measured end-to-end on v5e: T=2 wins the isolated GRU micro-bench
    # slightly but regresses the full train step (~-10%%, likely scheduling
    # interplay with the backward kernel); keep T=1.
    return 1


def _pallas_forward(params, xg, lengths, N, L, H, emit_hs):
    R = min(N, MAX_ROWS)
    T = _time_tile(L)
    io = xg.dtype  # bf16 IO streams half the bytes and runs 2x-rate matmuls
    w_blk = _block_diag_whh(params["fwd"]["w_hh"], params["bwd"]["w_hh"], H)
    b_blk = _interleave_gates(params["fwd"]["bias_hh"],
                              params["bwd"]["bias_hh"], H).reshape(1, -1)
    kernel = functools.partial(_fwd_kernel, H=H, L=L, T=T, emit_hs=emit_hs)
    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(N, R), L // T),
        in_specs=[
            pl.BlockSpec((R, T * 6 * H), lambda i, t: (i, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, T * 2 * H), lambda i, t: (i, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, T * 2 * H), lambda i, t: (i, t) if emit_hs else (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, L * 2 * H), io),
            jax.ShapeDtypeStruct((N, (L if emit_hs else T) * 2 * H), io),
        ],
        scratch_shapes=[pltpu.VMEM((R, 2 * H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * L * 2 * H * 6 * H,
            bytes_accessed=4 * N * L * (8 + (2 if emit_hs else 0)) * H,
            transcendentals=6 * N * L * H,
        ),
        interpret=_interpret(),
    )(xg, lengths.astype(jnp.int32).reshape(N, 1), w_blk, b_blk)
    return outs  # (y_cat, hs_cat)


def _stack_time(x):
    """(N, L, E) -> (N, L, 2E): true-time lanes next to flipped-time lanes.
    The flip touches only the (small-E) input, not the 6H-wide gate tensor
    the old per-direction path had to interleave afterwards."""
    return jnp.concatenate([x, x[:, ::-1]], axis=-1)


# ----------------------------------------- Pallas-projected input (fused)
# The GRU kernels consume/emit xg / dxg in plain row-major {1,0}; XLA's
# projection matmul however emits {0,1} and inserts full-tensor relayout
# copies at the kernel boundary (profiled at ~10% of the UMPR-R bf16 step,
# with the separate dW_ih/dx contractions adding more).  These projection
# kernels compute the SAME matmuls in Pallas over (row tile, timestep)
# blocks of the (N, L*C) stream, so the {1,0} layout is produced/consumed
# directly -- no copies, and the backward folds dW_ih/db_ih accumulation
# into the same sweep that computes the input-stream gradient.
# (A fully fused variant -- projecting per timestep INSIDE the GRU kernels
# -- measured device-neutral: each small per-step dot pays ~5us of issue/
# stall latency, eating exactly what the dead copies cost.  Big-tile
# projection kernels amortize that overhead away.)
#
# x arrives stacked ([x_f | x_b(flipped) | zero pad]) and padded to one MXU
# lane tile (_PROJ_C columns), so blocks stay 128-aligned and the
# block-diagonal weight's zero rows cost only padding the MXU pays for
# anyway (2E <= 128 is the mode's precondition, see _proj_mode).

_PROJ_C = _MXU_LANES


def _proj_rows(dtype):
    """Projection row tile, bounded by the 16 MB scoped-VMEM budget: the
    backward holds (R, 6H) + 2x(R, C) blocks double-buffered plus the
    (C, 6H) f32 accumulators (R=2048 f32 measured 24 MB > 16 MB)."""
    return 2048 if jnp.dtype(dtype).itemsize <= 2 else 1024


def _build_xc(x, E):
    """(N, L, E) -> (N, L*_PROJ_C) stacked + zero-padded input stream.

    Shapes stay (N, L*width) END TO END through the projection and GRU
    kernels: on TPU's (8, 128)-tiled layouts a reshape that splits the row
    dimension ((N, L*w) <-> (N*L, w)) is NOT a bitcast -- XLA materializes
    it as a full-tensor copy, which is exactly the traffic these kernels
    exist to avoid (measured: 1.4 + 0.7 ms per 20 steps when the projection
    kernels briefly used flat (N*L, w) shapes)."""
    N, L = x.shape[0], x.shape[1]
    xc = _stack_time(x)
    if 2 * E < _PROJ_C:
        xc = jnp.pad(xc, ((0, 0), (0, 0), (0, _PROJ_C - 2 * E)))
    return xc.reshape(N, L * _PROJ_C)


def _proj_weights(params, H, E):
    """Block-diagonal (C, 6H) weight + (1, 6H) bias in the interleaved gate
    layout, rows zero-padded to the lane tile."""
    w = _block_diag(params["fwd"]["w_ih"], params["bwd"]["w_ih"], H)
    if 2 * E < _PROJ_C:
        w = jnp.pad(w, ((0, _PROJ_C - 2 * E), (0, 0)))
    b = _interleave_gates(params["fwd"]["bias_ih"],
                          params["bwd"]["bias_ih"], H).reshape(1, -1)
    return w, b


def _xg_precision(io):
    # f32 path: 3-pass HIGHEST keeps the projection at full f32 accuracy
    # (and fwd/bwd remat consistency is exact either way -- both kernels run
    # the same dot on the same operands).  bf16 operands reject HIGHEST;
    # their native MXU mode already accumulates in f32.
    return (jax.lax.Precision.HIGHEST if io == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _proj_fwd_kernel(xc_ref, wih_ref, bih_ref, xg_ref):
    prec = _xg_precision(wih_ref.dtype)
    xg_ref[:] = (jnp.dot(xc_ref[:], wih_ref[:],
                         preferred_element_type=jnp.float32, precision=prec)
                 + bih_ref[:].astype(jnp.float32)).astype(xg_ref.dtype)


def _pallas_project_fwd(xc, wih, bih, H, N, L):
    """(N, L*C) -> (N, L*6H): per (row tile, timestep) block one
    (R, C) @ (C, 6H) + b matmul, emitted in the row-major {1,0} layout the
    GRU kernel streams -- no relayout copy can appear between them."""
    R = min(N, _proj_rows(xc.dtype))
    io = xc.dtype
    return pl.pallas_call(
        _proj_fwd_kernel,
        grid=(pl.cdiv(N, R), L),
        in_specs=[
            pl.BlockSpec((R, _PROJ_C), lambda i, t: (i, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 6 * H), lambda i, t: (i, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L * 6 * H), io),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * L * _PROJ_C * 6 * H,
            bytes_accessed=xc.dtype.itemsize * N * L * (_PROJ_C + 6 * H),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xc, wih, bih)


def _proj_bwd_kernel(dxg_ref, xc_ref, wih_t_ref, *out_and_scratch, N, R, L,
                     emit_dxc):
    """One sweep over (row tile, timestep) blocks: dxc = dxg @ W^T, with
    dW_ih = xc^T @ dxg and db_ih = sum(dxg) accumulated in VMEM scratch
    (sequential grid).  emit_dxc=False (the frozen-embedding case: the
    input-stream gradient is dead, see bigru_pallas_nodx) drops the dxc
    matmul and its (N, L*C) HBM write entirely."""
    if emit_dxc:
        dxc_ref, dwih_ref, dbih_ref, dw_scr, db_scr = out_and_scratch
    else:
        dwih_ref, dbih_ref, dw_scr, db_scr = out_and_scratch
    i, t = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (t == 0))
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    io = dxg_ref.dtype
    prec = _xg_precision(io)
    rows = dxg_ref.shape[0]
    # the last row tile's padding rows read garbage blocks; zero BOTH
    # operands (0 * NaN = NaN would poison the weight accumulators)
    real = ((jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + i * R) < N)
    dxg = jnp.where(real, dxg_ref[:], jnp.zeros_like(dxg_ref[:]))
    x = jnp.where(real, xc_ref[:], jnp.zeros_like(xc_ref[:]))

    if emit_dxc:
        dxc_ref[:] = jnp.dot(dxg, wih_t_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=prec).astype(io)
    dw_scr[0] += jax.lax.dot_general(
        x, dxg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    db_scr[0] += jnp.sum(dxg.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when((i == pl.num_programs(0) - 1) & (t == L - 1))
    def _():
        dwih_ref[:] = dw_scr[:]
        dbih_ref[:] = db_scr[:]


def _pallas_project_bwd(dxg, xc, wih, H, N, L, emit_dxc=True):
    """-> (dxc (N, L*C) | None, dW_blk (C, 6H) f32, db_blk (6H,) f32),
    consuming dxg (N, L*6H) in the GRU backward kernel's native {1,0}
    layout.  emit_dxc=False skips the input-stream gradient (frozen
    embedding: dx is dead, but XLA cannot DCE through the kernel)."""
    R = min(N, _proj_rows(xc.dtype))
    io = xc.dtype
    kernel = functools.partial(_proj_bwd_kernel, N=N, R=R, L=L,
                               emit_dxc=emit_dxc)
    dxc_spec = [pl.BlockSpec((R, _PROJ_C), lambda i, t: (i, t),
                             memory_space=pltpu.VMEM)] if emit_dxc else []
    dxc_shape = ([jax.ShapeDtypeStruct((N, L * _PROJ_C), io)]
                 if emit_dxc else [])
    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(N, R), L),
        in_specs=[
            pl.BlockSpec((R, 6 * H), lambda i, t: (i, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, _PROJ_C), lambda i, t: (i, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=dxc_spec + [
            pl.BlockSpec((1, _PROJ_C, 6 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 6 * H), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=dxc_shape + [
            jax.ShapeDtypeStruct((1, _PROJ_C, 6 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 6 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, _PROJ_C, 6 * H), jnp.float32),
            pltpu.VMEM((1, 1, 6 * H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),  # accumulators
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 if emit_dxc else 1) * N * L * _PROJ_C * 6 * H,
            bytes_accessed=xc.dtype.itemsize * N * L
            * ((2 if emit_dxc else 1) * _PROJ_C + 6 * H),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(dxg, xc, wih.T)
    if emit_dxc:
        dxc, dwih, dbih = outs
        return dxc, dwih[0], dbih[0, 0]
    dwih, dbih = outs
    return None, dwih[0], dbih[0, 0]


# ------------------------------------------------- boundary repack kernels
# The GRU kernels speak combined time over sentence rows ((N, L*2H) {1,0});
# the model consumes TRUE-time tensors in two layouts: (B, S*L, 2H) for the
# affinity attention and (B*S, L, 2H) for S-Net.  Expressed in XLA, the
# conversions (reverse + concat + row<->column regrouping reshapes) run as
# chains of materialized full-tensor copies at ~15-30 GB/s -- profiled at
# 17-29% of the UMPR-R device step.  These kernels do each conversion in
# ONE pass: one HBM read, the shuffles in VMEM, one HBM write per output.
# (Mosaic has no `rev` primitive: time reversal is a static reversed-slice
# concat, which lowers to the same VMEM shuffles.)

_REPACK_K = 8  # batch rows per block (= 8*S sentence rows)


def _gru_out_kernel(ycat_ref, pos_ref, sent_ref, *, k, S, L, H):
    v = ycat_ref[:].reshape(k * S, L, 2 * H)
    fwd = v[..., :H]
    bwd = jnp.concatenate([v[:, L - 1 - t:L - t, H:] for t in range(L)],
                          axis=1)  # un-flip the reversed-time lanes
    y_sent = jnp.concatenate([fwd, bwd], axis=-1)       # (kS, L, 2H) true time
    sent_ref[:] = y_sent
    pos_ref[:] = y_sent.reshape(k, S * L, 2 * H)


def _pallas_gru_outputs(y_cat, S, L, H):
    """(N, L*2H) combined time -> ((N/S, S*L, 2H), (N, L, 2H)) true time."""
    N = y_cat.shape[0]
    B2 = N // S
    k = min(_REPACK_K, B2)
    kern = functools.partial(_gru_out_kernel, k=k, S=S, L=L, H=H)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(B2, k),),
        in_specs=[pl.BlockSpec((k * S, L * 2 * H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((k, S * L, 2 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * S, L, 2 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B2, S * L, 2 * H), y_cat.dtype),
            jax.ShapeDtypeStruct((N, L, 2 * H), y_cat.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=3 * y_cat.dtype.itemsize * N * L * 2 * H),
        interpret=_interpret(),
    )(y_cat)


def _gru_dy_kernel(dpos_ref, dsent_ref, dycat_ref, *, k, S, L, H):
    dsum = dpos_ref[:].reshape(k * S, L, 2 * H) + dsent_ref[:]
    fwd = dsum[..., :H]
    bwd = jnp.concatenate([dsum[:, L - 1 - t:L - t, H:] for t in range(L)],
                          axis=1)  # back to reversed (combined) time
    dycat_ref[:] = jnp.concatenate([fwd, bwd], axis=-1).reshape(
        k * S, L * 2 * H)


def _pallas_gru_dy(dpos, dsent, S, L, H):
    """VJP of _pallas_gru_outputs: sum both cotangents, re-flip, emit the
    combined-time (N, L*2H) stream the backward kernel reads."""
    N = dsent.shape[0]
    B2 = N // S
    k = min(_REPACK_K, B2)
    kern = functools.partial(_gru_dy_kernel, k=k, S=S, L=L, H=H)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(B2, k),),
        in_specs=[
            pl.BlockSpec((k, S * L, 2 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * S, L, 2 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * S, L * 2 * H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L * 2 * H), dsent.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=3 * dsent.dtype.itemsize * N * L * 2 * H),
        interpret=_interpret(),
    )(dpos, dsent)


# sentence rows per stack-pad block: the in-kernel value intermediates
# (the (R*L, E) -> (R, L, E) regroup, its reversed copy, and the padded
# concat) live in scoped VMEM at 128-lane vreg granularity -- R=256
# measured 23.4 MB > the 16 MB budget; 96 keeps ~8 MB of headroom
_STACK_ROWS = 96


def _stack_pad_kernel(x_ref, xc_ref, *, R, L, E):
    v = x_ref[:]                                        # (R, L, E)
    rev = jnp.concatenate([v[:, L - 1 - t:L - t] for t in range(L)], axis=1)
    z = jnp.zeros((R, L, _PROJ_C - 2 * E), v.dtype)
    xc_ref[:] = jnp.concatenate([v, rev, z], axis=-1).reshape(R, L * _PROJ_C)


def _pallas_stack_pad(x, N, L, E):
    """(N, L, E) sentence-row input (a free leading-dim view of the
    (B, S, L, E) embedding lookup) -> the stacked+padded (N, L*C)
    projection stream [x | x flipped | 0], replacing _build_xc's XLA
    reverse + pad + relayout chain with one single-pass kernel."""
    R = min(_STACK_ROWS, N)
    kern = functools.partial(_stack_pad_kernel, R=R, L=L, E=E)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(N, R),),
        in_specs=[pl.BlockSpec((R, L, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, L * _PROJ_C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L * _PROJ_C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=x.dtype.itemsize * N * L * (E + _PROJ_C)),
        interpret=_interpret(),
    )(x)


def _build_xg(params, x, H):
    """Input projections for both directions as ONE stacked matmul whose
    output is already in the kernel's interleaved gate layout.  Replaces
    the old two-matmul + 6-slice interleave, whose (N, L*6H) concat showed
    up in step profiles as ~177 MB of relayout/dynamic-update-slice traffic
    at the UMPR-R shapes (N=2560, L=20, H=64).  Wide embeddings
    (2E > one MXU lane tile, see _use_stacked_proj) keep the per-direction
    matmuls + interleave: there the stacked form's zero blocks cost real
    MACs."""
    N, L = x.shape[0], x.shape[1]
    E = x.shape[2]
    if _use_stacked_proj(E):
        w = _block_diag(params["fwd"]["w_ih"], params["bwd"]["w_ih"], H)
        b = _interleave_gates(params["fwd"]["bias_ih"],
                              params["bwd"]["bias_ih"], H)
        return (_stack_time(x) @ w + b).reshape(N, L * 6 * H)
    xg_f = x @ params["fwd"]["w_ih"] + params["fwd"]["bias_ih"]
    xg_b = x[:, ::-1] @ params["bwd"]["w_ih"] + params["bwd"]["bias_ih"]
    return _interleave_gates(xg_f, xg_b, H).reshape(N, L * 6 * H)


def _unflip(y_cat, N, L, H):
    """combined-time (N, L*2H) -> true-time (N, L, 2H)."""
    y_cat = y_cat.reshape(N, L, 2 * H)
    return jnp.concatenate([y_cat[..., :H], y_cat[:, ::-1, H:]], axis=-1)


def _bigru_pallas_fwd_impl(params, x, lengths, emit_hs=False):
    """f32 IO computes everything in f32 (exact-parity path); bf16 IO keeps
    the input / y / hs streams and matmul operands in bf16 (f32 accumulation
    and f32 carried state inside the kernel) -- the mixed-precision path.

    Returns (y, (stream, hs_cat)) where stream is the saved-for-backward
    input tensor: the stacked x stream xc in fused-projection mode, the
    projected gate tensor xg otherwise (see _proj_mode)."""
    N, L, E = x.shape
    H = params["fwd"]["w_hh"].shape[0]
    if x.dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(x.dtype), params)
    if _proj_mode(E) == "fused":
        xc = _build_xc(x, E)                                    # (N, L*C)
        wih, bih = _proj_weights(params, H, E)
        xg = _pallas_project_fwd(xc, wih, bih, H, N, L)
        y_cat, hs_cat = _pallas_forward(params, xg, lengths, N, L, H, emit_hs)
        y = _unflip(y_cat, N, L, H)
        return y, ((xc, xg), hs_cat)
    xg = _build_xg(params, x, H)
    y_cat, hs_cat = _pallas_forward(params, xg, lengths, N, L, H, emit_hs)
    y = _unflip(y_cat, N, L, H)
    return y, (xg, hs_cat)


# ---------------------------------------------------------------- backward
def _bwd_kernel(xg_ref, hs_prev_ref, dy_ref, len_ref, whh_ref, bhh_ref,
                whh_t_ref, dxg_ref, dw_ref, db_ref, g_scr, dw_scr, db_scr,
                *, H, L, N, R):
    """Grid (i, t) with combined time tau = L-1-t (reverse sweep).

    Rematerializes the gates from hs[tau-1], accumulates dW_hh/db_hh in
    scratch across the sweep, emits dxg per step."""
    t = pl.program_id(1)
    tau = L - 1 - t

    @pl.when(t == 0)
    def _():
        g_scr[:] = jnp.zeros_like(g_scr)
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    lengths = len_ref[:]
    rows = g_scr.shape[0]
    # Rows beyond N (the last tile's padding) read garbage blocks; their
    # output rows are clipped on write, but the dW/db accumulations would
    # silently include them -- mask them out of everything.
    real = ((jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
             + pl.program_id(0) * R) < N)
    # h before this step: hs[tau-1], or zeros at tau == 0.  Garbage (padded
    # rows / undefined blocks) may be NaN, so masking must be a select --
    # 0 * NaN is NaN.
    io = xg_ref.dtype  # bf16 IO: bf16 stream loads + 2x-rate matmul operands
    # HIGHEST (3-pass f32 contraction) only exists for f32 operands; Mosaic
    # rejects it on bf16, whose native MXU mode already accumulates in f32.
    prec = (jax.lax.Precision.HIGHEST if io == jnp.float32
            else jax.lax.Precision.DEFAULT)
    h_prev = jnp.where(real & (tau > 0),
                       hs_prev_ref[:].astype(jnp.float32), 0.0)

    xg_t = xg_ref[:].astype(jnp.float32)
    hg = jnp.dot(h_prev.astype(io), whh_ref[:],
                 preferred_element_type=jnp.float32,
                 precision=prec) + bhh_ref[:].astype(jnp.float32)
    hn_lin = hg[:, 4 * H:]
    r = jax.nn.sigmoid(xg_t[:, :2 * H] + hg[:, :2 * H])
    z = jax.nn.sigmoid(xg_t[:, 2 * H:4 * H] + hg[:, 2 * H:4 * H])
    n = jnp.tanh(xg_t[:, 4 * H:] + r * hn_lin)

    valid = _make_valid(lengths, tau, H, L, rows) & real  # (R, 2H) bool
    g = g_scr[:] + jnp.where(valid, dy_ref[:].astype(jnp.float32), 0.0)

    dz = g * (h_prev - n)
    dn_pre = g * (1.0 - z) * (1.0 - n * n)

    # mask gate grads with selects (invalid steps and padded rows may hold
    # NaN garbage): invalid steps contribute nothing
    dn_pre_m = jnp.where(valid, dn_pre, 0.0)
    dhn = jnp.where(valid, dn_pre * r, 0.0)
    dr_pre = jnp.where(valid, dn_pre * hn_lin * r * (1.0 - r), 0.0)
    dz_pre = jnp.where(valid, dz * z * (1.0 - z), 0.0)

    dxg_ref[:] = jnp.concatenate([dr_pre, dz_pre, dn_pre_m],
                                 axis=-1).astype(io)
    ghh = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)  # (R, 6H) f32

    # dh_prev = g*z + ghh @ W^T  on valid lanes; pass-through elsewhere
    dh = g * z + jnp.dot(ghh.astype(io), whh_t_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=prec)
    g_scr[:] = jnp.where(valid, dh, g)

    # dW accumulation stays f32 in scratch; f32 IO keeps the HIGHEST-
    # precision contraction, bf16 IO trades it for single-pass MXU rate.
    dw_scr[0] += jax.lax.dot_general(
        h_prev.astype(io), ghh.astype(io), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    db_scr[0] += jnp.sum(ghh, axis=0, keepdims=True)

    @pl.when(t == L - 1)
    def _():
        dw_ref[:] = dw_scr[:]
        db_ref[:] = db_scr[:]


def _pallas_backward(params, xg, hs_cat, dy_cat, lengths, N, L, H):
    R = min(N, MAX_ROWS)
    n_tiles = pl.cdiv(N, R)
    io = xg.dtype
    w_blk = _block_diag_whh(params["fwd"]["w_hh"], params["bwd"]["w_hh"], H)
    b_blk = _interleave_gates(params["fwd"]["bias_hh"],
                              params["bwd"]["bias_hh"], H).reshape(1, -1)
    kernel = functools.partial(_bwd_kernel, H=H, L=L, N=N, R=R)
    # hs_prev block: combined time tau-1 = L-t-2, clamped at 0 (the tau==0
    # step multiplies it away)
    dxg, dw_part, db_part = pl.pallas_call(
        kernel,
        grid=(n_tiles, L),
        in_specs=[
            pl.BlockSpec((R, 6 * H), lambda i, t: (i, L - 1 - t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 2 * H), lambda i, t: (i, jnp.maximum(L - t - 2, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 2 * H), lambda i, t: (i, L - 1 - t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, 6 * H), lambda i, t: (i, L - 1 - t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * H, 6 * H), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 6 * H), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, L * 6 * H), io),
            jax.ShapeDtypeStruct((n_tiles, 2 * H, 6 * H), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, 6 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 2 * H), jnp.float32),
            pltpu.VMEM((1, 2 * H, 6 * H), jnp.float32),
            pltpu.VMEM((1, 1, 6 * H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * N * L * 2 * H * 6 * H,
            bytes_accessed=4 * N * L * 16 * H,
            transcendentals=6 * N * L * H,
        ),
        interpret=_interpret(),
    )(xg, hs_cat, dy_cat, lengths.astype(jnp.int32).reshape(N, 1),
      w_blk, b_blk, w_blk.T)
    return dxg, dw_part.sum(axis=0), db_part.sum(axis=0)[0]


def _deinterleave(cat, H):
    """[..., 6H] laid out [r_f r_b z_f z_b n_f n_b] -> two [..., 3H]."""
    f = jnp.concatenate([cat[..., 0:H], cat[..., 2 * H:3 * H],
                         cat[..., 4 * H:5 * H]], axis=-1)
    b = jnp.concatenate([cat[..., H:2 * H], cat[..., 3 * H:4 * H],
                         cat[..., 5 * H:6 * H]], axis=-1)
    return f, b


def _make_bigru_pallas(need_dx):
    @jax.custom_vjp
    def f(params, x, lengths):
        y, _ = _bigru_pallas_fwd_impl(params, x, lengths)
        return y
    f.defvjp(_vjp_fwd, functools.partial(_vjp_bwd, need_dx=need_dx))
    return f


def _vjp_fwd(params, x, lengths):
    y, (stream, hs_cat) = _bigru_pallas_fwd_impl(params, x, lengths,
                                                 emit_hs=True)
    # fused mode saves the (stacked, padded) x stream + xg; x itself is
    # then not needed as a residual
    x_res = None if _proj_mode(x.shape[2]) == "fused" else x
    return y, (params, x_res, lengths, stream, hs_cat)


def _vjp_bwd_fused(params, lengths, stream, hs_cat, dy, need_dx=True):
    """Backward for the fused-projection mode, from a true-time (N, L, 2H)
    cotangent (the XLA unflip builds dy_cat; the split API's repack kernel
    replaces it, see _bwd_fused_from_dycat)."""
    xg = stream[1]
    in_dtype = xg.dtype
    H = params["fwd"]["w_hh"].shape[0]
    N = xg.shape[0]
    L = xg.shape[1] // (6 * H)

    dy = dy.astype(in_dtype)
    dy_cat = jnp.concatenate([dy[..., :H], dy[:, ::-1, H:]], axis=-1)
    dy_cat = dy_cat.reshape(N, L * 2 * H)
    dparams, dx = _bwd_fused_from_dycat(params, lengths, stream, hs_cat,
                                        dy_cat, need_dx=need_dx)
    return dparams, dx, None


def _bwd_fused_from_dycat(params, lengths, stream, hs_cat, dy_cat,
                          need_dx=True):
    """Fused-mode backward core: the GRU backward kernel emits dxg {1,0},
    then the projection-backward kernel consumes it in place -- dxc =
    dxg @ W^T plus the dW_ih/db_ih accumulation in one sweep.  No relayout
    copies, no separate XLA contractions; outside work is only the tiny
    block unpacking plus the dx un-stack."""
    xc, xg = stream                      # (N, L*C) and (N, L*6H)
    in_dtype = xg.dtype
    p32 = jax.tree.map(lambda a: a.astype(in_dtype), params)
    H = params["fwd"]["w_hh"].shape[0]
    E = params["fwd"]["w_ih"].shape[0]
    N = xg.shape[0]
    L = xg.shape[1] // (6 * H)

    dxg_cat, dw_blk, db_blk = _pallas_backward(
        p32, xg, hs_cat, dy_cat, lengths, N, L, H)
    wih, _ = _proj_weights(p32, H, E)
    dxc_cat, dwih_blk, dbih_blk = _pallas_project_bwd(
        dxg_cat, xc, wih, H, N, L, emit_dxc=need_dx)

    def blk_f(g):
        return dw_blk[0:H, 2 * g * H:(2 * g + 1) * H]
    def blk_b(g):
        return dw_blk[H:2 * H, (2 * g + 1) * H:(2 * g + 2) * H]
    dw_hh_f = jnp.concatenate([blk_f(g) for g in range(3)], axis=1)
    dw_hh_b = jnp.concatenate([blk_b(g) for g in range(3)], axis=1)
    db_hh_f, db_hh_b = _deinterleave(db_blk, H)

    # input-projection grads come straight out of the kernel's block-diag
    # accumulators: rows [0, E) feed the fwd lanes, [E, 2E) the bwd lanes
    # (rows beyond 2E are the lane padding -- provably zero, dropped)
    dw_ih_f = jnp.concatenate(
        [dwih_blk[:E, 2 * g * H:(2 * g + 1) * H] for g in range(3)], axis=1)
    dw_ih_b = jnp.concatenate(
        [dwih_blk[E:2 * E, (2 * g + 1) * H:(2 * g + 2) * H] for g in range(3)],
        axis=1)
    db_ih_f, db_ih_b = _deinterleave(dbih_blk, H)

    if need_dx:
        # dxc columns [0, E) are true-time (fwd lanes), [E, 2E) flipped-time
        # (bwd lanes), matching _build_xc's stacking; columns past 2E are the
        # lane padding
        dxc = dxc_cat.reshape(N, L, _PROJ_C)
        dx = dxc[..., :E] + dxc[..., E:2 * E][:, ::-1]
    else:
        # frozen-embedding case: the caller's dx cotangent is dead; emit
        # zeros (free for XLA to fold away) instead of the (N, L*C) matmul
        dx = jnp.zeros((N, L, E), in_dtype)

    dparams = {
        "fwd": {"w_ih": dw_ih_f, "w_hh": dw_hh_f,
                "bias_ih": db_ih_f, "bias_hh": db_hh_f},
        "bwd": {"w_ih": dw_ih_b, "w_hh": dw_hh_b,
                "bias_ih": db_ih_b, "bias_hh": db_hh_b},
    }
    dparams = jax.tree.map(
        lambda g, p: g.astype(p.dtype), dparams,
        {k: params[k] for k in ("fwd", "bwd")})
    return dparams, dx.astype(in_dtype)


def _vjp_bwd(res, dy, need_dx=True):
    params, x, lengths, stream, hs_cat = res
    if _proj_mode(params["fwd"]["w_ih"].shape[0]) == "fused":
        return _vjp_bwd_fused(params, lengths, stream, hs_cat, dy,
                              need_dx=need_dx)
    xg = stream
    in_dtype = x.dtype
    x32 = x  # io dtype throughout: f32 exact path or bf16 mixed precision
    p32 = jax.tree.map(lambda a: a.astype(in_dtype), params)
    N, L, E = x.shape
    H = params["fwd"]["w_hh"].shape[0]

    # consumer grads -> combined-time layout (the unflip is an involution)
    dy = dy.astype(in_dtype)
    dy_cat = jnp.concatenate([dy[..., :H], dy[:, ::-1, H:]], axis=-1)
    dy_cat = dy_cat.reshape(N, L * 2 * H)

    dxg_cat, dw_blk, db_blk = _pallas_backward(
        p32, xg, hs_cat, dy_cat, lengths, N, L, H)

    # unpack recurrent-weight grads from the block-diagonal accumulator
    def blk_f(g):
        return dw_blk[0:H, 2 * g * H:(2 * g + 1) * H]
    def blk_b(g):
        return dw_blk[H:2 * H, (2 * g + 1) * H:(2 * g + 2) * H]
    dw_hh_f = jnp.concatenate([blk_f(g) for g in range(3)], axis=1)
    dw_hh_b = jnp.concatenate([blk_b(g) for g in range(3)], axis=1)
    db_hh_f, db_hh_b = _deinterleave(db_blk, H)

    # input-projection grads: on the stacked path dxg stays in the
    # interleaved layout end to end (contracted against the stacked
    # (2E, 6H) weight); only the tiny weight and bias grads get
    # deinterleaved, never the (N, L, 6H) tensor.  The bwd-lane columns are
    # in combined (flipped) time, matching the flipped half of
    # _stack_time(x).  Wide embeddings mirror _build_xg's per-direction
    # path (deinterleave dxg, two honest-size contractions).
    dxg = dxg_cat.reshape(N, L, 6 * H)
    if _use_stacked_proj(E):
        dw2 = jnp.einsum("nle,nlg->eg", _stack_time(x32), dxg,
                         preferred_element_type=jnp.float32)  # (2E, 6H)
        dw_ih_f = jnp.concatenate(
            [dw2[:E, 2 * g * H:(2 * g + 1) * H] for g in range(3)], axis=1)
        dw_ih_b = jnp.concatenate(
            [dw2[E:, (2 * g + 1) * H:(2 * g + 2) * H] for g in range(3)], axis=1)
        if need_dx:
            w2 = _block_diag(p32["fwd"]["w_ih"], p32["bwd"]["w_ih"], H)
            dx2 = dxg @ w2.T                                  # (N, L, 2E)
            dx = dx2[..., :E] + dx2[..., E:][:, ::-1]
        else:
            dx = jnp.zeros((N, L, E), in_dtype)
    else:
        dxg_f, dxg_b = _deinterleave(dxg, H)                  # (N, L, 3H) x2
        if need_dx:
            dx = (dxg_f @ p32["fwd"]["w_ih"].T
                  + (dxg_b @ p32["bwd"]["w_ih"].T)[:, ::-1])
        else:
            dx = jnp.zeros((N, L, E), in_dtype)
        dw_ih_f = jnp.einsum("nle,nlg->eg", x32, dxg_f,
                             preferred_element_type=jnp.float32)
        dw_ih_b = jnp.einsum("nle,nlg->eg", x32[:, ::-1], dxg_b,
                             preferred_element_type=jnp.float32)
    db_ih_f, db_ih_b = _deinterleave(
        dxg.sum(axis=(0, 1), dtype=jnp.float32), H)

    dparams = {
        "fwd": {"w_ih": dw_ih_f, "w_hh": dw_hh_f,
                "bias_ih": db_ih_f, "bias_hh": db_hh_f},
        "bwd": {"w_ih": dw_ih_b, "w_hh": dw_hh_b,
                "bias_ih": db_ih_b, "bias_hh": db_hh_b},
    }
    dparams = jax.tree.map(
        lambda g, p: g.astype(p.dtype), dparams,
        {k: params[k] for k in ("fwd", "bwd")})
    return dparams, dx.astype(in_dtype), None


# Drop-in equal to bigru_scan (umpr_tpu/ops/gru.py): (N, L, E) ->
# (N, L, 2H) with packed-sequence masking semantics.
bigru_pallas = _make_bigru_pallas(need_dx=True)

# Variant for callers whose input embeddings are FROZEN (every UMPR config:
# reference model.py:237 freezes the GloVe table, and the pretrainers feed
# frozen embeddings too): the x cotangent is dead, but XLA cannot DCE a
# computation that lives inside a Pallas kernel, so the default path pays a
# full (N, L*C) matmul + HBM write + boundary relayout for a gradient
# nobody reads.  This variant returns zeros for dx (free to fold) and skips
# the dxc work in every projection mode.
bigru_pallas_nodx = _make_bigru_pallas(need_dx=False)


# ---------------------------------------------------- split (repacked) API
def _split_fwd_impl(params, x, lengths, S, emit_hs):
    """Fused-projection forward from the (N, L, E) sentence-row input to
    BOTH true-time consumer layouts via the repack kernels: no XLA
    reverse / concat / regroup copies anywhere on the path."""
    N, L, E = x.shape
    H = params["fwd"]["w_hh"].shape[0]
    p = params
    if x.dtype != jnp.float32:
        p = jax.tree.map(lambda a: a.astype(x.dtype), params)
    xc = _pallas_stack_pad(x, N, L, E)
    wih, bih = _proj_weights(p, H, E)
    xg = _pallas_project_fwd(xc, wih, bih, H, N, L)
    y_cat, hs_cat = _pallas_forward(p, xg, lengths, N, L, H, emit_hs)
    y_pos, y_sent = _pallas_gru_outputs(y_cat, S, L, H)
    return (y_pos, y_sent), ((xc, xg), hs_cat)


def _make_bigru_pallas_split(need_dx):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def f(params, x, lengths, S):
        (y_pos, y_sent), _ = _split_fwd_impl(params, x, lengths, S,
                                             emit_hs=False)
        return y_pos, y_sent

    def fwd(params, x, lengths, S):
        outs, (stream, hs_cat) = _split_fwd_impl(params, x, lengths, S,
                                                 emit_hs=True)
        return outs, (params, lengths, stream, hs_cat)

    def bwd(S, res, cts):
        params, lengths, stream, hs_cat = res
        dpos, dsent = cts
        io = stream[1].dtype
        H = params["fwd"]["w_hh"].shape[0]
        L = dsent.shape[1]
        dy_cat = _pallas_gru_dy(dpos.astype(io), dsent.astype(io), S, L, H)
        dparams, dx = _bwd_fused_from_dycat(params, lengths, stream, hs_cat,
                                            dy_cat, need_dx=need_dx)
        return dparams, dx, None

    f.defvjp(fwd, bwd)
    return f


# (params, x (N, L, E), lengths (N,), S) ->
#   (Y_pos (N/S, S*L, 2H), Y_sent (N, L, 2H)), both in TRUE time: the
# attention and S-Net layouts.  x is the embedding lookup viewed with its
# leading dims merged ((B, S, L, E) -> (B*S, L, E), a free reshape).
bigru_pallas_split = _make_bigru_pallas_split(need_dx=True)
bigru_pallas_split_nodx = _make_bigru_pallas_split(need_dx=False)
