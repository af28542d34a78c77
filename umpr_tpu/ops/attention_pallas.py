"""Fused Pallas TPU kernel for the R-Net affinity attention (fwd + bwd).

STATUS (round-2 measurement): the XLA composite path WINS at every shape
this kernel supports on v5e -- fwd+bwd 0.80 ms vs 2.20 ms at the reference
shape (B=64, P=400) and 3.48 ms vs 5.51 ms at P=1024, the kernel's VMEM
ceiling (tools/bench_kernels.py, BENCH_DETAILS.md).  XLA fuses the
tanh+max reductions into the affinity matmul well enough that the HBM
traffic this kernel avoids does not dominate, while the kernel pays
per-sample grid serialization and full-(P, P) VPU passes for the argmax
residuals.  Production paths therefore use the composite
(umpr_tpu/ops/attention.py) for BOTH training and eval; the kernel remains
available via affinity_attention(..., use_pallas=True) as a tested
alternative.  For configs whose P*P activations outgrow HBM comfort (the
composite writes B*P*P*4 bytes -- 4.3 GB at B=64/P=4096), the flash-style
column-tiled variant at the bottom of this file (affinity_attention_tiled)
streams the affinity matrix in (P, TQ) tiles with an online softmax and
supports arbitrary P.

The composite XLA path materializes the (B, P, P) affinity tensor in HBM
(41 MB per direction at the Music-small config).  Here each sample's P x P
affinity tile lives only in VMEM:

forward, per sample:
    T   = gru_i @ M                     (precomputed outside: one big MXU op)
    A   = tanh(T @ U^T)                 (P, P) in VMEM, computed ONCE
    soft_u = softmax(max over rows of A, over existing cols)   (1, P) lanes
    soft_i = softmax(max over cols of A, over existing rows)   (P, 1) sublanes
    atte_u = soft_u @ U;  atte_i = soft_i^T @ I

The u-half reduces over sublanes into the lane-friendly (1, P) layout; the
i-half stays in (P, 1) orientation end to end (max, exp-normalize, and the
final contraction all reduce over sublanes), so deriving BOTH directions
from the single A tile needs no (P, P) transpose -- round 1 paid a second
tanh(U @ T^T) matmul for the same effect, doubling both the MXU work and
the tanh transcendentals (the VPU cost that dominates at P = 400).

backward: the forward kernel also emits each column's max value and FIRST
argmax row (tiny (B, P) residuals), so the backward needs no (P, P)-shaped
work at all -- per half it is one gather + one batched scatter-add in XLA
(argmax routing, matching torch.max's vjp; ties differ from jnp.max's
tie-splitting only on exact ties).

Both P (= S*L) and B are padded to tile multiples in the wrapper; padded
positions carry exists=0 and are excluded everywhere.  Verified against the
composite path for values and gradients (tests/test_attention_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umpr_tpu.ops.masking import NEG_INF

def _samples_fwd(P):
    """Samples per grid step, bounded by scoped VMEM (16 MB): the compiler
    keeps ~2 (P, P) f32 temporaries live per sample (the affinity tile plus
    the masked/compare intermediate), so budget 8 MB of tiles per sample
    batch.  P=512 -> 4, P=1024 -> 1."""
    return max(1, min(4, (1 << 23) // (P * P * 4) // 2))


def max_kernel_p():
    """Largest padded P the kernel supports: the live (P, P) f32 tiles plus
    the (B-slice, P) output/residual rows must fit the 16 MB scoped-VMEM
    limit (P=1280 measured 16.89M > 16M on v5e)."""
    return 1024


def _interpret():
    return jax.default_backend() != "tpu"


def _masked_softmax_row(scores, e_col):
    """(1, P) masked softmax over the lane axis."""
    scores = jnp.where(e_col > 0, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    ex = jnp.exp(scores - m) * e_col
    return ex / jnp.sum(ex, axis=1, keepdims=True)


def _masked_softmax_col(scores, e_row):
    """(P, 1) masked softmax over the sublane axis."""
    scores = jnp.where(e_row > 0, scores, NEG_INF)
    m = jnp.max(scores, axis=0, keepdims=True)
    ex = jnp.exp(scores - m) * e_row
    return ex / jnp.sum(ex, axis=0, keepdims=True)


def _fwd_kernel(t_ref, u_ref, i_ref, erow_ref, ecol_ref,
                su_ref, si_ref, au_ref, ai_ref, cmu_ref, cmi_ref,
                amu_ref, ami_ref, *, samples):
    """Per sample: ONE (P, P) affinity tile, both directions derived from it.

    Residuals for the backward: each direction's max value and FIRST argmax
    index (tiny (B, P) tensors) -- the max gradient routes to one (row, col)
    position per lane, so the backward needs no (P, P) recompute at all
    (first-argmax routing, matching torch.max's vjp)."""
    e_row, e_col = erow_ref[:], ecol_ref[:]
    for s in range(samples):
        T, U = t_ref[s], u_ref[s]
        # A[p, q] = tanh(T_p . U_q): rows p = item positions, cols q = user
        A = jnp.tanh(jax.lax.dot_general(T, U, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32))

        # u-half: max over rows (sublanes) -> (1, P) lanes pipeline
        A_mr = jnp.where(e_row > 0, A, NEG_INF)
        colmax = jnp.max(A_mr, axis=0, keepdims=True)             # (1, P)
        rows = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0)
        am_u = jnp.min(jnp.where(A_mr == colmax, rows, jnp.int32(1 << 30)),
                       axis=0, keepdims=True)                     # (1, P)
        soft_u = _masked_softmax_row(colmax, e_col)
        atte_u = jnp.dot(soft_u, U, preferred_element_type=jnp.float32)

        # i-half: max over cols (lanes) -> (P, 1) sublanes pipeline
        A_mc = jnp.where(e_col > 0, A, NEG_INF)
        rowmax = jnp.max(A_mc, axis=1, keepdims=True)             # (P, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, A.shape, 1)
        am_i = jnp.min(jnp.where(A_mc == rowmax, cols, jnp.int32(1 << 30)),
                       axis=1, keepdims=True)                     # (P, 1)
        soft_i = _masked_softmax_col(rowmax, e_row)               # (P, 1)
        atte_i = jax.lax.dot_general(soft_i, i_ref[s], (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (1, D)

        su_ref[s] = soft_u
        si_ref[s] = soft_i
        au_ref[s] = atte_u
        ai_ref[s] = atte_i
        cmu_ref[s] = colmax
        cmi_ref[s] = rowmax
        amu_ref[s] = am_u
        ami_ref[s] = am_i


def _softmax_vjp_b(soft, dsoft):
    """(B, P) softmax backward."""
    inner = jnp.sum(dsoft * soft, axis=1, keepdims=True)
    return soft * (dsoft - inner)


def _pad(x, n, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


def _specs(samples, P, D):
    big = pl.BlockSpec((samples, P, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    vec_p = pl.BlockSpec((samples, 1, P), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    col_p = pl.BlockSpec((samples, P, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((samples, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return big, vec_p, col_p, vec_d, full


def _forward(T, U, I, e, B, P, D):
    samples = _samples_fwd(P)
    big, vec_p, col_p, vec_d, full = _specs(samples, P, D)
    e_row = e.reshape(P, 1)
    e_col = e.reshape(1, P)
    kernel = functools.partial(_fwd_kernel, samples=samples)
    # i-half outputs live in (P, 1) column orientation (see _fwd_kernel)
    return pl.pallas_call(
        kernel,
        grid=(B // samples,),
        in_specs=[big, big, big, full, full],
        out_specs=[vec_p, col_p, vec_d, vec_d, vec_p, col_p, vec_p, col_p],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((B, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((B, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((B, P, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * P * D, bytes_accessed=4 * B * P * D * 3,
            transcendentals=B * P * P),
        interpret=_interpret(),
    )(T, U, I, e_row, e_col)


@jax.custom_vjp
def affinity_attention_pallas(gru_u, gru_i, M, exists):
    out, _ = _fwd_impl(gru_u, gru_i, M, exists)
    return out


def _prep(gru_u, gru_i, M, exists):
    B0, P0, D = gru_u.shape
    dtype = gru_u.dtype
    gru_u = gru_u.astype(jnp.float32)
    gru_i = gru_i.astype(jnp.float32)
    M = M.astype(jnp.float32)
    P = -(-P0 // 128) * 128
    samples = _samples_fwd(P)
    B = -(-B0 // samples) * samples
    U = _pad(_pad(gru_u, P, 1), B, 0)
    Ifull = _pad(_pad(gru_i, P, 1), B, 0)
    T = (Ifull.reshape(B * P, D) @ M).reshape(B, P, D)  # one big MXU op
    e = _pad(exists.astype(jnp.float32), P, 0)
    return U, Ifull, T, e, B, P, D, B0, P0, dtype


def _fwd_impl(gru_u, gru_i, M, exists):
    U, Ifull, T, e, B, P, D, B0, P0, dtype = _prep(gru_u, gru_i, M, exists)
    su, si, au, ai, cmu, cmi, amu, ami = _forward(T, U, Ifull, e, B, P, D)
    # i-half outputs arrive in (B, P, 1) column orientation
    out = (su[:B0, 0, :P0].astype(dtype), si[:B0, :P0, 0].astype(dtype),
           au[:B0, 0].astype(dtype), ai[:B0, 0].astype(dtype))
    return out, (gru_u, gru_i, M, exists, su, si, cmu, cmi, amu, ami)


def _vjp_fwd(gru_u, gru_i, M, exists):
    out, res = _fwd_impl(gru_u, gru_i, M, exists)
    return out, res


def _argmax_routed_bwd(U, Ifull, T, M, res, grads, B, P, B0, P0):
    """The shared backward core: no (P, P)-shaped work -- the max gradient
    routes to one saved argmax position per lane, so each half is one
    gather + one batched scatter-add over (B, P, D) tensors (plus the
    softmax/atte chain).  First-argmax routing matches torch.max's vjp;
    jnp.max tie-splitting differs only on exact ties (measure-zero for
    continuous inputs; at saturated-tanh ties both route zero gradient).
    Used by BOTH the whole-tile and the column-tiled kernels -- their
    residual contract (final softmax weights, per-position max values,
    first-argmax indices) is identical."""
    su, si, cmu, cmi, amu, ami = res
    dsu0, dsi0, dau0, dai0 = grads
    D = U.shape[-1]
    soft_u, soft_i = su[:, 0], si[:, :, 0]       # (B, P); i-half is (B, P, 1)
    colmax_u, colmax_i = cmu[:, 0], cmi[:, :, 0]
    amax_u, amax_i = amu[:, 0], ami[:, :, 0]     # (B, P) int32
    # fully-masked rows/cols carry the 1<<30 argmax sentinel; their routed
    # value is exactly zero (masked softmax), so clip to a safe index
    amax_u = jnp.minimum(amax_u, P - 1)
    amax_i = jnp.minimum(amax_i, P - 1)

    z_p = jnp.zeros((B, P), jnp.float32)
    z_d = jnp.zeros((B, D), jnp.float32)
    dsu = z_p.at[:B0, :P0].set(dsu0.astype(jnp.float32))
    dsi = z_p.at[:B0, :P0].set(dsi0.astype(jnp.float32))
    dau = z_d.at[:B0].set(dau0.astype(jnp.float32))
    dai = z_d.at[:B0].set(dai0.astype(jnp.float32))

    # atte_u = soft_u @ U ; atte_i = soft_i @ I
    dsu = dsu + jnp.einsum("bd,bpd->bp", dau, U)
    dsi = dsi + jnp.einsum("bd,bpd->bp", dai, Ifull)
    dU = soft_u[..., None] * dau[:, None, :]
    dI = soft_i[..., None] * dai[:, None, :]

    g_u = _softmax_vjp_b(soft_u, dsu)            # zero at masked positions
    g_i = _softmax_vjp_b(soft_i, dsi)
    val_u = g_u * (1.0 - colmax_u * colmax_u)    # tanh grad at the argmax
    val_i = g_i * (1.0 - colmax_i * colmax_i)

    b_idx = jnp.arange(B)[:, None]
    # u-half: A[p, q] = tanh(T_p . U_q); grad lands at (amax_u[q], q)
    dU = dU + val_u[..., None] * jnp.take_along_axis(T, amax_u[..., None], axis=1)
    dT = jnp.zeros((B, P, D), jnp.float32).at[b_idx, amax_u].add(
        val_u[..., None] * U)
    # i-half: A^T[q, p] = tanh(U_q . T_p); grad lands at (amax_i[p], p)
    dT = dT + val_i[..., None] * jnp.take_along_axis(U, amax_i[..., None], axis=1)
    dU = dU.at[b_idx, amax_i].add(val_i[..., None] * T)

    # T = I @ M: fold dT into dI / dM with large XLA matmuls
    dI = dI + jnp.einsum("bpe,fe->bpf", dT, M)
    dM = jnp.einsum("bpe,bpf->ef", Ifull, dT)
    return dU, dI, dM


def _vjp_bwd(res, grads):
    gru_u, gru_i, M, exists, su, si, cmu, cmi, amu, ami = res
    U, Ifull, T, e, B, P, D, B0, P0, dtype = _prep(gru_u, gru_i, M, exists)
    dU, dI, dM = _argmax_routed_bwd(U, Ifull, T, M.astype(jnp.float32),
                                    (su, si, cmu, cmi, amu, ami), grads,
                                    B, P, B0, P0)
    return (dU[:B0, :P0].astype(gru_u.dtype), dI[:B0, :P0].astype(gru_i.dtype),
            dM.astype(M.dtype), None)


affinity_attention_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Column-tiled (flash-style) forward for LARGE P.
#
# The composite path materializes (B, P, P) in HBM -- 4.3 GB at B=64/P=4096
# -- and the small kernel above caps at max_kernel_p() because it holds the
# whole P x P tile in VMEM.  This variant streams column tiles of the
# affinity matrix: per (sample, tile) it computes A[:, q0:q0+TQ] once,
# finalizes that tile's column maxima (the u-half scores are complete per
# column), folds them into an online softmax (running max/normalizer with
# rescaled attention accumulator, the flash-attention recurrence), and
# accumulates the i-half's running row max/argmax in VMEM scratch.  Nothing
# (P, P)-shaped ever exists; VMEM holds T/I (P, D) plus one (P, TQ) tile.
#
# The backward is IDENTICAL to the small kernel's: argmax routing needs only
# the per-position max values and first-argmax indices, which this forward
# emits exactly (within-tile argmin of the row iota; across tiles the
# strictly-greater update keeps the earliest tile, preserving global
# first-argmax semantics).  soft_u is emitted as raw exp(score - m_tile)
# per tile plus (m_tile, m_final, l_final) and rescaled outside the kernel
# with one (B, P) elementwise fixup.

def _tile_q(P):
    """Column-tile width: Mosaic keeps ~6-8 (P, TQ) f32 stack temporaries
    live (the tile, its maskings, the argmax reductions), and the kernel
    raises its per-kernel VMEM limit to 100 MB (the chip has 128 MB), so
    budget ~16 MB per tile -- small tiles serialize the grid and starve the
    MXU (TQ=256 at P=2048 measured 3x slower than TQ=1024)."""
    return max(128, min(P, (1 << 24) // (P * 4) // 128 * 128))


def _tiled_dims(P0):
    """(padded P, TQ) such that P is a TQ multiple and the (P, TQ) tile
    fits the VMEM budget; iterate because padding P can shrink TQ."""
    P = -(-P0 // 128) * 128
    TQ = _tile_q(P)
    for _ in range(4):
        TQ = _tile_q(P)
        P_new = -(-P0 // TQ) * TQ
        if P_new == P:
            break
        P = P_new
    return P, TQ


def _tiled_kernel(t_ref, u_ref, erow_ref, ecol_ref,
                  su_ref, si_ref, au_ref, cmu_ref, cmi_ref,
                  amu_ref, ami_ref, mused_ref, mfin_ref, lfin_ref,
                  m_scr, l_scr, acc_scr, rmax_scr, ramax_scr, *, TQ, nq):
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        rmax_scr[:] = jnp.full_like(rmax_scr, NEG_INF)
        ramax_scr[:] = jnp.full_like(ramax_scr, 1 << 30)

    T = t_ref[0]                  # (P, D)
    U_t = u_ref[0]                # (TQ, D) current column tile
    e_row = erow_ref[:]           # (P, 1)
    e_col_t = ecol_ref[0]         # (1, TQ)
    A = jnp.tanh(jax.lax.dot_general(T, U_t, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32))

    # ---- u-half: per-column max over rows is FINAL within this tile
    A_mr = jnp.where(e_row > 0, A, NEG_INF)
    colmax = jnp.max(A_mr, axis=0, keepdims=True)                # (1, TQ)
    # jnp.argmax = FIRST max index (the torch.max vjp routing) and needs no
    # iota/where temporaries -- each (P, TQ) stack slot counts here
    am_u = jnp.argmax(A_mr, axis=0, keepdims=True).astype(jnp.int32)
    cmu_ref[0] = colmax
    amu_ref[0] = am_u

    # online softmax over column tiles (flash recurrence)
    s = jnp.where(e_col_t > 0, colmax, NEG_INF)
    m_prev = m_scr[:]                                            # (1, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p_t = jnp.exp(s - m_new) * e_col_t                           # (1, TQ)
    su_ref[0] = p_t                    # raw; rescaled outside the kernel
    # m used for this tile, broadcast per column (keeps the output block
    # lane-shaped; the su fixup outside is then pure elementwise)
    mused_ref[0] = jnp.broadcast_to(m_new, (1, p_t.shape[1]))
    l_scr[:] = l_scr[:] * corr + jnp.sum(p_t, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jnp.dot(
        p_t, U_t, preferred_element_type=jnp.float32)            # (1, D)
    m_scr[:] = m_new

    # ---- i-half: running row max/first-argmax across tiles
    A_mc = jnp.where(e_col_t > 0, A, NEG_INF)
    rt = jnp.max(A_mc, axis=1, keepdims=True)                    # (P, 1)
    at = (jnp.argmax(A_mc, axis=1, keepdims=True).astype(jnp.int32)
          + q * TQ)
    upd = rt > rmax_scr[:]             # strictly greater: ties keep the
    ramax_scr[:] = jnp.where(upd, at, ramax_scr[:])  # earliest tile/col
    rmax_scr[:] = jnp.maximum(rmax_scr[:], rt)

    @pl.when(q == nq - 1)
    def _():
        rmax = rmax_scr[:]
        soft_i = _masked_softmax_col(rmax, e_row)                # (P, 1)
        si_ref[0] = soft_i
        cmi_ref[0] = rmax
        ami_ref[0] = ramax_scr[:]
        # atte_i = soft_i^T @ I happens OUTSIDE the kernel (one XLA matmul
        # from the si output): keeping I out of the kernel removes a
        # double-buffered (P, D) input block from the scoped-VMEM stack
        au_ref[0] = acc_scr[:] / l_scr[:]
        mfin_ref[0] = m_scr[:]
        lfin_ref[0] = l_scr[:]


def _tiled_forward(T, U, e, B, P, D, TQ):
    nq = P // TQ
    big = pl.BlockSpec((1, P, D), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM)
    u_tile = pl.BlockSpec((1, TQ, D), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM)
    row_e = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile_p = pl.BlockSpec((1, 1, TQ), lambda b, q: (b, 0, q), memory_space=pltpu.VMEM)
    col_p = pl.BlockSpec((1, P, 1), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((1, 1, D), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM)
    one_b = pl.BlockSpec((1, 1, 1), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_tiled_kernel, TQ=TQ, nq=nq)
    return pl.pallas_call(
        kernel,
        grid=(B, nq),
        in_specs=[big, u_tile, row_e,
                  pl.BlockSpec((1, 1, TQ), lambda b, q: (0, 0, q),
                               memory_space=pltpu.VMEM)],
        out_specs=[tile_p, col_p, vec_d, tile_p, col_p, tile_p, col_p,
                   tile_p, one_b, one_b],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),   # su (raw)
            jax.ShapeDtypeStruct((B, P, 1), jnp.float32),   # si
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),   # au
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),   # cmu
            jax.ShapeDtypeStruct((B, P, 1), jnp.float32),   # cmi
            jax.ShapeDtypeStruct((B, 1, P), jnp.int32),     # amu
            jax.ShapeDtypeStruct((B, P, 1), jnp.int32),     # ami
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),   # m used, per col
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),   # m_final
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),   # l_final
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 1), jnp.float32),   # m
            pltpu.VMEM((1, 1), jnp.float32),   # l
            pltpu.VMEM((1, D), jnp.float32),   # acc
            pltpu.VMEM((P, 1), jnp.float32),   # row max
            pltpu.VMEM((P, 1), jnp.int32),     # row argmax
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * P * D, bytes_accessed=4 * B * P * D * 3,
            transcendentals=B * P * P),
        # Mosaic keeps ~6-8 (P, TQ) stack temporaries live (the tile, its
        # maskings, the argmax reductions); the default 16 MB scoped-VMEM
        # budget rejects P >= 2048 even at TQ=128 while the chip has 128 MB
        # of VMEM -- raise the per-kernel limit instead of shrinking tiles
        # below MXU-efficient sizes.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(T, U, e.reshape(P, 1), e.reshape(1, 1, P))


def _tiled_fwd_impl(gru_u, gru_i, M, exists):
    B0, P0, D = gru_u.shape
    dtype = gru_u.dtype
    P, TQ = _tiled_dims(P0)
    U = _pad(gru_u.astype(jnp.float32), P, 1)
    Ifull = _pad(gru_i.astype(jnp.float32), P, 1)
    Mf = M.astype(jnp.float32)
    T = (Ifull.reshape(B0 * P, D) @ Mf).reshape(B0, P, D)
    e = _pad(exists.astype(jnp.float32), P, 0)
    (su_raw, si, au, cmu, cmi, amu, ami,
     m_used, m_fin, l_fin) = _tiled_forward(T, U, e, B0, P, D, TQ)
    ai = jnp.einsum("bp,bpd->bd", si[:, :, 0], Ifull)[:, None, :]
    # rescale the per-tile raw weights into the final softmax:
    # su = raw * exp(m_tile - m_final) / l_final  (m_used is per column)
    su = su_raw * (jnp.exp(m_used - m_fin) / l_fin)              # (B, 1, P)
    out = (su[:, 0, :P0].astype(dtype), si[:B0, :P0, 0].astype(dtype),
           au[:, 0].astype(dtype), ai[:, 0].astype(dtype))
    return out, (gru_u, gru_i, M, exists, su, si, cmu, cmi, amu, ami)


@jax.custom_vjp
def affinity_attention_tiled(gru_u, gru_i, M, exists):
    out, _ = _tiled_fwd_impl(gru_u, gru_i, M, exists)
    return out


def _tiled_vjp_fwd(gru_u, gru_i, M, exists):
    return _tiled_fwd_impl(gru_u, gru_i, M, exists)


def _tiled_vjp_bwd(res, grads):
    """The shared argmax-routed backward; only the padding prep differs
    from the whole-tile kernel (TQ-granular P, no B padding)."""
    gru_u, gru_i, M, exists, su, si, cmu, cmi, amu, ami = res
    B0, P0, D = gru_u.shape
    P = su.shape[-1]
    U = _pad(gru_u.astype(jnp.float32), P, 1)
    Ifull = _pad(gru_i.astype(jnp.float32), P, 1)
    Mf = M.astype(jnp.float32)
    T = (Ifull.reshape(B0 * P, D) @ Mf).reshape(B0, P, D)
    dU, dI, dM = _argmax_routed_bwd(U, Ifull, T, Mf,
                                    (su, si, cmu, cmi, amu, ami), grads,
                                    B0, P, B0, P0)
    return (dU[:, :P0].astype(gru_u.dtype), dI[:, :P0].astype(gru_i.dtype),
            dM.astype(M.dtype), None)


affinity_attention_tiled.defvjp(_tiled_vjp_fwd, _tiled_vjp_bwd)
