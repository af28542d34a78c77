"""Fused Pallas TPU kernel for the R-Net affinity attention (fwd + bwd).

The composite XLA path materializes the (B, P, P) affinity tensor in HBM
twice (forward value + tanh residual for backward) -- 80+ MB of traffic per
step at the Music-small config.  Here each sample's P x P affinity tile
lives only in VMEM:

forward, per sample:
    T   = gru_i @ M                     (precomputed outside: one big MXU op)
    A   = tanh(T @ U^T)                 (P, P) in VMEM
    At  = tanh(U @ T^T)  (= A^T)        computed as a second matmul so BOTH
                                        reduction/softmax pipelines run in
                                        the lane-friendly (1, P) layout
                                        (transposing (P,P) in VMEM is far
                                        more expensive than one extra MXU op)
    soft_u = softmax(max over rows of A,  over existing cols)
    soft_i = softmax(max over rows of At, over existing cols)
    atte_u = soft_u @ U;  atte_i = soft_i @ I

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

SAMPLES_FWD = 4   # samples per grid step (VMEM-bound)


def _interpret():
    return jax.default_backend() != "tpu"


def _masked_softmax_row(scores, e_col):
    """(1, P) masked softmax over the lane axis."""
    scores = jnp.where(e_col > 0, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    ex = jnp.exp(scores - m) * e_col
    return ex / jnp.sum(ex, axis=1, keepdims=True)


def _half_forward(T, U, other, e_row, e_col):
    """One direction: A = tanh(T @ U^T).

    Returns (soft (1,P), atte (1,D), colmax (1,P), argmax (1,P) int32).
    colmax/argmax are the backward pass's residuals: the max gradient routes
    to one (row, col) position per column, so the backward needs no (P,P)
    recompute at all (first-argmax routing, matching torch.max's vjp)."""
    A = jnp.tanh(jax.lax.dot_general(T, U, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32))
    A_m = jnp.where(e_row > 0, A, NEG_INF)      # mask nonexistent rows
    colmax = jnp.max(A_m, axis=0, keepdims=True)  # (1, P)
    rows = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0)
    amax = jnp.min(jnp.where(A_m == colmax, rows, jnp.int32(1 << 30)),
                   axis=0, keepdims=True)       # first argmax per column
    soft = _masked_softmax_row(colmax, e_col)
    atte = jnp.dot(soft, other, preferred_element_type=jnp.float32)  # (1, D)
    return soft, atte, colmax, amax


def _fwd_kernel(t_ref, u_ref, i_ref, erow_ref, ecol_ref,
                su_ref, si_ref, au_ref, ai_ref, cmu_ref, cmi_ref,
                amu_ref, ami_ref, *, samples):
    e_row, e_col = erow_ref[:], ecol_ref[:]
    for s in range(samples):
        # u-direction: A = tanh(T U^T); i-direction via A^T = tanh(U T^T)
        soft_u, atte_u, cm_u, am_u = _half_forward(
            t_ref[s], u_ref[s], u_ref[s], e_row, e_col)
        soft_i, atte_i, cm_i, am_i = _half_forward(
            u_ref[s], t_ref[s], i_ref[s], e_row, e_col)
        su_ref[s] = soft_u
        si_ref[s] = soft_i
        au_ref[s] = atte_u
        ai_ref[s] = atte_i
        cmu_ref[s] = cm_u
        cmi_ref[s] = cm_i
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
    vec_d = pl.BlockSpec((samples, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return big, vec_p, vec_d, full


def _forward(T, U, I, e, B, P, D):
    big, vec_p, vec_d, full = _specs(SAMPLES_FWD, P, D)
    e_row = e.reshape(P, 1)
    e_col = e.reshape(1, P)
    kernel = functools.partial(_fwd_kernel, samples=SAMPLES_FWD)
    return pl.pallas_call(
        kernel,
        grid=(B // SAMPLES_FWD,),
        in_specs=[big, big, big, full, full],
        out_specs=[vec_p, vec_p, vec_d, vec_d, vec_p, vec_p, vec_p, vec_p],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, P), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * P * P * D, bytes_accessed=4 * B * P * D * 3,
            transcendentals=2 * B * P * P),
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
    B = -(-B0 // SAMPLES_FWD) * SAMPLES_FWD
    U = _pad(_pad(gru_u, P, 1), B, 0)
    Ifull = _pad(_pad(gru_i, P, 1), B, 0)
    T = (Ifull.reshape(B * P, D) @ M).reshape(B, P, D)  # one big MXU op
    e = _pad(exists.astype(jnp.float32), P, 0)
    return U, Ifull, T, e, B, P, D, B0, P0, dtype


def _fwd_impl(gru_u, gru_i, M, exists):
    U, Ifull, T, e, B, P, D, B0, P0, dtype = _prep(gru_u, gru_i, M, exists)
    su, si, au, ai, cmu, cmi, amu, ami = _forward(T, U, Ifull, e, B, P, D)
    out = (su[:B0, 0, :P0].astype(dtype), si[:B0, 0, :P0].astype(dtype),
           au[:B0, 0].astype(dtype), ai[:B0, 0].astype(dtype))
    return out, (gru_u, gru_i, M, exists, su, si, cmu, cmi, amu, ami)


def _vjp_fwd(gru_u, gru_i, M, exists):
    out, res = _fwd_impl(gru_u, gru_i, M, exists)
    return out, res


def _vjp_bwd(res, grads):
    """Backward without any (P,P)-shaped work: the max gradient routes to
    one saved argmax position per column, so each half is one gather + one
    scatter-add over (B, P, D) tensors (plus the softmax/atte chain).
    First-argmax routing matches torch.max's vjp; jnp.max tie-splitting
    differs only on exact ties (measure-zero for continuous inputs)."""
    gru_u, gru_i, M, exists, su, si, cmu, cmi, amu, ami = res
    dsu0, dsi0, dau0, dai0 = grads
    U, Ifull, T, e, B, P, D, B0, P0, dtype = _prep(gru_u, gru_i, M, exists)
    soft_u, soft_i = su[:, 0], si[:, 0]          # (B, P)
    colmax_u, colmax_i = cmu[:, 0], cmi[:, 0]
    amax_u, amax_i = amu[:, 0], ami[:, 0]        # (B, P) int32

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
    d_gru_u = dU[:B0, :P0].astype(gru_u.dtype)
    d_gru_i = dI[:B0, :P0].astype(gru_i.dtype)
    return d_gru_u, d_gru_i, dM.astype(M.dtype), None


affinity_attention_pallas.defvjp(_vjp_fwd, _vjp_bwd)
