"""Fused affinity-attention kernel vs the composite XLA path: forward
values and full gradients (interpreted on CPU in CI)."""

import numpy as np
import jax
import jax.numpy as jnp

from umpr_tpu.ops.attention import affinity_attention


def _setup(seed, B=5, P=37, D=16):
    rng = np.random.default_rng(seed)
    gru_u = rng.standard_normal((B, P, D)).astype(np.float32)
    gru_i = rng.standard_normal((B, P, D)).astype(np.float32)
    M = rng.standard_normal((D, D)).astype(np.float32)
    exists = np.zeros(P, bool)
    exists[:29] = True  # runtime batch maxima smaller than static P
    # zero the GRU outputs at nonexistent positions like the real model does
    gru_u[:, ~exists] *= 0
    gru_i[:, ~exists] *= 0
    return (jnp.asarray(gru_u), jnp.asarray(gru_i), jnp.asarray(M),
            jnp.asarray(exists))


def test_forward_matches_composite():
    args = _setup(0)
    ref = affinity_attention(*args, use_pallas=False)
    out = affinity_attention(*args, use_pallas=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gradients_match_composite():
    gru_u, gru_i, M, exists = _setup(1)

    def loss(fn_pallas):
        def f(u, i, m):
            soft_u, soft_i, atte_u, atte_i = affinity_attention(
                u, i, m, exists, use_pallas=fn_pallas)
            # touch every output so all grad paths are exercised
            return (jnp.sum(jnp.sin(atte_u)) + jnp.sum(atte_i ** 2)
                    + jnp.sum(soft_u * soft_i) + jnp.sum(soft_i ** 3))
        return f

    gp = jax.grad(loss(True), argnums=(0, 1, 2))(gru_u, gru_i, M)
    gs = jax.grad(loss(False), argnums=(0, 1, 2))(gru_u, gru_i, M)
    for a, b, name in zip(gp, gs, ("d_gru_u", "d_gru_i", "dM")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_jit_and_batch_padding():
    # B not divisible by the kernel's samples-per-step; P already aligned
    args = _setup(2, B=3, P=128, D=8)

    @jax.jit
    def f(u, i, m, e):
        return affinity_attention(u, i, m, e, use_pallas=True)

    out = f(*args)
    ref = affinity_attention(*args, use_pallas=False)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _tiled_case(seed, B, P, D=128, frac=0.9):
    rng = np.random.default_rng(seed)
    gu = jnp.asarray(rng.standard_normal((B, P, D)), jnp.float32)
    gi = jnp.asarray(rng.standard_normal((B, P, D)), jnp.float32)
    M = jnp.asarray(rng.standard_normal((D, D)) * 0.1, jnp.float32)
    e = jnp.asarray((np.arange(P) < int(P * frac)).astype(np.float32))
    return gu, gi, M, e


def test_tiled_single_tile_matches_composite_tightly():
    """One column tile: the online-softmax recurrence degenerates and the
    result should match the composite to tight f32 tolerance."""
    from umpr_tpu.ops.attention import affinity_attention
    from umpr_tpu.ops.attention_pallas import affinity_attention_tiled
    gu, gi, M, e = _tiled_case(7, B=3, P=1100)
    ref = affinity_attention(gu, gi, M, e, use_pallas=False)
    out = affinity_attention_tiled(gu, gi, M, e)
    for r, o, name in zip(ref, out, ("su", "si", "au", "ai")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_tiled_multi_tile_matches_composite(monkeypatch):
    """Force 3 column tiles so the flash recurrence (running max, corr
    rescaling, cross-tile first-argmax) actually executes; au/ai tolerate
    the online softmax's f32 reassociation (~1e-4-scale)."""
    from umpr_tpu.ops import attention_pallas as ap
    from umpr_tpu.ops.attention import affinity_attention
    monkeypatch.setattr(ap, "_tile_q", lambda P: 512)
    gu, gi, M, e = _tiled_case(7, B=3, P=1100)
    assert ap._tiled_dims(1100) == (1536, 512)  # really multi-tile
    ref = affinity_attention(gu, gi, M, e, use_pallas=False)
    out = ap.affinity_attention_tiled(gu, gi, M, e)
    tols = {"su": 2e-5, "si": 2e-5, "au": 1e-3, "ai": 1e-3}
    for r, o, name in zip(ref, out, ("su", "si", "au", "ai")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=tols[name], atol=tols[name],
                                   err_msg=name)


def test_tiled_gradients_match_composite(monkeypatch):
    from umpr_tpu.ops import attention_pallas as ap
    from umpr_tpu.ops.attention import affinity_attention
    monkeypatch.setattr(ap, "_tile_q", lambda P: 512)  # multi-tile
    gu, gi, M, e = _tiled_case(8, B=2, P=1100, frac=0.9)

    def loss(fn, gu_, gi_, M_):
        su, si, au, ai = fn(gu_, gi_, M_, e)
        return (jnp.sum(au ** 2) + jnp.sum(ai ** 2)
                + jnp.sum(su * jnp.arange(su.shape[-1]))
                + jnp.sum(si ** 2))

    g_ref = jax.grad(lambda *a: loss(
        lambda *b: affinity_attention(*b, use_pallas=False), *a),
        argnums=(0, 1, 2))(gu, gi, M)
    g_tile = jax.grad(lambda *a: loss(ap.affinity_attention_tiled, *a),
                      argnums=(0, 1, 2))(gu, gi, M)
    for a, b, name in zip(g_tile, g_ref, ("dgu", "dgi", "dM")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_affinity_attention_raises_past_tiled_vmem_ceiling():
    """P beyond the tiled kernel's VMEM ceiling must fail early with a
    legible error, not deep inside Mosaic's allocator."""
    import pytest
    from umpr_tpu.ops import attention
    B, P, D = 1, 40960, 128  # B*P*P*4 ~ 6.7 GB routes to tiled; P > ceiling
    gu = jnp.zeros((B, P, D), jnp.float32)
    gi = jnp.zeros((B, P, D), jnp.float32)
    M = jnp.zeros((D, D), jnp.float32)
    e = jnp.ones((P,), jnp.float32)
    with pytest.raises(NotImplementedError, match="VMEM ceiling"):
        attention.affinity_attention(gu, gi, M, e)


def test_affinity_attention_routes_to_tiled_beyond_memory_budget(monkeypatch):
    """Above the (B, P, P) byte threshold affinity_attention must hand over
    to the tiled kernel (the composite would OOM HBM at real sizes)."""
    from umpr_tpu.ops import attention, attention_pallas
    called = {}
    real = attention_pallas.affinity_attention_tiled

    def spy(*a):
        called["tiled"] = True
        return real(*a)

    monkeypatch.setattr(attention_pallas, "affinity_attention_tiled", spy)
    monkeypatch.setattr(attention, "TILED_BYTES_THRESHOLD", 1)  # tiny budget
    rng = np.random.default_rng(9)
    B, P, D = 2, 200, 128
    gu = jnp.asarray(rng.standard_normal((B, P, D)), jnp.float32)
    gi = jnp.asarray(rng.standard_normal((B, P, D)), jnp.float32)
    M = jnp.asarray(rng.standard_normal((D, D)) * 0.1, jnp.float32)
    e = jnp.asarray((np.arange(P) < 150).astype(np.float32))
    routed = attention.affinity_attention(gu, gi, M, e, use_pallas=False)
    assert called.get("tiled")
    monkeypatch.setattr(attention, "TILED_BYTES_THRESHOLD", 4 << 30)
    ref = attention.affinity_attention(gu, gi, M, e, use_pallas=False)
    for a, b in zip(routed, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
