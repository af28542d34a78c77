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
