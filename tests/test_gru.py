"""Masked bidirectional GRU vs torch pack_padded_sequence semantics.

Oracle: torch nn.GRU fed through pack_padded_sequence/pad_packed_sequence
with total_length, exactly as the reference's ImprovedRnn does
(reference src/model.py:12-21) -- minus the double-unsort bug at model.py:21
(see umpr_tpu/ops/gru.py docstring).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from umpr_tpu.ops.gru import init_bigru, bigru_scan, torch_gru_params

torch = pytest.importorskip("torch")


def torch_packed_bigru(params, x, lengths):
    """Reference-semantics oracle built on torch's packed-sequence GRU."""
    in_size, h3 = np.asarray(params["fwd"]["w_ih"]).shape
    hidden = h3 // 3
    gru = torch.nn.GRU(input_size=in_size, hidden_size=hidden,
                       batch_first=True, bidirectional=True)
    state = {k: torch.tensor(np.asarray(v)) for k, v in torch_gru_params(params).items()}
    gru.load_state_dict(state)
    with torch.no_grad():
        data = torch.tensor(np.asarray(x))
        lens = torch.tensor(np.asarray(lengths))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            data, lens, batch_first=True, enforce_sorted=False)
        out, _ = gru(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=x.shape[1])
    return out.numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_bigru_matches_torch_packed(seed):
    rng = np.random.default_rng(seed)
    N, L, E, H = 13, 20, 50, 64
    x = rng.standard_normal((N, L, E)).astype(np.float32)
    lengths = rng.integers(1, L + 1, size=N).astype(np.int64)
    lengths[0] = L   # full-length sequence
    lengths[1] = 1   # pad-sentence case: single <PAD> step must be computed

    params = init_bigru(jax.random.PRNGKey(seed), E, H)
    ours = np.asarray(bigru_scan(params, jnp.asarray(x), jnp.asarray(lengths)))
    ref = torch_packed_bigru(params, x, lengths)

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    # Outputs past each length must be exactly zero (pad_packed semantics).
    for n in range(N):
        assert np.all(ours[n, lengths[n]:] == 0.0)


def test_bigru_backward_direction_starts_at_length():
    """The bwd half at t=len-1 must equal a len-1-only run (h0 consumed
    exactly at the sequence's own end, not the padded end)."""
    rng = np.random.default_rng(2)
    E, H, L = 8, 16, 10
    params = init_bigru(jax.random.PRNGKey(3), E, H)
    x = rng.standard_normal((1, L, E)).astype(np.float32)
    lengths = np.array([4])

    full = np.asarray(bigru_scan(params, jnp.asarray(x), jnp.asarray(lengths)))
    trimmed = np.asarray(
        bigru_scan(params, jnp.asarray(x[:, :4]), jnp.asarray(lengths)))
    np.testing.assert_allclose(full[:, :4], trimmed, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not __import__("os").environ.get("UMPR_SOAK"),
                    reason="extended soak: set UMPR_SOAK=<n_patterns> to run")
def test_soak_extended_gru_oracle():
    """Opt-in randomized-shape sweep (UMPR_SOAK=<n_patterns>) of BOTH GRU
    paths (lax.scan and the Pallas kernel with its default projection mode)
    against the torch packed-GRU oracle.  One-off runs of 60 and 80
    patterns recorded in PARITY.md; kept in-repo for cheap re-runs."""
    from umpr_tpu.ops.gru_pallas import bigru_pallas
    n = int(__import__("os").environ["UMPR_SOAK"])
    rng = np.random.default_rng(123)
    for trial in range(n):
        N = int(rng.integers(1, 40)); L = int(rng.integers(1, 24))
        E = int(rng.integers(1, 60)); H = int(rng.integers(1, 40))
        x = rng.standard_normal((N, L, E)).astype(np.float32)
        lengths = rng.integers(1, L + 1, size=N).astype(np.int32)
        params = init_bigru(jax.random.PRNGKey(trial), E, H)
        ref = torch_packed_bigru(params, x, lengths)
        for fn, name in ((bigru_scan, "scan"), (bigru_pallas, "pallas")):
            y = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(lengths)))
            err = np.abs(y - ref).max()
            assert err < 2e-5, (trial, name, (N, L, E, H), err)
