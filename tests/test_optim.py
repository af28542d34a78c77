"""Optimizer parity vs torch.optim.Adam with the reference's two-group
weight-decay setup (reference main.py:22-26), and gradient parity of the
full model vs torch autograd through the reference implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from umpr_tpu.train.optim import make_optimizer, split_frozen
from umpr_tpu.models.umpr import ModelDims, init_umpr, umpr_forward

torch = pytest.importorskip("torch")


def test_adam_weight_decay_parity():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    params = {"layer": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    l2, lr = 1e-3, 1e-2

    tx = make_optimizer(l2)
    state = tx.init(params)

    tw = torch.nn.Parameter(torch.tensor(w))
    tb = torch.nn.Parameter(torch.tensor(b))
    opt = torch.optim.Adam(
        [{"params": [tw]}, {"params": [tb], "weight_decay": 0.0}],
        lr=lr, weight_decay=l2)

    for step in range(3):
        gw = rng.standard_normal(w.shape).astype(np.float32)
        gb = rng.standard_normal(b.shape).astype(np.float32)
        grads = {"layer": {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)}}
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)

        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        opt.step()

    np.testing.assert_allclose(np.asarray(params["layer"]["kernel"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layer"]["bias"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_gradient_parity_review_net():
    """jax.grad through our masked static-shape model == torch autograd
    through the (bug-fixed) reference on the same weights and batch."""
    from tests.ref_oracle import (import_reference_model, patch_improved_rnn,
                                  load_umpr, batch_to_reference, RefConfig,
                                  random_batch)
    ref = import_reference_model()
    patch_improved_rnn(ref)

    rng = np.random.default_rng(4)
    batch = random_batch(rng, B=4, S=5, L=10, S_ui=2)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(2), dims,
                       rng.standard_normal((40, 16)).astype(np.float32))
    trainable, frozen = split_frozen(params)

    def loss_fn(tr):
        full = {**tr, **frozen}
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        _, loss, _ = umpr_forward(full, b, dims, train=False)
        return loss

    grads = jax.grad(loss_fn)(trainable)

    model = load_umpr(ref, params, RefConfig(review_net_only=True))
    model.train()  # no dropout in the review net; train() only matters for VGG
    _, ref_loss = model(*batch_to_reference(batch))
    ref_loss.backward()

    pairs = [
        (grads["review_net"]["rnet"]["M"], model.review_net.r_net.M.grad),
        (grads["review_net"]["linear_u"]["kernel"], model.review_net.linear_u.weight.grad.T),
        (grads["review_net"]["snet_u"]["Ms"], model.review_net.s_net_u.Ms.grad),
        (grads["review_net"]["rnet"]["gru"]["fwd"]["w_ih"],
         model.review_net.r_net.gru.module.weight_ih_l0.grad.T),
        (grads["review_net"]["rnet"]["gru"]["bwd"]["bias_hh"],
         model.review_net.r_net.gru.module.bias_hh_l0_reverse.grad),
        (grads["linear_fusion"]["kernel"], model.linear_fusion[0].weight.grad.T),
        (grads["linear_fusion"]["bias"], model.linear_fusion[0].bias.grad),
    ]
    for ours, theirs in pairs:
        np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_gradient_parity_full_umpr():
    """Gradients through ControlNet + VisualNet (VGG16) + both losses vs
    torch autograd through the reference implementation."""
    from tests.ref_oracle import (import_reference_model, patch_improved_rnn,
                                  load_umpr, batch_to_reference, RefConfig,
                                  random_batch)
    ref = import_reference_model()
    patch_improved_rnn(ref)

    rng = np.random.default_rng(9)
    batch = random_batch(rng, B=2, S=4, L=9, S_ui=2, V=2, P=1,
                         with_photos=True, img=224)
    dims = ModelDims(review_net_only=False, view_size=2)
    params = init_umpr(jax.random.PRNGKey(6), dims,
                       rng.standard_normal((40, 16)).astype(np.float32))
    trainable, frozen = split_frozen(params)

    def loss_fn(tr):
        full = {**tr, **frozen}
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        _, loss, _ = umpr_forward(full, b, dims, train=False)
        return loss

    grads = jax.grad(loss_fn)(trainable)

    model = load_umpr(ref, params, RefConfig(review_net_only=False, views=["a", "b"]))
    model.eval()  # dropout off on both sides
    _, ref_loss = model(*batch_to_reference(batch))
    ref_loss.backward()

    cn, vn = model.control_net, model.visual_net
    pairs = [
        (grads["control_net"]["cnet"]["conv"]["kernel"],
         cn.c_net.cnn[0].weight.grad.permute(2, 1, 0)),
        (grads["control_net"]["cnet"]["linear"]["kernel"],
         cn.c_net.linear[0].weight.grad.T),
        (grads["control_net"]["cnet"]["gru"]["fwd"]["w_ih"],
         cn.c_net.gru.module.weight_ih_l0.grad.T),
        (grads["control_net"]["ssnet"]["linear"]["kernel"],
         cn.ss_net.linear[0].weight.grad.T),
        (grads["control_net"]["snet"]["Ms"], cn.s_net.Ms.grad),
        (grads["visual_net"]["pos_v_emb"], vn.pos_v_emb.grad),
        (grads["visual_net"]["linear"]["kernel"], vn.linear.weight.grad.T),
        (grads["visual_net"]["vgg16"]["features"][0]["kernel"],
         vn.vgg16[0].features[0].weight.grad.permute(2, 3, 1, 0)),
        (grads["visual_net"]["vgg16"]["classifier"][2]["kernel"],
         vn.vgg16[0].classifier[6].weight.grad.T),
        (grads["linear_fusion"]["kernel"], model.linear_fusion[0].weight.grad.T),
    ]
    for i, (ours, theirs) in enumerate(pairs):
        # atol 5e-5: the 13-conv-deep VGG backward accumulates ~1e-5 noise
        # on near-zero elements
        np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                                   rtol=2e-3, atol=5e-5, err_msg=f"pair {i}")


def test_adam_bf16_moments_tracks_f32():
    """--adam_moment_dtype bfloat16: same trajectory as f32 Adam to bf16
    rounding tolerance, and bit-exact resume from its own stored state."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    params = {"layer": {"kernel": jnp.asarray(w)}}
    lr = 1e-2

    tx32 = make_optimizer(1e-3)
    tx16 = make_optimizer(1e-3, "bfloat16")
    s32, s16 = tx32.init(params), tx16.init(params)
    p32 = p16 = params

    grads_seq = [rng.standard_normal(w.shape).astype(np.float32)
                 for _ in range(5)]
    for g in grads_seq:
        gr32 = {"layer": {"kernel": jnp.asarray(g)}}
        u32, s32 = tx32.update(gr32, s32, p32)
        p32 = jax.tree.map(lambda p, u: p - lr * u, p32, u32)
        u16, s16 = tx16.update(gr32, s16, p16)
        p16 = jax.tree.map(lambda p, u: p - lr * u, p16, u16)

    np.testing.assert_allclose(np.asarray(p16["layer"]["kernel"]),
                               np.asarray(p32["layer"]["kernel"]),
                               rtol=0, atol=2e-2)
    assert s16[1].mu["layer"]["kernel"].dtype == jnp.bfloat16
    # nu stays f32: with b2=0.999 its ~0.1% per-step EMA change is below
    # bf16's rounding threshold, so a bf16 nu would ratchet up on spikes and
    # never decay (see _scale_by_adam_bf16_moments).
    assert s16[1].nu["layer"]["kernel"].dtype == jnp.float32

    # resume-exactness: replaying step 6 from the stored (rounded) state in a
    # fresh transform gives bit-identical params to continuing in-process
    g6 = {"layer": {"kernel": jnp.asarray(
        rng.standard_normal(w.shape).astype(np.float32))}}
    u_cont, _ = tx16.update(g6, s16, p16)
    p_cont = jax.tree.map(lambda p, u: p - lr * u, p16, u_cont)
    tx_new = make_optimizer(1e-3, "bfloat16")
    u_res, _ = tx_new.update(g6, jax.tree.map(lambda x: x, s16), p16)
    p_res = jax.tree.map(lambda p, u: p - lr * u, p16, u_res)
    np.testing.assert_array_equal(np.asarray(p_cont["layer"]["kernel"]),
                                  np.asarray(p_res["layer"]["kernel"]))


def test_adam_bf16_second_moment_decays_after_spike():
    """Regression: nu must keep decaying under small late-training gradients
    (a bf16-stored nu would absorb sub-ULP EMA updates and stay frozen at
    its historical peak forever)."""
    params = {"w": jnp.ones((4,), jnp.float32)}
    tx = make_optimizer(0.0, "bfloat16")
    s = tx.init(params)
    spike = {"w": jnp.full((4,), 10.0, jnp.float32)}
    _, s = tx.update(spike, s, params)
    nu_peak = float(s[1].nu["w"][0])
    tiny = {"w": jnp.full((4,), 1e-3, jnp.float32)}
    for _ in range(50):
        _, s = tx.update(tiny, s, params)
    nu_now = float(s[1].nu["w"][0])
    # 50 steps of 0.999 decay toward ~0: nu must shrink by ~|1 - 0.999^50|
    assert nu_now < nu_peak * 0.96, (nu_peak, nu_now)


def test_adam_factored_nu_rank1_exact():
    """When g^2 is rank-1 (constant gradients are the canonical case), the
    factored second moment is EXACTLY the full one, so factored Adam must
    reproduce full Adam step for step."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((8, 6)).astype(np.float32)
    params = {"layer": {"kernel": jnp.asarray(w)}}
    u = rng.standard_normal(8).astype(np.float32)
    v = rng.standard_normal(6).astype(np.float32)
    g = jnp.asarray(np.outer(u, v))  # g^2 = outer(u^2, v^2): rank-1

    tx_full = make_optimizer(0.0)
    tx_fact = make_optimizer(0.0, factored_nu=True)
    p_full, s_full = dict(params), tx_full.init(params)
    p_fact, s_fact = dict(params), tx_fact.init(params)
    for _ in range(4):
        grads = {"layer": {"kernel": g}}
        up_full, s_full = tx_full.update(grads, s_full, p_full)
        up_fact, s_fact = tx_fact.update(grads, s_fact, p_fact)
        np.testing.assert_allclose(
            np.asarray(up_fact["layer"]["kernel"]),
            np.asarray(up_full["layer"]["kernel"]), rtol=2e-6, atol=1e-7)


def test_adam_factored_nu_state_shapes_and_bias_path():
    """>=2-D params get (row, col) factored nu; 1-D biases keep the full nu
    and must match full Adam exactly (their path is unfactored)."""
    rng = np.random.default_rng(5)
    params = {"conv": {"kernel": jnp.asarray(
                  rng.standard_normal((3, 3, 4, 5)).astype(np.float32)),
                       "bias": jnp.zeros((5,), jnp.float32)}}
    tx = make_optimizer(0.0, factored_nu=True)
    state = tx.init(params)
    nu = state[1].nu  # chain: (masked-decay, adam)
    shapes = sorted(tuple(a.shape for a in leaf) for leaf in nu)
    assert ((3, 3, 4), (5,)) in shapes       # factored conv kernel
    assert ((5,),) in shapes                  # full-bias nu

    tx_full = make_optimizer(0.0)
    tx_fact = tx
    s_full = tx_full.init(params)
    s_fact = state
    for i in range(3):
        g = {"conv": {"kernel": jnp.asarray(
                 rng.standard_normal((3, 3, 4, 5)).astype(np.float32)),
                      "bias": jnp.asarray(
                 rng.standard_normal((5,)).astype(np.float32))}}
        up_full, s_full = tx_full.update(g, s_full, params)
        up_fact, s_fact = tx_fact.update(g, s_fact, params)
        np.testing.assert_allclose(np.asarray(up_fact["conv"]["bias"]),
                                   np.asarray(up_full["conv"]["bias"]),
                                   rtol=1e-6, atol=1e-7)


def test_adam_factored_nu_converges_and_tracks_adam():
    """General (non-rank-1) gradients: factored Adam minimizes a quadratic
    and stays in the same neighborhood as full Adam."""
    rng = np.random.default_rng(7)
    target = jnp.asarray(rng.standard_normal((10, 8)).astype(np.float32))

    def loss(p):
        return jnp.sum((p["w"] - target) ** 2)

    lr = 0.05
    results = {}
    for name, tx in [("full", make_optimizer(0.0)),
                     ("fact", make_optimizer(0.0, factored_nu=True)),
                     ("fact_bf16mu", make_optimizer(0.0, "bfloat16", True))]:
        p = {"w": jnp.zeros((10, 8), jnp.float32)}
        s = tx.init(p)
        for _ in range(300):
            g = jax.grad(loss)(p)
            up, s = tx.update(g, s, p)
            p = jax.tree.map(lambda a, u: a - lr * u, p, up)
        results[name] = float(loss(p))
    assert results["fact"] < 1e-2, results
    assert results["fact_bf16mu"] < 5e-2, results
    assert results["fact"] < results["full"] * 10 + 1e-3, results


@pytest.mark.slow
def test_grad_accum_equals_single_step():
    """make_train_step_accum(k) must produce the same update and loss as the
    single full-batch step (fp-summation-order tolerance), for both the
    review-only and the full multi-modal model, including dead padded
    samples and an entirely-dead micro-batch (the loader's end-of-epoch
    padding can land that way)."""
    from tests.ref_oracle import random_batch
    from umpr_tpu.train.step import make_train_step, make_train_step_accum

    for review_only, kwargs in ((True, {}),
                                (False, dict(with_photos=True, img=32))):
        rng = np.random.default_rng(11)
        batch = random_batch(rng, B=8, S=5, L=10, S_ui=2, **kwargs)
        batch["sample_mask"][-3:] = 0.0  # last k=4 micro-batch fully dead
        dims = ModelDims(review_net_only=review_only, view_size=1,
                         photo_size=32)
        emb = np.random.default_rng(0).standard_normal((40, 16)).astype(np.float32)
        params = init_umpr(jax.random.PRNGKey(2), dims, emb)
        trainable, frozen = split_frozen(params)
        tx = make_optimizer(1e-3)
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

        results = []
        for k in (1, 4):
            step = (make_train_step(dims, tx, donate=False) if k == 1 else
                    make_train_step_accum(dims, k, tx, donate=False))
            # dropout_rng=None: dropout off on both paths (the accum path
            # draws per-micro-batch masks when a key is given, so exact
            # comparison requires it off)
            t, _, loss, aux = step(trainable, frozen, tx.init(trainable),
                                   dev_batch, 1e-3, None)
            results.append((t, float(loss), aux))

        (t1, l1, a1), (t4, l4, a4) = results
        assert float(a1["n_real"]) == float(a4["n_real"]) == 5.0
        assert abs(l1 - l4) <= 1e-5 * max(1.0, abs(l1)), (l1, l4)
        # same aux surface on both paths: metrics hooks written against the
        # single-step contract must keep working under grad accumulation
        assert set(a1) == set(a4)
        for key in set(a1) - {"n_real"}:
            np.testing.assert_allclose(float(a1[key]), float(a4[key]),
                                       rtol=1e-4, atol=1e-6, err_msg=key)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6), t1, t4)


def test_grad_accum_dropout_runs():
    """With a dropout key the accum path draws per-micro-batch masks; it
    must run and stay finite (no equality claim vs single-step)."""
    from tests.ref_oracle import random_batch
    from umpr_tpu.train.step import make_train_step_accum

    rng = np.random.default_rng(3)
    batch = random_batch(rng, B=4, S=4, L=8, S_ui=2, with_photos=True, img=32)
    dims = ModelDims(review_net_only=False, view_size=1, photo_size=32)
    emb = rng.standard_normal((40, 16)).astype(np.float32)
    params = init_umpr(jax.random.PRNGKey(1), dims, emb)
    trainable, frozen = split_frozen(params)
    tx = make_optimizer(1e-3)
    step = make_train_step_accum(dims, 2, tx, donate=False)
    _, _, loss, _ = step(trainable, frozen, tx.init(trainable),
                         {k: jnp.asarray(v) for k, v in batch.items()},
                         1e-3, jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))
