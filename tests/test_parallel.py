"""Data-parallel invariant: N-device training is step-for-step identical to
1-device training on the same global batch.

This is exactly the invariant the reference's DataParallel bug violated
(reference readme.md:154-160): per-shard max lengths drifted from the global
pad length.  With static global shapes + runtime masks the bug cannot exist;
this test proves it on an 8-way virtual CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from umpr_tpu.models.umpr import ModelDims, init_umpr
from umpr_tpu.parallel.mesh import make_mesh, replicated, batch_sharded
from umpr_tpu.train.optim import make_optimizer, split_frozen
from umpr_tpu.train.step import make_train_step
from tests.ref_oracle import random_batch


def run_steps(devices, n_steps=3, seed=0, shard_embedding=False):
    mesh = make_mesh(devices)
    rep, dp = replicated(mesh), batch_sharded(mesh)

    rng = np.random.default_rng(seed)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(seed), dims,
                       rng.standard_normal((48, 16)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    trainable = jax.device_put(trainable, rep)
    if shard_embedding:
        from jax.sharding import NamedSharding, PartitionSpec as P
        frozen = {"embedding": jax.device_put(
            frozen["embedding"], NamedSharding(mesh, P("dp", None)))}
    else:
        frozen = jax.device_put(frozen, rep)
    tx = make_optimizer(1e-3)
    opt_state = jax.device_put(tx.init(trainable), rep)
    step = make_train_step(dims, tx, donate=False)

    losses = []
    for i in range(n_steps):
        batch = random_batch(np.random.default_rng(100 + i), B=16, S=5, L=12, S_ui=2)
        batch = {k: jax.device_put(jnp.asarray(v), dp) for k, v in batch.items()}
        trainable, opt_state, loss, _ = step(
            trainable, frozen, opt_state, batch, 1e-3, jax.random.PRNGKey(i))
        losses.append(float(loss))
    return losses, trainable


def test_8dev_equals_1dev():
    devices = jax.devices()
    assert len(devices) >= 8
    losses_1, tr_1 = run_steps(devices[:1])
    losses_8, tr_8 = run_steps(devices[:8])
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-5, atol=1e-6)
    l1 = jax.tree_util.tree_leaves(tr_1)
    l8 = jax.tree_util.tree_leaves(tr_8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_vocab_sharded_embedding_equals_replicated():
    """Tensor-parallel vocab table (rows sharded over the mesh) must be a
    pure layout change: identical losses and updates."""
    devices = jax.devices()
    losses_rep, tr_rep = run_steps(devices[:8], seed=1)
    losses_tp, tr_tp = run_steps(devices[:8], seed=1, shard_embedding=True)
    np.testing.assert_allclose(losses_rep, losses_tp, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(tr_rep),
                    jax.tree_util.tree_leaves(tr_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_2d_mesh_shape_batch_on_dp():
    """mesh_shape [4, 2]: batch shards over the leading 'dp' axis; params
    replicated over both axes; same losses as 1-D."""
    devices = jax.devices()[:8]
    from umpr_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(devices, shape=[4, 2])
    assert mesh.axis_names == ("dp", "mp")
    losses_1, _ = run_steps(devices[:1], seed=3)

    from umpr_tpu.parallel.mesh import replicated, batch_sharded
    rep, dp = replicated(mesh), batch_sharded(mesh)
    rng = np.random.default_rng(3)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(3), dims,
                       rng.standard_normal((48, 16)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    trainable = jax.device_put(trainable, rep)
    frozen = jax.device_put(frozen, rep)
    tx = make_optimizer(1e-3)
    opt_state = jax.device_put(tx.init(trainable), rep)
    step = make_train_step(dims, tx, donate=False)
    losses = []
    for i in range(3):
        batch = random_batch(np.random.default_rng(100 + i), B=16, S=5, L=12, S_ui=2)
        batch = {k: jax.device_put(jnp.asarray(v), dp) for k, v in batch.items()}
        trainable, opt_state, loss, _ = step(
            trainable, frozen, opt_state, batch, 1e-3, jax.random.PRNGKey(i))
        losses.append(float(loss))
    np.testing.assert_allclose(losses, losses_1, rtol=1e-5, atol=1e-6)


def test_grad_accum_on_8dev_mesh():
    """Gradient accumulation under a dp-sharded batch: the (B,) -> (k, B/k)
    reshape must compile and the update must match the 1-device accumulated
    run (GSPMD reshards the micro axis; values are mesh-independent)."""
    from umpr_tpu.train.step import make_train_step_accum
    from umpr_tpu.parallel.mesh import make_mesh, replicated, batch_sharded

    def run(devices):
        mesh = make_mesh(devices)
        rep, dp = replicated(mesh), batch_sharded(mesh)
        rng = np.random.default_rng(3)
        dims = ModelDims(review_net_only=True)
        params = init_umpr(jax.random.PRNGKey(3), dims,
                           rng.standard_normal((48, 16)).astype(np.float32))
        trainable, frozen = split_frozen(params)
        trainable = jax.device_put(trainable, rep)
        frozen = jax.device_put(frozen, rep)
        tx = make_optimizer(1e-3)
        opt_state = jax.device_put(tx.init(trainable), rep)
        step = make_train_step_accum(dims, 2, tx, donate=False)
        batch = random_batch(np.random.default_rng(7), B=16, S=5, L=12, S_ui=2)
        batch = {k: jax.device_put(jnp.asarray(v), dp) for k, v in batch.items()}
        trainable, opt_state, loss, _ = step(
            trainable, frozen, opt_state, batch, 1e-3, None)
        return float(loss), trainable

    devices = jax.devices()
    assert len(devices) >= 8
    l1, t1 = run(devices[:1])
    l8, t8 = run(devices[:8])
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(t8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
