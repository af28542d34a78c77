"""Jitted train / eval steps.

One compiled executable per phase: static shapes everywhere (the loader pads
final batches with masked dead samples), runtime batch maxima carried as
data.  Under a multi-device mesh the batch arrays arrive sharded along 'dp'
and parameters replicated; XLA turns the global-mean loss and the gradient
reductions into psum over ICI -- the reference's DataParallel scatter/gather
(main.py:81-84) with none of its shard-length pitfalls.

Gradient-parity note: the loss is the global masked mean, so N-device
training is step-for-step identical to 1-device training on the same global
batch (verified in tests/test_parallel.py), the invariant the reference's
DataParallel bug violated (readme.md:154-160).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from umpr_tpu.models.umpr import umpr_forward
from umpr_tpu.train.optim import merge_params


def make_train_step(dims, tx, donate=True):
    def loss_fn(trainable, frozen, batch, dropout_rng):
        params = merge_params(trainable, frozen)
        pred, loss, aux = umpr_forward(params, batch, dims, train=True,
                                       dropout_rng=dropout_rng)
        return loss, (pred, aux)

    def train_step(trainable, frozen, opt_state, batch, lr, dropout_rng):
        (loss, (pred, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, dropout_rng)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        trainable = optax.apply_updates(trainable, updates)
        aux["n_real"] = jnp.sum(batch["sample_mask"])
        return trainable, opt_state, loss, aux

    return jax.jit(train_step, donate_argnums=(0, 2) if donate else ())


def make_multi_train_step(dims, tx, donate=True):
    """K train steps per dispatch: batches stacked on a leading axis,
    lax.scan applies them sequentially on-device.  Numerically identical to
    K single dispatches (same update order); amortizes per-dispatch host
    latency, which dominates through-trainer throughput on remote-attached
    TPUs (this machine's relay adds ~10-30 ms per call).

    Only FULL chunks may be dispatched: a dead batch would still apply the
    weight-decay part of the update.  The trainer handles remainders with
    the single-step path."""

    def loss_fn(trainable, frozen, batch, dropout_rng):
        params = merge_params(trainable, frozen)
        pred, loss, aux = umpr_forward(params, batch, dims, train=True,
                                       dropout_rng=dropout_rng)
        return loss, (pred, aux)

    def multi_step(trainable, frozen, opt_state, batches, lr, dropout_rngs):
        def body(carry, inp):
            trainable, opt_state = carry
            batch, rng = inp
            (loss, (pred, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, frozen, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            trainable = optax.apply_updates(trainable, updates)
            return (trainable, opt_state), (loss, jnp.sum(batch["sample_mask"]))

        (trainable, opt_state), (losses, n_reals) = jax.lax.scan(
            body, (trainable, opt_state), (batches, dropout_rngs))
        return trainable, opt_state, jnp.sum(losses * n_reals), jnp.sum(n_reals)

    return jax.jit(multi_step, donate_argnums=(0, 2) if donate else ())


def make_eval_step(dims):
    def eval_step(trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        pred, _, _ = umpr_forward(params, batch, dims, train=False)
        mask = batch["sample_mask"]
        sq_err = jnp.sum(mask * (pred - batch["ratings"]) ** 2)
        return sq_err, jnp.sum(mask)

    return jax.jit(eval_step)


def evaluate_mse(eval_step, trainable, frozen, batches):
    """Dataset MSE = sum of squared errors / sample count, the reference's
    evaluate_mse semantics (src/evaluate.py:6-14)."""
    total, count = 0.0, 0.0
    for batch in batches:
        sq, n = eval_step(trainable, frozen, batch)
        total += float(sq)
        count += float(n)
    if count == 0:
        return float("nan")  # empty dataset -- surface it, don't report 0
    return total / count
