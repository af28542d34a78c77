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
import numpy as np
import optax

from umpr_tpu.models.umpr import masked_sq_sum, umpr_forward
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
    the single-step path.

    Dropout rngs are derived IN-GRAPH from (base_rng, start): per-step
    key j is fold_in(base_rng, start + j) -- bit-identical to the eager
    _fold_chunk derivation the trainer used through round 4, but one
    fewer device dispatch per chunk (measured 0.34 ms/step on the relay,
    BENCH_DETAILS.md "Through-trainer").  `start` must arrive as a
    uint32 ARRAY (np.uint32(batch_counter)): a Python int would bake
    into the trace and recompile every chunk."""

    def loss_fn(trainable, frozen, batch, dropout_rng):
        params = merge_params(trainable, frozen)
        pred, loss, aux = umpr_forward(params, batch, dims, train=True,
                                       dropout_rng=dropout_rng)
        return loss, (pred, aux)

    def multi_step(trainable, frozen, opt_state, batches, lr, base_rng,
                   start):
        k = jax.tree.leaves(batches)[0].shape[0]
        offs = start + jnp.arange(k, dtype=jnp.uint32)
        dropout_rngs = jax.vmap(
            lambda j: jax.random.fold_in(base_rng, j))(offs)

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


def make_train_step_accum(dims, k, tx, donate=True):
    """One optimizer update from k sequential micro-batches (gradient
    accumulation): the batch's leading dim is split into k slices and a
    lax.scan accumulates their gradients before a single tx.update.  Peak
    activation memory drops to one micro-batch's footprint (the VGG16
    path's 224^2 activations dominate), enabling large effective batches
    on a fixed HBM budget.

    Equivalent to the single full-batch step up to floating-point
    summation order (CI-verified at 1e-5): the loss is additive over
    samples -- the MSE term is re-assembled as
    sq_sum_micro / n_total (n_total = the FULL batch's real-sample count),
    and the auxiliary visual loss (reference model.py:276) sums over the
    batch inside its (V, B) @ (B, V) contraction, so per-micro-batch
    loss_v terms add up to the full-batch value.  Dropout draws one
    subkey per micro-batch (the one intentional divergence from the
    single-step path; a full batch draws a single mask)."""

    def micro_loss(trainable, frozen, batch, dropout_rng, n_total):
        params = merge_params(trainable, frozen)
        pred, _, aux = umpr_forward(params, batch, dims, train=True,
                                    dropout_rng=dropout_rng)
        mask = batch["sample_mask"]
        sq = masked_sq_sum(pred, batch["ratings"], mask)
        loss = sq / n_total
        # per-micro aux terms that SUM to the single-step aux values:
        # loss_r micro-terms are sq/n_total (full-batch denominator), loss_v
        # is additive over micro-batches (see the docstring)
        out_aux = {"loss_r": sq / n_total}
        if not dims.review_net_only:
            loss = loss + dims.loss_v_rate * aux["loss_v"]
            out_aux["loss_v"] = aux["loss_v"]
        return loss, out_aux

    def train_step(trainable, frozen, opt_state, batch, lr, dropout_rng):
        B = batch["sample_mask"].shape[0]
        assert B % k == 0, f"batch {B} not divisible by grad_accum_steps {k}"
        n_total = jnp.maximum(jnp.sum(batch["sample_mask"]), 1.0)
        # Full-batch padding maxima, broadcast to every micro-batch: the
        # model's numerics follow the reference's per-batch dynamic padding
        # (umpr_tpu/ops/masking.py), so each micro-batch must see the FULL
        # batch's maxima or accumulation would diverge from the single step.
        from umpr_tpu.ops import masking
        pad_maxima = (
            masking.batch_max_count(batch["u_counts"], batch["i_counts"]),
            masking.batch_max_length(batch["u_lengths"], batch["i_lengths"]),
            batch["ui_counts"].max(), batch["ui_lengths"].max())
        micro = jax.tree.map(
            lambda a: a.reshape((k, B // k) + a.shape[1:]), batch)
        # dropout_rng=None (dropout off, like the single-step path) is a
        # trace-time property; scan still needs an array leaf to carry.
        has_rng = dropout_rng is not None
        rngs = (jax.random.split(dropout_rng, k) if has_rng
                else jnp.zeros(k, jnp.int32))

        def body(grads, inp):
            mb, rng = inp
            mb = dict(mb, pad_maxima=pad_maxima)
            (loss, aux_m), g = jax.value_and_grad(micro_loss, has_aux=True)(
                trainable, frozen, mb, rng if has_rng else None, n_total)
            return jax.tree.map(jnp.add, grads, g), (loss, aux_m)

        zeros = jax.tree.map(jnp.zeros_like, trainable)
        grads, (losses, auxs) = jax.lax.scan(body, zeros, (micro, rngs))
        updates, opt_state = tx.update(grads, opt_state, trainable)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        trainable = optax.apply_updates(trainable, updates)
        # same aux surface as make_train_step: micro terms sum to the
        # full-batch loss_r / loss_v (see micro_loss)
        aux = jax.tree.map(lambda a: jnp.sum(a, axis=0), auxs)
        aux["n_real"] = jnp.sum(batch["sample_mask"])
        return trainable, opt_state, jnp.sum(losses), aux

    return jax.jit(train_step, donate_argnums=(0, 2) if donate else ())


RESIDENT_FIELDS = ("u_tokens", "u_lengths", "u_counts",
                   "i_tokens", "i_lengths", "i_counts",
                   "ui_tokens", "ui_lengths", "ui_counts", "ratings")


def gather_batch(data, idx, n_real):
    """Assemble a loader-identical batch ON DEVICE from resident packed
    arrays: fancy-index `idx` rows of every field, then apply exactly the
    dead-sample padding the host loader applies to a final partial batch
    (loader.py::_make_batch): sample_mask 0, counts 0, lengths 1, row 0 as
    the harmless gather target.  Rows `arange(B) >= n_real` are dead.

    This is the device-resident-corpus dispatch path: instead of shipping
    ~250 KB of batch arrays per step through the host->device link (the
    measured through-trainer bottleneck on relay-attached hosts -- see
    BENCH_DETAILS.md "Through-trainer attribution"), the trainer ships a
    (B,) int32 index vector and the gather runs at HBM bandwidth."""
    B = idx.shape[0]
    alive = jnp.arange(B) < n_real
    idx = jnp.where(alive, idx, 0)
    batch = {k: data[k][idx] for k in RESIDENT_FIELDS}
    batch["sample_mask"] = alive.astype(jnp.float32)
    for k in ("u_counts", "i_counts", "ui_counts"):
        batch[k] = jnp.where(alive, batch[k], 0)
    for k in ("u_lengths", "i_lengths", "ui_lengths"):
        batch[k] = jnp.where(alive[:, None], batch[k], 1)
    if "photo_bank" in data:
        # resident photos: per-sample bank rows -> (B, V, P, H, W, 3) uint8.
        # Bank row 0 is all-zeros, exactly what the streaming loader ships
        # for '' paths, decode failures, and dead samples (paths[dead]='').
        rows = data["photo_idx"][idx]
        rows = jnp.where(alive[:, None, None], rows, 0)
        batch["photos"] = data["photo_bank"][rows]
    return batch


def make_train_step_resident(dims, tx, donate=True):
    """make_train_step over a device-resident dataset: the batch arrives as
    (data, idx, n_real) and is gathered on device.  Bit-identical to the
    streaming step on the same rows (tests/test_device_dataset.py)."""

    def loss_fn(trainable, frozen, batch, dropout_rng):
        params = merge_params(trainable, frozen)
        pred, loss, aux = umpr_forward(params, batch, dims, train=True,
                                       dropout_rng=dropout_rng)
        return loss, (pred, aux)

    def train_step(trainable, frozen, opt_state, data, idx, n_real, lr,
                   dropout_rng):
        batch = gather_batch(data, idx, n_real)
        (loss, (pred, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, dropout_rng)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        trainable = optax.apply_updates(trainable, updates)
        aux["n_real"] = jnp.sum(batch["sample_mask"])
        return trainable, opt_state, loss, aux

    return jax.jit(train_step, donate_argnums=(0, 2) if donate else ())


def make_multi_train_step_resident(dims, tx, donate=True):
    """make_multi_train_step over a device-resident dataset: idxs (k, B)
    and n_reals (k,) replace the stacked batch arrays; each scan step
    gathers its batch from `data` on device.  The per-dispatch wire traffic
    drops from ~k*250 KB to ~k*260 bytes."""

    def loss_fn(trainable, frozen, batch, dropout_rng):
        params = merge_params(trainable, frozen)
        pred, loss, aux = umpr_forward(params, batch, dims, train=True,
                                       dropout_rng=dropout_rng)
        return loss, (pred, aux)

    def multi_step(trainable, frozen, opt_state, data, idxs, n_reals, lr,
                   base_rng, start):
        k = idxs.shape[0]
        offs = start + jnp.arange(k, dtype=jnp.uint32)
        dropout_rngs = jax.vmap(
            lambda j: jax.random.fold_in(base_rng, j))(offs)

        def body(carry, inp):
            trainable, opt_state = carry
            idx, n_real, rng = inp
            batch = gather_batch(data, idx, n_real)
            (loss, (pred, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, frozen, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            trainable = optax.apply_updates(trainable, updates)
            return (trainable, opt_state), (loss, jnp.sum(batch["sample_mask"]))

        (trainable, opt_state), (losses, n_reals_out) = jax.lax.scan(
            body, (trainable, opt_state), (idxs, n_reals, dropout_rngs))
        return (trainable, opt_state, jnp.sum(losses * n_reals_out),
                jnp.sum(n_reals_out))

    return jax.jit(multi_step, donate_argnums=(0, 2) if donate else ())


def make_eval_step_resident(dims):
    def eval_step(trainable, frozen, data, idx, n_real):
        batch = gather_batch(data, idx, n_real)
        params = merge_params(trainable, frozen)
        pred, _, _ = umpr_forward(params, batch, dims, train=False)
        mask = batch["sample_mask"]
        sq_err = masked_sq_sum(pred, batch["ratings"], mask)
        return sq_err, jnp.sum(mask)

    return jax.jit(eval_step)


def make_multi_eval_step_resident(dims):
    """make_multi_eval_step over a device-resident dataset (idxs (k, B),
    n_reals (k,)); per-batch (sq, n) pairs come back as (k,) vectors so
    the host keeps the reference's per-batch summation order."""

    def multi_eval(trainable, frozen, data, idxs, n_reals):
        params = merge_params(trainable, frozen)

        def body(_, inp):
            idx, n_real = inp
            batch = gather_batch(data, idx, n_real)
            pred, _, _ = umpr_forward(params, batch, dims, train=False)
            mask = batch["sample_mask"]
            return None, (masked_sq_sum(pred, batch["ratings"], mask),
                          jnp.sum(mask))

        _, (sqs, ns) = jax.lax.scan(body, None, (idxs, n_reals))
        return sqs, ns

    return jax.jit(multi_eval)


def make_eval_step(dims):
    def eval_step(trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        pred, _, _ = umpr_forward(params, batch, dims, train=False)
        mask = batch["sample_mask"]
        sq_err = masked_sq_sum(pred, batch["ratings"], mask)
        return sq_err, jnp.sum(mask)

    return jax.jit(eval_step)


def make_multi_eval_step(dims):
    """K eval batches per device dispatch: batches stacked on a leading
    axis, lax.scan applies them sequentially on-device, per-batch
    (sq_err, n) pairs come back as (k,) vectors so callers keep the
    reference's per-batch host summation order (src/evaluate.py:6-14).

    The eval/serving path is dispatch-bound on remote-attached TPUs for
    the same reason training is (see make_multi_train_step): per-call
    latency adds serially to every batch.  Unlike training there is no
    carried state, but one dispatch per k batches amortizes the latency
    identically."""

    def multi_eval(trainable, frozen, batches):
        params = merge_params(trainable, frozen)

        def body(_, batch):
            pred, _, _ = umpr_forward(params, batch, dims, train=False)
            mask = batch["sample_mask"]
            return None, (masked_sq_sum(pred, batch["ratings"], mask),
                          jnp.sum(mask))

        _, (sqs, ns) = jax.lax.scan(body, None, batches)
        return sqs, ns

    return jax.jit(multi_eval)


def mse_from_parts(parts):
    """Reduce (sq_sum, n) pairs — scalars or per-chunk arrays — to dataset
    MSE = sum of squared errors / sample count, the reference's evaluate_mse
    semantics (src/evaluate.py:6-14).  The single host-side home for this
    reduction: evaluate_mse and the trainer's chunked-dispatch eval both
    route through it, so the semantics (incl. nan on an empty split —
    surface it, don't report 0) cannot fork between configurations."""
    parts = list(parts)
    # one bulk device->host fetch instead of a readback round trip per
    # part: on relay-attached hosts each np.asarray costs an RTT, which
    # dominated the eval wall at the 500-batch protocol cadence
    parts = jax.device_get(parts)
    total, count = 0.0, 0.0
    for sq, n in parts:
        for s, c in zip(np.asarray(sq).ravel(), np.asarray(n).ravel()):
            total += float(s)
            count += float(c)
    return total / count if count else float("nan")


def evaluate_mse(eval_step, trainable, frozen, batches):
    """Dataset MSE over a device-batch stream (one eval_step per batch)."""
    return mse_from_parts(eval_step(trainable, frozen, b) for b in batches)
