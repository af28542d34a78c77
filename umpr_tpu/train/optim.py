"""Optimizer with torch-parity semantics.

Reference (main.py:22-26): torch.optim.Adam with weight_decay=l2 for every
parameter whose name does NOT contain 'bias', weight_decay=0 for biases,
plus ExponentialLR stepped once per epoch.  torch Adam's weight decay is L2
ADDED TO THE GRADIENT before the moment updates (not AdamW), so the optax
chain is add_decayed_weights -> scale_by_adam, and the (per-epoch decayed)
learning rate is applied to the final update by the train step.

The frozen GloVe embedding (reference model.py:237: from_pretrained default
freeze => the parameter never reaches the optimizer) is excluded up front by
`split_frozen`, so Adam moments are never allocated for the (potentially
multi-hundred-MB) vocab table.
"""

from __future__ import annotations

import jax
import optax

FROZEN_KEYS = ("embedding",)


def split_frozen(params):
    """params -> (trainable, frozen) top-level split."""
    trainable = {k: v for k, v in params.items() if k not in FROZEN_KEYS}
    frozen = {k: v for k, v in params.items() if k in FROZEN_KEYS}
    return trainable, frozen


def merge_params(trainable, frozen):
    return {**trainable, **frozen}


def _no_bias_mask(params):
    """True (apply weight decay) for every leaf whose key path does not end
    in a 'bias'-flavored name -- the exact analogue of the reference's
    `'bias' not in name` grouping (main.py:23-24)."""
    def walk(node, decay=True):
        if isinstance(node, dict):
            return {k: walk(v, decay and "bias" not in k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, decay) for v in node)
        return decay
    return walk(params)


def _scale_by_adam_bf16_moments(b1, b2, eps):
    """scale_by_adam with the FIRST moment stored bfloat16 (f32 math
    in-register); the second moment stays float32.

    mu's per-step relative change is ~(1-b1)=10%, far above bf16's half-ULP
    (~0.2-0.4%), so rounding it is benign.  nu's per-step change with
    b2=0.999 is ~0.1% -- BELOW bf16's rounding threshold -- so a bf16 nu
    would absorb small updates entirely: it could ratchet up on gradient
    spikes but never decay back, permanently suppressing those parameters'
    updates late in training.  nu therefore stays f32; the option still cuts
    a quarter of the m/v read+write streams of the fused grad+Adam ops over
    VGG16's 138M params.  The update is computed from the ROUNDED stored mu
    so a checkpoint resume replays the exact same trajectory as an
    uninterrupted run.  Opt-in via --adam_moment_dtype bfloat16 (default
    float32 keeps bit-parity with torch Adam)."""
    import jax.numpy as jnp

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.bfloat16), params),
            nu=jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params))

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        # f32 moment math, bf16 mu storage; the rounded values feed the update
        mu = jax.tree.map(
            lambda m, g: (b1 * m.astype(g.dtype) + (1 - b1) * g).astype(jnp.bfloat16),
            state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * (g * g).astype(jnp.float32),
            state.nu, updates)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v, g: (m.astype(g.dtype) / c1)
            / (jnp.sqrt(v / c2).astype(g.dtype) + eps),
            mu, nu, updates)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _factored_shape(shape):
    """Factor the second moment for tensors that are genuinely 2-D+ (both the
    flattened row block and the last dim larger than 1)."""
    rows = 1
    for d in shape[:-1]:
        rows *= d
    return len(shape) >= 2 and shape[-1] > 1 and rows > 1


def _scale_by_adam_factored_nu(b1, b2, eps, mu_dtype="float32"):
    """Adam with an Adafactor-style FACTORED second moment for >=2-D
    parameters (opt-in ``--adam_factored_nu``; Shazeer & Stern 2018,
    arXiv:1804.04235).

    nu is approximated per matrix as ``vhat = outer(r, c) / mean(r)`` where
    r/c are EMAs of the row/column means of g**2 (exact whenever g**2 is
    rank-1, e.g. any constant or outer-product gradient); conv kernels
    [kh, kw, ci, co] factor as rows=(kh, kw, ci) x cols=(co,).  1-D params
    (biases) keep the full nu.  The first moment and every other Adam
    ingredient (bias correction, eps placement, the L2-added-to-gradient
    decay applied upstream) are unchanged, so this is Adam with a low-rank
    nu, not Adafactor (no update clipping, no relative step sizes).

    Why: over VGG16's 138M params the full nu costs 552 MB of state and
    ~1.1 GB of read+write HBM traffic per step; factored it is ~0.3 MB.
    NOT torch-parity (a different trajectory) -- default stays full Adam.
    Composes with --adam_moment_dtype bfloat16 (mu storage rounding,
    resume-exact: updates are computed from the rounded mu)."""
    import jax.numpy as jnp

    mu_dtype = jnp.dtype(mu_dtype)

    def init_fn(params):
        mu = jax.tree.map(lambda p: jnp.zeros(p.shape, mu_dtype), params)

        def nu_init(p):
            if _factored_shape(p.shape):
                return (jnp.zeros(p.shape[:-1], jnp.float32),
                        jnp.zeros(p.shape[-1:], jnp.float32))
            return (jnp.zeros(p.shape, jnp.float32),)

        nu = tuple(nu_init(p) for p in jax.tree.leaves(params))
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def mu_up(m, g):
            return (b1 * m.astype(g.dtype) + (1 - b1) * g).astype(mu_dtype)

        def nu_up(nu_leaf, g):
            g2 = (g * g).astype(jnp.float32)
            if len(nu_leaf) == 2:
                row, col = nu_leaf
                return (b2 * row + (1 - b2) * g2.mean(axis=-1),
                        b2 * col + (1 - b2) * g2.mean(
                            axis=tuple(range(g.ndim - 1))))
            return (b2 * nu_leaf[0] + (1 - b2) * g2,)

        def vhat(nu_leaf):
            if len(nu_leaf) == 2:
                row, col = nu_leaf
                # outer(row, col) / mean(row): mean(row) == mean(col) == the
                # EMA of mean(g^2), so the approximation is symmetric and
                # rank-1-exact.  The guard only matters while every seen
                # gradient was exactly zero (update is 0 regardless).
                denom = jnp.maximum(row.mean(), jnp.float32(1e-30))
                return row[..., None] * col / denom / c2
            return nu_leaf[0] / c2

        u_leaves, tdef = jax.tree.flatten(updates)
        mu = jax.tree.map(mu_up, state.mu, updates)
        nu = tuple(nu_up(nl, g) for nl, g in zip(state.nu, u_leaves))
        out_leaves = [
            (m.astype(g.dtype) / c1)
            / (jnp.sqrt(vhat(nl)).astype(g.dtype) + eps)
            for m, nl, g in zip(jax.tree.leaves(mu), nu, u_leaves)]
        out = jax.tree.unflatten(tdef, out_leaves)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(l2_regularization, moment_dtype="float32",
                   factored_nu=False):
    """Gradient transform WITHOUT the lr scale (the step applies -lr)."""
    if moment_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"adam_moment_dtype must be 'float32' or 'bfloat16', got "
            f"{moment_dtype!r}")
    if factored_nu:
        adam = _scale_by_adam_factored_nu(0.9, 0.999, 1e-8,
                                          mu_dtype=moment_dtype)
    elif moment_dtype == "float32":
        adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)  # torch defaults
    else:
        adam = _scale_by_adam_bf16_moments(0.9, 0.999, 1e-8)
    return optax.chain(
        optax.masked(optax.add_decayed_weights(l2_regularization), _no_bias_mask),
        adam,
    )


def init_opt_state(tx, trainable):
    return tx.init(trainable)


def lr_at_epoch(base_lr, decay, epoch):
    """ExponentialLR stepped per epoch (reference main.py:26,54)."""
    return base_lr * (decay ** epoch)
