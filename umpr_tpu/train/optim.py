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


def make_optimizer(l2_regularization, moment_dtype="float32"):
    """Gradient transform WITHOUT the lr scale (the step applies -lr)."""
    if moment_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"adam_moment_dtype must be 'float32' or 'bfloat16', got "
            f"{moment_dtype!r}")
    adam = (optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)  # torch defaults
            if moment_dtype == "float32"
            else _scale_by_adam_bf16_moments(0.9, 0.999, 1e-8))
    return optax.chain(
        optax.masked(optax.add_decayed_weights(l2_regularization), _no_bias_mask),
        adam,
    )


def init_opt_state(tx, trainable):
    return tx.init(trainable)


def lr_at_epoch(base_lr, decay, epoch):
    """ExponentialLR stepped per epoch (reference main.py:26,54)."""
    return base_lr * (decay ** epoch)
