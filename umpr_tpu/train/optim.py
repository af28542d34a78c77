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


def make_optimizer(l2_regularization):
    """Gradient transform WITHOUT the lr scale (the step applies -lr)."""
    return optax.chain(
        optax.masked(optax.add_decayed_weights(l2_regularization), _no_bias_mask),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),  # torch Adam defaults
    )


def init_opt_state(tx, trainable):
    return tx.init(trainable)


def lr_at_epoch(base_lr, decay, epoch):
    """ExponentialLR stepped per epoch (reference main.py:26,54)."""
    return base_lr * (decay ** epoch)
