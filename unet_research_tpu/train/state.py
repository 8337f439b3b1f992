"""Train state: params + SGD(momentum) with runtime-adjustable LR.

Optimizer recipe parity: torch.optim.SGD(lr, momentum=0.99) with optional
global-norm gradient clipping (the reference passes --gradient_clip_val 0.5
through the PL Trainer; README.md:64). optax.sgd's trace update
(v = g + mu*v; p -= lr*v) is identical to torch SGD with dampening=0.

The LR is injected via optax.inject_hyperparams so the plateau scheduler can
change it between epochs without recompiling the jitted step.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # non-trainable collections (BatchNorm running stats); None for the
    # GroupNorm/no-norm models every reference entry point builds
    batch_stats: Optional[FrozenDict] = None

    def apply_gradients(self, grads, lr):
        opt_state = set_lr(self.opt_state, lr)
        updates, new_opt_state = self.tx.update(grads, opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params, opt_state=new_opt_state)


def make_optimizer(
    lr: float, momentum: float = 0.99, clip_norm: Optional[float] = None
) -> optax.GradientTransformation:
    def build(learning_rate):
        parts = []
        if clip_norm is not None:
            parts.append(optax.clip_by_global_norm(clip_norm))
        parts.append(optax.sgd(learning_rate=learning_rate, momentum=momentum))
        return optax.chain(*parts)

    return optax.inject_hyperparams(build)(learning_rate=lr)


def set_lr(opt_state, lr):
    """Replace the injected learning_rate hyperparam (traced-scalar safe)."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = lr
    return opt_state._replace(hyperparams=hyper)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def create_train_state(
    params,
    lr: float,
    momentum: float = 0.99,
    clip_norm: Optional[float] = None,
    batch_stats=None,
) -> TrainState:
    import jax.numpy as jnp

    tx = make_optimizer(lr, momentum, clip_norm)
    return TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        batch_stats=batch_stats,
    )
