"""Train state: params + optax optimizer + step counter (+ batch stats)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    warmup_steps: int = 1000,
    max_steps: int = 100_000,
) -> optax.GradientTransformation:
    """AdamW with linear warmup + cosine decay (standard metric-learning recipe)."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=max(max_steps, warmup_steps + 1),
        end_value=lr * 0.01,
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def create_train_state(
    model,
    example_inputs: tuple,
    tx: Optional[optax.GradientTransformation] = None,
    seed: int = 0,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    """Initialize params (and batch_stats when the model uses BatchNorm)."""
    tx = tx or make_optimizer()
    variables = model.init(jax.random.PRNGKey(seed), *example_inputs, **(init_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        tx=tx,
    )
