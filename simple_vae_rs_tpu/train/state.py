"""Functional train state: params (incl. gammas), BN stats, Adam state, RNG.

The reference mutates an ``nn.Module`` in place and keeps the optimizer
outside the checkpoint (broken resume, reference ``train.py:57-63``); here
the entire training state is one pytree — jit-donatable, shardable, and
checkpointable as a unit, which makes resume exact.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax
from flax import struct
from flax.core import FrozenDict

from simple_vae_rs_tpu.config import TrainConfig


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Global-norm clip 1.0 -> Adam(1e-4), matching reference
    ``models/base.py:106`` + ``train.py:65`` (torch clips before the step).

    The learning rate is applied outside this transformation (see
    ``apply_updates_with_lr``) so the host-side plateau scheduler can change
    it without rebuilding optimizer state.
    """
    import jax.numpy as jnp

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(
            b1=0.9, b2=0.999, eps=1e-8,
            mu_dtype=jnp.bfloat16 if cfg.bf16_moments else None,
        ),
    )


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array  # int32 scalar


def create_train_state(
    variables: FrozenDict | Dict[str, Any],
    tx: optax.GradientTransformation,
    rng: jax.Array,
) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=rng,
        step=jnp.zeros((), jnp.int32),
    )
