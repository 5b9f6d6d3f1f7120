"""Train state: params + batch-norm stats + optimizer state + RNG, one pytree.

Unlike the reference checkpoint dict (train_classification.py:200-222, which
saves model/optimizer state but never restores the optimizer, :42-44), the
full state here is a single pytree — everything needed to resume exactly,
shard over a mesh, or donate to a jitted step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from pointnet_like_pose_estimation_tpu.train.config import TrainConfig


class PoseTrainState(train_state.TrainState):
    """TrainState + BatchNorm running stats + per-step RNG key."""

    batch_stats: Any = None
    rng: jax.Array = None


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam/SGD + L2 weight decay + StepLR schedule.

    Matches torch semantics: ``Adam(weight_decay=1e-4)`` adds ``wd * p`` to
    the gradient *before* the moment updates (not AdamW), and
    ``StepLR(step_size=20, gamma=0.7)`` decays per epoch
    (train_classification.py:50-61).
    """

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.learning_rate * (cfg.lr_gamma ** (epoch // cfg.lr_step_epochs))

    if cfg.optimizer == "adam":
        core = optax.scale_by_adam()
    elif cfg.optimizer == "sgd":
        core = optax.trace(decay=0.9)  # reference SGD(momentum=0.9) branch
    else:
        raise ValueError(cfg.optimizer)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        core,
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(
    cfg: TrainConfig,
    model,
    example_inputs: tuple,
    steps_per_epoch: int = 100,
) -> PoseTrainState:
    """Initialize params/batch_stats and bundle the optimizer."""
    # old-style uint32 keys so the whole state serializes with
    # flax.serialization (typed keys cannot round-trip through msgpack)
    key = jax.random.PRNGKey(cfg.seed)
    init_key, step_key = jax.random.split(key)
    # Init math is trivial; run it on the host CPU backend so a tunneled /
    # remote-compile TPU never pays per-module init compiles. The state is
    # pulled to host numpy (uncommitted) so it transfers to whichever device
    # or mesh the first real step runs on.
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu):
        variables = jax.jit(
            lambda k: model.init({"params": k, "dropout": k}, *example_inputs, train=True)
        )(init_key)
        state = PoseTrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=make_optimizer(cfg, steps_per_epoch),
            batch_stats=variables.get("batch_stats", {}),
            rng=step_key,
        )
    # The state's arrays are CPU-backed and UNCOMMITTED (created under
    # default_device, not device_put to it): the first downstream jit or
    # sharding constraint moves them to whatever device/mesh it runs on.
    return state
