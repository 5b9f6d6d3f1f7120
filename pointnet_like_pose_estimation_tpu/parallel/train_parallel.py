"""Data-parallel training: the single-chip step, sharded.

The same fused step as train/steps.py, jitted with explicit shardings:
state replicated, batch sharded over the ``data`` mesh axis. Under jit XLA
inserts the gradient all-reduce (psum over ICI) because the replicated
output sharding of the updated params demands it — no pmap, no manual
collectives, and BatchNorm statistics are *global* batch statistics by
construction (the single-program view reduces over the full sharded batch),
which the reference's single-GPU BN trivially had.

The identical step function runs 1 chip -> 1 host -> N hosts; only the mesh
changes (jax.distributed.initialize for multi-host, SURVEY §5).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointnet_like_pose_estimation_tpu.models import ModelSpec
from pointnet_like_pose_estimation_tpu.train.config import TrainConfig
from pointnet_like_pose_estimation_tpu.train.state import PoseTrainState
from pointnet_like_pose_estimation_tpu.train.steps import _loss_kwargs, _prepare_inputs


def make_parallel_train_step(spec: ModelSpec, cfg: TrainConfig, mesh: Mesh) -> Callable:
    """Jitted DP train step with explicit in/out shardings over ``mesh``."""
    loss_kw = _loss_kwargs(spec, cfg)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def step(state: PoseTrainState, batch: dict):
        rng, aug_key, drop_key = jax.random.split(state.rng, 3)
        inputs, target = _prepare_inputs(spec, cfg, aug_key, batch, train=True)

        def loss_fn(params):
            outputs, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                *inputs,
                train=True,
                rngs={"dropout": drop_key},
                mutable=["batch_stats"],
            )
            return spec.loss(outputs, target, **loss_kw), (outputs, updates)

        (loss, (outputs, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"], rng=rng
        )
        metrics = {"loss": loss, "metric": spec.metric(outputs, target)}
        return state, metrics

    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )
