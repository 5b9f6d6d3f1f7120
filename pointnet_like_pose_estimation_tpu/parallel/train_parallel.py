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


def make_parallel_train_step(
    spec: ModelSpec,
    cfg: TrainConfig,
    mesh: Mesh,
    *,
    tp_axis: str | None = None,
    state: PoseTrainState | None = None,
) -> Callable:
    """Jitted DP(+TP) train step with explicit in/out shardings over ``mesh``.

    With ``tp_axis`` set (a mesh axis name, conventionally ``'model'``), the
    wide MLP/FC kernels, their biases/BN parameters, and the matching
    optimizer moments additionally shard over that axis
    (parallel/tensor_parallel.py); place the state with ``shard_state_tp``
    before stepping. XLA emits the row-parallel psums and the DP gradient
    all-reduce from the sharding annotations alone.
    """
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

    if tp_axis is None:
        return jax.jit(
            step,
            in_shardings=(repl, data),
            out_shardings=(repl, repl),
            donate_argnums=0,
        )
    if state is None:
        raise ValueError("tp_axis requires a sample `state` to derive shardings")
    from pointnet_like_pose_estimation_tpu.parallel.tensor_parallel import (
        tensor_parallel_shardings,
    )

    state_sh = tensor_parallel_shardings(state, mesh, axis=tp_axis)
    return jax.jit(
        step,
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
        donate_argnums=0,
    )
