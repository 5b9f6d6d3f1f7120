"""Data-parallel training: the single-chip step, sharded.

The pure-DP path is a ``shard_map`` SPMD program with EXPLICIT collectives:
each device runs the fused train step on its local batch shard, BatchNorm
computes cross-replica statistics via ``bn_sync`` (flax ``axis_name`` ->
``lax.pmean`` — matching the single-GPU global-batch BN of the reference),
and the gradient/metric reductions are hand-placed ``pmean``s. This exists
because the GSPMD formulation leaked batch-scaled collectives: the ball
query's ``lax.top_k`` made the partitioner ALL-GATHER the full [B, S, N]
key tensor per SA layer (50 MB/step at d=8, measured in
log/bench_scaling.json) — with shard_map nothing inside the step can be
silently gathered; the only per-step traffic is the parameter-sized
gradient pmean.

The TP(+DP) path stays GSPMD-jitted: parameter/optimizer sharding over the
``model`` axis is exactly the annotation-driven partitioning GSPMD is good
at (parallel/tensor_parallel.py).

The identical step function runs 1 chip -> 1 host -> N hosts; only the mesh
changes (jax.distributed.initialize for multi-host, SURVEY §5).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointnet_like_pose_estimation_tpu.models import ModelSpec
from pointnet_like_pose_estimation_tpu.nn.bn_context import bn_sync
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
    """DP (shard_map) or DP+TP (GSPMD jit) train step over ``mesh``.

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

    def make_step(axis: str | None):
        def step(state: PoseTrainState, batch: dict):
            rng, aug_key, drop_key = jax.random.split(state.rng, 3)
            if axis is not None:
                # decorrelate augmentation/dropout draws across shards (the
                # replicated rng would repeat the same per-row draws on
                # every device)
                idx = lax.axis_index(axis)
                aug_key = jax.random.fold_in(aug_key, idx)
                drop_key = jax.random.fold_in(drop_key, idx)
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

            (loss, (outputs, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            metrics = {"loss": loss, "metric": spec.metric(outputs, target)}
            if axis is not None:
                # equal shard sizes -> pmean of local means == global mean;
                # BN stats are already cross-replica via bn_sync
                grads = lax.pmean(grads, axis)
                metrics = lax.pmean(metrics, axis)
            state = state.apply_gradients(
                grads=grads, batch_stats=updates["batch_stats"], rng=rng
            )
            return state, metrics

        return step

    if tp_axis is None:
        def dp_step(state, batch):
            with bn_sync("data"):  # trace-time: BN layers pick up axis_name
                return make_step("data")(state, batch)

        sm = jax.shard_map(
            dp_step,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sm, donate_argnums=0)
    if state is None:
        raise ValueError("tp_axis requires a sample `state` to derive shardings")
    from pointnet_like_pose_estimation_tpu.parallel.tensor_parallel import (
        tensor_parallel_shardings,
    )

    state_sh = tensor_parallel_shardings(state, mesh, axis=tp_axis)
    return jax.jit(
        make_step(None),
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
        donate_argnums=0,
    )
