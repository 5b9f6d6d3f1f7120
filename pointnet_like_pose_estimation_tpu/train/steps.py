"""Jitted train/eval step builders.

Everything the reference does on host per batch — numpy augmentation
(train_classification.py:105-113), one-hot splicing (train_translation.py:118),
centroid capture (:113) — is fused here into one jitted step, so a training
step is a single XLA program: augment -> forward -> loss -> backward ->
optimizer update, with the state donated in place.

Call stack parity: §3.1-3.2 of SURVEY.md (train_classification.main's hot
loop; train_{rotation,translation,sign}.py variants).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.data import augment as aug
from pointnet_like_pose_estimation_tpu.models import ModelSpec, losses
from pointnet_like_pose_estimation_tpu.train.config import TrainConfig
from pointnet_like_pose_estimation_tpu.train.state import PoseTrainState


def _prepare_inputs(spec: ModelSpec, cfg: TrainConfig, key, batch, train: bool):
    """Augment/normalize/splice a raw batch into model inputs + target."""
    points = batch["points"]
    if train and cfg.augment:
        k1, k2, k3 = jax.random.split(key, 3)
        points = aug.random_point_dropout(k1, points)
        points = aug.random_scale(k2, points)
        points = aug.random_shift(k3, points)
    # translation captures the centroid BEFORE normalization
    # (train_translation.py:113-115)
    mean = aug.cloud_mean(points, compat_first3=cfg.compat_first3_mean)
    points = aug.eval_preprocess(points)

    if spec.input_kind == "xyz":
        inputs = (points,)
    else:
        spliced = aug.splice_onehot(points, batch["labels"], cfg.num_classes)
        inputs = (spliced, mean) if spec.input_kind == "spliced_mean" else (spliced,)

    if spec.task == "classify":
        target = batch["labels"]
    elif spec.task == "rotation":
        target = batch["rot"]
    elif spec.task == "translation":
        target = batch["tran"]
    elif spec.task == "sign":
        target = batch["sign"]
    else:  # width: external target channel
        target = batch["width"]
    return inputs, target


def _loss_kwargs(spec: ModelSpec, cfg: TrainConfig) -> dict:
    if spec.task in ("rotation", "translation", "width"):
        return {"kind": cfg.loss_kind, "reduction": cfg.loss_reduction}
    if spec.task == "sign":
        return {"compat_pm1": cfg.compat_pm1_bce}
    return {}


def make_train_step(spec: ModelSpec, cfg: TrainConfig) -> Callable:
    """Build the donated, jitted training step for one model spec."""
    loss_kw = _loss_kwargs(spec, cfg)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_step(state: PoseTrainState, batch: dict):
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

    return train_step


def make_epoch_runner(spec: ModelSpec, cfg: TrainConfig) -> Callable:
    """Whole-epoch training in ONE dispatch: ``lax.scan`` over stacked
    batches.

    The per-step host round-trip dominates wall clock when steps are fast
    (sub-ms) or the device is reached over a tunnel. This wraps the same
    train-step body in a scan over ``[num_batches, B, ...]`` arrays: one
    device call per epoch, metrics returned per batch.
    """
    loss_kw = _loss_kwargs(spec, cfg)

    @functools.partial(jax.jit, donate_argnums=0)
    def epoch_runner(state: PoseTrainState, batches: dict):
        def one_step(state, batch):
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

            (loss, (outputs, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            state = state.apply_gradients(
                grads=grads, batch_stats=updates["batch_stats"], rng=rng
            )
            return state, {"loss": loss, "metric": spec.metric(outputs, target)}

        return jax.lax.scan(one_step, state, batches)

    return epoch_runner


def make_eval_step(spec: ModelSpec, cfg: TrainConfig) -> Callable:
    """Build the jitted eval step; returns per-batch metrics + predictions."""
    loss_kw = _loss_kwargs(spec, cfg)

    @jax.jit
    def eval_step(state: PoseTrainState, batch: dict):
        """Batches may carry a ``valid`` [B] mask (padded tail batches keep
        one static shape -> one compile); loss/metric are weighted sums so
        the caller can divide by the true sample count."""
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones_like(batch["labels"], jnp.float32)
        inputs, target = _prepare_inputs(spec, cfg, None, batch, train=False)
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            *inputs,
            train=False,
        )
        w = valid / jnp.maximum(jnp.sum(valid), 1.0)
        if spec.task == "classify":
            log_probs, _, pred = outputs
            picked = jnp.take_along_axis(
                log_probs, target[:, None].astype(jnp.int32), axis=1
            )[:, 0]
            loss = -jnp.sum(picked * w)
            metric = jnp.sum((pred == target).astype(jnp.float32) * w)
            out = {"loss": loss, "metric": metric, "pred": pred}
        elif spec.task == "sign":
            prob, hard = outputs
            t = jnp.where(target.reshape(prob.shape) > 0, 1.0, 0.0)
            p = jnp.clip(prob, 1e-7, 1 - 1e-7)
            loss = -jnp.sum(
                (t * jnp.log(p) + (1 - t) * jnp.log(1 - p))[:, 0] * w
            )
            th = jnp.where(target.reshape(hard.shape) > 0, 1.0, -1.0)
            metric = jnp.sum((hard == th)[:, 0].astype(jnp.float32) * w)
            out = {"loss": loss, "metric": metric, "pred": hard[:, 0], "prob": prob[:, 0]}
        else:
            err = outputs - target
            per = err * err if cfg.loss_kind == "L2_loss" else jnp.abs(err)
            loss = jnp.sum(jnp.mean(per, axis=-1) * w)
            scale = 100.0 if spec.task == "translation" else 1.0
            metric = jnp.sum(jnp.mean(jnp.abs(err), axis=-1) * w) * scale
            out = {
                "loss": loss,
                "metric": metric,
                "pred": outputs,
                "abs_err": jnp.sum(jnp.abs(err) * w[:, None], axis=0),
            }
        return out

    return eval_step
