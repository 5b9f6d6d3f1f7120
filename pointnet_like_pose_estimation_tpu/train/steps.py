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
        if cfg.augment_consistent_labels:
            # same scale/shift distributions, but applied to the regression
            # targets too — removes the reference's train-time label noise
            # (see TrainConfig.augment_consistent_labels)
            B = points.shape[0]
            s = jax.random.uniform(
                k2, (B, 1, 1), minval=aug.SCALE_LO, maxval=aug.SCALE_HI
            )
            u = jax.random.uniform(
                k3, (B, 1, points.shape[-1]),
                minval=-aug.SHIFT_RANGE, maxval=aug.SHIFT_RANGE,
            )
            points = points * s + u
            batch = dict(batch)
            batch["tran"] = batch["tran"] * s[:, 0] + u[:, 0]
            batch["width"] = batch["width"] * s[:, 0]
        else:
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


def make_device_epoch_runner(
    spec: ModelSpec, cfg: TrainConfig, num_steps: int
) -> Callable:
    """Whole-epoch training against a DEVICE-RESIDENT dataset: a handful of
    dispatches per epoch (``ceil(num_steps / cfg.epoch_chunk)`` scan
    segments), one scalar D2H for the summed metrics.

    The reference's hot loop crosses the host/device boundary every batch
    (numpy augmentation + ``.cuda()`` copies, train_classification.py:105-124).
    Over a tunneled TPU each crossing costs tens of milliseconds, so a
    per-step Python loop is latency-bound regardless of compute. Here the
    packed dataset lives in HBM (the full 7×8000-cloud set is ~0.7 GB), a
    fresh shuffle permutation is drawn from the carried PRNG key on device,
    and ``lax.scan`` runs the identical train-step body over segment-sized
    index slabs — batches are materialized inside the scan by a gather,
    augmentation stays fused in the step. Segmenting (vs one epoch-length
    scan) bounds single-execution device time, which trips RPC deadlines on
    tunneled TPUs at the multi-minute scale.

    Args:
      num_steps: batches per epoch (static; floor(len(ds)/batch_size),
        matching the reference's drop_last=True loader).

    Returns:
      ``epoch_runner(state, data) -> (state, {'loss', 'metric'})`` where
      ``data`` is a dict of [M, ...] device arrays and the metrics are means
      over the epoch.
    """
    loss_kw = _loss_kwargs(spec, cfg)
    B = cfg.batch_size
    # bound the steps per dispatch: one giant scan (minutes of device time in
    # a single execution) can trip RPC deadlines on tunneled/remote TPUs, and
    # segment boundaries give preemption + progress granularity. Segment
    # slicing happens on device arrays — still zero per-step H2D.
    chunk = max(1, min(cfg.epoch_chunk, num_steps))

    @jax.jit
    def draw_perm(state: PoseTrainState, data: dict):
        rng, perm_key = jax.random.split(state.rng)
        n = data["labels"].shape[0]
        perm = jax.random.permutation(perm_key, n)[: num_steps * B]
        return state.replace(rng=rng), perm.reshape(num_steps, B)

    def one_step(state, idx, data):
        batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
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

    @functools.partial(jax.jit, donate_argnums=0)
    def run_segment(state: PoseTrainState, data: dict, idx: jax.Array):
        state, metrics = jax.lax.scan(
            lambda s, i: one_step(s, i, data), state, idx
        )
        return state, {k: jnp.sum(v) for k, v in metrics.items()}

    def epoch_runner(state: PoseTrainState, data: dict):
        state, perm = draw_perm(state, data)
        sums = None
        for lo in range(0, num_steps - num_steps % chunk, chunk):
            state, ms = run_segment(state, data, perm[lo : lo + chunk])
            sums = ms if sums is None else {k: sums[k] + v for k, v in ms.items()}
        tail = num_steps % chunk
        if tail:  # one extra compile, shape [tail, B], cached across epochs
            state, ms = run_segment(state, data, perm[num_steps - tail :])
            sums = ms if sums is None else {k: sums[k] + v for k, v in ms.items()}
        return state, {k: v / num_steps for k, v in sums.items()}

    return epoch_runner


def make_device_eval_runner(
    spec: ModelSpec, cfg: TrainConfig, num_batches: int
) -> Callable:
    """Full-split evaluation in a few bounded dispatches with on-device
    accumulation.

    The reference's test loops accumulate per-class metrics on host, one
    D2H per batch (test_rotation.py:84-97). Here the padded test split is
    resident in HBM as ``[num_batches, B, ...]`` arrays and a ``lax.scan``
    accumulates raw SUMS on device — instance/class counts for
    classification and sign, per-class-per-axis absolute error for
    regression — so a full-split eval costs one dispatch and one tiny D2H.
    Hosts finalize the sums into the reference's metric conventions
    (``loop._finalize_eval``).

    Returns:
      ``eval_runner(state, data, valid) -> dict of sums`` where ``valid`` is
      the [num_batches, B] padding mask.
    """
    loss_kw = _loss_kwargs(spec, cfg)
    C = cfg.num_classes
    chunk = max(1, min(cfg.epoch_chunk, num_batches))

    @jax.jit
    def eval_segment(state: PoseTrainState, data: dict, valid: jax.Array, init: dict):
        def one(carry, xs):
            batch, v = xs
            inputs, target = _prepare_inputs(spec, cfg, None, batch, train=False)
            outputs = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                *inputs,
                train=False,
            )
            onehot = (
                batch["labels"][:, None] == jnp.arange(C)[None, :]
            ).astype(jnp.float32) * v[:, None]                 # [B, C], masked
            out = dict(carry)
            out["n"] = carry["n"] + jnp.sum(v)
            out["per_class_count"] = carry["per_class_count"] + jnp.sum(onehot, 0)
            if spec.task == "classify":
                log_probs, _, pred = outputs
                picked = jnp.take_along_axis(
                    log_probs, target[:, None].astype(jnp.int32), axis=1
                )[:, 0]
                out["loss"] = carry["loss"] - jnp.sum(picked * v)
                correct = (pred == target).astype(jnp.float32) * v
                out["metric"] = carry["metric"] + jnp.sum(correct)
                out["per_class_correct"] = carry["per_class_correct"] + onehot.T @ correct
            elif spec.task == "sign":
                prob, hard = outputs
                t = jnp.where(target.reshape(prob.shape) > 0, 1.0, 0.0)
                p = jnp.clip(prob, 1e-7, 1 - 1e-7)
                bce = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))[:, 0]
                out["loss"] = carry["loss"] + jnp.sum(bce * v)
                th = jnp.where(target.reshape(hard.shape) > 0, 1.0, -1.0)
                correct = (hard == th)[:, 0].astype(jnp.float32) * v
                out["metric"] = carry["metric"] + jnp.sum(correct)
                out["per_class_correct"] = carry["per_class_correct"] + onehot.T @ correct
            else:  # rotation / translation / width regression
                target2d = target.reshape(outputs.shape)
                err = outputs - target2d
                per = err * err if cfg.loss_kind == "L2_loss" else jnp.abs(err)
                out["loss"] = carry["loss"] + jnp.sum(jnp.mean(per, axis=-1) * v)
                abs_err = jnp.abs(err)                         # [B, D]
                out["metric"] = carry["metric"] + jnp.sum(jnp.mean(abs_err, -1) * v)
                out["per_class_abs_err"] = carry["per_class_abs_err"] + onehot.T @ (
                    abs_err * v[:, None]
                )
            return out, None

        sums, _ = jax.lax.scan(one, init, (data, valid))
        return sums

    def _init_sums():
        D = 1 if spec.task == "width" else 3
        init = {
            "n": jnp.zeros((), jnp.float32),
            "loss": jnp.zeros((), jnp.float32),
            "metric": jnp.zeros((), jnp.float32),
            "per_class_count": jnp.zeros((C,), jnp.float32),
        }
        if spec.task in ("classify", "sign"):
            init["per_class_correct"] = jnp.zeros((C,), jnp.float32)
        else:
            init["per_class_abs_err"] = jnp.zeros((C, D), jnp.float32)
        return init

    def eval_runner(state: PoseTrainState, data: dict, valid: jax.Array):
        # segment the batch axis like the train runner (bounded dispatches);
        # the running sums chain through as a carried pytree
        sums = _init_sums()
        for lo in range(0, num_batches - num_batches % chunk, chunk):
            sums = eval_segment(
                state,
                {k: v[lo : lo + chunk] for k, v in data.items()},
                valid[lo : lo + chunk],
                sums,
            )
        tail = num_batches % chunk
        if tail:
            sums = eval_segment(
                state,
                {k: v[num_batches - tail :] for k, v in data.items()},
                valid[num_batches - tail :],
                sums,
            )
        return sums

    return eval_runner


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
