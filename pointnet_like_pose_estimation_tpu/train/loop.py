"""Training loop, evaluation, and checkpoint/resume.

Parity: train_classification.main (SURVEY §3.1) / train_{rotation,
translation,sign}.main (§3.2), test_* evaluation conventions (§3.4):
instance + mean-per-class accuracy for classification
(train_classification.py:144-155), per-axis and per-class absolute errors
for regression (test_rotation.py:84-97), cm scaling for translation
(test_translation.py:101), hard-sign accuracy (train_sign.py:124-127).

Checkpoints hold the FULL train state (params, batch stats, optimizer
moments, step, RNG) — the reference saves model+optimizer dicts but silently
drops optimizer state on resume (train_classification.py:41-48). Both
``best`` and ``latest`` are kept, and resume is automatic when a latest
checkpoint exists.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import signal
import time

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from pointnet_like_pose_estimation_tpu.data.dataset import PoseDataset, iter_batches
from pointnet_like_pose_estimation_tpu.models import get_model_spec
from pointnet_like_pose_estimation_tpu.train.config import TrainConfig
from pointnet_like_pose_estimation_tpu.train.state import create_train_state
from pointnet_like_pose_estimation_tpu.train.steps import (
    make_epoch_runner,
    make_eval_step,
    make_train_step,
)

log = logging.getLogger("plpe.train")

_HIGHER_IS_BETTER = {"classify": True, "sign": True, "rotation": False,
                     "translation": False, "width": False}


def _ckpt_dir(cfg: TrainConfig) -> str:
    task = "classification" if "cls" in cfg.model else "pose"
    return os.path.join(cfg.log_dir, task, cfg.experiment, "checkpoints")


def save_checkpoint(path: str, state, epoch: int, metric: float):
    """Atomic full-state checkpoint; on a multi-host slice only process 0
    writes (every process holds identical replicated state)."""
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    with open(tmp + ".json", "w") as f:
        json.dump({"epoch": epoch, "metric": float(metric)}, f)
    # rename data first: a reader that sees the .json can trust the payload
    os.replace(tmp, path)
    os.replace(tmp + ".json", path + ".json")


def load_checkpoint(path: str, state):
    """Restore a full train state from bytes; returns (state, meta)."""
    with open(path, "rb") as f:
        state = flax.serialization.from_bytes(state, f.read())
    with open(path + ".json") as f:
        meta = json.load(f)
    return state, meta


def _example_batch(cfg: TrainConfig, spec, n=2):
    batch = {
        "points": jnp.zeros((n, cfg.num_points, 3), jnp.float32),
        "labels": jnp.zeros((n,), jnp.int32),
        "rot": jnp.zeros((n, 3), jnp.float32),
        "tran": jnp.zeros((n, 3), jnp.float32),
        "sign": jnp.ones((n,), jnp.float32),
        "width": jnp.zeros((n, 1), jnp.float32),
    }
    return batch


def build_state(cfg: TrainConfig, steps_per_epoch: int = 100):
    """Construct (spec, model, fresh state) for a config."""
    spec = get_model_spec(cfg.model)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
    kwargs = {"dtype": dtype}
    if spec.task == "classify":
        kwargs["num_classes"] = cfg.num_classes
    model = spec.make(**kwargs)
    if spec.input_kind == "xyz":
        example = (jnp.zeros((2, cfg.num_points, 3)),)
    elif spec.input_kind == "spliced":
        example = (jnp.zeros((2, cfg.num_points, 3 + cfg.num_classes)),)
    else:
        example = (jnp.zeros((2, cfg.num_points, 3 + cfg.num_classes)), jnp.zeros((2, 3)))
    state = create_train_state(cfg, model, example, steps_per_epoch)
    return spec, model, state


class PreemptionGuard:
    """Graceful preemption: SIGTERM/SIGINT set a flag checked at batch and
    epoch boundaries so the loop saves ``latest`` and exits cleanly — the
    elastic-recovery piece the reference lacks entirely (its only recovery
    is a bare try/except resume at startup, train_classification.py:41-48).
    Restores previous handlers on exit; a second signal falls through to
    the default handler (hard kill still possible)."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._previous = {}
        self.preempted = False

    def _handle(self, signum, frame):
        if self.preempted:  # second signal: defer to the original handler
            handler = self._previous.get(signum)
            if callable(handler):
                handler(signum, frame)
            else:
                signal.signal(signum, signal.SIG_DFL)
                signal.raise_signal(signum)
            return
        self.preempted = True
        log.warning("preemption signal %s: will checkpoint and exit", signum)

    def __enter__(self):
        for s in self._signals:
            try:
                self._previous[s] = signal.signal(s, self._handle)
            except ValueError:  # non-main thread: run unguarded
                pass
        return self

    def __exit__(self, *exc):
        for s, h in self._previous.items():
            signal.signal(s, h)
        return False


def _pad_batch(batch: dict, batch_size: int) -> dict:
    """Pad a tail batch to the full static batch size with a validity mask,
    so evaluation compiles exactly one program."""
    n = len(batch["labels"])
    out = dict(batch)
    out["valid"] = np.ones(batch_size, np.float32)
    if n < batch_size:
        pad = batch_size - n
        for k, v in batch.items():
            out[k] = np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
        out["valid"][n:] = 0.0
    return out


def evaluate(cfg: TrainConfig, state, ds: PoseDataset, eval_step=None) -> dict:
    """Full-split evaluation with the reference's metric conventions."""
    spec = get_model_spec(cfg.model)
    if eval_step is None:
        eval_step = make_eval_step(spec, cfg)
    loss_sum, metric_sum, count = 0.0, 0.0, 0
    per_class_correct = np.zeros(cfg.num_classes)
    per_class_count = np.zeros(cfg.num_classes)
    per_class_err = np.zeros((cfg.num_classes, 3))
    for raw in iter_batches(ds, cfg.batch_size, drop_last=False):
        n_valid = len(raw["labels"])
        batch = _pad_batch(raw, cfg.batch_size)
        out = jax.device_get(eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()}))
        loss_sum += float(out["loss"]) * n_valid
        metric_sum += float(out["metric"]) * n_valid
        count += n_valid
        labels = raw["labels"]
        if spec.task == "classify":
            pred = out["pred"][:n_valid]
            for c in range(cfg.num_classes):
                m = labels == c
                per_class_correct[c] += (pred[m] == c).sum()
                per_class_count[c] += m.sum()
        elif spec.task in ("rotation", "translation"):
            target = raw["rot"] if spec.task == "rotation" else raw["tran"]
            err = np.abs(out["pred"][:n_valid] - target)
            for c in range(cfg.num_classes):
                m = labels == c
                per_class_err[c] += err[m].sum(axis=0)
                per_class_count[c] += m.sum()
    result = {
        "loss": loss_sum / max(count, 1),
        "metric": metric_sum / max(count, 1),
    }
    seen = per_class_count > 0
    if spec.task == "classify":
        acc = per_class_correct[seen] / per_class_count[seen]
        result["instance_acc"] = float(per_class_correct.sum() / per_class_count.sum())
        result["class_acc"] = float(acc.mean())
    elif spec.task in ("rotation", "translation"):
        # translation reported in cm (test_translation.py:101), rotation in
        # degrees; per-class-per-axis like test_rotation.py:84-97
        scale = 100.0 if spec.task == "translation" else 1.0
        axis_err = per_class_err.sum(0) / max(per_class_count.sum(), 1) * scale
        result["axis_err"] = axis_err.tolist()
        result["mean_err"] = float(axis_err.mean())
        with np.errstate(invalid="ignore"):
            pc = per_class_err / np.maximum(per_class_count[:, None], 1) * scale
        result["per_class_axis_err"] = pc[seen].tolist()
    return result


def train(
    cfg: TrainConfig,
    train_ds: PoseDataset,
    test_ds: PoseDataset | None = None,
    *,
    resume: bool = True,
) -> tuple:
    """Run the full training recipe; returns (state, history)."""
    if cfg.multihost:
        jax.distributed.initialize()
    spec = get_model_spec(cfg.model)
    steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)
    spec, model, state = build_state(cfg, steps_per_epoch)
    put = lambda b: {k: jnp.asarray(v) for k, v in b.items()}  # noqa: E731
    if cfg.data_parallel:
        from pointnet_like_pose_estimation_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            replicate,
            shard_batch,
        )

        mesh = make_mesh()
        if cfg.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by data axis "
                f"{mesh.shape['data']}"
            )
        state = replicate(state, mesh)
        train_step = make_parallel_train_step(spec, cfg, mesh)
        put = lambda b: shard_batch(b, mesh)  # noqa: E731
    else:
        train_step = make_train_step(spec, cfg)
    epoch_runner = (
        make_epoch_runner(spec, cfg) if cfg.scan_epoch and not cfg.data_parallel else None
    )
    eval_step = make_eval_step(spec, cfg)

    ckpt = _ckpt_dir(cfg)
    # per-experiment file log, mirroring the reference's create_log
    # (train_classification.py:178-186) layout log/<task>/<exp>/logs/
    logs_dir = os.path.join(os.path.dirname(ckpt), "logs")
    os.makedirs(logs_dir, exist_ok=True)
    if jax.process_index() == 0:  # reproducibility record
        with open(os.path.join(os.path.dirname(ckpt), "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    fh = logging.FileHandler(os.path.join(logs_dir, f"{cfg.model}.log"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    log.addHandler(fh)
    start_epoch, best_metric = 0, None
    latest = os.path.join(ckpt, "latest.msgpack")
    if resume and os.path.exists(latest):
        state, meta = load_checkpoint(latest, state)
        start_epoch = meta["epoch"] + 1
        best_path = os.path.join(ckpt, "best.msgpack.json")
        if os.path.exists(best_path):
            best_metric = json.load(open(best_path))["metric"]
        log.info("resumed from epoch %d", start_epoch)

    higher = _HIGHER_IS_BETTER[spec.task]
    history = []
    rng = np.random.default_rng(cfg.seed)
    guard = PreemptionGuard()
    guard.__enter__()
    try:
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            train_loss, train_metric, n = 0.0, 0.0, 0
            if epoch_runner is not None:
                stacked = None
                for batch in iter_batches(train_ds, cfg.batch_size, rng=rng):
                    if stacked is None:
                        stacked = {k: [] for k in batch}
                    for k, v in batch.items():
                        stacked[k].append(v)
                batches = {k: jnp.asarray(np.stack(v)) for k, v in stacked.items()}
                state, metrics = epoch_runner(state, batches)
                n = len(next(iter(batches.values())))
                train_loss = float(jnp.sum(metrics["loss"]))
                train_metric = float(jnp.sum(metrics["metric"]))
            else:
                for batch in iter_batches(train_ds, cfg.batch_size, rng=rng):
                    if guard.preempted:
                        break
                    state, metrics = train_step(state, put(batch))
                    train_loss += float(metrics["loss"])
                    train_metric += float(metrics["metric"])
                    n += 1
            if guard.preempted:
                # partial epoch: persist state tagged to the previous epoch so
                # resume re-runs this epoch in full
                save_checkpoint(latest, state, epoch - 1, 0.0)
                log.warning("preempted during epoch %d; latest saved, exiting", epoch)
                break
            row = {
                "epoch": epoch,
                "train_loss": train_loss / max(n, 1),
                "train_metric": train_metric / max(n, 1),
                "seconds": time.time() - t0,
            }
            if test_ds is not None and len(test_ds):
                row.update({f"test_{k}": v for k, v in evaluate(cfg, state, test_ds, eval_step).items()})
                key = "test_instance_acc" if spec.task == "classify" else (
                    "test_metric" if spec.task == "sign" else "test_mean_err")
                cur = row.get(key, row.get("test_metric"))
                if best_metric is None or (cur > best_metric if higher else cur < best_metric):
                    best_metric = cur
                    save_checkpoint(os.path.join(ckpt, "best.msgpack"), state, epoch, cur)
            save_checkpoint(latest, state, epoch, row.get("train_loss", 0.0))
            history.append(row)
            log.info("%s", row)
            if guard.preempted:
                log.warning("preempted after epoch %d; exiting cleanly", epoch)
                break
    finally:
        guard.__exit__()
        log.removeHandler(fh)
        fh.close()
        if history and jax.process_index() == 0:  # machine-readable curves
            with open(os.path.join(os.path.dirname(ckpt), "history.json"), "w") as f:
                json.dump(history, f, indent=2)
    return state, history
