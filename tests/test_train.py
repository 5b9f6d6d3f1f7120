"""End-to-end tiny training tests: loss decreases, checkpoints resume."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointnet_like_pose_estimation_tpu.data import build_dataset, load_dataset
from pointnet_like_pose_estimation_tpu.data.generators import CATEGORIES
from pointnet_like_pose_estimation_tpu.train import TrainConfig, evaluate, train
from pointnet_like_pose_estimation_tpu.train.loop import build_state, load_checkpoint


@pytest.fixture(scope="module")
def tiny_ds():
    fields = build_dataset(10, seed=0, n_points=64, categories=CATEGORIES[:3])
    return load_dataset(fields, "train"), load_dataset(fields, "test")


def _cfg(model, **kw):
    defaults = dict(
        model=model,
        num_classes=3,
        num_points=64,
        batch_size=8,
        epochs=2,
        augment=False,
    )
    defaults.update(kw)
    return TrainConfig.for_model(**defaults)


def test_classification_train_loss_drops(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg("pointnet_cls", epochs=8, log_dir=str(tmp_path), learning_rate=1e-3)
    state, history = train(cfg, train_ds, test_ds, resume=False)
    assert min(h["train_loss"] for h in history[1:]) < history[0]["train_loss"]
    assert "test_instance_acc" in history[-1]
    assert 0.0 <= history[-1]["test_instance_acc"] <= 1.0


def test_rotation_head_trains(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg("rotation", epochs=3, log_dir=str(tmp_path), learning_rate=1e-3)
    state, history = train(cfg, train_ds, test_ds, resume=False)
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert len(history[-1]["test_axis_err"]) == 3


def test_sign_head_trains(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg("sign", epochs=2, log_dir=str(tmp_path))
    state, history = train(cfg, train_ds, test_ds, resume=False)
    assert 0.0 <= history[-1]["test_metric"] <= 1.0


def test_translation_head_trains(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg("translation", epochs=2, log_dir=str(tmp_path))
    state, history = train(cfg, train_ds, test_ds, resume=False)
    # mean_err reported in cm
    assert history[-1]["test_mean_err"] > 0


def test_checkpoint_resume(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg("pointnet_cls", epochs=2, log_dir=str(tmp_path), experiment="resume")
    state, history = train(cfg, train_ds, test_ds, resume=False)
    # second call resumes at epoch 2 and runs 1 more epoch
    cfg2 = _cfg("pointnet_cls", epochs=3, log_dir=str(tmp_path), experiment="resume")
    state2, history2 = train(cfg2, train_ds, test_ds, resume=True)
    assert [h["epoch"] for h in history2] == [2]


def test_checkpoint_roundtrip(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg("pointnet_cls", epochs=1, log_dir=str(tmp_path), experiment="rt")
    state, _ = train(cfg, train_ds, test_ds, resume=False)
    _, _, fresh = build_state(cfg)
    restored, meta = load_checkpoint(
        str(tmp_path / "classification" / "rt" / "checkpoints" / "latest.msgpack"), fresh
    )
    a = evaluate(cfg, state, test_ds)
    b = evaluate(cfg, restored, test_ds)
    np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)


def test_compat_flags_run(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg(
        "translation",
        epochs=1,
        log_dir=str(tmp_path),
        compat_first3_mean=True,
        experiment="compat",
    )
    _, history = train(cfg, train_ds, test_ds, resume=False)
    assert np.isfinite(history[-1]["train_loss"])


def test_data_parallel_train_loop(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg(
        "pointnet_cls",
        epochs=2,
        log_dir=str(tmp_path),
        experiment="dp",
        data_parallel=True,
        batch_size=8,  # divisible by 8 devices
    )
    state, history = train(cfg, train_ds, test_ds, resume=False)
    assert len(history) == 2
    assert np.isfinite(history[-1]["train_loss"])
    # file log written (create_log parity)
    assert (tmp_path / "classification" / "dp" / "logs" / "pointnet_cls.log").exists()


def test_device_epoch_runner_deterministic_and_learns(tiny_ds, tmp_path):
    """The device-resident epoch runner (default path) is bit-deterministic
    across runs with the same seed and reduces the loss."""
    train_ds, test_ds = tiny_ds
    a = _cfg("pointnet_cls", epochs=6, log_dir=str(tmp_path), experiment="dev_a",
             learning_rate=1e-3)
    b = _cfg("pointnet_cls", epochs=6, log_dir=str(tmp_path), experiment="dev_b",
             learning_rate=1e-3)
    _, ha = train(a, train_ds, test_ds, resume=False)
    _, hb = train(b, train_ds, test_ds, resume=False)
    assert ha[0]["train_loss"] == hb[0]["train_loss"]
    assert ha[-1]["train_loss"] == hb[-1]["train_loss"]
    assert min(h["train_loss"] for h in ha[1:]) < ha[0]["train_loss"]


def test_per_step_path_still_works(tiny_ds, tmp_path):
    """device_data=False falls back to the per-step dispatch loop."""
    train_ds, test_ds = tiny_ds
    cfg = _cfg("pointnet_cls", epochs=2, log_dir=str(tmp_path),
               experiment="per_step", device_data=False)
    _, history = train(cfg, train_ds, test_ds, resume=False)
    assert len(history) == 2 and np.isfinite(history[-1]["train_loss"])


def test_device_eval_matches_per_batch_eval(tiny_ds, tmp_path):
    """The one-dispatch device eval runner reproduces a per-batch host
    accumulation of make_eval_step exactly (same metric conventions)."""
    from pointnet_like_pose_estimation_tpu.data.dataset import iter_batches
    from pointnet_like_pose_estimation_tpu.models import get_model_spec
    from pointnet_like_pose_estimation_tpu.train import make_eval_step

    train_ds, test_ds = tiny_ds
    for model in ("pointnet_cls", "rotation", "translation", "sign"):
        cfg = _cfg(model, epochs=1, log_dir=str(tmp_path), experiment=f"ev_{model}")
        state, _ = train(cfg, train_ds, test_ds, resume=False)
        spec = get_model_spec(cfg.model)
        result = evaluate(cfg, state, test_ds)

        eval_step = make_eval_step(spec, cfg)
        loss_sum = metric_sum = count = 0.0
        for raw in iter_batches(test_ds, cfg.batch_size, drop_last=False):
            n = len(raw["labels"])
            batch = {k: jnp.asarray(v) for k, v in raw.items()}
            if n < cfg.batch_size:  # pad + mask the tail batch
                pad = cfg.batch_size - n
                batch = {
                    k: jnp.concatenate([v, jnp.repeat(v[:1], pad, axis=0)])
                    for k, v in batch.items()
                }
                batch["valid"] = jnp.concatenate(
                    [jnp.ones(n), jnp.zeros(pad)]
                ).astype(jnp.float32)
            out = eval_step(state, batch)
            loss_sum += float(out["loss"]) * n
            metric_sum += float(out["metric"]) * n
            count += n
        np.testing.assert_allclose(result["loss"], loss_sum / count, rtol=1e-5)
        np.testing.assert_allclose(result["metric"], metric_sum / count, rtol=1e-5)


def test_eval_reports_per_class_sign_accuracy(tiny_ds, tmp_path):
    """Sign evaluation carries per-class accuracy (reference reports only the
    overall number, train_sign.py:124-127 — per-class completes the matrix)."""
    train_ds, test_ds = tiny_ds
    cfg = _cfg("sign", epochs=1, log_dir=str(tmp_path), experiment="sign_pc")
    state, _ = train(cfg, train_ds, test_ds, resume=False)
    result = evaluate(cfg, state, test_ds)
    assert "per_class_acc" in result and len(result["per_class_acc"]) >= 1
    assert 0.0 <= result["class_acc"] <= 1.0


def test_preemption_guard_checkpoints_and_resumes(tiny_ds, tmp_path):
    """SIGTERM mid-training saves ``latest`` and exits cleanly; a fresh call
    resumes and completes the remaining epochs."""
    import signal

    train_ds, test_ds = tiny_ds
    cfg = _cfg("pointnet_cls", epochs=4, log_dir=str(tmp_path), experiment="preempt")

    from pointnet_like_pose_estimation_tpu.train import loop as loop_mod

    orig = loop_mod.PreemptionGuard.__enter__

    def enter_and_fire(self):
        out = orig(self)
        signal.raise_signal(signal.SIGTERM)  # delivered before first batch
        return out

    loop_mod.PreemptionGuard.__enter__ = enter_and_fire
    try:
        _, history = train(cfg, train_ds, test_ds, resume=False)
    finally:
        loop_mod.PreemptionGuard.__enter__ = orig
    assert history == []  # preempted in epoch 0 -> no completed epochs
    latest = tmp_path / "classification" / "preempt" / "checkpoints" / "latest.msgpack"
    assert latest.exists()
    assert (tmp_path / "classification" / "preempt" / "checkpoints" / "latest.msgpack.json").exists()
    # handler restored after train() returned (not our guard's bound method)
    handler = signal.getsignal(signal.SIGTERM)
    assert getattr(handler, "__qualname__", "").startswith("PreemptionGuard") is False
    # resume: re-runs from epoch 0 and completes all 4
    _, history2 = train(cfg, train_ds, test_ds, resume=True)
    assert [h["epoch"] for h in history2] == [0, 1, 2, 3]


def test_checkpoint_write_is_atomic(tiny_ds, tmp_path):
    """No .tmp residue after a save; payload+meta appear together."""
    from pointnet_like_pose_estimation_tpu.train.loop import save_checkpoint

    cfg = _cfg("pointnet_cls", epochs=1, log_dir=str(tmp_path))
    _, _, state = build_state(cfg)
    path = str(tmp_path / "ck" / "latest.msgpack")
    save_checkpoint(path, state, 3, 0.5)
    import os

    assert os.path.exists(path) and os.path.exists(path + ".json")
    assert not os.path.exists(path + ".tmp")
    restored, meta = load_checkpoint(path, state)
    assert meta == {"epoch": 3, "metric": 0.5}


def test_bfloat16_training(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg("pointnet_cls", epochs=1, log_dir=str(tmp_path), dtype="bfloat16")
    _, history = train(cfg, train_ds, test_ds, resume=False)
    assert np.isfinite(history[-1]["train_loss"])


def test_width_head_trains_on_derived_targets(tmp_path):
    """Width targets (smallest horizontal extent) exist in generated data and
    the width head trains on them — completing the reference's untrainable
    width model (it has no train_width.py and no loader field)."""
    from pointnet_like_pose_estimation_tpu.data import build_dataset, load_dataset
    from pointnet_like_pose_estimation_tpu.data.generators import CATEGORIES

    fields = build_dataset(8, seed=1, n_points=64, categories=CATEGORIES[:2])
    assert "width" in fields and (fields["width"] > 0).all()
    train_ds = load_dataset(fields, "train")
    test_ds = load_dataset(fields, "test")
    assert (train_ds.width > 0).all()
    cfg = _cfg("width", num_classes=2, epochs=5, log_dir=str(tmp_path), batch_size=4)
    _, history = train(cfg, train_ds, test_ds, resume=False)
    assert min(h["train_loss"] for h in history[1:]) < history[0]["train_loss"]


def test_experiment_records_config_and_history(tiny_ds, tmp_path):
    train_ds, test_ds = tiny_ds
    cfg = _cfg("pointnet_cls", epochs=2, log_dir=str(tmp_path), experiment="rec")
    _, history = train(cfg, train_ds, test_ds, resume=False)
    import json

    exp = tmp_path / "classification" / "rec"
    saved_cfg = json.load(open(exp / "config.json"))
    assert saved_cfg["model"] == "pointnet_cls" and saved_cfg["epochs"] == 2
    saved_hist = json.load(open(exp / "history.json"))
    assert [h["epoch"] for h in saved_hist] == [0, 1]


def test_train_with_dataset_smaller_than_batch(tmp_path):
    # ADVICE r2: the device epoch runner reshaped a short permutation and
    # crashed when len(train_ds) < batch_size; it must fall back gracefully
    fields = build_dataset(4, seed=0, n_points=64, categories=CATEGORIES[:3])
    tr = load_dataset(fields, "train")
    te = load_dataset(fields, "test")
    cfg = _cfg("pointnet_cls", batch_size=len(tr) + 5, epochs=1,
               log_dir=str(tmp_path), experiment="tiny")
    assert len(tr) < cfg.batch_size
    _, hist = train(cfg, tr, te)
    assert len(hist) == 1


def test_augment_consistent_labels_flag(tiny_ds, tmp_path):
    # flag on: targets transform with the cloud; training runs and the
    # step is well-formed (translation uses tran, width scales too)
    tr, te = tiny_ds
    cfg = _cfg("translation", epochs=2, log_dir=str(tmp_path),
               experiment="acl", augment=True)
    cfg = cfg.__class__(**{**cfg.__dict__, "augment_consistent_labels": True})
    _, hist = train(cfg, tr, te)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train_loss"])


def test_sustained_time_converges():
    """sustained_time grows its iteration count until the timed span is real
    wall clock (the round-4 fix for block_until_ready early-return over the
    tunneled TPU); on CPU it must return a sane positive per-call time."""
    import jax.numpy as jnp

    from pointnet_like_pose_estimation_tpu.utils import sustained_time

    import jax

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    t = sustained_time(f, x, min_seconds=0.05, max_iters=1 << 16)
    assert 0 < t < 0.05
