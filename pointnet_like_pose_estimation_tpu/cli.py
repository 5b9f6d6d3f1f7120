"""Command-line entry points.

Replaces the reference's per-script argparse + ``os.system`` sweep runners
(train.py:5-38, test.py:3-20) with one typed CLI:

  python -m pointnet_like_pose_estimation_tpu.cli generate --num-per-class 800
  python -m pointnet_like_pose_estimation_tpu.cli train --model pointnet2_cls_ssg
  python -m pointnet_like_pose_estimation_tpu.cli eval  --model rotation
  python -m pointnet_like_pose_estimation_tpu.cli infer --input scene.ply
  python -m pointnet_like_pose_estimation_tpu.cli sweep
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys


def _add_train_args(p):
    p.add_argument("--model", default="pointnet_cls")
    p.add_argument("--data", default="data_cache/dataset.npz")
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    p.add_argument("--loss-function", default="L2_loss", choices=["L2_loss", "L1_loss"])
    p.add_argument("--loss-reduction", default="mean", choices=["mean", "sum"])
    p.add_argument("--log-dir", default="log")
    p.add_argument("--experiment", default=None)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--compat-first3-mean", action="store_true")
    p.add_argument("--compat-pm1-bce", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all devices on a 'data' mesh")


def _cfg_from_args(args):
    from pointnet_like_pose_estimation_tpu.train import TrainConfig

    kw = dict(
        batch_size=args.batch_size,
        epochs=args.epochs,
        optimizer=args.optimizer,
        loss_kind=args.loss_function,
        loss_reduction=args.loss_reduction,
        log_dir=args.log_dir,
        experiment=args.experiment or args.model,
        dtype=args.dtype,
        seed=args.seed,
        augment=not args.no_augment,
        compat_first3_mean=args.compat_first3_mean,
        compat_pm1_bce=args.compat_pm1_bce,
        data_parallel=args.data_parallel,
    )
    if args.learning_rate is not None:
        kw["learning_rate"] = args.learning_rate
    return TrainConfig.for_model(args.model, **kw)


def cmd_generate(args):
    from pointnet_like_pose_estimation_tpu.data import build_dataset

    path = build_dataset(args.num_per_class, seed=args.seed, path=args.out)
    print(f"wrote {path}")


def cmd_train(args):
    from pointnet_like_pose_estimation_tpu.data import load_dataset
    from pointnet_like_pose_estimation_tpu.train import train

    cfg = _cfg_from_args(args)
    train_ds = load_dataset(args.data, "train")
    test_ds = load_dataset(args.data, "test")
    _, history = train(cfg, train_ds, test_ds)
    print(json.dumps(history[-1]))


def cmd_eval(args):
    from pointnet_like_pose_estimation_tpu.data import load_dataset
    from pointnet_like_pose_estimation_tpu.train import evaluate
    from pointnet_like_pose_estimation_tpu.train.loop import (
        _ckpt_dir,
        build_state,
        load_checkpoint,
    )

    cfg = _cfg_from_args(args)
    _, _, state = build_state(cfg)
    ckpt = os.path.join(_ckpt_dir(cfg), "best.msgpack")
    state, meta = load_checkpoint(ckpt, state)
    result = evaluate(cfg, state, load_dataset(args.data, "test"))
    result["checkpoint_epoch"] = meta["epoch"]
    print(json.dumps(result))


def cmd_infer(args):
    import numpy as np

    from pointnet_like_pose_estimation_tpu.data.io_utils import load_ply
    from pointnet_like_pose_estimation_tpu.pipeline import GraspPipeline, PipelineConfig

    def load(path):
        cloud = (
            load_ply(path) if path.endswith(".ply")
            else np.loadtxt(path, delimiter=",")
        )
        return cloud.astype(np.float32)

    overrides = json.loads(args.config) if args.config else {}
    if "clip_range" in overrides:
        overrides["clip_range"] = tuple(overrides["clip_range"])
    cfg = PipelineConfig(**overrides)
    if args.checkpoints:
        paths = json.loads(args.checkpoints)
        pipe = GraspPipeline.from_checkpoints(cfg, paths)
    else:
        pipe = GraspPipeline.from_random(cfg)
    # several inputs stream through the pipelined path (host/device overlap)
    for path, out in zip(args.input, pipe.stream(load(p) for p in args.input)):
        if out is None:
            print(json.dumps({"input": path, "clusters": 0}))
            continue
        print(
            json.dumps(
                {
                    "input": path,
                    "clusters": int(out["clusters"].shape[0]),
                    "pred_class": out["pred_class"].tolist(),
                    "rotation_deg": out["rotation_deg"].tolist(),
                    "translation": out["translation"].tolist(),
                    "width": out["width"].tolist(),
                }
            )
        )


def cmd_sweep(args):
    """The reference's 16-config loss/reduction ablation sweep (train.py:5-21),
    run in-process instead of via os.system."""
    from pointnet_like_pose_estimation_tpu.data import load_dataset
    from pointnet_like_pose_estimation_tpu.train import TrainConfig, train

    train_ds = load_dataset(args.data, "train")
    test_ds = load_dataset(args.data, "test")
    results = {}
    jobs = []
    # reference grid (train.py:4-20): cls, sign, rotation x {L1,L2}x{mean,sum},
    # translation x {L1,L2}x{mean,sum} x {mean-MLP, no-mean-MLP}
    for model in ("rotation", "sign", "translation", "translation_no_mlp"):
        for kind in ("L2_loss", "L1_loss"):
            for reduction in ("mean", "sum"):
                if model == "sign" and (kind, reduction) != ("L2_loss", "mean"):
                    continue  # sign uses BCE; one config
                jobs.append((model, kind, reduction))
    jobs.append(("pointnet_cls", "L2_loss", "mean"))
    out_path = os.path.join(args.log_dir, "sweep_results.json")
    settings = {"epochs": args.epochs, "data": args.data}
    if os.path.exists(out_path):  # resume a partial sweep
        with open(out_path) as f:
            results = json.load(f)
        # resume is keyed by config name only — refuse to mix budgets:
        # stale results from a different epochs/data setting would silently
        # survive into this run's results file. Files that PREDATE the
        # _settings stamp have unknown provenance — refuse those too rather
        # than falsely certifying them under the current settings.
        prev = results.get("_settings")
        has_rows = any(not k.startswith("_") for k in results)
        if prev is None and has_rows:
            raise SystemExit(
                f"sweep resume: {out_path} has results but no _settings "
                f"stamp (pre-round-4 file, unknown budget); delete it or "
                f"pass a different --log-dir to start a fresh sweep"
            )
        if prev is not None and prev != settings:
            raise SystemExit(
                f"sweep resume: {out_path} was produced with settings {prev}, "
                f"current invocation uses {settings}; delete the file or "
                f"pass a different --log-dir to start a fresh sweep"
            )
    results["_settings"] = settings
    for model, kind, reduction in jobs:
        name = f"{model}_{kind}_{reduction}"
        if name in results:
            continue
        cfg = TrainConfig.for_model(
            model,
            epochs=args.epochs,
            loss_kind=kind,
            loss_reduction=reduction,
            log_dir=args.log_dir,
            experiment=name,
        )
        _, history = train(cfg, train_ds, test_ds)
        results[name] = history[-1]
        print(name, json.dumps(history[-1]))
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(prog="plpe")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="build the synthetic dataset")
    g.add_argument("--num-per-class", type=int, default=800)
    g.add_argument("--out", default="data_cache/dataset.npz")
    g.add_argument("--seed", type=int, default=0)
    g.set_defaults(fn=cmd_generate)

    t = sub.add_parser("train", help="train one model")
    _add_train_args(t)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="evaluate the best checkpoint")
    _add_train_args(e)
    e.set_defaults(fn=cmd_eval)

    i = sub.add_parser("infer", help="end-to-end grasp inference on cloud file(s)")
    i.add_argument("--input", required=True, nargs="+",
                   help="one or more .ply/.txt clouds; several stream "
                        "through the pipelined serving path in order")
    i.add_argument("--config", default="",
                   help="JSON overrides for PipelineConfig fields, e.g. "
                        "'{\"clip_range\": [-1.0, 0.0], \"min_points\": 200}'")
    i.add_argument("--checkpoints", default=None, help="json dict name->path")
    i.set_defaults(fn=cmd_infer)

    s = sub.add_parser("sweep", help="loss/reduction ablation sweep")
    s.add_argument("--data", default="data_cache/dataset.npz")
    s.add_argument("--epochs", type=int, default=10)
    s.add_argument("--log-dir", default="log")
    s.set_defaults(fn=cmd_sweep)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
