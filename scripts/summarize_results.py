"""Render log/round{2,3}_results.json into the BASELINE.md north-star table.

Metric conventions follow the reference eval scripts: instance/class accuracy
(test_classification.py:144-155), per-axis mean absolute rotation error in
degrees (test_rotation.py:84-97), translation error cm-scaled
(test_translation.py:101), sign accuracy via hard threshold
(train_sign.py:105-127), width mean absolute error in meters.

Replaces everything below the '<!-- round2-results -->' marker in
BASELINE.md (idempotent re-runs as training jobs land).
"""
import json
import os
import sys

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKER = "<!-- round2-results -->"

ROWS = [
    # (model, kind)
    ("pointnet_cls", "cls"),
    ("pointnet2_cls_ssg", "cls"),
    ("pointnet2_cls_msg", "cls"),
    ("rotation", "deg"),
    ("rotation_ssg", "deg"),
    ("rotation_msg", "deg"),
    ("sign", "acc"),
    ("sign_ssg", "acc"),
    ("sign_msg", "acc"),
    ("translation", "cm"),
    ("translation_ssg", "cm"),
    ("translation_msg", "cm"),
    ("width", "m"),
    ("pose", "deg"),
    # the rest of pose.py's config lattice (model/pose.py:47-91, VERDICT r3
    # missing #2): input transform, feature transform, mean-residual
    # translation, classify branch
    ("pose_transform", "deg"),
    ("pose_feat_trans", "deg"),
    ("pose_mean", "cm"),
    ("pose_classify", "cls"),
]


def fmt(model, kind, rec):
    if rec is None:
        return f"| `{model}` | — | (not yet run) |"
    if "error" in rec:
        return f"| `{model}` | FAILED | {rec['error'][:80]} |"
    be = rec.get("best_eval") or {}
    epochs = rec.get("epochs_done", "?")
    extra = f"{epochs} epochs, best @ {be.get('best_epoch', '?')}"
    if kind == "cls":
        return (f"| `{model}` | {be.get('instance_acc', float('nan'))*100:.2f}% instance / "
                f"{be.get('class_acc', float('nan'))*100:.2f}% class | {extra} |")
    if kind == "acc":
        return f"| `{model}` | {be.get('instance_acc', float('nan'))*100:.2f}% sign accuracy | {extra} |"
    axis = be.get("axis_err") or [float("nan")] * 3
    if kind == "deg":
        ax = " / ".join(f"{a:.2f}" for a in axis)
        return f"| `{model}` | {be.get('mean_err', float('nan')):.2f} deg/axis (x/y/z: {ax}) | {extra} |"
    if kind == "cm":
        ax = " / ".join(f"{a:.2f}" for a in axis)
        return f"| `{model}` | {be.get('mean_err', float('nan')):.2f} cm/axis (x/y/z: {ax}) | {extra} |"
    return f"| `{model}` | {be.get('mean_err', float('nan'))*100:.2f} cm abs width error | {extra} |"


def _bf16_section():
    """bf16 end-to-end validation rows (VERDICT r4 #2): the same reference
    recipe at dtype=bfloat16, shown against the committed f32 metric so the
    bf16 perf headline carries accuracy evidence."""
    path = "log/round5_results.json"
    if not os.path.exists(path):
        return []
    with open(path) as f:
        r5 = json.load(f)
    rows = [(k, v) for k, v in r5.items()
            if k.endswith("_bf16") and "error" not in v and v.get("best_eval")]
    if not rows:
        return []
    lines = [
        "### bf16 end-to-end validation (round 5)",
        "",
        "Reference recipe re-run with compute dtype bfloat16 (params and",
        "optimizer state stay f32); f32 row from the main table alongside.",
        "",
        "| Model (bf16) | Test metric | f32 reference row |",
        "|---|---|---|",
    ]
    for key, rec in rows:
        model = rec.get("model", key[:-5])
        be = rec["best_eval"]
        f32 = r5.get(model) or {}
        f32be = f32.get("best_eval") or {}
        if "cls" in model:
            m = f"{be.get('instance_acc', float('nan'))*100:.2f}% instance"
            fm = f"{f32be.get('instance_acc', float('nan'))*100:.2f}%"
        elif model.startswith("sign"):
            m = f"{be.get('instance_acc', float('nan'))*100:.2f}% sign acc"
            fm = f"{f32be.get('instance_acc', float('nan'))*100:.2f}%"
        else:
            unit = "deg" if model.startswith("rotation") or model.startswith("pose") else "cm"
            m = f"{be.get('mean_err', float('nan')):.2f} {unit}/axis"
            fm = f"{f32be.get('mean_err', float('nan')):.2f} {unit}/axis"
        ep = rec.get("epochs_done", "?")
        lines.append(f"| `{model}` | {m} ({ep} ep, best @ {be.get('best_epoch','?')}) | {fm} |")
    lines.append("")
    return lines


def _sweep_section():
    path = "log/sweep_r3/sweep_results.json"
    if not os.path.exists(path):
        return []
    with open(path) as f:
        sweep = json.load(f)
    lines = [
        "### Loss/reduction ablation sweep (reference train.py:4-20 grid)",
        "",
        "25 epochs per config on the full-scale set (reduced from the",
        "reference's 100; cli.py sweep). Last-epoch test metric:",
        "",
        "| Config | Test metric |",
        "|---|---|",
    ]
    for name, row in sweep.items():
        if name.startswith("_"):  # metadata (e.g. _settings), not a config
            continue
        metric = row.get("test_mean_err", row.get("test_metric"))
        unit = ("deg/axis" if name.startswith("rotation")
                else "cm/axis" if name.startswith("translation")
                else "acc")
        if isinstance(metric, float) and unit == "acc":
            lines.append(f"| `{name}` | {metric*100:.2f}% |")
        else:
            lines.append(f"| `{name}` | {metric:.2f} {unit} |")
    lines.append("")
    return lines


def _label_experiment_section():
    path = "log/translation_label_experiment.json"
    if not os.path.exists(path):
        return []
    with open(path) as f:
        exp = json.load(f)
    lines = [
        "### Beyond-reference: label-consistent augmentation (PARITY.md)",
        "",
        "| Arm | Result |",
        "|---|---|",
    ]
    for tag, row in exp.items():
        if "axis_err_cm" in row:
            ax = " / ".join(f"{a:.2f}" for a in row["axis_err_cm"])
            lines.append(
                f"| `{tag}` (acl={row['augment_consistent_labels']}) | "
                f"{row.get('mean_err_cm', row.get('mean_err')):.2f} cm/axis (x/y/z: {ax}), "
                f"{row['epochs']} epochs |")
        else:
            lines.append(
                f"| `{tag}` (acl={row['augment_consistent_labels']}) | "
                f"{row.get('mean_err', float('nan'))*100:.2f} cm width err, "
                f"{row['epochs']} epochs |")
    lines.append("")
    return lines


def main():
    results = {}
    for path in (
        "log/round2_results.json",
        "log/round3_results.json",
        "log/round4_results.json",
        "log/round5_results.json",
    ):
        if os.path.exists(path):
            with open(path) as f:
                for model, rec in json.load(f).items():
                    # round 3 supersedes round 2 when it trained further or
                    # round 2 has no completed evidence
                    old = results.get(model)
                    if (old is None or "error" in old
                            or rec.get("epochs_done", 0) >= old.get("epochs_done", 0)):
                        if "error" not in rec or old is None:
                            results[model] = rec
    lines = [
        MARKER,
        "",
        "## Measured results (rounds 2-5): reference recipe on the full-scale set",
        "",
        "7 classes x 8,000 clouds (6,001/1,999 split per class, N=1024 — the",
        "reference's exact dataset scale, ModelDataLoader.py:56-58), batch 24,",
        "Adam lr 1e-3 (cls) / 1e-4 (pose), wd 1e-4, StepLR(20, 0.7) — trained",
        "end-to-end on ONE v5e chip via scripts/train_round{2..5}.py; metrics",
        "from the best checkpoint on the held-out test split (13,993 clouds).",
        "",
        "| Model | Test metric | Notes |",
        "|---|---|---|",
    ]
    for model, kind in ROWS:
        lines.append(fmt(model, kind, results.get(model)))
    lines += [
        "",
        "Notes: sign accuracy for the `cylinder` class is chance-level by",
        "construction — a cylinder's z-rotation sign is unobservable from",
        "geometry (rotational symmetry); the other 6 classes carry the metric.",
        "`pose` is the generic configurable head (reference model/pose.py:7-105)",
        "in its rotation configuration; `pose_{transform,feat_trans,mean,",
        "classify}` are the rest of its config lattice (:47-91).",
        "`pose_classify` is trivially perfect BY CONSTRUCTION — pose.py",
        "consumes the same spliced (3+7)-channel input in every config, so",
        "the classify branch sees its own one-hot label (reference quirk,",
        "reproduced faithfully). Raw per-class numbers:",
        "log/round{2..5}_results.json.",
        "",
    ]
    lines += _bf16_section()
    lines += _sweep_section()
    lines += _label_experiment_section()
    with open("BASELINE.md") as f:
        base = f.read()
    head = base.split(MARKER)[0].rstrip() + "\n\n"
    with open("BASELINE.md", "w") as f:
        f.write(head + "\n".join(lines))
    done = sum(1 for m, _ in ROWS if m in results and "error" not in results[m])
    print(f"BASELINE.md updated: {done}/{len(ROWS)} models with results")


if __name__ == "__main__":
    main()
