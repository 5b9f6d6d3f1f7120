"""Render docs/CONVERGENCE.md: is each model converged, plateaued, or still
climbing at its trained epoch count?

VERDICT r3 #1's bar is "no row with best_epoch within 2 of epochs_done" —
i.e. evidence the metric stopped improving, or a committed analysis of why
not. This report derives that evidence from the committed training curves
(log/{classification,pose}/<exp>/history.json): for each model it tabulates
the best epoch, the epoch gap, and the improvement rate over the last third
of training (metric slope per 10 epochs, in the metric's own units), then
issues a verdict:

  converged   best is >=3 epochs before the end AND the tail slope shows
              <1% further improvement per 10 epochs
  plateauing  best near the end but the tail slope is <1%/10ep — more
              epochs would move the number only marginally
  climbing    tail slope >=1%/10ep — the row is a floor, not a result

Run: python scripts/convergence_report.py  (host-only, reads history.json)
"""
import json
import os

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPS = [
    # (model, experiment dir, metric key, higher_is_better, unit)
    ("pointnet_cls", "classification/r2_pointnet_cls", "test_instance_acc", True, "acc"),
    ("pointnet2_cls_ssg", "classification/r3_pointnet2_cls_ssg", "test_instance_acc", True, "acc"),
    ("pointnet2_cls_msg", "classification/r3_pointnet2_cls_msg", "test_instance_acc", True, "acc"),
    ("rotation", "pose/r3_rotation", "test_mean_err", False, "deg"),
    ("rotation_ssg", "pose/r3_rotation_ssg", "test_mean_err", False, "deg"),
    ("rotation_msg", "pose/r3_rotation_msg", "test_mean_err", False, "deg"),
    ("sign", "pose/r3_sign", "test_metric", True, "acc"),
    ("sign_ssg", "pose/r3_sign_ssg", "test_metric", True, "acc"),
    ("sign_msg", "pose/r5_sign_msg", "test_metric", True, "acc"),
    ("translation", "pose/r3_translation_ref", "test_mean_err", False, "cm"),
    # r5_*: post-reset reruns — the container recycle wiped the uncommitted
    # r3 experiment dirs, so round 5 retrains these from scratch
    ("translation_ssg", "pose/r5_translation_ssg", "test_mean_err", False, "cm"),
    ("translation_msg", "pose/r3_translation_msg", "test_mean_err", False, "cm"),
    ("width", "pose/r3_width_ref", "test_mean_err", False, "m"),
    ("pose", "pose/r3_pose", "test_mean_err", False, "deg"),
    ("pose_transform", "pose/r4_pose_transform", "test_mean_err", False, "deg"),
    ("pose_feat_trans", "pose/r4_pose_feat_trans", "test_mean_err", False, "deg"),
    ("pose_mean", "pose/r4_pose_mean", "test_mean_err", False, "cm"),
    # bf16 end-to-end validation runs (VERDICT r4 #2)
    ("pointnet2_cls_ssg_bf16", "classification/r5_pn2_ssg_bf16",
     "test_instance_acc", True, "acc"),
    ("translation_msg_bf16", "pose/r5_translation_msg_bf16",
     "test_mean_err", False, "cm"),
]


def load_full_curve(exp_dir: str, model: str) -> list[dict]:
    """Reconstruct the FULL training curve across resumes.

    ``history.json`` holds only the LAST run's rows (train() rewrites it per
    invocation), but every epoch row is also logged to
    ``logs/<model>.log`` as a python dict literal — parse those, dedupe by
    epoch keeping the latest occurrence, and merge with history.json.
    """
    import ast

    rows: dict[int, dict] = {}
    log_path = os.path.join("log", exp_dir, "logs", f"{model}.log")
    if os.path.exists(log_path):
        for line in open(log_path, errors="replace"):
            i = line.find("{'epoch':")
            if i < 0:
                continue
            try:
                row = ast.literal_eval(line[i:].strip())
            except (ValueError, SyntaxError):
                continue
            if isinstance(row, dict) and "epoch" in row:
                rows[row["epoch"]] = row
    hist_path = os.path.join("log", exp_dir, "history.json")
    if os.path.exists(hist_path):
        for row in json.load(open(hist_path)):
            rows[row["epoch"]] = row
    return [rows[e] for e in sorted(rows)]


def analyze(hist, key, higher):
    rows = [(r["epoch"], r[key]) for r in hist if key in r]
    if len(rows) < 5:
        return None
    rows.sort()
    epochs = [e for e, _ in rows]
    vals = [v for _, v in rows]
    best_i = max(range(len(vals)), key=lambda i: vals[i]) if higher else min(
        range(len(vals)), key=lambda i: vals[i])
    # least-squares slope over the last third (>=5 points)
    tail = rows[-max(5, len(rows) // 3):]
    n = len(tail)
    mx = sum(e for e, _ in tail) / n
    my = sum(v for _, v in tail) / n
    denom = sum((e - mx) ** 2 for e, _ in tail) or 1.0
    slope = sum((e - mx) * (v - my) for e, v in tail) / denom  # per epoch
    improving = -slope if not higher else slope                # >0 = improving
    rel_per_10 = 10 * improving / max(abs(my), 1e-9)
    return {
        "epochs_done": epochs[-1] + 1,
        "best_epoch": epochs[best_i],
        "best": vals[best_i],
        "last": vals[-1],
        "tail_slope_per_10ep": 10 * slope,
        "tail_rel_improvement_per_10ep": rel_per_10,
    }


def verdict(a):
    gap = a["epochs_done"] - 1 - a["best_epoch"]
    if gap >= 10:
        # the best checkpoint sat >=10 epochs before the end — convergence
        # evidence on its own, robust to noisy per-epoch tail slopes
        return "converged"
    if a["tail_rel_improvement_per_10ep"] < 0.01:
        return "converged" if gap >= 3 else "plateauing"
    return "climbing"


def _results_epochs():
    """model -> (epochs_done, best_epoch) from the authoritative results
    files — curves for some round-2 runs did not survive the round-2
    workspace reset, so a shorter surviving curve must not masquerade as
    the full training record."""
    out = {}
    for p in ("log/round2_results.json", "log/round3_results.json",
              "log/round4_results.json", "log/round5_results.json"):
        if not os.path.exists(p):
            continue
        for m, rec in json.load(open(p)).items():
            if "error" in rec:
                continue
            e = rec.get("epochs_done", 0)
            if e >= out.get(m, (0, None))[0]:
                be = (rec.get("best_eval") or {}).get("best_epoch")
                out[m] = (e, be)
    return out


def main():
    lines = [
        "# Convergence report (auto-generated: scripts/convergence_report.py)",
        "",
        "Tail slope = least-squares metric change over the last third of",
        "training, scaled per 10 epochs; relative % is against the tail mean.",
        "A 'climbing' verdict marks a floor, not a result.",
        "",
        "NOTE (round 5): a mid-round container reset destroyed every",
        "training curve not committed to git (docs/ROUND5.md, incident",
        "section) — 'curve lost' rows carry their committed best from the",
        "round results files; curves and results are git-tracked since, so",
        "this is not recoverable history but can no longer recur.",
        "",
        "| Model | Epochs | Best @ | Best | Last | Tail Δ/10ep | Verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    summary = {}
    recorded = _results_epochs()
    for model, exp, key, higher, unit in EXPS:
        exp_dir = exp.split("/", 1)[1] if "/" in exp else exp
        hist = load_full_curve(exp, model)
        rec_e, rec_be = recorded.get(model, (0, None))
        if not hist:
            lines.append(
                f"| `{model}` | {rec_e or '—'} | {rec_be if rec_be is not None else '—'} "
                f"| — | — | — | curve lost (result: round results files) |")
            continue
        a = analyze(hist, key, higher)
        if a is None:
            lines.append(
                f"| `{model}` | {rec_e or '—'} | {rec_be if rec_be is not None else '—'} "
                f"| — | — | — | curve lost (result: round results files) |")
            continue
        # a curve with interior holes (early rows lost to a hard kill before
        # per-epoch persistence landed) must not pass as the full record:
        # its curve-derived best can understate the checkpointed best
        n_rows = sum(1 for r in hist if key in r)
        if n_rows < 0.8 * a["epochs_done"]:
            lines.append(
                f"| `{model}` | {a['epochs_done']} | {rec_be if rec_be is not None else '—'} "
                f"| — | — | — | curve has gaps ({n_rows}/{a['epochs_done']} epochs survive; "
                f"best from checkpoint meta / round results files) |")
            continue
        if rec_e > a["epochs_done"] + 2:
            # the surviving curve is a SHORTER rerun (round-2 curves lost);
            # the committed result outranks it — don't let a truncated curve
            # read as the training record
            lines.append(
                f"| `{model}` | {rec_e} | {rec_be} | — | — | — | "
                f"curve truncated (surviving curve: {a['epochs_done']} ep; "
                f"committed result from round results files) |")
            continue
        v = verdict(a)
        summary[model] = {**a, "verdict": v}
        fmt = (lambda x: f"{x*100:.2f}%") if unit == "acc" else (
            (lambda x: f"{x*100:.2f} cm") if unit == "m" else
            (lambda x: f"{x:.2f} {unit}"))
        lines.append(
            f"| `{model}` | {a['epochs_done']} | {a['best_epoch']} | "
            f"{fmt(a['best'])} | {fmt(a['last'])} | "
            f"{a['tail_rel_improvement_per_10ep']*100:+.1f}% | **{v}** |"
        )
    lines.append("")
    with open("docs/CONVERGENCE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    with open("log/convergence_report.json", "w") as f:
        json.dump(summary, f, indent=2)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
