"""Probe the round-2 per-axis error anomalies (VERDICT r2 #3).

Two anomalies in the committed eval metrics (log/round2_results.json):
  1. translation z-error 5.16 cm vs 1.86/2.50 for x/y, uniformly across
     all 7 classes;
  2. cuboid rotation x-error ~21 deg vs ~2-10 deg elsewhere.

This script answers both from DATA, with no model in the loop:

  (1) For every test cloud, the translation head's mean-residual branch
      sees the cloud centroid (train_translation.py:113); the rest must be
      inferred from the NORMALIZED cloud (scale divided out). So the
      relevant statistics are the per-axis offset t - centroid: its mean
      (learnable bias) and its spread GIVEN scale-free shape (irreducible
      unless the scale cue is reintroduced). We report per-class per-axis
      stats of the offset, plus a linear probe (mean,onehot)->t to bound
      what the residual branch alone achieves. During TRAINING the
      reference recipe also jitters labels: random_scale multiplies the
      cloud (and thus the captured mean) by s~U[0.8,1.25] while the target
      stays raw (provider.py:144-155 + train_translation.py:110-115), so
      the train-time label noise per axis is ~std(s)*E|t_axis| — z sits at
      E|t_z|~0.8 m vs E|t_x|~0.25 m, a 3x larger noise floor. Both effects
      are REFERENCE-FAITHFUL; we quantify them here.

  (2) A cuboid (rectangular box) with near-equal y/z sides is nearly
      invariant under 90-deg x-rolls, and every box is invariant under
      180-deg flips; with phi drawn from +-90 deg (build_data.py's non-cube
      roll range) the +-90 boundary pair maps to the SAME cloud. We
      quantify: fraction of cuboid draws with |sy - sz| small, and the
      label-vs-shape ambiguity of the +-90 boundary.

Writes log/anomaly_probe.json and prints a summary.
"""

import json
import os
import sys

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

import numpy as np

from pointnet_like_pose_estimation_tpu.data import load_dataset
from pointnet_like_pose_estimation_tpu.data.generators import CATEGORIES

DATA = os.environ.get("PLPE_DATASET", "data_cache/dataset_full.npz")


def translation_stats(ds):
    pts, tran, labels = np.asarray(ds.points), np.asarray(ds.tran), np.asarray(ds.labels)
    centroid = pts.mean(axis=1)                      # [M, 3]
    offset = tran - centroid                         # what's NOT in the mean
    rows = {}
    for c, name in enumerate(CATEGORIES):
        m = labels == c
        rows[name] = {
            "offset_mean_cm": (offset[m].mean(0) * 100).round(3).tolist(),
            "offset_std_cm": (offset[m].std(0) * 100).round(3).tolist(),
        }
    # linear probe: [centroid, onehot] -> t  (what the mean-residual branch
    # can do with a linear map; the conv trunk must close the rest)
    X = np.concatenate(
        [centroid, np.eye(len(CATEGORIES))[labels]], axis=1
    )
    X = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    W, *_ = np.linalg.lstsq(X, tran, rcond=None)
    err = np.abs(X @ W - tran).mean(0) * 100
    # scale-aware probe: add the normalization scale (max radius about the
    # centroid) — the cue the normalized cloud DELETES
    scale = np.linalg.norm(pts - centroid[:, None, :], axis=-1).max(1)
    X2 = np.concatenate([X, scale[:, None]], axis=1)
    W2, *_ = np.linalg.lstsq(X2, tran, rcond=None)
    err2 = np.abs(X2 @ W2 - tran).mean(0) * 100
    # train-time label-noise floor induced by random_scale on the captured
    # mean (reference-faithful augmentation quirk)
    s_std = np.sqrt((1.25 - 0.8) ** 2 / 12.0)
    noise_floor = s_std * np.abs(tran).mean(0) * 100
    return {
        "per_class_offset": rows,
        "linear_probe_mean_onehot_err_cm": err.round(3).tolist(),
        "linear_probe_plus_scale_err_cm": err2.round(3).tolist(),
        "train_label_noise_floor_cm": noise_floor.round(3).tolist(),
        "abs_target_mean_m": np.abs(tran).mean(0).round(4).tolist(),
    }


def cuboid_ambiguity():
    rng = np.random.default_rng(0)
    n = 20000
    sy = rng.integers(7, 11, n) / 100
    sz = rng.integers(4, 9, n) / 100
    near_square = np.abs(sy - sz) <= 0.01
    phi = rng.integers(-90, 91, n)
    boundary = np.abs(phi) >= 80
    return {
        "frac_near_square_yz": float(near_square.mean()),
        "frac_phi_near_pm90": float(boundary.mean()),
        "note": (
            "|sy-sz|<=0.01 makes the box nearly invariant under 90-deg "
            "x-rolls (phi ambiguous mod 90); phi=+90 and phi=-90 give "
            "identical clouds for ANY box (180-deg flip symmetry), so the "
            "+-90 roll range of non-cube categories (build_data.py:62-174) "
            "carries irreducible boundary ambiguity."
        ),
    }


def main():
    ds = load_dataset(DATA, "test")
    out = {
        "translation": translation_stats(ds),
        "cuboid_rotation": cuboid_ambiguity(),
    }
    os.makedirs("log", exist_ok=True)
    with open("log/anomaly_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
