"""MPMD multi-head fan-out: one device per pose head.

The reference overlaps its four pose heads with Python threads on a single
GPU (mutilthreading/predict_test.py:25-67) — the threads contend for one
device and the GIL. The TPU-native shape of that idea is MPMD placement:
each head's parameters live on (are *committed* to) a different chip, so the
four forward programs are dispatched asynchronously and execute genuinely
concurrently, one per chip, with the spliced input broadcast over ICI.

This is the expert-parallel analog for this model family: the "experts" are
the heterogeneous task heads (different output widths, sign's sigmoid,
translation's mean-residual branch), which is exactly why they fan out as
separate committed programs rather than as one stacked-weight shard_map —
stacking requires homogeneous parameter trees, and head heterogeneity is the
point.

Complementary to pipeline/infer.py's fused single-program path: on ONE chip
the fused program wins (XLA overlaps the heads itself); on a multi-chip
slice this path splits the memory footprint and the FLOPs per chip.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_like_pose_estimation_tpu.data import augment as aug
from pointnet_like_pose_estimation_tpu.ops import euler_rotation_matrix, normalize_cloud

_HEADS = ("rotation", "sign", "translation", "width")


class MultiHeadParallel:
    """Classifier + 4 pose heads placed round-robin over ``devices``.

    Args:
      models: name -> (flax module, variables) for keys
        classifier/rotation/sign/translation/width (same contract as
        pipeline.GraspPipeline).
      num_classes: one-hot width spliced onto the pose inputs.
      devices: devices to fan out over; defaults to ``jax.devices()``.
        Fewer devices than models degrades gracefully (round-robin).
    """

    def __init__(
        self,
        models: dict[str, tuple[Any, Any]],
        *,
        num_classes: int = 7,
        devices: Sequence[jax.Device] | None = None,
    ):
        devices = list(devices if devices is not None else jax.devices())
        order = list(_HEADS) + ["classifier"]
        self.placement = {n: devices[i % len(devices)] for i, n in enumerate(order)}
        self.num_classes = num_classes
        self._fns = {}
        self._vars = {}
        for name in order:
            model, variables = models[name]
            dev = self.placement[name]
            # committed variables pin each head's program to its device
            self._vars[name] = jax.device_put(variables, dev)
            self._fns[name] = jax.jit(
                lambda v, *a, _m=model: _m.apply(v, *a, train=False)
            )

        def _front(xyz):
            mean = jnp.mean(xyz, axis=1)
            normed = normalize_cloud(xyz)
            log_probs, _, pred_class = models["classifier"][0].apply(
                self._vars["classifier"], normed, train=False
            )
            spliced = aug.splice_onehot(normed, pred_class, self.num_classes)
            return log_probs, pred_class, spliced, mean

        self._front = jax.jit(_front)

    def __call__(self, xyz) -> dict:
        """xyz: [K, N, 3] raw cluster clouds -> grasp-estimate dict (host).

        All four head programs are dispatched before any result is awaited;
        JAX's async dispatch runs them concurrently, one per device.
        """
        xyz = jax.device_put(jnp.asarray(xyz, jnp.float32), self.placement["classifier"])
        log_probs, pred_class, spliced, mean = self._front(xyz)

        futures = {}
        for name in _HEADS:
            dev = self.placement[name]
            args = (jax.device_put(spliced, dev),)
            if name == "translation":
                args += (jax.device_put(mean, dev),)
            futures[name] = self._fns[name](self._vars[name], *args)

        rot = np.asarray(futures["rotation"])
        sign_prob, hard_sign = map(np.asarray, futures["sign"])
        tran = np.asarray(futures["translation"])
        width = np.asarray(futures["width"])

        signed_rot = rot.copy()
        signed_rot[:, 2] *= hard_sign[:, 0]
        R = np.asarray(euler_rotation_matrix(jnp.radians(signed_rot)))
        return {
            "log_probs": np.asarray(log_probs),
            "pred_class": np.asarray(pred_class),
            "rotation_deg": signed_rot,
            "rotation_matrix": R,
            "sign_prob": sign_prob[:, 0],
            "translation": tran,
            "width": width[:, 0],
        }
