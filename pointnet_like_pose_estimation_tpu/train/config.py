"""Typed training configuration.

One dataclass replaces the reference's per-script argparse redeclarations
(train_classification.py:83-96, train_rotation.py:83-96,
train_translation.py:83-97). Defaults transcribe the reference recipe:
batch 24, Adam lr 1e-3 (classification) / 1e-4 (pose), weight decay 1e-4,
StepLR(step=20 epochs, gamma=0.7), 100 epochs, dropout 0.4
(train_classification.py:50-61,88-95; train_rotation.py:91).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class TrainConfig:
    model: str = "pointnet_cls"
    num_classes: int = 7
    num_points: int = 1024
    batch_size: int = 24
    epochs: int = 100
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    optimizer: str = "adam"          # 'adam' | 'sgd' (train_classification.py:50-59)
    lr_step_epochs: int = 20         # StepLR step_size
    lr_gamma: float = 0.7            # StepLR gamma
    loss_kind: str = "L2_loss"       # pose heads: 'L2_loss' | 'L1_loss'
    loss_reduction: str = "mean"     # 'mean' | 'sum'
    seed: int = 0
    log_dir: str = "log"
    experiment: str = "default"
    dtype: str = "float32"           # compute dtype: 'float32' | 'bfloat16'
    augment: bool = True
    data_parallel: bool = False      # shard the batch over a 'data' mesh axis
    multihost: bool = False          # call jax.distributed.initialize() first
    device_data: bool = True         # dataset resident in HBM; one dispatch
    #                                  per epoch/eval (steps.make_device_epoch_runner)
    epoch_chunk: int = 256           # max scan steps per dispatch (bounds
    #                                  single-execution wall time on tunneled TPUs)
    ckpt_every: int = 1              # save 'latest' every k epochs (bounds
    #                                  D2H checkpoint traffic on tunneled TPUs)
    # reference-compat quirk flags (SURVEY §3.2)
    compat_first3_mean: bool = False  # train_translation.py:113 first-3-points mean
    compat_pm1_bce: bool = False      # train_sign.py:121 ±1 targets into BCE
    # beyond-reference: transform regression targets WITH the augmentation
    # (tran' = s*tran + u, width' = s*width). The reference scales/shifts the
    # cloud but leaves targets raw (provider.py:131-155 +
    # train_translation.py:110-115), injecting per-axis label noise
    # ~std(s)*E|t_axis| — the measured z-error 2x anomaly
    # (log/anomaly_probe.json). Default False = reference-faithful.
    augment_consistent_labels: bool = False

    @classmethod
    def for_model(cls, model: str, **overrides) -> "TrainConfig":
        """Reference per-task defaults: pose heads train at lr 1e-4."""
        lr = 1e-3 if "cls" in model else 1e-4
        base = dict(model=model, learning_rate=lr)
        base.update(overrides)
        return cls(**base)
