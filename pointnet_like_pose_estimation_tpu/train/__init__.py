"""Training subsystem: typed config, train state, jitted steps, loop."""

from pointnet_like_pose_estimation_tpu.train.config import TrainConfig
from pointnet_like_pose_estimation_tpu.train.state import PoseTrainState, create_train_state
from pointnet_like_pose_estimation_tpu.train.steps import make_eval_step, make_train_step
from pointnet_like_pose_estimation_tpu.train.loop import evaluate, train

__all__ = [
    "TrainConfig",
    "PoseTrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "evaluate",
    "train",
]
