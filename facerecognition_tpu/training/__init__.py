"""Training layer: pure jitted train steps, YAML-config trainers, schedules,
early stopping, checkpoint/resume — rebuild of the reference trainers
(models/arcface/train_arcface.py, models/facenet/train_facenet.py) with the
hot loop as a data-parallel pjit step."""

from facerecognition_tpu.training.steps import (
    ArcFaceTrainState,
    make_arcface_train_step,
    make_arcface_eval_step,
    make_facenet_train_step,
    softmax_cross_entropy,
)
from facerecognition_tpu.training.config import load_config, deep_merge
from facerecognition_tpu.training.schedules import (
    EarlyStopping,
    ReduceOnPlateau,
    build_schedule,
)
from facerecognition_tpu.training.checkpoint import CheckpointManager
from facerecognition_tpu.training.synthetic_faces import (
    identity_dataset,
    render_scene,
    sample_identity,
    scene_batch,
)
from facerecognition_tpu.training.train_detector import (
    CurriculumConfig,
    evaluate_detector,
    fit_score_calibration,
    train_detector_curriculum,
)

__all__ = [
    "CurriculumConfig",
    "evaluate_detector",
    "fit_score_calibration",
    "identity_dataset",
    "render_scene",
    "sample_identity",
    "scene_batch",
    "train_detector_curriculum",
    "ArcFaceTrainState",
    "make_arcface_train_step",
    "make_arcface_eval_step",
    "make_facenet_train_step",
    "softmax_cross_entropy",
    "load_config",
    "deep_merge",
    "EarlyStopping",
    "ReduceOnPlateau",
    "build_schedule",
    "CheckpointManager",
]
