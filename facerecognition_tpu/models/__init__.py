"""Flax model zoo: ArcFace (ResNet50), FaceNet (InceptionResnetV1), LBPH,
and the single-stage face detector — jit-compiled XLA graphs replacing the
reference's PyTorch/cuDNN and OpenCV-contrib native paths (SURVEY.md §2.9)."""

from facerecognition_tpu.models.resnet import ResNet50Backbone
from facerecognition_tpu.models.arcface import (
    ArcFaceModel,
    ArcMarginProduct,
    arc_margin_logits,
    freeze_mask,
)
from facerecognition_tpu.models.inception_resnet_v1 import InceptionResnetV1
from facerecognition_tpu.models.facenet import FaceNetModel, triplet_loss
from facerecognition_tpu.models.lbph import LBPHModel
from facerecognition_tpu.models.mobilefacenet import (
    MobileFaceNet,
    MobileFaceNetArcFace,
)
from facerecognition_tpu.models.detector_net import BlazeFaceNet

__all__ = [
    "MobileFaceNet",
    "MobileFaceNetArcFace",
    "BlazeFaceNet",
    "ResNet50Backbone",
    "ArcFaceModel",
    "ArcMarginProduct",
    "arc_margin_logits",
    "freeze_mask",
    "InceptionResnetV1",
    "FaceNetModel",
    "triplet_loss",
    "LBPHModel",
]
