"""Preprocessing layer: face detection API + dataset pipelines."""

from facerecognition_tpu.preprocessing.face_detector import FaceDetector

__all__ = ["FaceDetector"]
