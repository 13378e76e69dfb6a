"""Core jitted image / matching ops (the TPU-native replacements for the
reference's OpenCV / skimage / FAISS native dependencies — SURVEY.md §2.9)."""

from facerecognition_tpu.ops.umeyama import ARCFACE_TEMPLATE, umeyama, invert_affine
from facerecognition_tpu.ops.image import (
    affine_warp,
    align_crop,
    bilinear_resize,
    crop_with_margin,
    normalize_imagenet_style,
    rgb_to_grayscale,
)
from facerecognition_tpu.ops.matcher import (
    cosine_similarity,
    cosine_topk,
    l2_normalize,
    compute_prototypes,
)

__all__ = [
    "ARCFACE_TEMPLATE",
    "umeyama",
    "invert_affine",
    "affine_warp",
    "align_crop",
    "bilinear_resize",
    "crop_with_margin",
    "normalize_imagenet_style",
    "rgb_to_grayscale",
    "cosine_similarity",
    "cosine_topk",
    "l2_normalize",
    "compute_prototypes",
]
