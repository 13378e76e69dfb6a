"""Shared utilities: checkpoint serialization, config, image IO, timing."""

from facerecognition_tpu.utils.serialization import load_variables, save_variables
from facerecognition_tpu.utils.imageio import load_image, to_uint8

__all__ = ["load_variables", "save_variables", "load_image", "to_uint8"]
