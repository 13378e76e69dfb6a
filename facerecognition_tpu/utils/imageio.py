"""Host-side image IO (PIL/cv2 optional) — everything device-side is jnp."""

from __future__ import annotations

import os
from typing import Any, Union

import numpy as np


def load_image(img_input: Union[str, "os.PathLike", np.ndarray, Any]) -> np.ndarray:
    """Load an image as RGB uint8 HWC from a path / PIL image / array.

    Accepts the same input kinds as the reference engine
    (inference/recognition_engine.py:244 — path or PIL.Image) plus raw numpy
    arrays (video frames).
    """
    if isinstance(img_input, np.ndarray):
        arr = img_input
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        elif arr.ndim == 3 and arr.shape[2] == 4:
            arr = arr[:, :, :3]  # drop alpha — contract is RGB HWC
        return to_uint8(arr)
    if hasattr(img_input, "convert"):  # PIL image
        return np.asarray(img_input.convert("RGB"))
    path = os.fspath(img_input)
    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"))
    except ImportError:
        import cv2

        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(path)
        return bgr[:, :, ::-1].copy()


def to_uint8(arr: np.ndarray) -> np.ndarray:
    """Clamp/convert an array to uint8 [0, 255]."""
    if arr.dtype == np.uint8:
        return arr
    if np.issubdtype(arr.dtype, np.floating) and arr.max() <= 1.0 + 1e-6:
        arr = arr * 255.0
    return np.clip(arr, 0, 255).astype(np.uint8)
