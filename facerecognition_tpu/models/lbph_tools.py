"""LBPH convenience tools (reference component #15).

- ``recognize_face``: single-image recognition with threshold → name
  (reference inference_lbph.py:4-18)
- ``load_faces_capped``: folder loader with a per-class image cap
  (reference dataset_lbph.py:5-59 ``load_data_no_haar``)
- ``plot_confidence_histogram``: distance histogram
  (reference histogram_lbph.py:8-30)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from facerecognition_tpu.models.lbph import LBPHModel


def recognize_face(
    model: LBPHModel,
    image: np.ndarray,
    label_map: Optional[dict[int, str]] = None,
    threshold: Optional[float] = None,
) -> dict:
    """Single-image LBPH recognition (reference inference_lbph.py:4-18).

    Returns {'identity', 'label', 'confidence', 'recognized'} — confidence
    is the chi2 distance (lower = better).
    """
    thr = threshold if threshold is not None else model.threshold
    saved = model.threshold
    model.threshold = thr
    try:
        label, conf = model.predict(image)
    finally:
        model.threshold = saved
    name = "Unknown"
    if label >= 0:
        name = label_map.get(label, str(label)) if label_map else str(label)
    return {
        "identity": name,
        "label": int(label),
        "confidence": float(conf),
        "recognized": label >= 0,
    }


def load_faces_capped(
    data_dir: str,
    image_size: int = 100,
    max_per_class: int = 30,
) -> tuple[np.ndarray, np.ndarray, dict[int, str]]:
    """Folder loader capped at ``max_per_class`` images per identity
    (reference dataset_lbph.py:5-59)."""
    import jax.numpy as jnp

    from facerecognition_tpu.data.datasets import FolderDataset
    from facerecognition_tpu.ops.image import bilinear_resize, rgb_to_grayscale
    from facerecognition_tpu.utils.imageio import load_image

    index = FolderDataset(data_dir)
    images, labels = [], []
    counts: dict[int, int] = {}
    for path, label in zip(index.paths, index.labels):
        if counts.get(int(label), 0) >= max_per_class:
            continue
        try:
            img = load_image(path)
        except (FileNotFoundError, OSError):
            continue
        gray = np.asarray(
            rgb_to_grayscale(jnp.asarray(np.asarray(img, np.float32)))
        )
        if gray.shape != (image_size, image_size):
            gray = np.asarray(
                bilinear_resize(jnp.asarray(gray), image_size, image_size)
            )
        images.append(gray)
        labels.append(int(label))
        counts[int(label)] = counts.get(int(label), 0) + 1
    label_map = {i: n for i, n in enumerate(index.label_names)}
    return np.stack(images), np.asarray(labels, np.int64), label_map


def plot_confidence_histogram(
    confidences: Sequence[float],
    output_path: str,
    threshold: Optional[float] = None,
    bins: int = 30,
) -> str:
    """Histogram of LBPH distances with optional threshold marker
    (reference histogram_lbph.py:8-30)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.hist(np.asarray(confidences), bins=bins, color="#4878cf", alpha=0.85)
    if threshold is not None:
        ax.axvline(threshold, color="r", linestyle="--",
                   label=f"threshold = {threshold}")
        ax.legend()
    ax.set_xlabel("LBPH distance (lower = more confident)")
    ax.set_ylabel("count")
    d = os.path.dirname(output_path)
    if d:
        os.makedirs(d, exist_ok=True)
    fig.savefig(output_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return output_path
