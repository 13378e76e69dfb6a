"""FaceDetector — the detection API surface (reference
preprocessing/face_detector.py:21-588) over the jitted single-stage detector.

Semantics parity with the reference:
- ``detect(image) -> {'bbox', 'landmarks', 'confidence'} | None``
  (face_detector.py:118-142) with confidence_threshold, min_face_size and
  select_largest filtering (:162-189 — largest face by area when multiple).
- ``detect_all(image)`` returns every surviving face (used by the web app's
  bbox drawing).
- ``detect_batch(paths) -> DataFrame`` (:292).
- ``crop_face(image, bbox, margin, target_size)`` (:367-407).
- ``visualize(image, detection)`` (:409).
- ``compare_detectors(image, backends)`` latency/count harness (:465-534).

Backend: 'blazeface' — the trainable TPU single-stage net (the reference's
'mtcnn'/'retinaface'/'opencv' backends all delegate to native libs that
don't exist on TPU; one jitted detector covers all three roles, SURVEY.md
§2.9). Checkpoints load via ``weights=`` (msgpack from
`training.train_detector`).
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from facerecognition_tpu.models.detector_net import (
    BlazeFaceNet,
    build_detector_net,
    anchor_centers,
    detect_faces,
)
from facerecognition_tpu.ops.image import bilinear_resize, crop_with_margin
from facerecognition_tpu.utils.imageio import load_image
from facerecognition_tpu.utils.serialization import load_variables


#: Shipped checkpoints in preference order: the v4 wide-envelope detector
#: (RANGES_V4 pose/illumination curriculum — OOD pose 99.0% / illumination
#: 96.5% vs v3's 88.5% / 87.5%, docs/DETECTOR.md), then the MXU-dense
#: robustness-trained v3, then the v2 curriculum detector, then the round-1
#: synthetic-blob one.
DEFAULT_CHECKPOINTS = (
    "detector_v4_128.msgpack",
    "detector_v3_128.msgpack",
    "detector_v2_128.msgpack",
    "detector_synthetic_128.msgpack",
)


def default_detector_checkpoint() -> Optional[str]:
    """Path of the best shipped detector checkpoint, or None if none exist.

    Single source of truth for the v3>v2 preference chain — bench.py and the
    real-photo tests must measure the same detector serving uses.
    """
    assets = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "assets",
    )
    for name in DEFAULT_CHECKPOINTS:
        path = os.path.join(assets, name)
        if os.path.exists(path):
            return path
    return None


def load_detector_checkpoint(weights) -> tuple[str, dict, Optional[tuple]]:
    """Decode a detector checkpoint into ``(arch, variables, calibration)``.

    ``weights`` is a msgpack path or an already-loaded variables dict. The
    architecture marker (v3+ dense nets; absent -> the original
    BlazeFaceNet) and the Platt score calibration ride in the checkpoint
    next to the params and are popped out here.
    """
    if isinstance(weights, (str, os.PathLike)):
        variables = load_variables(os.fspath(weights))
    else:
        variables = dict(weights)
    arch = "blaze"
    raw_arch = variables.pop("arch", None)
    if raw_arch is not None:
        arch = raw_arch.decode() if isinstance(raw_arch, bytes) else str(raw_arch)
    cal = variables.pop("calibration", None)
    if cal is not None:
        cal = (float(cal["a"]), float(cal["b"]))
    return arch, variables, cal


class FaceDetector:
    """Multi-face detector with reference-parity filtering semantics."""

    def __init__(
        self,
        backend: str = "blazeface",
        confidence_threshold: float = 0.9,
        min_face_size: int = 20,
        select_largest: bool = True,
        input_size: int = 128,
        iou_threshold: float = 0.3,
        max_faces: int = 16,
        weights: Optional[str | dict] = None,
        dtype: Any = jnp.float32,
    ):
        if backend != "blazeface":
            raise ValueError(
                f"backend {backend!r} not available — the TPU build ships the "
                "single 'blazeface' jitted backend (covers the reference's "
                "mtcnn/retinaface/opencv roles)"
            )
        self.backend = backend
        self.confidence_threshold = confidence_threshold
        self.min_face_size = min_face_size
        self.select_largest = select_largest
        self.input_size = input_size
        self.iou_threshold = iou_threshold
        self.max_faces = max_faces

        if weights is None and input_size == 128:
            # Ship-with-repo checkpoints so detect() works out of the box.
            weights = default_detector_checkpoint()
        self._calibration: Optional[tuple[float, float]] = None
        arch = "blaze"
        if weights is None:
            self.net = build_detector_net(arch, dtype)
            self.variables = self.net.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, input_size, input_size, 3)),
            )
        else:
            arch, self.variables, self._calibration = (
                load_detector_checkpoint(weights)
            )
            self.net = build_detector_net(arch, dtype)
            if self._calibration is None:
                # Focal-loss training deflates raw sigmoids; without the
                # in-checkpoint Platt (a, b) an absolute threshold like the
                # 0.5 default reads far too strict and recall collapses.
                import warnings

                warnings.warn(
                    "detector checkpoint has no 'calibration' key: raw "
                    "focal-loss scores are deflated, so absolute "
                    "confidence thresholds will under-detect. Fit one via "
                    "training.train_detector.fit_score_calibration.",
                    stacklevel=2,
                )
        self.arch = arch
        self.anchors = jnp.asarray(anchor_centers(input_size))

        def _detect(variables, image_f32, iou_threshold):
            # image: (H=size, W=size, 3) float [0,255] → normalized.
            # iou_threshold rides as a TRACED operand so mutating
            # detector.iou_threshold takes effect (a closure capture would
            # silently pin the first-trace value). max_faces shapes the
            # output and stays fixed at construction.
            x = image_f32[None] / 127.5 - 1.0
            raw = self.net.apply(variables, x)[0]
            return detect_faces(
                raw, self.anchors, iou_threshold, self.max_faces
            )

        self._detect_jit = jax.jit(_detect)

    # ------------------------------------------------------------------

    def _run(self, image: np.ndarray):
        """Resize to the detector size, run, rescale outputs to image coords."""
        h, w = image.shape[:2]
        s = self.input_size
        img = jnp.asarray(np.asarray(image, np.float32))
        if (h, w) != (s, s):
            img = bilinear_resize(img, s, s)
        boxes, lms, scores, valid = self._detect_jit(
            self.variables, img, jnp.float32(self.iou_threshold)
        )
        boxes = np.asarray(boxes, np.float64)
        lms = np.asarray(lms, np.float64)
        scores = np.asarray(scores, np.float64)
        if self._calibration is not None:
            a, b = self._calibration
            z = np.log(np.clip(scores, 1e-9, 1 - 1e-9) / (1 - np.clip(scores, 1e-9, 1 - 1e-9)))
            scores = 1.0 / (1.0 + np.exp(-(a * z + b)))
        valid = np.asarray(valid)
        sx, sy = w / s, h / s
        boxes[:, 0::2] *= sx
        boxes[:, 1::2] *= sy
        lms[..., 0] *= sx
        lms[..., 1] *= sy
        return boxes, lms, scores, valid

    def detect_all(self, image) -> list[dict]:
        """All faces above threshold/min-size, sorted by confidence."""
        img = load_image(image)
        boxes, lms, scores, valid = self._run(img)
        out = []
        for i in range(len(scores)):
            if not valid[i] or scores[i] < self.confidence_threshold:
                continue
            bw = boxes[i, 2] - boxes[i, 0]
            bh = boxes[i, 3] - boxes[i, 1]
            if min(bw, bh) < self.min_face_size:
                continue
            out.append(
                {
                    "bbox": boxes[i].tolist(),
                    "landmarks": lms[i].tolist(),
                    "confidence": float(scores[i]),
                }
            )
        return out

    def detect(self, image) -> Optional[dict]:
        """Single-face API: largest face (or highest confidence) or None.

        Mirrors reference select_largest behavior (face_detector.py:162-189).
        """
        faces = self.detect_all(image)
        if not faces:
            return None
        if self.select_largest:
            faces.sort(
                key=lambda f: (f["bbox"][2] - f["bbox"][0])
                * (f["bbox"][3] - f["bbox"][1]),
                reverse=True,
            )
        return faces[0]

    def detect_batch(self, image_paths: Sequence[str]):
        """Detect over many paths → pandas DataFrame (reference :292-365)."""
        import pandas as pd

        rows = []
        for path in image_paths:
            try:
                det = self.detect(path)
            except (FileNotFoundError, OSError):
                det = None
            row = {"image_path": str(path), "detected": det is not None}
            if det is not None:
                x1, y1, x2, y2 = det["bbox"]
                row.update(
                    confidence=det["confidence"],
                    x1=x1,
                    y1=y1,
                    x2=x2,
                    y2=y2,
                    width=x2 - x1,
                    height=y2 - y1,
                )
            rows.append(row)
        return pd.DataFrame(rows)

    def crop_face(
        self,
        image,
        bbox: Optional[Sequence[float]] = None,
        margin: float = 0.2,
        target_size: int = 112,
    ) -> Optional[np.ndarray]:
        """Crop (with relative margin) and resize (reference :367-407)."""
        img = load_image(image)
        if bbox is None:
            det = self.detect(img)
            if det is None:
                return None
            bbox = det["bbox"]
        out = crop_with_margin(
            jnp.asarray(np.asarray(img, np.float32)),
            jnp.asarray(np.asarray(bbox, np.float32)),
            margin,
            target_size,
        )
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)

    def visualize(self, image, detections: Optional[list[dict]] = None) -> np.ndarray:
        """Draw bboxes + landmarks; returns an RGB uint8 array."""
        img = load_image(image).copy()
        if detections is None:
            detections = self.detect_all(img)
        for det in detections:
            x1, y1, x2, y2 = (int(round(v)) for v in det["bbox"])
            x1, x2 = np.clip([x1, x2], 0, img.shape[1] - 1)
            y1, y2 = np.clip([y1, y2], 0, img.shape[0] - 1)
            img[y1:y2, x1 : x1 + 2] = (0, 255, 0)
            img[y1:y2, x2 - 1 : x2 + 1] = (0, 255, 0)
            img[y1 : y1 + 2, x1:x2] = (0, 255, 0)
            img[y2 - 1 : y2 + 1, x1:x2] = (0, 255, 0)
            for lx, ly in det.get("landmarks") or []:
                lx, ly = int(round(lx)), int(round(ly))
                if 1 <= lx < img.shape[1] - 1 and 1 <= ly < img.shape[0] - 1:
                    img[ly - 1 : ly + 2, lx - 1 : lx + 2] = (255, 0, 0)
        return img


def compare_detectors(
    image, backends: Sequence[FaceDetector], n_runs: int = 5
) -> list[dict]:
    """Latency/detection comparison harness (reference :465-534), over
    configured detector instances instead of backend strings."""
    img = load_image(image)
    results = []
    for det in backends:
        det.detect(img)  # warm/compile
        t0 = time.perf_counter()
        for _ in range(n_runs):
            r = det.detect(img)
        dt = (time.perf_counter() - t0) / n_runs
        results.append(
            {
                "backend": f"{det.backend}@{det.input_size}",
                "latency_ms": dt * 1e3,
                "detected": r is not None,
                "confidence": r["confidence"] if r else 0.0,
            }
        )
    return results
