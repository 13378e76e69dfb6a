"""Real-photograph validation of detect → align → embed (VERDICT r1 item 3).

The only real face image in this environment is the reference repo's own
upload sample (/root/reference/uploads/anh1.jpg, 900x900 frontal portrait —
the photo the reference's MTCNN detects, face_detector.py:81-97). The
hand-annotated ground-truth head box lives in tests/fixtures/anh1_gt.json.

These tests require the committed curriculum checkpoint
(assets/detector_v2_128.msgpack) and skip cleanly when the photo is absent.
"""

import json
import os

import numpy as np
import pytest

REAL_PHOTO = "/root/reference/uploads/anh1.jpg"
GT_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "anh1_gt.json")
from facerecognition_tpu.preprocessing.face_detector import (
    default_detector_checkpoint,
)

# Same preference chain as FaceDetector's default (single source of truth).
CKPT = default_detector_checkpoint() or "missing"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(REAL_PHOTO), reason="reference photo not present"
    ),
    pytest.mark.skipif(
        not os.path.exists(CKPT), reason="curriculum checkpoint not trained"
    ),
]


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


@pytest.fixture(scope="module")
def photo():
    from PIL import Image

    return np.asarray(Image.open(REAL_PHOTO).convert("RGB"))


@pytest.fixture(scope="module")
def detector():
    from facerecognition_tpu.preprocessing.face_detector import FaceDetector

    return FaceDetector(weights=CKPT, confidence_threshold=0.5)


class TestRealPhoto:
    def test_detects_the_face(self, photo, detector):
        gt = json.load(open(GT_PATH))
        det = detector.detect(photo)
        assert det is not None, "no detection on the real photo"
        iou = _iou(det["bbox"], gt["bbox"])
        assert iou >= 0.5, f"IoU {iou:.2f} vs hand-annotated box"

    def test_landmarks_plausible(self, photo, detector):
        """Eyes above nose above mouth, roughly inside the GT box."""
        gt = json.load(open(GT_PATH))
        det = detector.detect(photo)
        lm = np.asarray(det["landmarks"])  # (5, 2)
        x1, y1, x2, y2 = gt["bbox"]
        pad = 0.3 * (x2 - x1)
        assert (lm[:, 0] > x1 - pad).all() and (lm[:, 0] < x2 + pad).all()
        assert (lm[:, 1] > y1 - pad).all() and (lm[:, 1] < y2 + pad).all()
        assert lm[0, 1] < lm[2, 1] < (lm[3, 1] + lm[4, 1]) / 2  # eye<nose<mouth
        assert lm[0, 0] < lm[1, 0]  # left eye left of right eye

    def test_align_embed_recognize_roundtrip(self, photo, detector):
        """Full pipeline: the aligned real face embeds and matches itself
        through the engine (detect→align→embed→enroll→recognize)."""
        from facerecognition_tpu.inference.engine import RecognitionEngine
        from tests.test_engine import SmallEmbedder

        eng = RecognitionEngine(
            embedder=SmallEmbedder(), detector=detector, threshold=0.5
        )
        assert eng.add_to_db("anh", [photo])
        res = eng.recognize(photo)
        assert res["status"] == "success"
        assert res["identity"] == "anh"
        assert res["confidence"] > 0.9
