"""Detector tests: NMS, anchor targets, end-to-end synthetic training."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facerecognition_tpu.models.detector_net import (
    BlazeFaceNet,
    anchor_centers,
    detect_faces,
)
from facerecognition_tpu.ops.nms import iou_matrix, nms_padded
from facerecognition_tpu.preprocessing.face_detector import FaceDetector
from facerecognition_tpu.training.train_detector import (
    MAX_GT,
    DetectorTrainConfig,
    assign_targets,
    synthetic_face_batch,
    train_detector_synthetic,
)


class TestNMS:
    def test_iou_matrix(self):
        a = jnp.array([[0, 0, 10, 10], [0, 0, 5, 5]], jnp.float32)
        iou = np.asarray(iou_matrix(a, a))
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
        assert abs(iou[0, 1] - 25.0 / 100.0) < 1e-6

    def test_nms_suppresses_overlaps(self):
        boxes = jnp.array(
            [
                [0, 0, 10, 10],
                [1, 1, 11, 11],  # overlaps #0
                [50, 50, 60, 60],  # separate
                [0, 0, 0, 0],  # padding
            ],
            jnp.float32,
        )
        scores = jnp.array([0.9, 0.8, 0.7, 0.0])
        idx, valid = nms_padded(boxes, scores, 0.3, 4)
        kept = [int(i) for i, v in zip(idx, valid) if v]
        assert kept == [0, 2]

    def test_nms_keeps_all_when_disjoint(self):
        boxes = jnp.array(
            [[0, 0, 5, 5], [10, 10, 15, 15], [20, 20, 25, 25]], jnp.float32
        )
        scores = jnp.array([0.5, 0.9, 0.7])
        idx, valid = nms_padded(boxes, scores, 0.3, 3)
        assert valid.all()
        assert [int(i) for i in idx] == [1, 2, 0]  # score order


class TestAnchors:
    def test_anchor_count(self):
        a = anchor_centers(128)
        assert a.shape == ((128 // 8) ** 2 * 2 + (128 // 16) ** 2 * 6, 3)

    def test_assignment_covers_every_gt(self, rng):
        anchors = jnp.asarray(anchor_centers(128))
        gt_boxes = jnp.asarray(
            np.array(
                [[10, 10, 50, 60], [70, 70, 120, 125]]
                + [[0, 0, 0, 0]] * (MAX_GT - 2),
                np.float32,
            )
        )
        gt_lms = jnp.zeros((MAX_GT, 5, 2))
        gt_valid = jnp.asarray([True, True] + [False] * (MAX_GT - 2))
        t = assign_targets(anchors, gt_boxes, gt_lms, gt_valid)
        assert int(t["pos"].sum()) >= 2  # every GT has ≥1 positive
        # no positives for padding-only image
        t0 = assign_targets(
            anchors, gt_boxes, gt_lms, jnp.zeros((MAX_GT,), bool)
        )
        assert int(t0["pos"].sum()) == 0


class TestDetectorNet:
    def test_forward_shape(self):
        net = BlazeFaceNet()
        x = jnp.zeros((2, 128, 128, 3))
        v = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(v, x)
        a = anchor_centers(128)
        assert out.shape == (2, len(a), 15)

    def test_detect_faces_shapes(self, rng):
        a = jnp.asarray(anchor_centers(128))
        raw = jnp.asarray(rng.normal(size=(len(a), 15)).astype(np.float32))
        boxes, lms, scores, valid = detect_faces(raw, a, 0.3, 128, 8)
        assert boxes.shape == (8, 4)
        assert lms.shape == (8, 5, 2)
        assert scores.shape == valid.shape == (8,)


@pytest.mark.slow
class TestSyntheticTraining:
    def test_learns_to_detect(self, rng):
        cfg = DetectorTrainConfig(input_size=64, batch_size=16, steps=150, lr=2e-3)
        variables, history = train_detector_synthetic(cfg, log_every=50)
        assert history[-1]["loss"] < history[0]["loss"] * 0.5

        det = FaceDetector(
            input_size=64,
            weights=variables,
            confidence_threshold=0.35,
            min_face_size=4,
        )
        test_rng = np.random.default_rng(123)
        imgs, gb, gl, gv = synthetic_face_batch(test_rng, 24, 64, p_face=1.0)
        hits, center_ok = 0, 0
        for i in range(len(imgs)):
            d = det.detect(imgs[i].astype(np.uint8))
            if d is None:
                continue
            hits += 1
            bx = d["bbox"]
            gcx = (gb[i, 0, 0] + gb[i, 0, 2]) / 2
            gcy = (gb[i, 0, 1] + gb[i, 0, 3]) / 2
            if bx[0] - 12 <= gcx <= bx[2] + 12 and bx[1] - 12 <= gcy <= bx[3] + 12:
                center_ok += 1
        assert hits >= 16, f"only {hits}/24 detections"
        assert center_ok >= hits * 0.7
