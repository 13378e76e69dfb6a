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
        boxes, lms, scores, valid = detect_faces(raw, a, 0.3, 8)
        assert boxes.shape == (8, 4)
        assert lms.shape == (8, 5, 2)
        assert scores.shape == valid.shape == (8,)

    def test_best_face_matches_nms_top1(self, rng):
        # The argmax fast path must agree EXACTLY with greedy NMS's first
        # pick (which is by construction the score argmax) — this is the
        # contract that lets the fused bench/serving graph skip top-k+NMS
        # for the one-face-per-frame case.
        from facerecognition_tpu.models.detector_net import (
            detect_best_face,
        )

        a = jnp.asarray(anchor_centers(128))
        for seed in range(3):
            r = np.random.default_rng(seed)
            raw = jnp.asarray(r.normal(size=(len(a), 15)).astype(np.float32))
            boxes, lms, scores, valid = detect_faces(raw, a, 0.3, 4)
            bbox, blm, bscore = detect_best_face(raw, a)
            assert bool(valid[0])
            np.testing.assert_allclose(bbox, boxes[0], rtol=1e-6)
            np.testing.assert_allclose(blm, lms[0], rtol=1e-6)
            np.testing.assert_allclose(bscore, scores[0], rtol=1e-6)


class TestCurriculumRobustness:
    def test_producer_death_raises_not_hangs(self, monkeypatch):
        """A crashing scene producer must surface as an error, not an
        eternal q.get() hang."""
        import facerecognition_tpu.training.synthetic_faces as sf
        from facerecognition_tpu.training.train_detector import (
            CurriculumConfig,
            train_detector_curriculum,
        )

        def boom(*a, **k):
            raise RuntimeError("render exploded")

        monkeypatch.setattr(sf, "scene_batch", boom)
        with pytest.raises(RuntimeError, match="producer"):
            train_detector_curriculum(
                CurriculumConfig(
                    input_size=64, batch_size=4, steps=2, prefetch_threads=2
                )
            )


class TestScoreCalibration:
    def test_irls_recovers_logistic_params(self, rng):
        """fit_score_calibration's IRLS core must recover a known (a, b)
        mapping when TP/FP labels are drawn from that exact logistic."""
        from facerecognition_tpu.training.train_detector import (
            fit_score_calibration,
        )

        # Build a detector stub whose detections carry scores drawn so that
        # P(tp | z) = sigmoid(2.5 z + 1.0); bypass rendering by monkeypatch.
        true_a, true_b = 2.5, 1.0
        z = rng.normal(size=4000) * 1.5 - 1.0
        p = 1 / (1 + np.exp(-(true_a * z + true_b)))
        y = rng.random(4000) < p

        class Stub:
            input_size = 128
            confidence_threshold = 0.5
            _calibration = None
            _i = 0

            def detect_all(self, img):
                i, Stub._i = Stub._i, Stub._i + 1
                if i >= 4000:
                    return []
                s = 1 / (1 + np.exp(-z[i]))
                # TP → perfectly overlapping box; FP → far away.
                box = [10, 10, 50, 50] if y[i] else [200, 200, 240, 240]
                return [{"bbox": box, "confidence": s, "landmarks": None}]

        import facerecognition_tpu.training.train_detector as td

        orig = td.__dict__["fit_score_calibration"]

        # Patch render_scene to always put one GT at [10,10,50,50].
        import facerecognition_tpu.training.synthetic_faces as sf

        def fake_render(rng_, size, max_faces, p_face=0.8, ranges=None):
            boxes = np.zeros((4, 4), np.float32)
            boxes[0] = [10, 10, 50, 50]
            valid = np.zeros(4, bool)
            valid[0] = True
            return (
                np.zeros((size, size, 3), np.uint8),
                boxes,
                np.zeros((4, 5, 2), np.float32),
                valid,
            )

        real = sf.render_scene
        sf.render_scene = fake_render
        try:
            a, b = orig(Stub(), n_scenes=4000)
        finally:
            sf.render_scene = real
        assert abs(a - true_a) < 0.4, (a, b)
        assert abs(b - true_b) < 0.3, (a, b)

    def test_facedetector_applies_checkpoint_calibration(self, rng):
        """A 'calibration' entry in the weights dict must reshape scores:
        with a strong positive offset, raw mid scores pass a high thr."""
        net = BlazeFaceNet()
        variables = net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        raw_det = FaceDetector(
            input_size=64, weights=dict(variables), confidence_threshold=0.0,
            min_face_size=0,
        )
        raw_faces = raw_det.detect_all(img)
        cal_det = FaceDetector(
            input_size=64,
            weights={**dict(variables), "calibration": {"a": 1.0, "b": 5.0}},
            confidence_threshold=0.0,
            min_face_size=0,
        )
        assert cal_det._calibration == (1.0, 5.0)
        cal_faces = cal_det.detect_all(img)
        assert len(cal_faces) == len(raw_faces)
        for r, c in zip(raw_faces, cal_faces):
            s = np.clip(r["confidence"], 1e-9, 1 - 1e-9)
            zr = np.log(s / (1 - s))
            expect = 1 / (1 + np.exp(-(zr + 5.0)))
            assert abs(c["confidence"] - expect) < 1e-6


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


class TestDenseDetNet:
    """v3 MXU-dense backbone: same (B, A, 15) contract as BlazeFaceNet so
    anchors/decode/NMS/training are shared."""

    def test_output_contract_matches_anchors(self):
        from facerecognition_tpu.models.detector_net import (
            DenseDetNet,
            anchor_centers,
        )

        net = DenseDetNet()
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        out = net.apply(v, jnp.zeros((2, 128, 128, 3)))
        assert out.shape == (2, len(anchor_centers(128)), 15)

    def test_build_by_arch(self):
        from facerecognition_tpu.models.detector_net import (
            BlazeFaceNet,
            DenseDetNet,
            build_detector_net,
        )

        assert isinstance(build_detector_net("blaze"), BlazeFaceNet)
        assert isinstance(build_detector_net("dense"), DenseDetNet)
        with pytest.raises(ValueError, match="unknown detector arch"):
            build_detector_net("resnext")

    def test_checkpoint_arch_roundtrip(self, tmp_path):
        """FaceDetector picks the net class from the checkpoint's arch key
        (and keeps calibration handling intact)."""
        from facerecognition_tpu.models.detector_net import DenseDetNet
        from facerecognition_tpu.preprocessing.face_detector import (
            FaceDetector,
        )
        from facerecognition_tpu.utils.serialization import save_variables

        net = DenseDetNet()
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        p = str(tmp_path / "det.msgpack")
        save_variables(
            p,
            {
                "params": v["params"],
                "arch": "dense",
                "calibration": {"a": 1.5, "b": -0.2},
            },
        )
        det = FaceDetector(weights=p, confidence_threshold=0.3)
        assert det.arch == "dense"
        assert isinstance(det.net, DenseDetNet)
        assert det._calibration == (1.5, -0.2)
        img = np.random.default_rng(0).integers(0, 256, (96, 96, 3)).astype(
            np.uint8
        )
        det.detect_all(img)  # runs without shape errors

    def test_legacy_checkpoint_defaults_to_blaze(self, tmp_path):
        from facerecognition_tpu.models.detector_net import BlazeFaceNet
        from facerecognition_tpu.preprocessing.face_detector import (
            FaceDetector,
        )
        from facerecognition_tpu.utils.serialization import save_variables

        net = BlazeFaceNet()
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        p = str(tmp_path / "det.msgpack")
        save_variables(p, {"params": v["params"]})
        det = FaceDetector(weights=p)
        assert det.arch == "blaze"
        assert isinstance(det.net, BlazeFaceNet)
