"""Fused single-dispatch recognize path."""

import numpy as np
import pytest

from facerecognition_tpu.preprocessing.face_detector import FaceDetector
from facerecognition_tpu.inference.engine import RecognitionEngine
from facerecognition_tpu.training.train_detector import (
    DetectorTrainConfig,
    synthetic_face_batch,
    train_detector_synthetic,
)


@pytest.mark.slow
class TestFusedPipeline:
    @pytest.fixture(scope="class")
    def stack(self):
        from tests.test_engine import SmallEmbedder

        variables, _ = train_detector_synthetic(
            DetectorTrainConfig(
                input_size=64,
                batch_size=16,
                steps=400,
                lr=2e-3,
                max_faces_per_image=2,
            ),
            log_every=200,
        )
        detector = FaceDetector(
            input_size=64,
            weights=variables,
            confidence_threshold=0.3,
            min_face_size=4,
        )
        engine = RecognitionEngine(
            embedder=SmallEmbedder(), detector=detector, threshold=0.2
        )
        return engine, detector

    def test_fused_matches_contract(self, stack, rng):
        engine, detector = stack
        imgs, gb, gl, gv = synthetic_face_batch(rng, 4, 96, p_face=1.0)
        # enroll identities from crops of the frames themselves
        for i in range(4):
            engine.add_to_db(f"person{i}", [imgs[i].astype(np.uint8)])
        results = engine.fused_recognize_frames(imgs, k=3)
        assert len(results) == 4
        for r in results:
            assert r["status"] == "success"
            assert set(r) >= {"identity", "confidence", "top_k", "bbox"}
        # detected frames should carry a bbox and non-empty top_k
        detected = [r for r in results if r["identity"] != "No face"]
        assert detected, "fused path detected nothing"
        for r in detected:
            assert r["bbox"] is not None
            assert len(r["top_k"]) == 3

    def test_fused_applies_detector_calibration(self, stack, rng):
        """With Platt calibration on the detector, the fused path must
        threshold CALIBRATED scores like detect_all does — a strong
        positive offset turns previous 'No face' frames into detections
        at a high threshold, and reported det_scores match sigmoid(a z+b)."""
        engine, detector = stack
        imgs, gb, gl, gv = synthetic_face_batch(rng, 2, 96, p_face=1.0)
        if not len(engine.gallery):
            engine.add_to_db("cal0", [imgs[0].astype(np.uint8)])
        old_cal = detector._calibration
        old_thr = detector.confidence_threshold
        try:
            detector._calibration = None
            detector.confidence_threshold = 0.2
            raw = engine.fused_recognize_frames(imgs, k=1)
            raw_scores = [
                f["det_score"] for r in raw for f in r["faces"]
            ]
            assert raw_scores, "fixture detector found nothing"
            # calibrated: huge offset → every raw score maps to ~1.0
            detector._calibration = (1.0, 8.0)
            detector.confidence_threshold = 0.95
            cal = engine.fused_recognize_frames(imgs, k=1)
            cal_scores = [
                f["det_score"] for r in cal for f in r["faces"]
            ]
            assert len(cal_scores) >= len(raw_scores)
            for s in cal_scores:
                assert s > 0.95
        finally:
            detector._calibration = old_cal
            detector.confidence_threshold = old_thr

    def test_fused_respects_min_face_size(self, stack, rng):
        """A min_face_size larger than any face suppresses every fused
        detection (detect_all parity)."""
        engine, detector = stack
        imgs, gb, gl, gv = synthetic_face_batch(rng, 2, 96, p_face=1.0)
        if not len(engine.gallery):
            engine.add_to_db("ms0", [imgs[0].astype(np.uint8)])
        old = detector.min_face_size
        try:
            detector.min_face_size = 10_000
            res = engine.fused_recognize_frames(imgs, k=1)
            assert all(r["identity"] == "No face" for r in res)
            assert all(r["faces"] == [] for r in res)
        finally:
            detector.min_face_size = old

    def test_fused_multiface_two_identities(self, stack, rng):
        """A 2-face frame through the fused path returns 2 per-face results
        (reference web_app.py:40-81 draws every detected face)."""
        engine, detector = stack
        # Find a frame with two non-overlapping synthetic faces that the
        # fixture detector sees BOTH of (its quality bar lives in
        # test_detector; here we test the per-face fused plumbing).
        first = None
        for _ in range(12):
            frame, gb, gl, gv = synthetic_face_batch(
                rng, 1, 96, p_face=1.0, max_per_image=2
            )
            if gv[0].sum() < 2:
                continue
            if len(engine.gallery) == 0:
                engine.add_to_db("seed", [frame[0].astype(np.uint8)])
            cand = engine.fused_recognize_frames(frame, k=1, max_faces=4)[0]
            if len(cand["faces"]) >= 2:
                first = cand
                break
        assert first is not None, "no 2-face frame fully detected in 12 tries"
        # Enroll each detected face's own embedding, then re-run: every face
        # must come back as ITS identity (per-face align/embed/match works).
        for j, f in enumerate(first["faces"][:2]):
            engine.gallery.add(f"multi{j}", f["embedding"])
        res = engine.fused_recognize_frames(frame, k=2, max_faces=4)[0]
        assert res["status"] == "success"
        assert res["identity"] == res["faces"][0]["identity"]
        names = [f["identity"] for f in res["faces"][:2]]
        assert set(names) == {"multi0", "multi1"}, names
        for f in res["faces"][:2]:
            assert f["bbox"] is not None and len(f["top_k"]) == 2
            assert f["confidence"] > 0.99  # exact re-embed of the same face

    def test_fused_max_faces_default_single(self, stack, rng):
        """max_faces=1 keeps the original one-face contract + faces list."""
        engine, detector = stack
        imgs, *_ = synthetic_face_batch(rng, 2, 96, p_face=1.0)
        res = engine.fused_recognize_frames(imgs, k=1)
        assert all(len(r["faces"]) <= 1 for r in res)

    def test_fused_argmax_path_matches_nms_top_slot(self, stack, rng):
        """max_faces=1 takes the argmax decode (detect_best_face) instead of
        top-k+NMS; its result must agree with the NMS graph's first slot on
        every frame — same identity, same det score, same bbox."""
        engine, detector = stack
        imgs, *_ = synthetic_face_batch(rng, 4, 96, p_face=1.0)
        if len(engine.gallery) == 0:
            engine.add_to_db("ax0", [imgs[0].astype(np.uint8)])
        fast = engine.fused_recognize_frames(imgs, k=2, max_faces=1)
        slow = engine.fused_recognize_frames(imgs, k=2, max_faces=2)
        for rf, rs in zip(fast, slow):
            assert rf["identity"] == rs["identity"]
            if rf["bbox"] is None:
                assert rs["bbox"] is None
                continue
            np.testing.assert_allclose(rf["bbox"], rs["bbox"], rtol=1e-5)
            np.testing.assert_allclose(
                rf["faces"][0]["det_score"],
                rs["faces"][0]["det_score"],
                rtol=1e-5,
            )
            np.testing.assert_allclose(
                rf["confidence"], rs["confidence"], rtol=1e-5
            )

    def test_recognize_all_staged_multiface(self, stack, rng):
        """Staged multi-face path (arbitrary image sizes — the web upload
        route): every detected face comes back with identity+bbox."""
        engine, detector = stack
        for _ in range(12):
            frame, gb, gl, gv = synthetic_face_batch(
                rng, 1, 96, p_face=1.0, max_per_image=2
            )
            if gv[0].sum() < 2:
                continue
            res = engine.recognize_all(frame[0])
            if len(res["faces"]) >= 2:
                break
        assert res["status"] == "success"
        assert len(res["faces"]) >= 2
        # enroll each face's embedding; re-run must return those identities
        for j, f in enumerate(res["faces"][:2]):
            engine.gallery.add(f"staged{j}", f["embedding"])
        res2 = engine.recognize_all(frame[0])
        ids = [f["identity"] for f in res2["faces"][:2]]
        assert set(ids) == {"staged0", "staged1"}
        for f in res2["faces"]:
            assert len(f["bbox"]) == 4 and f["det_score"] > 0

    def test_fused_requires_gallery_and_detector(self, stack, rng):
        engine, detector = stack
        from tests.test_engine import SmallEmbedder

        bare = RecognitionEngine(embedder=SmallEmbedder())
        frames = rng.integers(0, 256, (1, 96, 96, 3)).astype(np.float32)
        with pytest.raises(ValueError, match="detector"):
            bare.fused_recognize_frames(frames)
        bare.detector = detector
        with pytest.raises(ValueError, match="gallery"):
            bare.fused_recognize_frames(frames)


@pytest.mark.slow
class TestFusedInt8Kernel:
    def test_fused_int8_matches_dense_top1(self, rng):
        """match_kernel='int8' must flow through the FUSED graph too (the
        capacity serving path), agreeing with dense on identity and within
        quantization error on score."""
        from tests.test_engine import SmallEmbedder

        variables, _ = train_detector_synthetic(
            DetectorTrainConfig(
                input_size=64, batch_size=16, steps=200, lr=2e-3
            ),
            log_every=200,
        )
        detector = FaceDetector(
            input_size=64, weights=variables,
            confidence_threshold=0.3, min_face_size=4,
        )
        embedder = SmallEmbedder()
        dense_eng = RecognitionEngine(
            embedder=embedder, detector=detector, threshold=0.2
        )
        imgs, *_ = synthetic_face_batch(rng, 4, 96, p_face=1.0)
        for i in range(4):
            dense_eng.add_to_db(f"p{i}", [imgs[i].astype(np.uint8)])
        int8_eng = RecognitionEngine(
            embedder=embedder, detector=detector, threshold=0.2,
            match_kernel="int8",
        )
        int8_eng.gallery = dense_eng.gallery
        dense = dense_eng.fused_recognize_frames(imgs, k=3)
        quant = int8_eng.fused_recognize_frames(imgs, k=3)
        assert any(r["identity"] != "No face" for r in dense)
        for a, b in zip(dense, quant):
            assert a["identity"] == b["identity"]
            if a["identity"] not in ("No face",):
                assert abs(a["confidence"] - b["confidence"]) < 2e-2
