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
            DetectorTrainConfig(input_size=64, batch_size=16, steps=120, lr=2e-3),
            log_every=60,
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
