"""Evaluation suite + explainability tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facerecognition_tpu.inference.evaluate import (
    cmc_curve,
    compute_metrics,
    evaluate_recognition_engine,
    generate_report,
    measure_latency_throughput,
    open_set_identification,
    roc_eer,
    threshold_sweep,
    top_k_accuracy,
)


class TestMetrics:
    def test_compute_metrics_perfect(self):
        y = np.array([0, 1, 2, 1])
        m = compute_metrics(y, y)
        assert m["accuracy"] == 1.0
        assert m["f1_macro"] == 1.0

    def test_top_k(self):
        scores = np.array([[0.9, 0.5, 0.1], [0.2, 0.3, 0.9], [0.5, 0.6, 0.4]])
        y = np.array([0, 0, 1])
        out = top_k_accuracy(scores, y, ks=(1, 2))
        assert out["top_1_accuracy"] == pytest.approx(2 / 3)
        assert out["top_2_accuracy"] == pytest.approx(2 / 3)

    def test_threshold_sweep_monotone_unknowns(self, rng):
        n = 100
        y_true = rng.integers(0, 5, n)
        y_pred = y_true.copy()
        scores = rng.uniform(0.2, 1.0, n)
        out = threshold_sweep(y_true, y_pred, scores)
        assert out["best_accuracy"]["accuracy"] >= out["sweep"][-1]["accuracy"]
        assert 0 <= out["best_f1"]["f1"] <= 1

    def test_cmc_curve(self):
        scores = np.array(
            [
                [0.9, 0.5, 0.1],  # true 0 -> rank 1
                [0.3, 0.2, 0.9],  # true 0 -> rank 2
                [0.6, 0.1, 0.5],  # true 1 -> rank 3
            ]
        )
        y = np.array([0, 0, 1])
        out = cmc_curve(scores, y, max_rank=3)
        assert out["ranks"] == [1, 2, 3]
        assert out["cmc"] == pytest.approx([1 / 3, 2 / 3, 1.0])
        assert out["rank1"] == pytest.approx(1 / 3)
        # cmc is monotone non-decreasing and rank1 == top-1 accuracy
        assert all(a <= b for a, b in zip(out["cmc"], out["cmc"][1:]))
        t1 = top_k_accuracy(scores, y, ks=(1,))["top_1_accuracy"]
        assert out["rank1"] == pytest.approx(t1)

    def test_open_set_identification(self, rng):
        """Separable genuine vs impostor scores: DIR@FAR is high; raising
        the FAR target can only raise (or keep) DIR."""
        n_known, n_unknown, c = 200, 200, 10
        y = rng.integers(0, c, n_known + n_unknown)
        scores = rng.uniform(0.0, 0.3, (n_known + n_unknown, c))
        known = np.zeros(n_known + n_unknown, bool)
        known[:n_known] = True
        # genuine probes score high on the true column
        scores[np.arange(n_known), y[:n_known]] = rng.uniform(0.7, 1.0, n_known)
        out = open_set_identification(
            scores, y, known, far_targets=(0.1, 0.01)
        )
        assert out["dir_at_far_0.1"] >= out["dir_at_far_0.01"] > 0.9
        assert out["threshold_at_far_0.01"] >= out["threshold_at_far_0.1"]
        # no unknowns -> None (no FAR can be measured)
        out2 = open_set_identification(
            scores[:n_known], y[:n_known], known[:n_known]
        )
        assert out2["dir_at_far_0.01"] is None

    def test_roc_eer_separable(self, rng):
        pos = rng.normal(0.8, 0.05, 300)
        neg = rng.normal(0.2, 0.05, 300)
        scores = np.concatenate([pos, neg])
        truth = np.concatenate([np.ones(300), np.zeros(300)])
        roc = roc_eer(truth, scores)
        assert roc["auc"] > 0.99
        assert roc["eer"] < 0.05


@pytest.mark.slow
class TestEngineEvaluation:
    def test_end_to_end_eval_and_report(self, rng, tmp_path):
        from tests.test_engine import SmallEmbedder
        from facerecognition_tpu.inference.engine import RecognitionEngine

        emb = SmallEmbedder()
        eng = RecognitionEngine(embedder=emb, threshold=0.2)
        names = [f"p{i}" for i in range(4)]
        base = {
            n: rng.integers(0, 256, (112, 112, 3), dtype=np.uint8) for n in names
        }
        for n, img in base.items():
            eng.add_to_db(n, [img])
        # test set: noisy variants
        images, labels = [], []
        for i, n in enumerate(names):
            for _ in range(3):
                noisy = np.clip(
                    base[n].astype(int) + rng.integers(-8, 8, base[n].shape),
                    0,
                    255,
                ).astype(np.uint8)
                images.append(noisy)
                labels.append(i)
        images = np.stack(images)
        labels = np.asarray(labels)

        out_dir = str(tmp_path / "eval")
        res = evaluate_recognition_engine(
            eng, images, labels, names, output_dir=out_dir
        )
        assert res["metrics"]["accuracy"] > 0.9
        assert res["top_1_accuracy"] > 0.9
        assert res["top_5_accuracy"] >= res["top_1_accuracy"]
        assert "verification" in res and res["verification"]["auc"] > 0.9
        assert os.path.exists(os.path.join(out_dir, "roc.png"))
        assert os.path.exists(os.path.join(out_dir, "confusion.png"))

        report = generate_report(res, str(tmp_path / "report.md"))
        text = open(report).read()
        assert "top_1_accuracy" in text and "AUC" in text

    def test_closed_set_accuracy_independent_of_engine_threshold(self, rng):
        """Closed-set metrics come from the RAW top-1, not the thresholded
        identity — a high engine.threshold must not zero the accuracy
        (double-thresholding bug)."""
        from tests.test_engine import SmallEmbedder
        from facerecognition_tpu.inference.engine import RecognitionEngine

        eng = RecognitionEngine(embedder=SmallEmbedder(), threshold=0.999)
        names = ["p0", "p1"]
        base = {
            n: rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
            for n in names
        }
        for n in names:
            eng.add_to_db(n, [base[n]])
        images = np.stack([base[n] for n in names])
        labels = np.arange(2)
        res = evaluate_recognition_engine(eng, images, labels, names)
        # Self-queries score ~1.0 > any threshold anyway; add noisy queries
        # that fall below 0.999 but are still top-1 correct.
        noisy = np.stack(
            [
                np.clip(
                    base[n].astype(int) + rng.integers(-30, 30, base[n].shape),
                    0,
                    255,
                ).astype(np.uint8)
                for n in names
            ]
        )
        res = evaluate_recognition_engine(
            eng, np.concatenate([images, noisy]), np.tile(labels, 2), names
        )
        assert res["metrics"]["accuracy"] == 1.0

    def test_speed_measurement(self, rng):
        from tests.test_engine import SmallEmbedder
        from facerecognition_tpu.inference.engine import RecognitionEngine

        eng = RecognitionEngine(embedder=SmallEmbedder())
        images = rng.integers(0, 256, (8, 112, 112, 3), dtype=np.uint8)
        sp = measure_latency_throughput(eng, images, batch_sizes=(1, 8))
        assert sp["avg_latency_ms"] > 0
        assert sp["max_throughput"] > 0


@pytest.mark.slow
class TestExplainability:
    def test_arcface_gradcam(self, rng):
        from facerecognition_tpu.inference.explainability import (
            ExplainabilityEngine,
            cam_to_heatmap,
            overlay_heatmap,
        )
        from tests.test_engine import SmallEmbedder

        emb = SmallEmbedder()
        engine = ExplainabilityEngine(emb)
        img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        out = engine.explain(img)
        assert out is not None
        assert out["cam"].shape == (112, 112)
        assert 0.0 <= out["cam"].min() and out["cam"].max() <= 1.0
        assert out["overlay"].shape == (112, 112, 3)
        assert out["embedding"].shape == (512,)

        # with a target embedding the CAM changes
        target = rng.normal(size=512).astype(np.float32)
        out2 = engine.explain(img, target_embedding=target)
        assert not np.allclose(out2["cam"], out["cam"])

        heat = cam_to_heatmap(out["cam"])
        assert heat.dtype == np.uint8 and heat.shape == (112, 112, 3)
        over = overlay_heatmap(img, out["cam"])
        assert over.shape == (112, 112, 3)

    def test_facenet_activation_cam(self, rng):
        from facerecognition_tpu.inference.explainability import (
            FaceNetExplainabilityEngine,
        )
        from facerecognition_tpu.inference.extract_embeddings import (
            load_facenet_model,
        )

        emb = load_facenet_model(dtype=jnp.float32)
        engine = FaceNetExplainabilityEngine(emb)
        img = rng.integers(0, 256, (160, 160, 3), dtype=np.uint8)
        out = engine.explain(img)
        assert out is not None
        assert out["cam"].shape == (160, 160)
        assert out["embedding"].shape == (512,)
