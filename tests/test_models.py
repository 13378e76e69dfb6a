"""Model tests: shapes, ArcMargin math, triplet miners vs brute force."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facerecognition_tpu.models.arcface import ArcFaceModel, arc_margin_logits, freeze_mask
from facerecognition_tpu.models.facenet import (
    FaceNetModel,
    masked_triplet_loss,
    mine_batch_hard,
    mine_semi_hard,
    triplet_loss,
)


class TestArcMargin:
    def test_matches_reference_formula(self, rng):
        b, d, c = 4, 16, 10
        emb = rng.normal(size=(b, d)).astype(np.float32)
        w = rng.normal(size=(c, d)).astype(np.float32)
        labels = rng.integers(0, c, size=b)
        s, m = 64.0, 0.5
        out = np.asarray(
            arc_margin_logits(jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), s, m)
        )

        # Independent numpy transcription of the ArcFace paper formula.
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        wn = w / np.linalg.norm(w, axis=1, keepdims=True)
        cos = en @ wn.T
        sin = np.sqrt(np.clip(1 - cos**2, 1e-7, None))
        phi = cos * math.cos(m) - sin * math.sin(m)
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        phi = np.where(cos > th, phi, cos - mm)
        oh = np.eye(c)[labels]
        ref = (oh * phi + (1 - oh) * cos) * s
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_margin_penalizes_true_class(self, rng):
        emb = rng.normal(size=(3, 8)).astype(np.float32)
        w = rng.normal(size=(5, 8)).astype(np.float32)
        labels = np.array([0, 1, 2])
        with_m = np.asarray(
            arc_margin_logits(jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), 1.0, 0.5)
        )
        no_m = np.asarray(
            arc_margin_logits(jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), 1.0, 0.0)
        )
        for i, l in enumerate(labels):
            assert with_m[i, l] <= no_m[i, l] + 1e-6  # margin only hurts target
            others = [c for c in range(5) if c != l]
            np.testing.assert_allclose(with_m[i, others], no_m[i, others], atol=1e-5)


class TestArcFaceModel:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = ArcFaceModel(num_classes=10, embedding_size=512, margin=0.2)
        x = jnp.zeros((2, 112, 112, 3))
        # Init through the training branch so the margin-head params exist.
        variables = model.init(
            jax.random.PRNGKey(0), x, labels=jnp.zeros((2,), jnp.int32)
        )
        return model, variables

    def test_inference_shape(self, model_and_params):
        model, variables = model_and_params
        emb = model.apply(variables, jnp.zeros((2, 112, 112, 3)))
        assert emb.shape == (2, 512)

    def test_training_branch(self, model_and_params):
        model, variables = model_and_params
        labels = jnp.array([1, 2])
        (logits, emb), mutated = model.apply(
            variables,
            jnp.zeros((2, 112, 112, 3)),
            labels=labels,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert logits.shape == (2, 10)
        assert emb.shape == (2, 512)
        assert "batch_stats" in mutated

    def test_slim_backbone_roundtrip(self, tmp_path):
        """stage_sizes=(2,2,2,2): fewer params, same contract, and the
        checkpoint marker rebuilds the right backbone on load."""
        import numpy as np

        from facerecognition_tpu.inference.extract_embeddings import (
            load_arcface_model,
        )
        from facerecognition_tpu.utils.serialization import save_variables

        slim = ArcFaceModel(embedding_size=512, stage_sizes=(2, 2, 2, 2))
        v_slim = slim.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
        full = ArcFaceModel(embedding_size=512)
        v_full = full.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
        n = lambda v: sum(
            x.size for x in jax.tree_util.tree_leaves(v["params"])
        )
        assert n(v_slim) < 0.7 * n(v_full)
        emb = slim.apply(v_slim, jnp.zeros((2, 112, 112, 3)))
        assert emb.shape == (2, 512)

        p = str(tmp_path / "slim.msgpack")
        save_variables(
            p,
            {
                "params": v_slim["params"],
                "batch_stats": v_slim["batch_stats"],
                "stage_sizes": np.asarray((2, 2, 2, 2), np.int32),
            },
        )
        embedder = load_arcface_model(p)
        assert tuple(embedder.config.stage_sizes) == (2, 2, 2, 2)
        out = embedder.embed_uint8(np.zeros((2, 112, 112, 3), np.float32))
        assert out.shape == (2, 512) and np.isfinite(out).all()

    def test_freeze_mask(self, model_and_params):
        _, variables = model_and_params
        mask = freeze_mask(variables["params"], freeze_ratio=0.8)
        flat = jax.tree_util.tree_leaves_with_path(mask)
        frozen = [p for p, v in flat if not v]
        trainable = [p for p, v in flat if v]
        assert frozen and trainable
        # head always trainable
        assert all("backbone" in jax.tree_util.keystr(p) for p in frozen)


class TestMiners:
    def _ref_semi_hard(self, emb, labels, margin):
        """Brute-force transcription of reference mine_semi_hard_triplets
        (facenet_dataloader.py:169-235)."""
        d = np.sqrt(((emb[:, None] - emb[None, :]) ** 2).sum(-1) + 1e-16)
        triplets = set()
        b = len(emb)
        for a in range(b):
            for p in range(b):
                if p == a or labels[p] != labels[a]:
                    continue
                negs = [n for n in range(b) if labels[n] != labels[a]]
                if not negs:
                    continue
                band = [n for n in negs if d[a, p] < d[a, n] < d[a, p] + margin]
                if band:
                    n = band[int(np.argmax([d[a, x] for x in band]))]
                else:
                    n = negs[int(np.argmin([d[a, x] for x in negs]))]
                triplets.add((a, p, n))
        return triplets

    def test_semi_hard_matches_bruteforce(self, rng):
        emb = rng.normal(size=(12, 8)).astype(np.float32)
        labels = np.repeat(np.arange(3), 4)
        ai, pi, ni, valid = mine_semi_hard(jnp.asarray(emb), jnp.asarray(labels), 0.5)
        got = {
            (int(a), int(p), int(n))
            for a, p, n, v in zip(np.asarray(ai), np.asarray(pi), np.asarray(ni), np.asarray(valid))
            if v
        }
        ref = self._ref_semi_hard(emb, labels, 0.5)
        assert got == ref

    def test_batch_hard(self, rng):
        emb = rng.normal(size=(8, 4)).astype(np.float32)
        labels = np.repeat(np.arange(2), 4)
        ai, pi, ni, valid = mine_batch_hard(jnp.asarray(emb), jnp.asarray(labels))
        d = np.sqrt(((emb[:, None] - emb[None, :]) ** 2).sum(-1) + 1e-16)
        for a in range(8):
            assert valid[a]
            pos = [i for i in range(8) if labels[i] == labels[a] and i != a]
            neg = [i for i in range(8) if labels[i] != labels[a]]
            assert int(pi[a]) == pos[int(np.argmax([d[a, i] for i in pos]))]
            assert int(ni[a]) == neg[int(np.argmin([d[a, i] for i in neg]))]

    def test_triplet_loss_semantics(self, rng):
        a = rng.normal(size=(4, 8)).astype(np.float32)
        p = a + 0.01
        n = rng.normal(size=(4, 8)).astype(np.float32) * 10
        # positive much closer than negative → loss 0
        assert float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), 0.5)) == 0.0
        # degenerate: neg == pos → loss == margin
        loss = float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(p), 0.5))
        assert abs(loss - 0.5) < 1e-5

    def test_masked_loss_ignores_padding(self, rng):
        emb = rng.normal(size=(6, 4)).astype(np.float32)
        ai = jnp.array([0, 1, 2])
        pi = jnp.array([1, 2, 0])
        ni = jnp.array([3, 4, 5])
        full = masked_triplet_loss(
            jnp.asarray(emb), ai, pi, ni, jnp.array([True, True, True])
        )
        partial_valid = masked_triplet_loss(
            jnp.asarray(emb),
            jnp.concatenate([ai, jnp.array([0])]),
            jnp.concatenate([pi, jnp.array([0])]),
            jnp.concatenate([ni, jnp.array([0])]),
            jnp.array([True, True, True, False]),
        )
        np.testing.assert_allclose(float(full), float(partial_valid), rtol=1e-6)


@pytest.mark.slow
class TestFaceNetShape:
    def test_facenet_output_normalized(self):
        model = FaceNetModel(embedding_size=512)
        x = jnp.zeros((1, 160, 160, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(variables, jnp.ones((1, 160, 160, 3)) * 0.1)
        assert emb.shape == (1, 512)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5)

    def test_projection_128(self):
        model = FaceNetModel(embedding_size=128)
        x = jnp.zeros((1, 160, 160, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(variables, x)
        assert emb.shape == (1, 128)
