"""RecognitionEngine + Gallery + sharded gallery tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facerecognition_tpu.inference.engine import Gallery, RecognitionEngine
from facerecognition_tpu.inference.extract_embeddings import (
    EmbedderConfig,
    Embedder,
    build_db,
)
from facerecognition_tpu.parallel import ShardedGallery, create_mesh


class SmallEmbedder(Embedder):
    """Tiny arcface embedder (random init) for fast tests."""

    def __init__(self):
        from facerecognition_tpu.models.arcface import ArcFaceModel

        config = EmbedderConfig("arcface", 512, 112, jnp.float32)
        model = ArcFaceModel(embedding_size=512, dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
        super().__init__(config, variables)


@pytest.fixture(scope="module")
def embedder():
    return SmallEmbedder()


class TestGallery:
    def test_add_match_roundtrip(self, rng):
        g = Gallery(dim=8)
        for i in range(5):
            g.add(f"p{i}", rng.normal(size=8))
        assert len(g) == 5
        assert g.names == [f"p{i}" for i in range(5)]
        # re-add replaces
        g.add("p2", np.ones(8))
        assert len(g) == 5
        np.testing.assert_allclose(
            np.asarray(g.matrix)[2], np.ones(8) / np.sqrt(8), atol=1e-6
        )

    def test_save_load(self, rng, tmp_path):
        g = Gallery(dim=16)
        g.add("alice", rng.normal(size=16))
        g.add("bob", rng.normal(size=16))
        path = str(tmp_path / "db.npy")
        g.save(path)
        g2 = Gallery.load(path)
        assert g2.names == ["alice", "bob"]
        np.testing.assert_allclose(
            np.asarray(g.matrix), np.asarray(g2.matrix), atol=1e-6
        )

    def test_native_format_roundtrip(self, rng, tmp_path):
        g = Gallery(dim=16)
        g.add_many(
            [f"id_{i}" for i in range(100)],
            rng.normal(size=(100, 16)).astype(np.float32),
        )
        path = str(tmp_path / "gallery_native")
        g.save(path)
        import os

        assert os.path.exists(path + "/embeddings.npy")
        assert os.path.exists(path + "/names.json")
        for mmap in (False, True):
            g2 = Gallery.load(path, mmap=mmap)
            assert g2.names == g.names
            np.testing.assert_allclose(
                np.asarray(g.matrix), np.asarray(g2.matrix), atol=1e-6
            )

    def test_mmap_gallery_materializes_on_mutation(self, rng, tmp_path):
        g = Gallery(dim=8)
        g.add_many(
            [f"id_{i}" for i in range(10)],
            rng.normal(size=(10, 8)).astype(np.float32),
        )
        path = str(tmp_path / "gal")
        g.save(path)
        g2 = Gallery.load(path, mmap=True)
        assert isinstance(g2._store, np.memmap)
        g2.add("id_3", np.ones(8))  # overwrite existing row via mutation
        assert not isinstance(g2._store, np.memmap)
        np.testing.assert_allclose(
            np.asarray(g2.matrix)[3], np.ones(8) / np.sqrt(8), atol=1e-6
        )
        g3 = Gallery.load(path, mmap=True)
        assert g3.remove("id_0")
        assert len(g3) == 9

    def test_corrupt_native_gallery_rejected(self, rng, tmp_path):
        g = Gallery(dim=8)
        g.add("a", rng.normal(size=8))
        path = str(tmp_path / "gal")
        g.save(path)
        import json

        with open(path + "/names.json", "w") as f:
            json.dump(["a", "phantom"], f)
        with pytest.raises(ValueError, match="corrupt"):
            Gallery.load(path)

    def test_million_identity_roundtrip_fast(self, rng, tmp_path):
        """1M identities: flat-matrix format saves/loads in seconds (the
        pickled-dict compat format would materialize 1M python arrays)."""
        import time

        n, dim = 1_000_000, 16
        g = Gallery(dim=dim)
        g.add_many(
            np.char.add("id_", np.arange(n).astype(str)).tolist(),
            rng.normal(size=(n, dim)).astype(np.float32),
        )
        path = str(tmp_path / "big")
        t0 = time.perf_counter()
        g.save(path)
        g2 = Gallery.load(path, mmap=True)
        elapsed = time.perf_counter() - t0
        assert len(g2) == n
        assert g2.names[-1] == f"id_{n - 1}"
        np.testing.assert_allclose(
            np.asarray(g2._store[123]), np.asarray(g._matrix[123]), atol=1e-6
        )
        assert elapsed < 30, f"1M save+load took {elapsed:.1f}s"

    def test_quantized_cache_and_invalidation(self, rng):
        g = Gallery(dim=32)
        g.add_many(
            [f"id_{i}" for i in range(20)],
            rng.normal(size=(20, 32)).astype(np.float32),
        )
        q1, s1 = g.quantized()
        assert np.asarray(q1).dtype == np.int8
        assert q1.shape == (20, 32) and s1.shape == (20,)
        assert g.quantized()[0] is q1  # cached
        deq = np.asarray(q1, np.float32) * (np.asarray(s1)[:, None] / 127.0)
        np.testing.assert_allclose(deq, np.asarray(g.matrix), atol=0.01)
        g.add("new", rng.normal(size=32))
        q2, _ = g.quantized()  # mutation invalidates the cache
        assert q2 is not q1 and q2.shape == (21, 32)
        g.remove("new")
        assert g.quantized()[0].shape == (20, 32)

    def test_remove(self, rng):
        g = Gallery(dim=4)
        g.add("a", rng.normal(size=4))
        g.add("b", rng.normal(size=4))
        assert g.remove("a")
        assert not g.remove("zz")
        assert g.names == ["b"]

    def test_add_many_empty_is_noop(self, rng):
        g = Gallery(dim=8)
        g.add("keep", rng.normal(size=8))
        g.add_many([], np.zeros((0, 8), np.float32))
        assert g.names == ["keep"]

    def test_add_many_matches_sequential_add(self, rng):
        embs = rng.normal(size=(6, 8)).astype(np.float32)
        names = [f"p{i}" for i in range(6)]
        g1 = Gallery(dim=8)
        g1.add_many(names, embs)
        g2 = Gallery(dim=8)
        for n, e in zip(names, embs):
            g2.add(n, e)
        assert g1.names == g2.names
        np.testing.assert_allclose(
            np.asarray(g1.matrix), np.asarray(g2.matrix), atol=1e-6
        )

    def test_add_many_last_wins_on_duplicates(self, rng):
        g = Gallery(dim=4)
        g.add("a", np.array([1, 0, 0, 0], np.float32))
        g.add_many(
            ["a", "b", "b"],
            np.array(
                [[0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
            ),
        )
        assert g.names == ["a", "b"]
        mat = np.asarray(g.matrix)
        np.testing.assert_allclose(mat[0], [0, 1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(mat[1], [0, 0, 0, 1], atol=1e-6)

    def test_add_many_100k_fast(self, rng):
        import time

        n, d = 100_000, 64
        embs = rng.normal(size=(n, d)).astype(np.float32)
        names = [f"id_{i}" for i in range(n)]
        g = Gallery(dim=d)
        t0 = time.perf_counter()
        g.add_many(names, embs)
        elapsed = time.perf_counter() - t0
        assert len(g) == n
        assert elapsed < 5.0, f"bulk enroll took {elapsed:.1f}s"
        # spot-check a row and dict round-trip of a slice
        i = 54_321
        np.testing.assert_allclose(
            np.asarray(g.matrix)[i],
            embs[i] / np.linalg.norm(embs[i]),
            atol=1e-6,
        )
        assert g.remove("id_99999") and len(g) == n - 1

    def test_incremental_adds_after_bulk(self, rng):
        g = Gallery(dim=4)
        g.add_many(["x", "y"], rng.normal(size=(2, 4)))
        g.add("z", rng.normal(size=4))
        g.remove("x")
        assert set(g.names) == {"y", "z"}
        assert np.asarray(g.matrix).shape == (2, 4)
        d = g.to_dict()
        assert set(d) == {"y", "z"}


class TestEngine:
    def test_recognize_result_contract(self, embedder, rng):
        eng = RecognitionEngine(embedder=embedder, threshold=0.3)
        img_a = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        img_b = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        assert eng.add_to_db("alice", [img_a])
        assert eng.add_to_db("bob", [img_b])

        res = eng.recognize(img_a)
        assert set(res) >= {"identity", "confidence", "top_k", "embedding", "status"}
        assert res["status"] == "success"
        assert res["identity"] == "alice"
        assert res["confidence"] > 0.9
        assert res["top_k"][0][0] == "alice"
        assert len(res["top_k"]) == 2

    def test_unknown_below_threshold(self, embedder, rng):
        eng = RecognitionEngine(embedder=embedder, threshold=0.999)
        eng.add_to_db("alice", [rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)])
        other = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        res = eng.recognize(other)
        assert res["identity"] == "Unknown"
        assert res["status"] == "success"

    def test_no_db_error(self, embedder, rng):
        eng = RecognitionEngine(embedder=embedder)
        res = eng.recognize(rng.integers(0, 256, (112, 112, 3), dtype=np.uint8))
        assert res["status"] == "error"
        assert "database" in res["message"].lower()

    def test_missing_file_error(self, embedder):
        eng = RecognitionEngine(embedder=embedder)
        res = eng.recognize("/nonexistent/img.jpg")
        assert res["status"] == "error"

    def test_batch_matches_single(self, embedder, rng):
        eng = RecognitionEngine(embedder=embedder, threshold=0.3)
        imgs = [
            rng.integers(0, 256, (112, 112, 3), dtype=np.uint8) for _ in range(3)
        ]
        for i, img in enumerate(imgs):
            eng.add_to_db(f"p{i}", [img])
        batch = eng.recognize_batch(imgs + ["/missing.jpg"])
        assert len(batch) == 4
        for i in range(3):
            single = eng.recognize(imgs[i])
            assert batch[i]["identity"] == single["identity"] == f"p{i}"
        assert batch[3]["status"] == "error"

    def test_set_threshold(self, embedder):
        eng = RecognitionEngine(embedder=embedder)
        eng.set_threshold(0.77)
        assert eng.threshold == 0.77

    def test_int8_match_kernel(self, embedder, rng):
        eng = RecognitionEngine(
            embedder=embedder, threshold=0.3, match_kernel="int8"
        )
        imgs = {
            name: rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
            for name in ("alice", "bob", "carol")
        }
        for name, img in imgs.items():
            eng.add_to_db(name, [img])
        for name, img in imgs.items():
            res = eng.recognize(img)
            assert res["status"] == "success"
            assert res["identity"] == name
            assert res["confidence"] > 0.9
        with pytest.raises(ValueError, match="unknown match_kernel"):
            RecognitionEngine(embedder=embedder, match_kernel="fp8")


class TestBuildDb:
    def test_build_db_from_folders(self, embedder, rng, tmp_path):
        from PIL import Image

        for person in ("alice", "bob"):
            pdir = tmp_path / "data" / person
            pdir.mkdir(parents=True)
            for i in range(2):
                arr = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
                Image.fromarray(arr).save(pdir / f"{i}.png")
        out = str(tmp_path / "face_db.npy")
        db = build_db(str(tmp_path / "data"), embedder, output_path=out)
        assert set(db) == {"alice", "bob"}
        for v in db.values():
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        g = Gallery.load(out)
        assert set(g.names) == {"alice", "bob"}


class TestShardedGallery:
    def test_matches_dense_topk(self, rng):
        mesh = create_mesh(gallery=-1)  # all 8 virtual devices
        n, d = 8 * 40, 32
        mat = rng.normal(size=(n, d)).astype(np.float32)
        sg = ShardedGallery(mesh, dim=d)
        sg.set_all([f"i{k}" for k in range(n)], mat)
        q = mat[[7, 99, 250]] + 0.01 * rng.normal(size=(3, d)).astype(np.float32)
        scores, idx = sg.topk(q, k=5)

        # dense reference
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        full = qn @ norm.T
        ref_idx = np.argsort(-full, axis=1)[:, :5]
        np.testing.assert_array_equal(idx, ref_idx)

    def test_padding_masked(self, rng):
        mesh = create_mesh(gallery=-1)
        n, d = 13, 16  # not divisible by 8 → padded
        mat = rng.normal(size=(n, d)).astype(np.float32)
        sg = ShardedGallery(mesh, dim=d)
        sg.set_all([f"i{k}" for k in range(n)], mat)
        scores, idx = sg.topk(mat[:2], k=5)
        assert (idx < n).all()

    def test_padding_never_beats_negative_matches(self, rng):
        """Zero sentinel rows (cosine 0) must not evict real rows whose
        cosine to the query is NEGATIVE — the in-graph -inf mask pins
        exactness, not just index validity."""
        mesh = create_mesh(gallery=-1)
        n, d = 9, 16  # 9 rows over 8 shards → padded to 16
        base = rng.normal(size=d).astype(np.float32)
        # All gallery rows anti-aligned with the query: every true cosine < 0.
        mat = -np.abs(rng.normal(size=(n, 1))).astype(np.float32) * base
        mat += 0.01 * rng.normal(size=(n, d)).astype(np.float32)
        sg = ShardedGallery(mesh, dim=d)
        sg.set_all([f"i{k}" for k in range(n)], mat)
        scores, idx = sg.topk(base[None], k=5)
        assert (idx < n).all()
        assert (scores < 0).all(), (
            f"sentinel 0-cosine leaked into top-k: {scores}"
        )
        # Exact: matches the dense reference ranking.
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        qn = base / np.linalg.norm(base)
        ref = np.argsort(-(qn @ norm.T))[:5]
        np.testing.assert_array_equal(idx[0], ref)


    def test_int8_sharded_matches_dense_topk(self, rng):
        """Quantized sharded gallery: top-1 agrees with the dense f32
        reference on clustered data; scores within the int8 error bound;
        padding stays masked."""
        mesh = create_mesh(gallery=-1)
        d = 64
        centers = rng.normal(size=(8 * 20, d)).astype(np.float32)
        mat = centers + 0.05 * rng.normal(size=centers.shape).astype(
            np.float32
        )
        n = len(mat) - 3  # not divisible by 8 → padded
        mat = mat[:n]
        sg = ShardedGallery(mesh, dim=d, quantize=True)
        sg.set_all([f"i{k}" for k in range(n)], mat)
        assert sg._matrix is None and sg._codes is not None
        q = mat[[3, 50, 111]] + 0.02 * rng.normal(size=(3, d)).astype(
            np.float32
        )
        scores, idx = sg.topk(q, k=5)
        assert (idx < n).all()

        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        full = qn @ norm.T
        ref_idx = np.argsort(-full, axis=1)[:, :5]
        np.testing.assert_array_equal(idx[:, 0], ref_idx[:, 0])
        ref_scores = np.take_along_axis(full, idx, axis=1)
        np.testing.assert_allclose(scores, ref_scores, atol=2e-2)


class TestEmbedderBuckets:
    def test_batch_larger_than_biggest_bucket(self, embedder, rng):
        """n > 512 pads to the next multiple of 512 and round-trips."""
        from facerecognition_tpu.inference.extract_embeddings import _bucket

        assert _bucket(1) == 1 and _bucket(2) == 8
        assert _bucket(513) == 1024
        imgs = rng.integers(0, 256, (5, 112, 112, 3)).astype(np.float32)
        out5 = embedder.embed_uint8(imgs)
        out1 = embedder.embed_uint8(imgs[:1])
        assert out5.shape == (5, 512)
        np.testing.assert_allclose(out5[0], out1[0], atol=1e-4)

    def test_empty_batch(self, embedder):
        out = embedder.embed_uint8(np.zeros((0, 112, 112, 3), np.float32))
        assert out.shape == (0, 512)


class TestPaddedStoreMatching:
    def test_device_store_shape_stable_across_adds(self, rng):
        from facerecognition_tpu.inference.engine import Gallery

        g = Gallery(dim=8)
        g.add_many([f"p{i}" for i in range(10)], rng.normal(size=(10, 8)))
        mat, n = g.device_store()
        assert n == 10 and mat.shape[0] >= 10
        cap = mat.shape[0]
        g.add("p_new", rng.normal(size=8))  # within capacity
        mat2, n2 = g.device_store()
        assert n2 == 11 and mat2.shape[0] == cap, (
            "capacity add must not change the padded shape "
            f"({mat2.shape[0]} vs {cap})"
        )
        q, s, nq = g.quantized_store()
        assert nq == 11 and q.shape[0] == cap

    def test_match_never_returns_padding_or_stale_rows(self, embedder, rng):
        from facerecognition_tpu.inference.engine import RecognitionEngine

        eng = RecognitionEngine(embedder=embedder, threshold=-2.0)
        # negative-match regime: enroll embeddings anti-correlated with the
        # query so zero padding rows (cosine 0) would win if unmasked
        query = rng.normal(size=512).astype(np.float32)
        query /= np.linalg.norm(query)
        for i in range(3):
            noise = rng.normal(size=512).astype(np.float32) * 0.05
            eng.gallery.add(f"neg{i}", -query + noise)
        matches = eng.match(query[None], k=3)
        best_name, best_score, top = matches[0]
        assert best_name.startswith("neg")
        assert best_score < -0.5
        assert all(n.startswith("neg") for n, _ in top)
        # removal leaves a stale row in capacity; still never surfaced
        eng.gallery.remove("neg1")
        matches = eng.match(query[None], k=2)
        assert all(n.startswith("neg") for n, _ in matches[0][2])

    def test_match_int8_padded_parity(self, embedder, rng):
        from facerecognition_tpu.inference.engine import RecognitionEngine

        dense = RecognitionEngine(embedder=embedder, threshold=0.1)
        quant = RecognitionEngine(
            embedder=embedder, threshold=0.1, match_kernel="int8"
        )
        embs = rng.normal(size=(20, 512)).astype(np.float32)
        names = [f"id{i}" for i in range(20)]
        dense.gallery.add_many(names, embs)
        quant.gallery.add_many(names, embs)
        qs = embs[[3, 11]] + 0.01 * rng.normal(size=(2, 512)).astype(
            np.float32
        )
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        md = dense.match(qs, k=3)
        mq = quant.match(qs, k=3)
        assert [m[0] for m in md] == ["id3", "id11"]
        assert [m[0] for m in mq] == ["id3", "id11"]

    def test_incremental_device_sync_matches_host(self, rng):
        """After the padded store is shipped, adds/updates/removes sync by
        scattering only the dirty rows — device content must equal host."""
        from facerecognition_tpu.inference.engine import Gallery

        g = Gallery(dim=8)
        g.add_many([f"p{i}" for i in range(10)], rng.normal(size=(10, 8)))
        mat0, _ = g.device_store()
        q0, s0, _ = g.quantized_store()
        # in-capacity add, overwrite of an existing name, swap-remove
        g.add("p_new", rng.normal(size=8))
        g.add("p3", rng.normal(size=8))
        g.remove("p1")
        mat1, n1 = g.device_store()
        q1, s1, n1q = g.quantized_store()
        assert n1 == n1q == 10
        assert mat1.shape == mat0.shape  # same compiled-shape object class
        np.testing.assert_allclose(
            np.asarray(mat1)[:n1], g._store[:n1], rtol=0, atol=0
        )
        from facerecognition_tpu.ops.matcher import (
            quantize_embeddings_int8_np,
        )

        qh, sh = quantize_embeddings_int8_np(g._store)
        np.testing.assert_array_equal(np.asarray(q1)[:n1], qh[:n1])
        np.testing.assert_allclose(np.asarray(s1)[:n1], sh[:n1], atol=1e-7)

    def test_capacity_growth_reships_store(self, rng):
        from facerecognition_tpu.inference.engine import Gallery

        g = Gallery(dim=8)
        g.add_many([f"p{i}" for i in range(64)], rng.normal(size=(64, 8)))
        mat0, _ = g.device_store()
        g.add("overflow", rng.normal(size=8))  # forces capacity doubling
        mat1, n = g.device_store()
        assert n == 65 and mat1.shape[0] > mat0.shape[0]
        np.testing.assert_allclose(np.asarray(mat1)[:65], g._store[:65])
