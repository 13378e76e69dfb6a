"""Native C++ decode library: correctness vs PIL + loader integration."""

import os

import numpy as np
import pytest

from facerecognition_tpu.data import native_decode


@pytest.fixture(scope="module")
def images_on_disk(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("imgs")
    paths, arrays = [], []
    for i, (fmt, ext) in enumerate([("PNG", "png"), ("JPEG", "jpg"), ("PNG", "png")]):
        arr = rng.integers(0, 256, (100 + i * 20, 80 + i * 10, 3), dtype=np.uint8)
        p = d / f"img{i}.{ext}"
        Image.fromarray(arr).save(p, format=fmt, quality=95)
        paths.append(str(p))
        arrays.append(arr)
    return paths, arrays


@pytest.mark.skipif(not native_decode.available(), reason="native lib not built")
class TestNativeDecode:
    def test_decode_batch_matches_framework_resize(self, images_on_disk):
        """Native decode+resize must match the framework's canonical
        cv2-convention bilinear (ops.bilinear_resize), not PIL's antialiased
        downscale."""
        import jax.numpy as jnp
        from PIL import Image

        from facerecognition_tpu.ops.image import bilinear_resize

        paths, _ = images_on_disk
        out, ok = native_decode.decode_batch(paths, 64, n_threads=2)
        assert ok.all()
        assert out.shape == (3, 64, 64, 3)
        for i, p in enumerate(paths):
            with Image.open(p) as im:
                full = np.asarray(im.convert("RGB"), np.float32)
            ref = np.asarray(bilinear_resize(jnp.asarray(full), 64, 64))
            got = out[i].astype(np.float32)
            # PNG path: sub-LSB rounding only. JPEG decode itself may differ
            # slightly between libjpeg and PIL builds.
            tol = 1.0 if p.endswith(".png") else 3.0
            assert np.mean(np.abs(got - ref)) < tol, f"{p} mean diff too big"

    def test_missing_and_garbage_files(self, tmp_path, images_on_disk):
        paths, _ = images_on_disk
        garbage = tmp_path / "bad.jpg"
        garbage.write_bytes(b"this is not an image")
        out, ok = native_decode.decode_batch(
            [paths[0], "/nonexistent.jpg", str(garbage)], 32
        )
        assert ok.tolist() == [True, False, False]
        assert (out[1] == 0).all() and (out[2] == 0).all()

    def test_loader_uses_native(self, images_on_disk, tmp_path, rng):
        from PIL import Image

        from facerecognition_tpu.data import BatchLoader, FolderDataset

        root = tmp_path / "ds"
        for p in range(2):
            d = root / f"p{p}"
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(
                    rng.integers(0, 256, (90, 90, 3), dtype=np.uint8)
                ).save(d / f"{i}.jpg", quality=95)
        ds = FolderDataset(str(root))

        def sampler():
            while True:
                yield np.arange(6)

        loader = BatchLoader(ds, sampler(), image_size=48, n_workers=2)
        assert loader._native is not None
        imgs, labels = next(iter(loader))
        loader.stop()
        assert imgs.shape == (6, 48, 48, 3)
        assert imgs.any()  # actually decoded

    def test_decode_mem_parity_and_fallback(self, rng):
        """decode_mem (serving path): PNG exact, JPEG == PIL (same libjpeg),
        grayscale promoted to RGB, garbage -> None, over-cap retry works."""
        import io

        from PIL import Image

        arr = rng.integers(0, 256, (231, 317, 3), dtype=np.uint8)

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        out = native_decode.decode_mem(buf.getvalue())
        assert np.array_equal(out, arr)

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        jpg = buf.getvalue()
        out = native_decode.decode_mem(jpg)
        ref = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
        assert out.shape == ref.shape
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2

        buf = io.BytesIO()
        Image.fromarray(arr[:, :, 0]).save(buf, format="JPEG")
        assert native_decode.decode_mem(buf.getvalue()).shape == (231, 317, 3)

        assert native_decode.decode_mem(b"not an image") is None

        # Heavily compressed large flat image: decoded size >> 24x bytes,
        # exercising the exact-size retry (rc == -1) path.
        big = np.zeros((2000, 3000, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(big).save(buf, format="JPEG", quality=10)
        out = native_decode.decode_mem(buf.getvalue())
        assert out.shape == (2000, 3000, 3)

    def test_web_decode_image_uses_native(self, rng, monkeypatch):
        """web_app._decode_image prefers the native decoder and falls back
        to PIL when it declines the payload."""
        import io

        from PIL import Image

        from facerecognition_tpu.apps import web_app

        arr = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        assert np.array_equal(web_app._decode_image(buf.getvalue()), arr)

        # BMP isn't handled natively -> PIL fallback must still decode it.
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="BMP")
        assert np.array_equal(web_app._decode_image(buf.getvalue()), arr)

        assert web_app._decode_image(b"junk") is None

    def test_native_faster_than_pil(self, tmp_path, rng):
        """Throughput sanity: native batch decode beats the PIL thread pool."""
        import time

        from PIL import Image

        from facerecognition_tpu.data.loader import _load_resize

        paths = []
        for i in range(40):
            arr = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
            p = tmp_path / f"{i}.jpg"
            Image.fromarray(arr).save(p, quality=95)
            paths.append(str(p))

        native_decode.decode_batch(paths[:2], 112)  # warm
        t0 = time.perf_counter()
        out, ok = native_decode.decode_batch(paths, 112, n_threads=8)
        t_native = time.perf_counter() - t0
        assert ok.all()

        t0 = time.perf_counter()
        for p in paths:
            _load_resize(p, 112)
        t_pil = time.perf_counter() - t0
        # parallel native should beat serial PIL comfortably, but this box
        # is heavily contended — allow generous slack so the test checks
        # "same order of magnitude or better", not scheduling luck.
        assert t_native < t_pil * 1.5, (t_native, t_pil)
