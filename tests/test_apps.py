"""Database-builder job system + WSGI web app tests."""

import io
import json
import os
import time

import numpy as np
import pytest

from facerecognition_tpu.inference.database_builder import (
    BuildJob,
    DatabaseBuilder,
    get_builder,
)


def make_dataset(tmp_path, rng, n_people=2, n_imgs=2, size=64):
    from PIL import Image

    root = tmp_path / "data"
    for p in range(n_people):
        d = root / f"person{p}"
        d.mkdir(parents=True)
        for i in range(n_imgs):
            arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


class TestDatabaseBuilder:
    def test_job_lifecycle_lbph(self, tmp_path, rng):
        data = make_dataset(tmp_path, rng)
        builder = DatabaseBuilder(str(tmp_path / "out"))
        job = builder.create_job("lbph", data)
        assert job.status == "pending"
        t = builder.start_build(job)
        t.join(timeout=120)
        assert job.status == "completed", job.error
        assert job.progress == 1.0
        assert len(job.output_files) == 2
        d = job.to_dict()
        assert d["progress"] == 100.0
        assert d["elapsed_seconds"] >= 0

    def test_job_failure_captured(self, tmp_path):
        builder = DatabaseBuilder(str(tmp_path / "out"))
        job = builder.create_job("lbph", "/nonexistent/dir")
        builder.start_build(job).join(timeout=60)
        assert job.status == "failed"
        assert job.error

    def test_unknown_model_type(self, tmp_path):
        builder = DatabaseBuilder(str(tmp_path))
        with pytest.raises(ValueError):
            builder.create_job("resnet", ".")

    def test_arcface_build_with_injected_embedder(self, tmp_path, rng):
        from tests.test_engine import SmallEmbedder

        data = make_dataset(tmp_path, rng, size=112)
        builder = DatabaseBuilder(str(tmp_path / "out"))
        job = builder.create_job("arcface", data)
        builder.start_build(job, embedder=SmallEmbedder()).join(timeout=300)
        assert job.status == "completed", job.error
        db = np.load(job.output_files[0], allow_pickle=True).item()
        assert set(db) == {"person0", "person1"}

    def test_singleton(self):
        assert get_builder() is get_builder()


# ---------------------------------------------------------------------------
# WSGI client helper
# ---------------------------------------------------------------------------


class Client:
    def __init__(self, app):
        self.app = app

    def request(self, method, path, body=b"", content_type=None, accept="application/json"):
        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
            "HTTP_ACCEPT": accept,
        }
        if content_type:
            environ["CONTENT_TYPE"] = content_type
        captured = {}

        def start_response(status, headers):
            captured["status"] = status
            captured["headers"] = dict(headers)

        chunks = self.app(environ, start_response)
        data = b"".join(chunks) if not captured.get("stream") else b""
        return captured["status"], captured["headers"], data

    def get_json(self, path):
        status, headers, data = self.request("GET", path)
        return status, json.loads(data)

    def post_multipart(self, path, fields):
        boundary = "testboundary42"
        parts = []
        for name, value in fields:
            if isinstance(value, tuple):
                filename, data = value
                parts.append(
                    f'--{boundary}\r\nContent-Disposition: form-data; '
                    f'name="{name}"; filename="{filename}"\r\n'
                    f"Content-Type: application/octet-stream\r\n\r\n".encode()
                    + data
                    + b"\r\n"
                )
            else:
                parts.append(
                    f'--{boundary}\r\nContent-Disposition: form-data; '
                    f'name="{name}"\r\n\r\n{value}\r\n'.encode()
                )
        body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        status, headers, data = self.request(
            "POST",
            path,
            body,
            content_type=f"multipart/form-data; boundary={boundary}",
        )
        try:
            return status, json.loads(data)
        except json.JSONDecodeError:
            return status, data


def png_bytes(rng, size=112):
    from PIL import Image

    buf = io.BytesIO()
    arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    Image.fromarray(arr).save(buf, format="PNG")
    return arr, buf.getvalue()


@pytest.fixture(scope="module")
def app_and_registry(tmp_path_factory):
    from tests.test_engine import SmallEmbedder
    from facerecognition_tpu.apps.web_app import EngineRegistry, create_app
    from facerecognition_tpu.inference.database_builder import DatabaseBuilder
    from facerecognition_tpu.inference.engine import RecognitionEngine

    registry = EngineRegistry()
    # Inject a prebuilt arcface engine; facenet/lbph stay unloaded.
    engine = RecognitionEngine(embedder=SmallEmbedder(), threshold=0.3)
    registry._engines["arcface"] = engine
    registry._engines["facenet"] = None
    registry._engines["lbph"] = None
    builder = DatabaseBuilder(str(tmp_path_factory.mktemp("dbs")))
    app = create_app(registry, builder=builder)
    return app, registry, engine, builder


@pytest.mark.slow
class TestWebApp:
    def test_home_get(self, app_and_registry):
        app, *_ = app_and_registry
        status, headers, data = Client(app).request("GET", "/", accept="text/html")
        assert status == "200 OK"
        assert b"<form" in data

    def test_recognize_post(self, app_and_registry, rng):
        app, registry, engine, _ = app_and_registry
        arr, png = png_bytes(rng)
        engine.add_to_db("tester", [arr])
        status, payload = Client(app).post_multipart(
            "/", [("image", ("t.png", png)), ("threshold", "0.3")]
        )
        assert status == "200 OK"
        res = payload["results"]
        assert res["arcface"]["identity"] == "tester"
        assert res["facenet"]["status"] == "error"  # model not loaded
        assert res["lbph"]["status"] == "error"
        assert res["arcface"]["time_ms"] > 0

    def test_recognize_no_image(self, app_and_registry):
        app, *_ = app_and_registry
        status, payload = Client(app).post_multipart("/", [("threshold", "0.5")])
        assert status.startswith("400")

    def test_draw_faces_annotates(self, rng):
        from facerecognition_tpu.apps.web_app import draw_faces

        img = rng.integers(0, 256, (160, 160, 3), dtype=np.uint8)
        faces = [
            {"identity": "alice", "confidence": 0.91,
             "bbox": [20, 20, 80, 80], "det_score": 0.9},
            {"identity": "Unknown", "confidence": 0.1,
             "bbox": [90, 90, 150, 150], "det_score": 0.7},
        ]
        out = draw_faces(img, faces)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert (out != img).any(), "annotation drew nothing"

    def test_batch_html_view(self, app_and_registry, rng):
        app, registry, engine, _ = app_and_registry
        # Unique image stream: the shared-seed rng would reproduce the exact
        # arrays earlier tests enrolled under other names (cosine tie).
        arr, png = png_bytes(np.random.default_rng(987123))
        engine.add_to_db("carl", [arr])
        boundary = "testboundary42"
        body = (
            f'--{boundary}\r\nContent-Disposition: form-data; name="model"'
            f"\r\n\r\narcface\r\n".encode()
            + f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="images"; filename="c.png"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n".encode()
            + png
            + f"\r\n--{boundary}--\r\n".encode()
        )
        status, headers, data = Client(app).request(
            "POST",
            "/batch",
            body,
            content_type=f"multipart/form-data; boundary={boundary}",
            accept="text/html",
        )
        assert status == "200 OK"
        assert b"<table>" in data and b"carl" in data

    def test_html_responses_escape_user_strings(self, app_and_registry, rng):
        """Reflected-XSS guard: a hostile filename must come back escaped
        in the batch HTML view."""
        app, *_ = app_and_registry
        _, png = png_bytes(np.random.default_rng(55))
        evil = '<img src=x onerror=alert(1)>.png'
        boundary = "xssb"
        body = (
            f'--{boundary}\r\nContent-Disposition: form-data; name="model"'
            f"\r\n\r\narcface\r\n".encode()
            + f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="images"; filename="{evil}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n".encode()
            + png
            + f"\r\n--{boundary}--\r\n".encode()
        )
        status, headers, data = Client(app).request(
            "POST",
            "/batch",
            body,
            content_type=f"multipart/form-data; boundary={boundary}",
            accept="text/html",
        )
        assert status == "200 OK"
        assert b"<img src=x onerror" not in data
        assert b"&lt;img" in data

    def test_batch_reports_undecodable_uploads(self, app_and_registry, rng):
        app, *_ = app_and_registry
        _, png = png_bytes(np.random.default_rng(56))
        status, payload = Client(app).post_multipart(
            "/batch",
            [
                ("model", "arcface"),
                ("images", ("ok.png", png)),
                ("images", ("broken.png", b"not an image")),
            ],
        )
        rows = {e["filename"]: e for e in payload["results"]}
        assert "broken.png" in rows
        assert rows["broken.png"]["status"] == "error"

    def test_bad_threshold_is_400(self, app_and_registry, rng):
        app, *_ = app_and_registry
        _, png = png_bytes(np.random.default_rng(57))
        status, payload = Client(app).post_multipart(
            "/", [("threshold", "abc"), ("image", ("a.png", png))]
        )
        assert status.startswith("400")

    def test_batch(self, app_and_registry, rng):
        app, registry, engine, _ = app_and_registry
        rng.integers(0, 256, 7)  # advance past test_recognize_post's draws
        arr1, png1 = png_bytes(rng)
        arr2, png2 = png_bytes(rng)
        engine.add_to_db("b1", [arr1])
        status, payload = Client(app).post_multipart(
            "/batch",
            [
                ("model", "arcface"),
                ("images", ("a.png", png1)),
                ("images", ("b.png", png2)),
            ],
        )
        assert status == "200 OK"
        assert len(payload["results"]) == 2
        assert payload["results"][0]["filename"] == "a.png"
        assert payload["results"][0]["identity"] == "b1"

    def test_builder_routes(self, app_and_registry, rng, tmp_path):
        app, *_ = app_and_registry
        c = Client(app)
        # bad dir
        status, payload = c.post_multipart(
            "/database-builder/build",
            [("dataset_dir", "/nope"), ("model_type", "lbph")],
        )
        assert status.startswith("400")
        # good dir
        data_dir = make_dataset(tmp_path, rng)
        status, payload = c.post_multipart(
            "/database-builder/build",
            [("dataset_dir", data_dir), ("model_type", "lbph")],
        )
        assert status == "200 OK"
        job_id = payload["job_id"]
        deadline = time.time() + 120
        while time.time() < deadline:
            status, s = c.get_json(f"/database-builder/status/{job_id}")
            if s["status"] in ("completed", "failed"):
                break
            time.sleep(0.5)
        assert s["status"] == "completed", s.get("error")
        # missing job
        status, _ = c.get_json("/database-builder/status/zzz")
        assert status.startswith("404")

    def test_download_job_reported_path(self, app_and_registry, rng, tmp_path):
        """Builder jobs report output_files as root-relative paths — the
        download route must serve them verbatim (it previously re-joined
        them onto the root and 404'd)."""
        app, registry, engine, builder = app_and_registry
        target = os.path.join(builder.output_root, "probe", "file.npy")
        os.makedirs(os.path.dirname(target), exist_ok=True)
        np.save(target, np.arange(3))
        status, headers, data = Client(app).request(
            "GET", "/database-builder/download/" + target
        )
        assert status == "200 OK" and len(data) > 0
        # guard still rejects escapes expressed as raw paths
        status, _, _ = Client(app).request(
            "GET", "/database-builder/download//etc/passwd"
        )
        assert status.startswith(("403", "404"))

    def test_download_path_guard(self, app_and_registry):
        app, *_ = app_and_registry
        c = Client(app)
        status, payload = c.get_json(
            "/database-builder/download/../../etc/passwd"
        )
        assert status.startswith("403") or status.startswith("404")

    def test_set_realtime_model_validation(self, app_and_registry):
        app, *_ = app_and_registry
        status, payload = Client(app).post_multipart(
            "/set_realtime_model", [("model", "nonsense")]
        )
        assert status.startswith("400")

    def test_404(self, app_and_registry):
        app, *_ = app_and_registry
        status, _ = Client(app).get_json("/nope")
        assert status.startswith("404")

    def test_oversized_body_rejected(self, rng):
        from facerecognition_tpu.apps.web_app import EngineRegistry, create_app

        app = create_app(EngineRegistry(), max_body_bytes=1024)
        status, payload = Client(app).post_multipart(
            "/", [("image", ("big.png", bytes(4096)))]
        )
        assert status.startswith("413")
        assert "limit" in payload["error"]

    def test_video_route(self, app_and_registry, tmp_path, rng):
        import cv2

        app, registry, engine, _ = app_and_registry
        engine.add_to_db(
            "vid_p", [rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)]
        )
        path = str(tmp_path / "c.avi")
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (64, 64)
        )
        for _ in range(6):
            w.write(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
        w.release()
        with open(path, "rb") as f:
            data = f.read()
        c = Client(app)
        status, out = c.post_multipart(
            "/video",
            [("video", ("c.avi", data)), ("every_n", "2"),
             ("model", "arcface")],
        )
        assert status.startswith("200")
        assert out["frames"] == 3  # 6 frames, stride 2
        assert len(out["timeline"]) == 3
        assert sum(out["identity_counts"].values()) == 3
        # error paths: no file; garbage bytes; bad ints; non-embedder model
        status, out = c.post_multipart("/video", [("model", "arcface")])
        assert status.startswith("400")
        status, out = c.post_multipart(
            "/video", [("video", ("x.mp4", b"not a video"))]
        )
        assert status.startswith("400")
        status, out = c.post_multipart(
            "/video", [("video", ("c.avi", data)), ("every_n", "")]
        )
        assert status.startswith("200")  # cleared field -> default, not 500
        status, out = c.post_multipart(
            "/video", [("video", ("c.avi", data)), ("every_n", "abc")]
        )
        assert status.startswith("400")
        status, out = c.post_multipart(
            "/video", [("video", ("c.avi", data)), ("model", "lbph")]
        )
        assert status.startswith("400")


@pytest.mark.slow
class TestRealtime:
    def test_synthetic_stream_and_result(self, rng):
        from tests.test_engine import SmallEmbedder
        from facerecognition_tpu.apps.realtime import (
            RealtimeRecognizer,
            SyntheticFrameSource,
        )
        from facerecognition_tpu.inference.engine import RecognitionEngine

        engine = RecognitionEngine(embedder=SmallEmbedder(), threshold=0.99)
        rt = RealtimeRecognizer(
            engine, source=SyntheticFrameSource(320, 240)
        )
        jpeg = rt.single_jpeg()
        assert jpeg[:2] == b"\xff\xd8"  # JPEG magic
        deadline = time.time() + 30
        while time.time() < deadline:
            if rt.result["identity"] != "...":
                break
            time.sleep(0.2)
        rt.stop()
        assert rt.result["identity"] in ("Unknown", "No face")


class TestVideoFile:
    @pytest.fixture()
    def tiny_video(self, tmp_path, rng):
        import cv2

        path = str(tmp_path / "clip.avi")
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (64, 64)
        )
        assert w.isOpened()
        # Solid-color frames: MJPG's chroma subsampling wrecks per-pixel
        # noise but preserves flat colors, so channel order stays testable.
        colors = rng.integers(30, 226, (10, 3), dtype=np.uint8)
        frames = np.broadcast_to(
            colors[:, None, None, :], (10, 64, 64, 3)
        ).copy()
        for f in frames:
            w.write(np.ascontiguousarray(f[:, :, ::-1]))  # writer takes BGR
        w.release()
        return path, frames

    def test_video_file_source_reads_rgb(self, tiny_video):
        from facerecognition_tpu.apps.realtime import VideoFileSource

        path, frames = tiny_video
        src = VideoFileSource(path)
        assert src.frame_count == 10
        first = src.read()
        src.release()
        assert first.shape == (64, 64, 3)
        # MJPG is lossy; flat colors survive, so RGB order must match
        assert np.mean(np.abs(first.astype(int) - frames[0].astype(int))) < 12
        with pytest.raises(FileNotFoundError):
            VideoFileSource("/nonexistent/clip.avi")

    def test_process_video_strided_batches(self, tiny_video, rng):
        from tests.test_engine import SmallEmbedder
        from facerecognition_tpu.apps.realtime import process_video
        from facerecognition_tpu.inference.engine import RecognitionEngine

        path, _ = tiny_video
        engine = RecognitionEngine(embedder=SmallEmbedder(), threshold=0.3)
        engine.add_to_db(
            "p0", [rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)]
        )
        seen = []
        out = process_video(
            engine,
            path,
            batch_size=4,
            every_n=2,
            on_batch=lambda done, res: seen.append((done, len(res))),
        )
        assert out["frames"] == 5  # 10 frames, stride 2
        assert len(out["results"]) == 5
        assert all(r["status"] == "success" for r in out["results"])
        assert out["fps"] > 0
        # progress callback saw the full batch then the padded tail
        assert seen == [(4, 4), (5, 1)]

    def test_process_video_max_frames(self, tiny_video):
        from tests.test_engine import SmallEmbedder
        from facerecognition_tpu.apps.realtime import process_video
        from facerecognition_tpu.inference.engine import RecognitionEngine

        path, _ = tiny_video
        engine = RecognitionEngine(embedder=SmallEmbedder())
        out = process_video(engine, path, batch_size=8, max_frames=3)
        assert out["frames"] == 3
        # degenerate args: 0-cap is empty (not 1 frame); every_n=0 raises
        out0 = process_video(engine, path, max_frames=0)
        assert out0["frames"] == 0 and out0["results"] == []
        with pytest.raises(ValueError, match="every_n"):
            process_video(engine, path, every_n=0)


class TestEngineRegistryDegradation:
    def test_missing_checkpoint_degrades_not_random(self):
        """No configured checkpoint → engine is None ('Model not loaded'),
        never a random-init net serving confident identities (ADVICE r1).
        Exception: the committed trained assets/<model>_synthid_512.msgpack
        checkpoints are picked up (trained weights, not random)."""
        import facerecognition_tpu
        from facerecognition_tpu.apps.web_app import EngineRegistry

        assets = os.path.join(
            os.path.dirname(os.path.dirname(facerecognition_tpu.__file__)),
            "assets",
        )
        reg = EngineRegistry()  # no checkpoints configured
        for model in ("arcface", "facenet"):
            shipped = os.path.join(assets, f"{model}_synthid_512.msgpack")
            if os.path.exists(shipped):
                assert reg.get(model) is not None  # shipped weights
            else:
                assert reg.get(model) is None
        reg2 = EngineRegistry(arcface_ckpt="/nonexistent/path.msgpack")
        assert reg2.get("arcface") is None


class TestStreamlitApp:
    """Drive the streamlit demo's engine path end-to-end (reference
    app/app.py:100-131) with a recording fake streamlit module — the real
    streamlit package is not in this image, so the fake executes run()'s
    actual control flow: engine construction, FACE_DB gallery load,
    threshold slider, upload decode, recognize(), result rendering."""

    @staticmethod
    def _fake_streamlit(upload_bytes, record):
        import types

        st = types.ModuleType("streamlit")
        st.title = lambda *a, **k: record.setdefault("title", a)
        st.cache_resource = lambda fn: fn
        sidebar = types.SimpleNamespace(
            write=lambda *a, **k: None,
            slider=lambda label, lo, hi, value, step: value,
        )
        st.sidebar = sidebar
        st.file_uploader = lambda *a, **k: upload_bytes
        st.image = lambda *a, **k: None
        st.error = lambda msg: record.setdefault("error", msg)
        st.subheader = lambda s: record.setdefault("identity", s)
        st.write = lambda *a, **k: None
        st.table = lambda rows: record.setdefault("table", rows)
        return st

    def test_recognize_path(self, tmp_path, monkeypatch, rng):
        import io
        import sys

        from PIL import Image

        from facerecognition_tpu.apps import streamlit_app
        from facerecognition_tpu.inference.engine import RecognitionEngine

        img = rng.integers(0, 256, (160, 160, 3)).astype("uint8")
        # Enroll through the real engine, persist the DB the app will load.
        setup = RecognitionEngine(model_type="arcface")
        assert setup.add_to_db("alice", [img])
        db_path = str(tmp_path / "face_db.npy")
        setup.gallery.save(db_path)

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        buf.seek(0)
        record = {}
        monkeypatch.setitem(
            sys.modules, "streamlit", self._fake_streamlit(buf, record)
        )
        monkeypatch.setenv("FACE_DB", db_path)
        # this test pins the no-detector recognize path (enrollment above
        # was whole-image); detector-on wiring is tested separately below
        monkeypatch.setenv("FACE_DETECTOR", "off")
        streamlit_app.run()
        assert "error" not in record, record
        assert record["identity"] == "alice"
        assert record["table"][0]["identity"] == "alice"

    def test_detector_constructed_and_consulted_by_default(
        self, tmp_path, monkeypatch, rng
    ):
        """Parity with the reference demo's detect-by-default engine
        (app/app.py:13 → recognition_engine.py:84): without FACE_DETECTOR=off
        the app must build a FaceDetector and route the upload through it."""
        import io
        import sys

        from PIL import Image

        from facerecognition_tpu.apps import streamlit_app
        from facerecognition_tpu.inference.engine import RecognitionEngine
        from facerecognition_tpu.preprocessing import face_detector as fd_mod

        calls = {"init": 0, "detect": 0}

        class FakeDetector:
            def __init__(self, *a, **k):
                calls["init"] += 1

            def detect(self, image):
                calls["detect"] += 1
                return None  # miss → engine's whole-image fallback chain

        monkeypatch.setattr(fd_mod, "FaceDetector", FakeDetector)

        img = rng.integers(0, 256, (160, 160, 3)).astype("uint8")
        setup = RecognitionEngine(model_type="arcface")
        assert setup.add_to_db("alice", [img])
        db_path = str(tmp_path / "face_db.npy")
        setup.gallery.save(db_path)

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        buf.seek(0)
        record = {}
        monkeypatch.setitem(
            sys.modules, "streamlit", self._fake_streamlit(buf, record)
        )
        monkeypatch.setenv("FACE_DB", db_path)
        monkeypatch.delenv("FACE_DETECTOR", raising=False)
        streamlit_app.run()
        assert calls["init"] == 1, "app did not construct a detector"
        assert calls["detect"] >= 1, "upload bypassed the detector"
        assert "error" not in record, record
        assert record["identity"] == "alice"  # fallback embeds whole image

    def test_empty_gallery_surfaces_error(self, tmp_path, monkeypatch, rng):
        import io
        import sys

        from PIL import Image

        from facerecognition_tpu.apps import streamlit_app

        img = rng.integers(0, 256, (160, 160, 3)).astype("uint8")
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        buf.seek(0)
        record = {}
        monkeypatch.setitem(
            sys.modules, "streamlit", self._fake_streamlit(buf, record)
        )
        monkeypatch.setenv("FACE_DB", str(tmp_path / "missing.npy"))
        monkeypatch.setenv("FACE_DETECTOR", "off")
        streamlit_app.run()
        assert "identity" not in record
        assert "error" in record


class TestWebUI:
    """The dedicated UI: on-disk templates + served static assets with the
    reference's interaction set (realtime polling, builder progress,
    templates/realtime.html:584-712, database_builder.html:844-882)."""

    def _get(self, app, path, accept="text/html"):
        import io as _io

        captured = {}

        def start(status, headers):
            captured["status"] = status
            captured["headers"] = dict(headers)

        environ = {
            "PATH_INFO": path,
            "REQUEST_METHOD": "GET",
            "HTTP_ACCEPT": accept,
            "wsgi.input": _io.BytesIO(b""),
        }
        body = b"".join(app(environ, start))
        return captured["status"], captured["headers"], body

    def test_templates_live_on_disk(self):
        from facerecognition_tpu.apps.web_app import TEMPLATES_DIR, STATIC_DIR

        for t in (
            "base.html",
            "index.html",
            "batch.html",
            "realtime.html",
            "database_builder.html",
        ):
            assert os.path.exists(os.path.join(TEMPLATES_DIR, t)), t
        for s in (
            "css/style.css",
            "js/index.js",
            "js/batch.js",
            "js/realtime.js",
            "js/builder.js",
        ):
            assert os.path.exists(os.path.join(STATIC_DIR, s)), s

    def test_pages_reference_static_assets(self, app_and_registry):
        app = app_and_registry[0]
        for path, js in (
            ("/", b"/static/js/index.js"),
            ("/batch", b"/static/js/batch.js"),
            ("/realtime", b"/static/js/realtime.js"),
            ("/database-builder", b"/static/js/builder.js"),
        ):
            status, _, body = self._get(app, path)
            assert status == "200 OK"
            assert b"/static/css/style.css" in body
            assert js in body, (path, js)
            assert b'class="active"' in body  # nav highlights current page

    def test_static_served_with_content_type(self, app_and_registry):
        app = app_and_registry[0]
        status, headers, body = self._get(app, "/static/css/style.css")
        assert status == "200 OK"
        assert headers["Content-Type"].startswith("text/css")
        assert b"--accent" in body
        status, headers, body = self._get(app, "/static/js/realtime.js")
        assert status == "200 OK"
        assert b"javascript" in headers["Content-Type"].encode()

    def test_js_drives_the_live_endpoints(self, app_and_registry):
        """The polling contract: realtime JS hits /realtime_result and
        /set_realtime_model; builder JS hits /database-builder/build and
        /database-builder/status/<id>."""
        app = app_and_registry[0]
        _, _, rt = self._get(app, "/static/js/realtime.js")
        assert b"/realtime_result" in rt
        assert b"/set_realtime_model" in rt
        assert b"/stop_camera" in rt
        _, _, bd = self._get(app, "/static/js/builder.js")
        assert b"/database-builder/build" in bd
        assert b"/database-builder/status/" in bd
        assert b"/database-builder/download/" in bd
        _, _, bj = self._get(app, "/static/js/batch.js")
        assert b"/video" in bj  # video form posts the offline-video route

    def test_static_path_traversal_guarded(self, app_and_registry):
        app = app_and_registry[0]
        status, _, _ = self._get(app, "/static/../web_app.py")
        assert status.startswith("404")
        status, _, _ = self._get(app, "/static/../../inference/engine.py")
        assert status.startswith("404")

    def test_unknown_template_token_renders_empty(self):
        from facerecognition_tpu.apps.web_app import render_template

        html = render_template("index.html", threshold="0.7")
        assert "{{" not in html
        assert 'value="0.7"' in html


# ---------------------------------------------------------------------------
# Micro-batching serving layer (apps/serving.py + POST /recognize)
# ---------------------------------------------------------------------------


class FakeFusedEngine:
    """Minimal engine surface the MicroBatcher / get_batcher consume."""

    def __init__(self, delay=0.0, fail=False):
        self.detector = object()
        self.gallery = ["a", "b", "c"]  # len() > 0 is all that's checked
        self.batch_sizes = []
        self.delay = delay
        self.fail = fail

    def fused_recognize_frames(self, frames, k=5, max_faces=1):
        if self.fail:
            raise ValueError("boom")
        if self.delay:
            time.sleep(self.delay)
        self.batch_sizes.append(len(frames))
        out = []
        for f in np.asarray(frames):
            tag = int(f[0, 0, 0])
            out.append(
                {
                    "identity": f"id{tag}",
                    "confidence": 0.9,
                    "top_k": [(f"id{tag}", 0.9)],
                    "bbox": [0, 0, 4, 4],
                    "status": "success",
                    "embedding": np.zeros(4, np.float32),
                    "faces": [
                        {
                            "identity": f"id{tag}",
                            "confidence": 0.9,
                            "top_k": [(f"id{tag}", 0.9)],
                            "bbox": [0, 0, 4, 4],
                            "det_score": 0.95,
                            "embedding": np.zeros(4, np.float32),
                        }
                    ],
                }
            )
        return out


class TestMicroBatcher:
    def _frames(self, n, size=8):
        # index encoded in pixel [0,0,0] so routing is verifiable
        return [
            np.full((size, size, 3), i, np.uint8) for i in range(n)
        ]

    def test_coalesces_and_routes_concurrent_requests(self):
        import threading as th

        from facerecognition_tpu.apps.serving import MicroBatcher

        eng = FakeFusedEngine(delay=0.05)
        mb = MicroBatcher(eng, frame_size=(8, 8), max_delay_ms=40.0)
        try:
            results = [None] * 16
            frames = self._frames(16)
            barrier = th.Barrier(16)

            def worker(i):
                barrier.wait()
                results[i] = mb.submit(frames[i])

            threads = [th.Thread(target=worker, args=(i,)) for i in range(16)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            for i, r in enumerate(results):
                assert r is not None and r["identity"] == f"id{i}", (i, r)
            s = mb.stats()
            assert s["requests"] == 16
            # 16 near-simultaneous submits against a 50ms dispatch + 40ms
            # window must coalesce well below one-dispatch-per-request
            assert s["batches"] <= 8, s
        finally:
            mb.close()

    def test_pads_to_standard_buckets(self):
        from facerecognition_tpu.apps.serving import BUCKETS, MicroBatcher

        eng = FakeFusedEngine()
        mb = MicroBatcher(eng, frame_size=(8, 8), max_delay_ms=1.0)
        try:
            for f in self._frames(3):
                mb.submit(f)
        finally:
            mb.close()
        assert eng.batch_sizes and all(
            b in BUCKETS for b in eng.batch_sizes
        ), eng.batch_sizes

    def test_resizes_to_frame_size(self):
        from facerecognition_tpu.apps.serving import MicroBatcher

        eng = FakeFusedEngine()
        mb = MicroBatcher(eng, frame_size=(8, 8), max_delay_ms=1.0)
        try:
            r = mb.submit(np.full((20, 30, 3), 5, np.uint8))
            assert r["identity"] == "id5"  # constant image survives resize
        finally:
            mb.close()

    def test_error_propagates_and_batcher_survives(self):
        from facerecognition_tpu.apps.serving import MicroBatcher

        eng = FakeFusedEngine(fail=True)
        mb = MicroBatcher(eng, frame_size=(8, 8), max_delay_ms=1.0)
        try:
            with pytest.raises(ValueError, match="boom"):
                mb.submit(self._frames(1)[0])
            eng.fail = False
            assert mb.submit(self._frames(1)[0])["identity"] == "id0"
        finally:
            mb.close()

    def test_rejects_bad_shapes_and_closed(self):
        from facerecognition_tpu.apps.serving import MicroBatcher

        mb = MicroBatcher(FakeFusedEngine(), frame_size=(8, 8))
        try:
            with pytest.raises(ValueError):
                mb.submit(np.zeros((8, 8), np.uint8))
        finally:
            mb.close()
        with pytest.raises(RuntimeError):
            mb.submit(np.zeros((8, 8, 3), np.uint8))

    def test_sheds_load_when_queue_full(self):
        import threading as th

        from facerecognition_tpu.apps.serving import (
            MicroBatcher,
            OverloadedError,
        )

        # Dispatcher busy for 0.8s per batch; queue bounded at 2. One
        # request occupies the dispatcher, then 3 more arrive: two queue,
        # the third must be shed with OverloadedError, not wait unbounded.
        eng = FakeFusedEngine(delay=0.8)
        mb = MicroBatcher(
            eng, frame_size=(8, 8), max_delay_ms=1.0, max_queue=2
        )
        try:
            ok, shed = [], []

            def worker(i):
                try:
                    ok.append(mb.submit(self._frames(8)[i]))
                except OverloadedError as e:
                    shed.append(e)

            t0 = th.Thread(target=worker, args=(0,))
            t0.start()
            time.sleep(0.3)  # dispatcher now mid-batch with frame 0
            rest = [th.Thread(target=worker, args=(i,)) for i in (1, 2, 3)]
            for t in rest:
                t.start()
            for t in [t0] + rest:
                t.join(timeout=30)
            assert len(shed) == 1, (len(ok), len(shed))
            assert len(ok) == 3
            assert mb.stats()["rejected"] == 1
        finally:
            mb.close()

    def test_stats_latency_percentiles_and_queue_depth(self):
        from facerecognition_tpu.apps.serving import MicroBatcher

        mb = MicroBatcher(FakeFusedEngine(), frame_size=(8, 8),
                          max_delay_ms=1.0)
        try:
            for f in self._frames(4):
                mb.submit(f)
            s = mb.stats()
            assert s["rejected"] == 0
            assert s["queue_depth"] == 0
            assert s["max_queue"] == 1024
            lat = s["latency_ms"]
            assert 0 <= lat["p50"] <= lat["p90"] <= lat["p99"]
            assert lat["mean"] > 0
            # dispatch duty-cycle counter: monotone seconds inside dispatches
            assert s["dispatch_s"] >= 0.0
        finally:
            mb.close()

    def test_submit_many_ordered_and_counted(self):
        from facerecognition_tpu.apps.serving import MicroBatcher

        eng = FakeFusedEngine()
        mb = MicroBatcher(eng, frame_size=(8, 8), max_delay_ms=1.0)
        try:
            results = mb.submit_many(self._frames(5))
            assert [r["identity"] for r in results] == [
                f"id{i}" for i in range(5)
            ]
            s = mb.stats()
            assert s["requests"] == 5
            assert len(mb.submit_many([])) == 0
        finally:
            mb.close()

    def test_submit_many_sheds_all_or_nothing(self):
        import threading as th

        from facerecognition_tpu.apps.serving import (
            MicroBatcher,
            OverloadedError,
        )

        # Dispatcher busy 0.8s; queue capacity 3. A 4-frame submit_many
        # must shed atomically (no partial admission), counting 4 rejects.
        eng = FakeFusedEngine(delay=0.8)
        mb = MicroBatcher(
            eng, frame_size=(8, 8), max_delay_ms=1.0, max_queue=3
        )
        try:
            t0 = th.Thread(target=lambda: mb.submit(self._frames(1)[0]))
            t0.start()
            time.sleep(0.3)  # dispatcher now mid-batch
            with pytest.raises(OverloadedError):
                mb.submit_many(self._frames(4))
            assert mb.stats()["rejected"] == 4
            # a fitting multi-submit still goes through afterwards
            t0.join(timeout=30)
            assert len(mb.submit_many(self._frames(3))) == 3
        finally:
            mb.close()


class TestRecognizeRoute:
    def _app_with_fused(self):
        from facerecognition_tpu.apps.web_app import EngineRegistry, create_app

        registry = EngineRegistry()
        eng = FakeFusedEngine()
        registry._engines["arcface"] = eng
        registry._engines["facenet"] = None
        registry._engines["lbph"] = None
        app = create_app(
            registry, batcher_opts={"frame_size": (8, 8), "max_delay_ms": 1.0}
        )
        return app, eng

    def test_recognize_route_roundtrip_raw_body(self, rng):
        app, eng = self._app_with_fused()
        _, png = png_bytes(rng, size=16)
        status, headers, data = Client(app).request(
            "POST", "/recognize", body=png, content_type="image/png"
        )
        assert status == "200 OK", data
        payload = json.loads(data)
        assert payload["status"] == "success"
        assert payload["model"] == "arcface"
        assert payload["identity"].startswith("id")
        assert "embedding" not in payload
        assert all("embedding" not in f for f in payload["faces"])
        assert payload["batching"]["requests"] >= 1

    def test_recognize_route_multipart(self, rng):
        app, eng = self._app_with_fused()
        _, png = png_bytes(rng, size=16)
        status, payload = Client(app).post_multipart(
            "/recognize", [("file", ("f.png", png))]
        )
        assert status == "200 OK"
        assert payload["status"] == "success"

    def test_recognize_route_multi_image(self):
        """N multipart image parts → one request, N ordered results."""
        from PIL import Image

        app, eng = self._app_with_fused()

        def const_png(v):
            buf = io.BytesIO()
            Image.fromarray(np.full((16, 16, 3), v, np.uint8)).save(
                buf, format="PNG"
            )
            return buf.getvalue()

        status, payload = Client(app).post_multipart(
            "/recognize",
            [("file", (f"f{v}.png", const_png(v))) for v in (3, 7, 11)],
        )
        assert status == "200 OK", payload
        assert payload["count"] == 3
        assert [r["identity"] for r in payload["results"]] == [
            "id3", "id7", "id11"
        ]
        assert all(r["status"] == "success" for r in payload["results"])
        assert all(
            "embedding" not in f
            for r in payload["results"]
            for f in r["faces"]
        )
        assert payload["batching"]["requests"] >= 3

    def test_recognize_route_multi_image_one_bad_400(self, rng):
        """Any undecodable part fails the whole request (atomic body)."""
        app, eng = self._app_with_fused()
        _, png = png_bytes(rng, size=16)
        status, payload = Client(app).post_multipart(
            "/recognize",
            [("file", ("a.png", png)), ("file", ("b.png", b"junk"))],
        )
        assert status.startswith("400"), payload

    def test_recognize_route_bad_body_400(self):
        app, eng = self._app_with_fused()
        status, _, data = Client(app).request(
            "POST", "/recognize", body=b"not an image",
            content_type="application/octet-stream",
        )
        assert status.startswith("400")

    def test_recognize_route_429_when_overloaded(self, rng):
        import threading as th

        from facerecognition_tpu.apps.web_app import EngineRegistry, create_app

        registry = EngineRegistry()
        eng = FakeFusedEngine(delay=0.8)
        registry._engines["arcface"] = eng
        app = create_app(
            registry,
            batcher_opts={
                "frame_size": (8, 8),
                "max_delay_ms": 1.0,
                "max_queue": 1,
            },
        )
        _, png = png_bytes(rng, size=16)

        statuses = []
        lock = th.Lock()

        def hit():
            status, _, _ = Client(app).request(
                "POST", "/recognize", body=png, content_type="image/png"
            )
            with lock:
                statuses.append(status)

        first = th.Thread(target=hit)
        first.start()
        time.sleep(0.3)  # dispatcher busy; queue capacity 1
        rest = [th.Thread(target=hit) for _ in range(3)]
        for t in rest:
            t.start()
        for t in [first] + rest:
            t.join(timeout=30)
        assert sum(s.startswith("429") for s in statuses) >= 1, statuses
        assert sum(s.startswith("200") for s in statuses) >= 2, statuses

    def test_recognize_route_503_when_not_servable(self, app_and_registry, rng):
        # the module fixture's engine has no detector -> degrade, not crash
        app, *_ = app_and_registry
        _, png = png_bytes(rng, size=16)
        status, _, data = Client(app).request(
            "POST", "/recognize", body=png, content_type="image/png"
        )
        assert status.startswith("503")
        assert b"not servable" in data


class TestStatsRoute:
    def test_stats_reports_models_without_building(self, app_and_registry):
        app, registry, engine, _ = app_and_registry
        status, payload = Client(app).get_json("/stats")
        assert status == "200 OK"
        assert payload["status"] == "ok"
        assert payload["models"]["arcface"]["loaded"] is True
        assert payload["models"]["arcface"]["gallery_size"] == len(
            engine.gallery
        )
        assert payload["models"]["facenet"] == {"loaded": False}

    def test_healthz_alias_and_batching_stats(self, rng):
        from facerecognition_tpu.apps.web_app import EngineRegistry, create_app

        registry = EngineRegistry()
        eng = FakeFusedEngine()
        eng.threshold = 0.5
        registry._engines["arcface"] = eng
        app = create_app(
            registry, batcher_opts={"frame_size": (8, 8), "max_delay_ms": 1.0}
        )
        _, png = png_bytes(rng, size=16)
        Client(app).request(
            "POST", "/recognize", body=png, content_type="image/png"
        )
        status, payload = Client(app).get_json("/healthz")
        assert status == "200 OK"
        assert payload["models"]["arcface"]["batching"]["requests"] >= 1
