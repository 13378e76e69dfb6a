"""Web app: framework-free WSGI rebuild of the reference Flask app.

Route parity with reference web_app.py (1246 LoC):
- ``GET/POST /``                 single-image recognition, multi-model compare
                                 + Grad-CAM overlays (web_app.py:707-824)
- ``GET/POST /batch``            multi-upload batch recognition (:827-892)
- ``GET /realtime``              realtime page (:1056)
- ``GET /video_feed``            MJPEG stream (:1062-1066)
- ``GET /realtime_result``       latest recognition JSON (:1069-1078)
- ``POST /stop_camera``          (:1081)
- ``POST /set_realtime_model``   (:1084-1093)
- ``POST /video``                offline video recognition (framework-plus:
                                 the reference has no file playback)
- ``GET /database-builder``      builder page (:1096)
- ``POST /database-builder/build``          (:1129-1205)
- ``GET /database-builder/status/<job_id>`` (:1208-1214)
- ``GET /database-builder/download/<path>`` with path-prefix guard (:1217-1242)

Differences by design: engines are constructed once and every recognition
runs through the batched jitted pipeline — the reference builds a fresh
MTCNN per request (web_app.py:356,408,461) and loops recognize() per upload.
No Flask dependency: plain WSGI + stdlib server (`python -m
facerecognition_tpu.apps.web_app`).
"""

from __future__ import annotations

import base64
import html
import io
import json
import mimetypes
import os
import re
import threading
import time
from email.parser import BytesParser
from email.policy import HTTP
from typing import Any, Callable, Optional
from urllib.parse import parse_qs

import numpy as np


def esc(v) -> str:
    """HTML-escape user-controlled strings (filenames, identities,
    messages) before interpolating into response markup."""
    return html.escape(str(v), quote=True)


# ---------------------------------------------------------------------------
# Engine registry (lazy singletons — reference web_app.py:128-339)
# ---------------------------------------------------------------------------


class EngineRegistry:
    def __init__(
        self,
        arcface_ckpt: Optional[str] = None,
        facenet_ckpt: Optional[str] = None,
        lbph_model_path: Optional[str] = None,
        gallery_path: Optional[str] = None,
        detector=None,
        threshold: float = 0.5,
        match_kernel: str = "auto",
    ):
        self.config = dict(
            arcface_ckpt=arcface_ckpt,
            facenet_ckpt=facenet_ckpt,
            lbph_model_path=lbph_model_path,
            gallery_path=gallery_path,
            threshold=threshold,
            match_kernel=match_kernel,
        )
        self.detector = detector
        self.lbph_label_map: dict[int, str] = {}
        self._engines: dict[str, Any] = {}
        self._lock = threading.Lock()

    def get(self, model_type: str):
        with self._lock:
            if model_type in self._engines:
                return self._engines[model_type]
            engine = self._build(model_type)
            self._engines[model_type] = engine
            return engine

    def _build(self, model_type: str):
        try:
            if model_type in ("arcface", "facenet"):
                from facerecognition_tpu.inference.engine import (
                    Gallery,
                    RecognitionEngine,
                )

                ckpt = self.config[f"{model_type}_ckpt"]
                if not ckpt:
                    # Ship-with-repo trained checkpoints (synthetic-identity
                    # curriculum: training/train_synthid.py for ArcFace,
                    # training/train_facenet.py for FaceNet) so the app
                    # serves real weights out of the box. ArcFace resolves
                    # through the package-wide default (slim-9k preferred).
                    from facerecognition_tpu.inference.extract_embeddings import (  # noqa: E501
                        default_arcface_checkpoint,
                        default_facenet_checkpoint,
                    )

                    ckpt = (
                        default_arcface_checkpoint()
                        if model_type == "arcface"
                        else default_facenet_checkpoint()
                    )
                if not ckpt or not os.path.exists(ckpt):
                    # No trained weights configured → degrade to the
                    # reference's "Model not loaded" instead of serving
                    # confident-looking identities from a random-init net.
                    return None
                engine = RecognitionEngine(
                    model_type=model_type,
                    checkpoint_path=ckpt,
                    threshold=self.config["threshold"],
                    detector=self.detector,
                    match_kernel=self.config.get("match_kernel", "auto"),
                )
                gp = self.config["gallery_path"]
                if gp and os.path.exists(gp):
                    engine.gallery = Gallery.load(gp)
                return engine
            if model_type == "lbph":
                from facerecognition_tpu.models.lbph import LBPHModel

                path = self.config["lbph_model_path"]
                if path and os.path.exists(path):
                    model = LBPHModel.load(path)
                    # train_lbph writes label_map.npy next to the model —
                    # load it so the UI shows names, not numeric labels
                    # (reference behavior).
                    lm_path = os.path.join(
                        os.path.dirname(os.path.abspath(path)),
                        "label_map.npy",
                    )
                    if os.path.exists(lm_path):
                        raw = np.load(lm_path, allow_pickle=True)
                        # Saved as a {int: name} dict (train_lbph.py:178).
                        items = (
                            raw.item().items()
                            if raw.ndim == 0
                            else enumerate(raw.tolist())
                        )
                        self.lbph_label_map = {
                            int(k): str(v) for k, v in items
                        }
                    return model
                return None
        except (OSError, ValueError):
            return None  # degrade like the reference ("Model not loaded")
        return None


# ---------------------------------------------------------------------------
# Request helpers
# ---------------------------------------------------------------------------


def _content_length(environ) -> int:
    """Tolerant Content-Length: malformed headers read as 0, not a 500."""
    try:
        return int(environ.get("CONTENT_LENGTH") or 0)
    except (TypeError, ValueError):
        return 0


def _parse_multipart(environ) -> dict[str, list]:
    """Minimal multipart/form-data parser on the stdlib email machinery."""
    ctype = environ.get("CONTENT_TYPE", "")
    body = environ["wsgi.input"].read(_content_length(environ))
    if not ctype.startswith("multipart/form-data"):
        return {
            k: [v[-1]] for k, v in parse_qs(body.decode(errors="ignore")).items()
        }
    msg = BytesParser(policy=HTTP).parsebytes(
        b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body
    )
    fields: dict[str, list] = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        filename = part.get_filename()
        payload = part.get_payload(decode=True)
        if filename:
            fields.setdefault(name, []).append(
                {"filename": filename, "data": payload}
            )
        else:
            fields.setdefault(name, []).append(
                (payload or b"").decode(errors="ignore")
            )
    return fields


def _decode_image(data: bytes) -> Optional[np.ndarray]:
    """Decode an uploaded image to RGB uint8.

    Hot serving path: the native libjpeg/libpng decoder (native/decode.cpp
    via data.native_decode.decode_mem) handles JPEG/PNG without PIL's
    object overhead — the serving load bench is host-decode-bound. PIL
    remains the fallback for other formats (GIF/BMP/WebP) and when the
    native library can't be built.
    """
    try:
        from facerecognition_tpu.data import native_decode

        if native_decode.available():
            img = native_decode.decode_mem(data)
            if img is not None:
                return img
    except Exception:
        pass
    from PIL import Image

    try:
        with Image.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"))
    except OSError:
        return None


def _b64_png(rgb: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(rgb, np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


# ---------------------------------------------------------------------------
# Recognition wrappers (reference recognize_with_<model>, web_app.py:492-701)
# ---------------------------------------------------------------------------


def recognize_with_model(registry: EngineRegistry, model_type: str, image: np.ndarray) -> dict:
    engine = registry.get(model_type)
    if engine is None:
        return {"model": model_type, "status": "error", "message": "Model not loaded"}
    t0 = time.perf_counter()
    if model_type == "lbph":
        import jax.numpy as jnp

        from facerecognition_tpu.ops.image import bilinear_resize, rgb_to_grayscale

        gray = np.asarray(rgb_to_grayscale(jnp.asarray(image.astype(np.float32))))
        size = 100
        gray = np.asarray(bilinear_resize(jnp.asarray(gray), size, size))
        label, conf = engine.predict(gray)
        topk = engine.predict_topk(gray, k=5)
        lm = registry.lbph_label_map  # numeric label → name when available
        name = lambda l: lm.get(int(l), str(l))  # noqa: E731
        result = {
            "model": model_type,
            "status": "success",
            "identity": name(label) if label >= 0 else "Unknown",
            "confidence": conf,  # LBPH: distance, lower = better
            "top_k": [(name(l), d) for l, d in topk],
        }
    else:
        faces = None
        if getattr(engine, "detector", None) is not None:
            # ONE recognize_all pass serves both the per-face drawing list
            # (reference web_app.py:40-81) and the headline identity — the
            # staged path would otherwise run detect→align→embed→match
            # twice per request.
            try:
                faces = engine.recognize_all(image)["faces"]
            except (ValueError, RuntimeError):
                faces = None
        if faces:
            # Headline face mirrors detect() select_largest semantics.
            best = (
                max(
                    faces,
                    key=lambda f: (f["bbox"][2] - f["bbox"][0])
                    * (f["bbox"][3] - f["bbox"][1]),
                )
                if engine.detector.select_largest
                else faces[0]
            )
            result = {
                "model": model_type,
                "status": "success",
                "identity": best["identity"],
                "confidence": float(best["confidence"]),
                "top_k": [(n, float(s)) for n, s in best.get("top_k", [])],
                "faces": [
                    {
                        "identity": f["identity"],
                        "confidence": float(f["confidence"]),
                        "bbox": [float(v) for v in f["bbox"]],
                        "det_score": f["det_score"],
                    }
                    for f in faces
                ],
            }
        else:
            # No detections (or no detector): the staged recognize() keeps
            # the reference's crop→resize fallback chain.
            res = engine.recognize(image)
            result = {
                "model": model_type,
                "status": res["status"],
                "identity": res["identity"],
                "confidence": res["confidence"],
                "top_k": [(n, float(s)) for n, s in res.get("top_k", [])],
            }
            if res.get("message"):
                result["message"] = res["message"]
    result["time_ms"] = (time.perf_counter() - t0) * 1e3
    return result


def draw_faces(image: np.ndarray, faces: list[dict]) -> np.ndarray:
    """Annotate every detected face: box + identity label (the reference's
    draw_face_bbox, web_app.py:40-81 — green known, orange Unknown)."""
    import cv2

    out = np.ascontiguousarray(image[..., ::-1])  # RGB→BGR for cv2 colors
    t = max(2, image.shape[1] // 320)
    for f in faces:
        x1, y1, x2, y2 = (int(round(v)) for v in f["bbox"])
        known = f["identity"] not in ("Unknown", "No face", "No database")
        color = (111, 181, 63) if known else (59, 164, 224)  # BGR ok/warn
        cv2.rectangle(out, (x1, y1), (x2, y2), color, t)
        label = f"{f['identity']} {f['confidence']:.2f}"
        (tw, th), _ = cv2.getTextSize(
            label, cv2.FONT_HERSHEY_SIMPLEX, 0.5 * t, t
        )
        ty = y1 - 4 * t if y1 - th - 6 * t > 0 else y2 + th + 4 * t
        cv2.rectangle(
            out, (x1, ty - th - 2 * t), (x1 + tw + 2 * t, ty + 2 * t), color, -1
        )
        cv2.putText(
            out, label, (x1 + t, ty), cv2.FONT_HERSHEY_SIMPLEX,
            0.5 * t, (15, 17, 21), t, cv2.LINE_AA,
        )
    return out[..., ::-1]


def gradcam_overlays(registry: EngineRegistry, image: np.ndarray) -> dict[str, str]:
    """ArcFace Grad-CAM + FaceNet activation-CAM overlays as base64 PNG
    (reference web_app.py:780-804)."""
    out = {}
    try:
        from facerecognition_tpu.inference.explainability import (
            ExplainabilityEngine,
            FaceNetExplainabilityEngine,
        )

        # Cache the explainability engines on the registry: constructing
        # them per request would rebuild (and re-trace) the jitted grad
        # closures every time.
        cache = getattr(registry, "_explain_cache", None)
        if cache is None:
            cache = registry._explain_cache = {}
        arc = registry.get("arcface")
        if arc is not None:
            if "arcface" not in cache:
                cache["arcface"] = ExplainabilityEngine(
                    arc.embedder, registry.detector
                )
            r = cache["arcface"].explain(image)
            if r is not None:
                out["arcface"] = _b64_png(r["overlay"])
        fn = registry.get("facenet")
        if fn is not None:
            if "facenet" not in cache:
                cache["facenet"] = FaceNetExplainabilityEngine(
                    fn.embedder, registry.detector
                )
            r = cache["facenet"].explain(image)
            if r is not None:
                out["facenet"] = _b64_png(r["overlay"])
    except (ValueError, RuntimeError):
        pass
    return out


# ---------------------------------------------------------------------------
# Templates + static assets (reference templates/ + static/, 4,670 LoC UI)
# ---------------------------------------------------------------------------

_APP_DIR = os.path.dirname(os.path.abspath(__file__))
TEMPLATES_DIR = os.path.join(_APP_DIR, "templates")
STATIC_DIR = os.path.join(_APP_DIR, "static")

_TOKEN_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")
_template_cache: dict[str, tuple[int, str]] = {}


def _load_template(name: str) -> str:
    """Read a template from disk, cached by mtime (live-editable)."""
    path = os.path.join(TEMPLATES_DIR, name)
    mtime = os.stat(path).st_mtime_ns
    cached = _template_cache.get(name)
    if cached is not None and cached[0] == mtime:
        return cached[1]
    with open(path, encoding="utf-8") as f:
        text = f.read()
    _template_cache[name] = (mtime, text)
    return text


def render_template(name: str, **ctx) -> str:
    """``{{ token }}`` substitution — no logic in templates; result
    fragments are rendered in Python with esc() applied to user strings.
    Unknown tokens render empty (nav_* active markers use this)."""
    return _TOKEN_RE.sub(
        lambda m: str(ctx.get(m.group(1), "")), _load_template(name)
    )


def render_page(template: str, title: str, nav: str, **ctx) -> str:
    body = render_template(template, **ctx)
    return render_template(
        "base.html",
        title=title,
        body=body,
        **{f"nav_{nav}": 'class="active"'},
    )


# ---------------------------------------------------------------------------
# WSGI app
# ---------------------------------------------------------------------------


def create_app(
    registry: Optional[EngineRegistry] = None,
    builder=None,
    realtime=None,
    download_root: Optional[str] = None,
    max_body_bytes: int = 256 << 20,
    batcher_opts: Optional[dict] = None,
) -> Callable:
    """Build the WSGI application. All collaborators are injectable for
    testing; defaults construct the standard stack lazily."""
    from facerecognition_tpu.inference.database_builder import get_builder

    registry = registry or EngineRegistry()
    builder = builder or get_builder()
    download_root = os.path.abspath(download_root or builder.output_root)
    state = {"realtime": realtime, "realtime_model": "arcface", "batchers": {}}
    state_lock = threading.Lock()

    def get_batcher(model: str):
        """Lazy per-model MicroBatcher for the /recognize serving API.

        Engine construction (checkpoint load, seconds) runs OUTSIDE
        state_lock — registry.get has its own lock — so first-touch builds
        don't stall every other route; double-checked store keeps one
        batcher per model."""
        b = state["batchers"].get(model)
        if b is not None:
            return b
        engine = registry.get(model)
        if (
            engine is None
            or getattr(engine, "detector", None) is None
            or len(engine.gallery) == 0
        ):
            return None
        from facerecognition_tpu.apps.serving import MicroBatcher

        with state_lock:
            b = state["batchers"].get(model)
            if b is None:
                b = MicroBatcher(engine, **(batcher_opts or {}))
                state["batchers"][model] = b
            return b

    def get_realtime():
        with state_lock:
            if state["realtime"] is None:
                from facerecognition_tpu.apps.realtime import RealtimeRecognizer

                engine = registry.get(state["realtime_model"])
                state["realtime"] = RealtimeRecognizer(
                    engine, detector=registry.detector
                )
            return state["realtime"]

    def respond_json(start, payload, status="200 OK"):
        body = json.dumps(payload).encode()
        start(status, [("Content-Type", "application/json"),
                       ("Content-Length", str(len(body)))])
        return [body]

    def respond_page(start, template, title, nav, status="200 OK", **ctx):
        page = render_page(template, title, nav, **ctx).encode()
        start(status, [("Content-Type", "text/html; charset=utf-8"),
                       ("Content-Length", str(len(page)))])
        return [page]

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        method = environ.get("REQUEST_METHOD", "GET")

        # Request-size guard: _parse_multipart buffers the whole body, so an
        # unbounded upload (e.g. a multi-GB video) would take down the
        # worker before any route logic runs.
        if method == "POST" and _content_length(environ) > max_body_bytes:
            msg = (
                f"request body exceeds {max_body_bytes} byte "
                f"({max_body_bytes / (1 << 20):.0f} MB) limit"
            )
            if "text/html" in environ.get("HTTP_ACCEPT", ""):
                # Browser form posts (/, /batch) get a page, not raw JSON.
                return respond_page(
                    start_response,
                    "index.html",
                    "Upload too large",
                    "home",
                    status="413 Content Too Large",
                    threshold="0.5",
                    results=f'<div class="result"><h3>Error</h3>'
                    f"<p>{esc(msg)}</p></div>",
                )
            return respond_json(
                start_response,
                {"error": msg},
                status="413 Content Too Large",
            )

        # -- static assets (css/js) ---------------------------------------
        if path.startswith("/static/"):
            rel = path[len("/static/") :]
            full = os.path.abspath(os.path.join(STATIC_DIR, rel))
            # Path-prefix guard — same policy as the download route.
            if not full.startswith(STATIC_DIR + os.sep) or not os.path.isfile(
                full
            ):
                return respond_json(
                    start_response, {"error": "not found"}, "404 Not Found"
                )
            ctype = mimetypes.guess_type(full)[0] or "application/octet-stream"
            with open(full, "rb") as f:
                data = f.read()
            start_response(
                "200 OK",
                [
                    ("Content-Type", ctype),
                    ("Content-Length", str(len(data))),
                    ("Cache-Control", "no-cache"),
                ],
            )
            return [data]

        # -- home: single image, 3-model compare --------------------------
        if path == "/":
            if method == "GET":
                return respond_page(
                    start_response,
                    "index.html",
                    "Single image",
                    "home",
                    threshold="0.5",
                )
            fields = _parse_multipart(environ)
            files = fields.get("image", [])
            if not files or not isinstance(files[0], dict):
                return respond_json(
                    start_response, {"error": "no image uploaded"}, "400 Bad Request"
                )
            image = _decode_image(files[0]["data"])
            if image is None:
                return respond_json(
                    start_response, {"error": "invalid image"}, "400 Bad Request"
                )
            try:
                threshold = float((fields.get("threshold") or ["0.5"])[0])
            except ValueError:
                return respond_json(
                    start_response,
                    {"error": "invalid threshold"},
                    "400 Bad Request",
                )
            for m in ("arcface", "facenet"):
                eng = registry.get(m)
                if eng is not None:
                    eng.set_threshold(threshold)
            results = {
                m: recognize_with_model(registry, m, image)
                for m in ("arcface", "facenet", "lbph")
            }
            payload = {"results": results}
            if (fields.get("gradcam") or ["0"])[0] == "1":
                payload["gradcam"] = gradcam_overlays(registry, image)
            if "text/html" in environ.get("HTTP_ACCEPT", ""):
                cards = []
                for m, r in results.items():
                    ident = esc(r.get("identity", "?"))
                    cls = "id unknown" if ident in ("Unknown", "No face") else "id"
                    topk_rows = "".join(
                        f"<tr><td>{esc(n)}</td><td>{s:.4f}</td></tr>"
                        for n, s in r.get("top_k", [])[:5]
                    )
                    table = (
                        f"<table><tr><th>identity</th><th>score</th></tr>"
                        f"{topk_rows}</table>"
                        if topk_rows
                        else ""
                    )
                    msg = (
                        f"<div class=meta>{esc(r['message'])}</div>"
                        if r.get("message")
                        else ""
                    )
                    annotated = ""
                    if r.get("faces"):
                        annotated = (
                            '<br><img class=cam style="max-width:420px" '
                            f'src="data:image/png;base64,'
                            f'{_b64_png(draw_faces(image, r["faces"]))}">'
                        )
                        if len(r["faces"]) > 1:
                            face_rows = "".join(
                                f"<tr><td>{esc(f['identity'])}</td>"
                                f"<td>{f['confidence']:.4f}</td>"
                                f"<td>{f['det_score']:.2f}</td></tr>"
                                for f in r["faces"]
                            )
                            table += (
                                "<table><tr><th>face</th><th>confidence</th>"
                                f"<th>det score</th></tr>{face_rows}</table>"
                            )
                    cards.append(
                        f"<div class=result><h3>{m}</h3>"
                        f"<span class='{cls}'>{ident}</span> "
                        f"<span class=meta>confidence "
                        f"{r.get('confidence', 0):.4f} · "
                        f"{r.get('time_ms', 0):.1f} ms</span>"
                        f"{msg}{table}{annotated}</div>"
                    )
                cams = "".join(
                    f"<div class=result><h3>{m} class activation</h3>"
                    f'<img class=cam src="data:image/png;base64,{b64}"></div>'
                    for m, b64 in payload.get("gradcam", {}).items()
                )
                return respond_page(
                    start_response,
                    "index.html",
                    "Results",
                    "home",
                    threshold=esc(threshold),
                    gradcam_checked="checked" if "gradcam" in payload else "",
                    results="".join(cards) + cams,
                )
            return respond_json(start_response, payload)

        # -- batch --------------------------------------------------------
        if path == "/batch":
            if method == "GET":
                return respond_page(
                    start_response, "batch.html", "Batch", "batch"
                )
            fields = _parse_multipart(environ)
            model = (fields.get("model") or ["arcface"])[0]
            files = [
                f for f in fields.get("images", []) if isinstance(f, dict)
            ]
            images, names, failed = [], [], []
            for f in files:
                img = _decode_image(f["data"])
                if img is not None:
                    images.append(img)
                    names.append(f["filename"])
                else:
                    failed.append(f["filename"])  # report, don't drop
            engine = registry.get(model)
            if engine is None or model == "lbph":
                results = [
                    recognize_with_model(registry, model, img) for img in images
                ]
            else:
                t0 = time.perf_counter()
                batch = engine.recognize_batch(images)
                dt = (time.perf_counter() - t0) * 1e3 / max(len(images), 1)
                results = [
                    {
                        "model": model,
                        "status": r["status"],
                        "identity": r["identity"],
                        "confidence": r["confidence"],
                        "time_ms": dt,
                    }
                    for r in batch
                ]
            payload = {
                "results": [
                    {"filename": n, **r} for n, r in zip(names, results)
                ]
                + [
                    {
                        "filename": n,
                        "status": "error",
                        "identity": "?",
                        "message": "invalid image",
                    }
                    for n in failed
                ]
            }
            if "text/html" in environ.get("HTTP_ACCEPT", ""):
                rows = "".join(
                    f"<tr><td>{esc(e['filename'])}</td>"
                    f"<td>{esc(e.get('identity', '?'))}"
                    f"</td><td>{e.get('confidence', 0):.4f}</td>"
                    f"<td>{e.get('time_ms', 0):.1f}</td></tr>"
                    for e in payload["results"]
                )
                table = (
                    f"<div class=result><h3>{model} · {len(names)} images"
                    "</h3><table><tr><th>file</th><th>identity</th>"
                    f"<th>confidence</th><th>ms/img</th></tr>{rows}</table>"
                    "</div>"
                )
                return respond_page(
                    start_response,
                    "batch.html",
                    "Batch results",
                    "batch",
                    results=table,
                )
            return respond_json(start_response, payload)

        if path == "/video" and method == "POST":
            # Offline video recognition (framework-plus: the reference only
            # consumes the live camera). Multipart field 'video' + optional
            # 'model', 'every_n', 'max_frames'.
            import tempfile

            from facerecognition_tpu.apps.realtime import process_video

            fields = _parse_multipart(environ)
            files = [
                f for f in fields.get("video", []) if isinstance(f, dict)
            ]
            if not files:
                return respond_json(
                    start_response,
                    {"error": "no video file uploaded"},
                    status="400 Bad Request",
                )
            model = (fields.get("model") or ["arcface"])[0]
            if model not in ("arcface", "facenet"):
                # LBPH has no detector/batched-embedding API; every other
                # route special-cases it via recognize_with_model.
                return respond_json(
                    start_response,
                    {"error": f"model {model!r} does not support video"},
                    status="400 Bad Request",
                )
            engine = registry.get(model)
            if engine is None:
                return respond_json(
                    start_response,
                    {"error": f"model {model!r} not loaded"},
                    status="503 Service Unavailable",
                )

            def _int_field(name, default):
                raw = (fields.get(name) or [""])[0]
                try:
                    return int(raw) if str(raw).strip() else default
                except (TypeError, ValueError):
                    return None

            every_n = _int_field("every_n", 1)
            max_frames = _int_field("max_frames", 300)
            if every_n is None or max_frames is None:
                return respond_json(
                    start_response,
                    {"error": "every_n/max_frames must be integers"},
                    status="400 Bad Request",
                )
            max_frames = max(min(max_frames, 2000), 1)
            suffix = os.path.splitext(files[0]["filename"])[1] or ".mp4"
            tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
            try:
                tmp.write(files[0]["data"])
                tmp.close()
                try:
                    out = process_video(
                        engine,
                        tmp.name,
                        every_n=max(every_n, 1),
                        max_frames=max_frames,
                    )
                except FileNotFoundError:
                    return respond_json(
                        start_response,
                        {"error": "unreadable video file"},
                        status="400 Bad Request",
                    )
            finally:
                try:
                    os.unlink(tmp.name)
                except OSError:
                    pass
            counts: dict[str, int] = {}
            timeline = []
            for r in out["results"]:
                ident = r.get("identity", "?")
                counts[ident] = counts.get(ident, 0) + 1
                timeline.append(
                    {
                        "identity": ident,
                        "confidence": round(float(r.get("confidence", 0)), 4),
                    }
                )
            return respond_json(
                start_response,
                {
                    "model": model,
                    "frames": out["frames"],
                    "fps": round(out["fps"], 1),
                    "identity_counts": dict(
                        sorted(counts.items(), key=lambda kv: -kv[1])
                    ),
                    "timeline": timeline,
                },
            )

        # -- high-QPS serving API: dynamic micro-batching ------------------
        if path == "/recognize" and method == "POST":
            # Concurrent requests coalesce into one fused detect→align→
            # embed→match dispatch (apps/serving.MicroBatcher) — the
            # production serving path; the HTML routes above stay
            # request-at-a-time like the reference. Body: raw image bytes,
            # or multipart with one or MORE 'file'/'image' parts (N frames
            # per request → {'results': [...]}). Query: ?model=arcface.
            from urllib.parse import parse_qs

            q = parse_qs(environ.get("QUERY_STRING", ""))
            model = (q.get("model") or ["arcface"])[0]
            if model not in ("arcface", "facenet"):
                return respond_json(
                    start_response,
                    {"error": f"model {model!r} does not support /recognize"},
                    status="400 Bad Request",
                )
            ctype = environ.get("CONTENT_TYPE", "")
            if ctype.startswith("multipart/"):
                # EVERY 'file'/'image' part is an image: one request may
                # carry N frames, amortizing per-request host cost (accept,
                # parse, respond) over N recognitions — the batch serving
                # body (reference batch page web_app.py:827-892 is
                # HTML-only; its JSON API is single-image-per-request).
                fields = _parse_multipart(environ)
                bodies = [
                    f["data"]
                    for f in fields.get("file", []) + fields.get("image", [])
                    if isinstance(f, dict)
                ]
            else:
                bodies = [
                    environ["wsgi.input"].read(_content_length(environ))
                ]
            images = [_decode_image(d) for d in bodies]
            if not images or any(im is None for im in images):
                return respond_json(
                    start_response,
                    {"error": "no decodable image in request body"},
                    status="400 Bad Request",
                )
            batcher = get_batcher(model)
            if batcher is None:
                return respond_json(
                    start_response,
                    {
                        "error": f"model {model!r} not servable (needs a "
                        "detector and an enrolled gallery)"
                    },
                    status="503 Service Unavailable",
                )
            from facerecognition_tpu.apps.serving import OverloadedError

            try:
                many = batcher.submit_many(images)
            except OverloadedError as exc:
                # bounded-queue load shedding: tell the client to back off
                return respond_json(
                    start_response,
                    {"error": str(exc), "retry": True},
                    status="429 Too Many Requests",
                )
            except TimeoutError as exc:
                return respond_json(
                    start_response,
                    {"error": f"recognition timed out: {exc}"},
                    status="503 Service Unavailable",
                )
            except Exception as exc:
                return respond_json(
                    start_response,
                    {"error": f"recognition failed: {exc}"},
                    status="500 Internal Server Error",
                )
            def strip(res: dict) -> dict:
                out = {k: v for k, v in res.items() if k != "embedding"}
                out["faces"] = [
                    {k: v for k, v in f.items() if k != "embedding"}
                    for f in res.get("faces", [])
                ]
                return out

            if len(many) == 1:
                payload = strip(many[0])  # single-image shape, unchanged
            else:
                payload = {"results": [strip(r) for r in many],
                           "count": len(many)}
            payload["model"] = model
            payload["batching"] = batcher.stats()
            return respond_json(start_response, payload)

        # -- serving introspection ------------------------------------------
        if path in ("/stats", "/healthz") and method == "GET":
            import jax as _jax

            payload = {
                "status": "ok",
                "platform": _jax.devices()[0].platform,
                "models": {},
            }
            # loaded engines only — never trigger a build from a health poll
            for m, eng in list(registry._engines.items()):
                if eng is None or not hasattr(eng, "gallery"):
                    payload["models"][m] = {"loaded": eng is not None}
                    continue
                info = {
                    "loaded": True,
                    "gallery_size": len(eng.gallery),
                    "threshold": eng.threshold,
                    "match_kernel": getattr(eng, "match_kernel", None),
                }
                with state_lock:
                    b = state["batchers"].get(m)
                if b is not None:
                    info["batching"] = b.stats()
                payload["models"][m] = info
            return respond_json(start_response, payload)

        # -- realtime -----------------------------------------------------
        if path == "/realtime":
            return respond_page(
                start_response, "realtime.html", "Realtime", "realtime"
            )

        if path == "/video_feed":
            rt = get_realtime()
            boundary = b"--frame"

            def stream():
                for jpeg in rt.frames():
                    yield (
                        boundary
                        + b"\r\nContent-Type: image/jpeg\r\n\r\n"
                        + jpeg
                        + b"\r\n"
                    )

            start_response(
                "200 OK",
                [
                    (
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame",
                    )
                ],
            )
            return stream()

        if path == "/realtime_result":
            rt = get_realtime()
            return respond_json(start_response, rt.result)

        if path == "/stop_camera" and method == "POST":
            with state_lock:
                if state["realtime"] is not None:
                    state["realtime"].stop()
                    state["realtime"] = None
            return respond_json(start_response, {"status": "stopped"})

        if path == "/set_realtime_model" and method == "POST":
            fields = _parse_multipart(environ)
            model = (fields.get("model") or ["arcface"])[0]
            if model not in ("arcface", "facenet"):
                return respond_json(
                    start_response,
                    {"error": f"unknown model {model}"},
                    "400 Bad Request",
                )
            engine = registry.get(model)
            if engine is None:
                return respond_json(
                    start_response,
                    {"error": f"model {model} not loaded"},
                    "400 Bad Request",
                )
            with state_lock:
                state["realtime_model"] = model
                if state["realtime"] is not None:
                    state["realtime"].engine = engine
            return respond_json(start_response, {"status": "ok", "model": model})

        # -- database builder --------------------------------------------
        if path == "/database-builder":
            return respond_page(
                start_response,
                "database_builder.html",
                "Database builder",
                "builder",
            )

        if path == "/database-builder/build" and method == "POST":
            fields = _parse_multipart(environ)
            dataset_dir = (fields.get("dataset_dir") or [""])[0]
            model_type = (fields.get("model_type") or ["arcface"])[0]
            if not dataset_dir or not os.path.isdir(dataset_dir):
                return respond_json(
                    start_response,
                    {"error": f"dataset_dir not found: {dataset_dir}"},
                    "400 Bad Request",
                )
            try:
                job = builder.create_job(model_type, dataset_dir)
            except ValueError as exc:
                return respond_json(
                    start_response, {"error": str(exc)}, "400 Bad Request"
                )
            builder.start_build(job, detector=registry.detector)
            return respond_json(start_response, {"job_id": job.job_id})

        if path.startswith("/database-builder/status/"):
            job_id = path.rsplit("/", 1)[-1]
            job = builder.get_job(job_id)
            if job is None:
                return respond_json(
                    start_response, {"error": "job not found"}, "404 Not Found"
                )
            return respond_json(start_response, job.to_dict())

        if path.startswith("/database-builder/download/"):
            rel = path[len("/database-builder/download/") :]
            full = os.path.abspath(os.path.join(download_root, rel))
            if not os.path.isfile(full):
                # Jobs report output_files as root-relative/absolute paths
                # (e.g. 'databases/arcface/face_db.npy') — resolve those
                # too, still subject to the prefix guard below.
                alt = os.path.abspath(rel)
                if os.path.isfile(alt):
                    full = alt
            # Path-prefix guard (reference web_app.py:1233).
            if not full.startswith(download_root + os.sep):
                return respond_json(
                    start_response, {"error": "forbidden"}, "403 Forbidden"
                )
            if not os.path.isfile(full):
                return respond_json(
                    start_response, {"error": "not found"}, "404 Not Found"
                )
            ctype = mimetypes.guess_type(full)[0] or "application/octet-stream"
            data = open(full, "rb").read()
            start_response(
                "200 OK",
                [("Content-Type", ctype), ("Content-Length", str(len(data)))],
            )
            return [data]

        return respond_json(
            start_response, {"error": "not found"}, "404 Not Found"
        )

    return app


def main(argv: Optional[list[str]] = None):
    import argparse
    from wsgiref.simple_server import make_server

    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(description="FaceRecognition TPU web app")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--arcface-ckpt", default=None)
    parser.add_argument("--facenet-ckpt", default=None)
    parser.add_argument("--lbph-model", default=None)
    parser.add_argument("--gallery", default=None)
    parser.add_argument(
        "--match-kernel",
        default="auto",
        choices=["auto", "dense", "pallas", "int8"],
        help="gallery match path: int8 = 4x HBM capacity (scores ±1e-3)",
    )
    parser.add_argument(
        "--warmup",
        action="store_true",
        help="pre-build engines and jit-compile before serving "
        "(first-request latency otherwise pays model init + compile)",
    )
    parser.add_argument(
        "--threads",
        type=int,
        default=1,
        help="serve with a threaded WSGI server (>1) so concurrent "
        "/recognize requests coalesce into micro-batches; 1 = the "
        "reference-style sequential server",
    )
    args = parser.parse_args(argv)
    # The detector is first-class app wiring: without it recognize_all /
    # multi-face drawing / realtime fused serving / aligned Grad-CAM all
    # silently degrade to whole-image embedding.
    try:
        from facerecognition_tpu.preprocessing.face_detector import (
            FaceDetector,
        )

        detector = FaceDetector(confidence_threshold=0.5)
    except Exception as exc:  # degrade loudly, not fatally
        print(f"warning: face detector unavailable ({exc})")
        detector = None
    registry = EngineRegistry(
        arcface_ckpt=args.arcface_ckpt,
        facenet_ckpt=args.facenet_ckpt,
        lbph_model_path=args.lbph_model,
        gallery_path=args.gallery,
        detector=detector,
        match_kernel=args.match_kernel,
    )
    app = create_app(registry)
    if args.warmup:
        import numpy as _np

        for m in ("arcface", "facenet"):
            eng = registry.get(m)
            if eng is not None:
                size = eng.embedder.config.input_size
                eng.embedder.embed_uint8(
                    _np.zeros((1, size, size, 3), _np.float32)
                )
                # Pre-compile the fused /recognize graphs for the small
                # buckets too (a cold fused compile runs minutes on TPU and
                # would eat the first requests' timeout budget). Needs an
                # enrolled gallery — matmul shape depends on it.
                if eng.detector is not None and len(eng.gallery) > 0:
                    for bucket in (1, 8):
                        eng.fused_recognize_frames(
                            _np.zeros((bucket, 256, 256, 3), _np.uint8), k=5
                        )
                    print(f"warmed {m} (incl. fused serving buckets 1/8)")
                    continue
                print(f"warmed {m}")
    if args.threads > 1:
        from socketserver import ThreadingMixIn
        from wsgiref.simple_server import WSGIServer

        class _ThreadedServer(ThreadingMixIn, WSGIServer):
            daemon_threads = True
            # socketserver's default listen backlog is 5 — a concurrent
            # client burst (the micro-batcher's whole point) gets
            # connection resets before a request is even read.
            request_queue_size = 128

        server = make_server(
            args.host, args.port, app, server_class=_ThreadedServer
        )
    else:
        server = make_server(args.host, args.port, app)
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
