"""Realtime video pipeline: frame source → detect → embed → match → overlay.

Rebuild of the reference realtime stack (web_app.py:909-1053) without its
hot-loop pathologies: no temp-file round trips (frames go straight into the
jitted pipeline), no fresh detector per call, and the shared result is
lock-protected (the reference's ``realtime_result`` is written/read without
a lock, web_app.py:981-993 — a documented benign race we fix).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Iterator, Optional

import numpy as np


class SyntheticFrameSource:
    """Procedural frame source for environments without a camera: a moving
    synthetic face (same generator the detector trains on)."""

    def __init__(self, width: int = 640, height: int = 480, fps: float = 30.0):
        self.width = width
        self.height = height
        self.fps = fps
        self._t0 = time.time()

    def read(self) -> Optional[np.ndarray]:
        from facerecognition_tpu.training.train_detector import (
            synthetic_face_batch,
        )

        t = time.time() - self._t0
        rng = np.random.default_rng(int(t * 2) % 1000)
        img, _, _, _ = synthetic_face_batch(rng, 1, min(self.height, self.width), p_face=1.0)
        frame = np.zeros((self.height, self.width, 3), np.uint8)
        s = img.shape[1]
        frame[:s, :s] = img[0].astype(np.uint8)
        return frame

    def release(self) -> None:
        pass


class CameraFrameSource:
    """cv2.VideoCapture wrapper (reference get_camera, web_app.py:909-927)."""

    def __init__(self, index: int = 0, width: int = 640, height: int = 480):
        import cv2

        self.cap = cv2.VideoCapture(index)
        self.cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
        self.cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)

    def read(self) -> Optional[np.ndarray]:
        ok, frame = self.cap.read()
        if not ok:
            return None
        return frame[:, ::-1, ::-1].copy()  # mirror + BGR→RGB

    def release(self) -> None:
        self.cap.release()


class VideoFileSource:
    """Frame source over a video file.

    The reference only consumes the live camera (web_app.py:913,
    ``cv2.VideoCapture(0)``); file playback + offline batch recognition is
    framework-plus capability (see :func:`process_video`).
    """

    def __init__(self, path: str):
        import cv2

        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {path}")
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS)) or 30.0
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def read(self) -> Optional[np.ndarray]:
        ok, frame = self.cap.read()
        if not ok:
            return None
        return frame[:, :, ::-1].copy()  # BGR→RGB (no mirror for files)

    def release(self) -> None:
        self.cap.release()


def process_video(
    engine,
    source,
    batch_size: int = 32,
    every_n: int = 1,
    k: int = 5,
    max_faces: int = 1,
    max_frames: Optional[int] = None,
    on_batch: Optional[Callable[[int, list], None]] = None,
) -> dict:
    """Batched offline recognition over a video.

    Frames are accumulated into fixed-size batches and pushed through the
    single-dispatch fused pipeline (`RecognitionEngine.fused_recognize_
    frames`) when the engine has a detector + gallery, else through
    ``recognize_batch``. The tail batch is zero-padded to ``batch_size`` so
    every dispatch reuses ONE compiled graph (recompile discipline,
    CLAUDE.md batch buckets) and the padding results are dropped.

    Args:
      engine: a RecognitionEngine.
      source: a frame source (``read()``/``release()``) or a video path.
      every_n: process every n-th frame (cadence control — the reference
        recognizes every 0.5 s on its camera thread, web_app.py:1030).
      on_batch: optional callback ``(frames_done, batch_results)`` for
        progress streaming.

    Returns:
      ``{"results": [per-frame dicts], "frames": N, "elapsed_s": t,
      "fps": N/t}`` — results align with processed (strided) frames.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if max_frames is not None and max_frames <= 0:
        return {"results": [], "frames": 0, "elapsed_s": 0.0, "fps": 0.0}
    if isinstance(source, (str, bytes)):
        source = VideoFileSource(source)
    use_fused = engine.detector is not None and len(engine.gallery) > 0

    def flush(batch: list) -> list:
        n = len(batch)
        if n == 0:
            return []
        if use_fused:
            frames = np.stack(batch)
            if n < batch_size:  # zero-pad: one graph per (H, W, B) key
                frames = np.concatenate(
                    [
                        frames,
                        np.zeros(
                            (batch_size - n, *frames.shape[1:]),
                            frames.dtype,
                        ),
                    ]
                )
            res = engine.fused_recognize_frames(frames, k=k, max_faces=max_faces)
        else:
            res = engine.recognize_batch(list(batch), k=k)
        return res[:n]

    results: list = []
    t0 = time.perf_counter()
    batch: list = []
    i = 0
    try:
        while True:
            frame = source.read()
            if frame is None:
                break
            if i % every_n == 0:
                batch.append(np.asarray(frame))
                if len(batch) == batch_size:
                    out = flush(batch)
                    results.extend(out)
                    if on_batch is not None:
                        on_batch(len(results), out)
                    batch = []
            i += 1
            if max_frames is not None and len(results) + len(batch) >= max_frames:
                break
        out = flush(batch)
        results.extend(out)
        if out and on_batch is not None:
            on_batch(len(results), out)
    finally:
        source.release()
    elapsed = time.perf_counter() - t0
    return {
        "results": results,
        "frames": len(results),
        "elapsed_s": elapsed,
        "fps": len(results) / elapsed if elapsed > 0 else 0.0,
    }


class RealtimeRecognizer:
    """Continuous recognition worker over a frame source.

    A worker thread runs detect→embed→match on the latest frame; the MJPEG
    generator overlays the latest result. ``min_interval`` throttles
    recognition (the reference hard-codes 0.5 s, web_app.py:1027; the TPU
    pipeline sustains per-frame, so default 0).
    """

    def __init__(
        self,
        engine,
        detector=None,
        source=None,
        min_interval: float = 0.0,
    ):
        self.engine = engine
        self.detector = detector
        self.source = source or SyntheticFrameSource()
        self.min_interval = min_interval
        self._lock = threading.Lock()
        self._result: dict = {"identity": "...", "confidence": 0.0, "bbox": None}
        self._latest_frame: Optional[np.ndarray] = None
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None

    # -- worker -------------------------------------------------------------

    def _recognize_loop(self) -> None:
        while not self._stop.is_set():
            with self._lock:
                frame = self._latest_frame
            if frame is None:
                time.sleep(0.01)
                continue
            t0 = time.time()
            result = self._recognize(frame)
            with self._lock:
                self._result = result
            dt = time.time() - t0
            if self.min_interval > dt:
                time.sleep(self.min_interval - dt)

    def _recognize(self, frame: np.ndarray) -> dict:
        # Fast path: one fused device dispatch when detector + gallery exist.
        if (
            self.detector is not None
            and getattr(self.engine, "detector", None) is self.detector
            and len(getattr(self.engine, "gallery", [])) > 0
        ):
            try:
                res = self.engine.fused_recognize_frames(
                    frame[None], max_faces=4
                )[0]
                return {
                    "identity": res["identity"],
                    "confidence": res["confidence"],
                    "bbox": res["bbox"],
                    # every detected face, for multi-face overlay
                    # (reference draws each face, web_app.py:40-81)
                    "faces": [
                        {
                            "identity": f["identity"],
                            "confidence": float(f["confidence"]),
                            "bbox": f["bbox"],
                        }
                        for f in res["faces"]
                    ],
                    "time_ms": None,
                }
            except (ValueError, RuntimeError):
                pass  # fall through to the staged path
        bbox = None
        face = frame
        if self.detector is not None:
            det = self.detector.detect(frame)
            if det is None:
                return {"identity": "No face", "confidence": 0.0, "bbox": None}
            bbox = det["bbox"]
            from facerecognition_tpu.ops.image import align_crop
            import jax.numpy as jnp

            if det.get("landmarks") is not None:
                face = np.asarray(
                    align_crop(
                        jnp.asarray(frame.astype(np.float32)),
                        jnp.asarray(np.asarray(det["landmarks"], np.float32)),
                        self.engine.embedder.config.input_size,
                    )
                )
            else:
                face = self.detector.crop_face(frame, bbox)
        res = self.engine.recognize(np.asarray(face, np.uint8))
        return {
            "identity": res.get("identity", "Unknown"),
            "confidence": float(res.get("confidence", 0.0)),
            "bbox": bbox,
            "time_ms": None,
        }

    # -- public API ---------------------------------------------------------

    def start(self) -> None:
        if self._worker is None or not self._worker.is_alive():
            self._stop.clear()
            self._worker = threading.Thread(
                target=self._recognize_loop, daemon=True
            )
            self._worker.start()

    def stop(self) -> None:
        self._stop.set()
        self.source.release()

    @property
    def result(self) -> dict:
        with self._lock:
            return dict(self._result)

    def frames(self) -> Iterator[bytes]:
        """MJPEG generator: JPEG frames with the recognition overlay
        (reference generate_frames, web_app.py:1006-1053)."""
        self.start()
        while not self._stop.is_set():
            frame = self.source.read()
            if frame is None:
                break
            with self._lock:
                self._latest_frame = frame
                result = dict(self._result)
            out = frame.copy()
            boxes = [
                f["bbox"]
                for f in result.get("faces") or []
                if f.get("bbox") is not None
            ] or ([result["bbox"]] if result.get("bbox") is not None else [])
            for bb in boxes:
                x1, y1, x2, y2 = (int(round(v)) for v in bb)
                x1, x2 = np.clip([x1, x2], 0, out.shape[1] - 1)
                y1, y2 = np.clip([y1, y2], 0, out.shape[0] - 1)
                out[y1:y2, x1 : x1 + 2] = (0, 255, 0)
                out[y1:y2, x2 - 1 : x2 + 1] = (0, 255, 0)
                out[y1 : y1 + 2, x1:x2] = (0, 255, 0)
                out[y2 - 1 : y2 + 1, x1:x2] = (0, 255, 0)
            yield _encode_jpeg(out)

    def single_jpeg(self) -> bytes:
        """One annotated frame (handy for tests and polling clients)."""
        gen = self.frames()
        return next(gen)


def _encode_jpeg(rgb: np.ndarray, quality: int = 80) -> bytes:
    import cv2

    ok, buf = cv2.imencode(
        ".jpg", rgb[:, :, ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), quality]
    )
    if not ok:
        raise RuntimeError("JPEG encode failed")
    return bytes(buf)
