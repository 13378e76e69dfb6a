"""Recognition engine: detect → align → embed → match as one device pipeline.

API-parity rebuild of reference inference/recognition_engine.py:66-464. The
core difference: matching is a single matmul + ``lax.top_k`` against a
device-resident gallery matrix (replacing the python cosine loop :277-289 and
FAISS :291-326 — both collapse to the same exact inner-product search), and
the whole embed+match path is jitted with batch bucketing.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from facerecognition_tpu.inference.extract_embeddings import (
    Embedder,
    load_arcface_model,
    load_facenet_model,
)
from facerecognition_tpu.ops.image import align_crop, crop_with_margin
from facerecognition_tpu.ops.matcher import auto_cosine_topk
from facerecognition_tpu.utils.imageio import load_image


class Gallery:
    """Device-resident identity gallery: (N, D) normalized matrix + names.

    Replaces the reference's dict database and FAISS index with one object;
    persists as the same .npy dict format the reference writes
    (extract_embeddings.py:831, np.save of {name: embedding}).
    """

    def __init__(self, dim: int = 512):
        self.dim = dim
        self.names: list[str] = []
        self._matrix = np.zeros((0, dim), np.float32)
        self._device_matrix: Optional[jax.Array] = None

    def __len__(self) -> int:
        return len(self.names)

    @property
    def matrix(self) -> jax.Array:
        if self._device_matrix is None:
            self._device_matrix = jnp.asarray(self._matrix)
        return self._device_matrix

    def add(self, name: str, embedding: np.ndarray) -> None:
        emb = np.asarray(embedding, np.float32).reshape(1, -1)
        emb = emb / (np.linalg.norm(emb) + 1e-12)
        if name in self.names:
            idx = self.names.index(name)
            self._matrix[idx] = emb[0]
        else:
            self.names.append(name)
            self._matrix = np.concatenate([self._matrix, emb])
        self._device_matrix = None  # invalidate device copy

    def remove(self, name: str) -> bool:
        if name not in self.names:
            return False
        idx = self.names.index(name)
        self.names.pop(idx)
        self._matrix = np.delete(self._matrix, idx, axis=0)
        self._device_matrix = None
        return True

    @classmethod
    def from_dict(cls, db: dict[str, np.ndarray]) -> "Gallery":
        first = next(iter(db.values()), None)
        g = cls(dim=len(np.ravel(first)) if first is not None else 512)
        for name, emb in db.items():
            g.add(name, np.ravel(emb))
        return g

    def to_dict(self) -> dict[str, np.ndarray]:
        return {n: self._matrix[i].copy() for i, n in enumerate(self.names)}

    def save(self, path: str) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        np.save(path, self.to_dict(), allow_pickle=True)

    @classmethod
    def load(cls, path: str) -> "Gallery":
        if not os.path.exists(path) and os.path.exists(path + ".npy"):
            path = path + ".npy"
        db = np.load(path, allow_pickle=True).item()
        return cls.from_dict(db)


class RecognitionEngine:
    """Face recognition engine (reference recognition_engine.py:66 contract).

    recognize() returns the same result dict shape:
    ``{'identity', 'confidence', 'top_k', 'embedding', 'status'[, 'message']}``.

    ``detector=None`` runs on pre-aligned/cropped inputs (the reference's
    ``use_face_detection=False`` mode, recognition_engine.py:84); pass a
    `facerecognition_tpu.preprocessing.FaceDetector` to enable the fused
    detect→align path.
    """

    def __init__(
        self,
        embedder: Optional[Embedder] = None,
        gallery: Optional[Gallery] = None,
        detector: Optional[Any] = None,
        threshold: float = 0.5,
        model_type: str = "arcface",
        checkpoint_path: Optional[str] = None,
    ):
        if embedder is None:
            loader = {
                "arcface": load_arcface_model,
                "facenet": load_facenet_model,
            }[model_type]
            embedder = loader(checkpoint_path)
        self.embedder = embedder
        self.gallery = gallery if gallery is not None else Gallery(
            dim=embedder.config.embedding_size
        )
        self.detector = detector
        self.threshold = threshold

    # -- configuration ------------------------------------------------------

    def set_threshold(self, threshold: float) -> None:
        """(reference recognition_engine.py:165)"""
        self.threshold = float(threshold)

    # -- pipeline stages ----------------------------------------------------

    def detect_and_align(self, image: np.ndarray) -> Optional[np.ndarray]:
        """Detect the largest face and align to the 112/160 template.

        Fallback chain mirrors reference :206-242 — landmarks→Umeyama-warp,
        else bbox-crop with margin 0.2, else None.
        """
        if self.detector is None:
            return None
        det = self.detector.detect(image)
        if det is None:
            return None
        size = self.embedder.config.input_size
        img = jnp.asarray(np.asarray(image, np.float32))
        if det.get("landmarks") is not None:
            aligned = align_crop(img, jnp.asarray(det["landmarks"], jnp.float32), size)
        else:
            aligned = crop_with_margin(
                img, jnp.asarray(det["bbox"], jnp.float32), 0.2, size
            )
        return np.asarray(aligned)

    def extract_embedding(self, img_input) -> Optional[np.ndarray]:
        """Image → L2-normalized embedding (with optional detect+align)."""
        try:
            img = load_image(img_input)
        except (FileNotFoundError, OSError):
            return None
        if self.detector is not None:
            aligned = self.detect_and_align(img)
            if aligned is not None:
                img = aligned
        return self.embedder.embed_uint8(np.asarray(img, np.float32)[None])[0]

    def match(
        self, embeddings: np.ndarray, k: int = 5
    ) -> list[tuple[str, float, list[tuple[str, float]]]]:
        """Batch gallery match: one matmul + top_k on device.

        Returns per query: (best_name, best_score, top_k list). Threshold →
        'Unknown' exactly like reference :281-287.
        """
        if len(self.gallery) == 0:
            return [("No database", 0.0, [])] * len(embeddings)
        k_eff = min(k, len(self.gallery))
        scores, idx = auto_cosine_topk(
            jnp.asarray(embeddings), self.gallery.matrix, k_eff
        )
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        out = []
        for q in range(len(embeddings)):
            top = [
                (self.gallery.names[int(i)], float(s))
                for s, i in zip(scores[q], idx[q])
            ]
            best_name, best_score = top[0]
            if best_score < self.threshold:
                best_name = "Unknown"
            out.append((best_name, best_score, top))
        return out

    # -- fused device pipeline ----------------------------------------------

    def _build_fused(self, frame_shape: tuple[int, int], k: int):
        """One jitted graph: detect → align → embed → match for a fixed
        frame shape. Single device dispatch per call — the production
        serving path (the staged path costs 4 dispatches, which matters on
        high-latency interconnects)."""
        import functools

        from facerecognition_tpu.models.detector_net import detect_faces
        from facerecognition_tpu.ops.image import normalize_imagenet_style
        from facerecognition_tpu.ops.warp_mxu import (
            align_crop_mxu_batch,
            bilinear_resize_mxu_batch,
        )

        det = self.detector
        size = self.embedder.config.input_size
        h, w = frame_shape
        det_size = det.input_size

        @functools.partial(jax.jit, static_argnums=())
        def fused(det_vars, emb_vars, gallery, frames):
            small = bilinear_resize_mxu_batch(frames, det_size, det_size, True)
            raw = det.net.apply(det_vars, small / 127.5 - 1.0)
            boxes, lms, det_scores, valid = jax.vmap(
                lambda r: detect_faces(
                    r, det.anchors, det.iou_threshold, det_size, 1
                )
            )(raw)
            lm = lms[:, 0] * jnp.array(
                [w / det_size, h / det_size], jnp.float32
            )
            lm = jnp.clip(lm, 0.0, jnp.array([w - 1.0, h - 1.0]))
            aligned = align_crop_mxu_batch(frames, lm, size, True)
            x = normalize_imagenet_style(aligned)
            emb = self.embedder.model.apply(emb_vars, x)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb.astype(jnp.float32), axis=1, keepdims=True),
                1e-12,
            )
            scores, idx = auto_cosine_topk(emb, gallery, k)
            return (
                scores,
                idx,
                det_scores[:, 0],
                boxes[:, 0],
                emb,
            )

        return fused

    def fused_recognize_frames(self, frames: np.ndarray, k: int = 5) -> list[dict]:
        """Recognize a (B, H, W, 3) frame batch in ONE device dispatch.

        Requires a detector and a non-empty gallery. Frames that fail
        detection (score < detector.confidence_threshold) come back as
        'No face'.
        """
        if self.detector is None:
            raise ValueError("fused path needs a detector")
        if len(self.gallery) == 0:
            raise ValueError("fused path needs a non-empty gallery")
        frames = np.asarray(frames, np.float32)
        key = (frames.shape[1], frames.shape[2], min(k, len(self.gallery)))
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        if key not in cache:
            cache[key] = self._build_fused(frames.shape[1:3], key[2])
        fused = cache[key]
        scores, idx, det_scores, boxes, emb = fused(
            self.detector.variables,
            self.embedder.variables,
            self.gallery.matrix,
            jnp.asarray(frames),
        )
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        det_scores = np.asarray(det_scores)
        boxes = np.asarray(boxes)
        emb = np.asarray(emb)
        out = []
        for b in range(len(frames)):
            if det_scores[b] < self.detector.confidence_threshold:
                out.append(
                    {
                        "identity": "No face",
                        "confidence": 0.0,
                        "top_k": [],
                        "bbox": None,
                        "status": "success",
                        "embedding": None,
                    }
                )
                continue
            top = [
                (self.gallery.names[int(i)], float(s))
                for s, i in zip(scores[b], idx[b])
            ]
            name, score = top[0]
            if score < self.threshold:
                name = "Unknown"
            out.append(
                {
                    "identity": name,
                    "confidence": score,
                    "top_k": top,
                    "bbox": boxes[b].tolist(),
                    "status": "success",
                    "embedding": emb[b],
                }
            )
        return out

    # -- public API ---------------------------------------------------------

    def recognize(self, img_input, k: int = 5) -> dict:
        """Recognize one image (reference :328-381 result contract)."""
        result: dict[str, Any] = {
            "identity": "Unknown",
            "confidence": 0.0,
            "top_k": [],
            "embedding": None,
            "status": "success",
        }
        embedding = self.extract_embedding(img_input)
        if embedding is None:
            result["status"] = "error"
            result["message"] = "Cannot extract embedding (no face or invalid image)"
            return result
        result["embedding"] = embedding
        if len(self.gallery) == 0:
            result["status"] = "error"
            result["message"] = "No database loaded"
            return result
        identity, confidence, top_k = self.match(embedding[None], k)[0]
        result.update(identity=identity, confidence=confidence, top_k=top_k)
        return result

    def recognize_batch(self, img_inputs: Sequence, k: int = 5) -> list[dict]:
        """Batch recognition — ONE embed batch + ONE match matmul for all
        images (the reference loops recognize() per image, :383-389)."""
        results: list[dict] = []
        images, slots = [], []
        for i, inp in enumerate(img_inputs):
            results.append(
                {
                    "identity": "Unknown",
                    "confidence": 0.0,
                    "top_k": [],
                    "embedding": None,
                    "status": "error",
                    "message": "Cannot extract embedding (no face or invalid image)",
                }
            )
            try:
                img = load_image(inp)
            except (FileNotFoundError, OSError):
                continue
            if self.detector is not None:
                aligned = self.detect_and_align(img)
                if aligned is not None:
                    img = aligned
            s = self.embedder.config.input_size
            img = np.asarray(img, np.float32)
            if img.shape[0] != s or img.shape[1] != s:
                from facerecognition_tpu.ops.image import bilinear_resize

                img = np.asarray(bilinear_resize(jnp.asarray(img), s, s))
            images.append(img)
            slots.append(i)
        if not images:
            return results
        embs = self.embedder.embed_uint8(np.stack(images))
        matches = self.match(embs, k) if len(self.gallery) else None
        for j, i in enumerate(slots):
            results[i] = {
                "identity": "Unknown",
                "confidence": 0.0,
                "top_k": [],
                "embedding": embs[j],
                "status": "success",
            }
            if matches is None:
                results[i]["status"] = "error"
                results[i]["message"] = "No database loaded"
            else:
                identity, confidence, top_k = matches[j]
                results[i].update(
                    identity=identity, confidence=confidence, top_k=top_k
                )
        return results

    def add_to_db(self, name: str, img_inputs: Sequence) -> bool:
        """Enroll an identity as the mean of its image embeddings
        (reference :391-422)."""
        embs = []
        for img in img_inputs:
            e = self.extract_embedding(img)
            if e is not None:
                embs.append(e)
        if not embs:
            return False
        mean = np.mean(np.stack(embs), axis=0)
        self.gallery.add(name, mean / (np.linalg.norm(mean) + 1e-8))
        return True

    def save_db(self, path: str) -> None:
        self.gallery.save(path)

    def get_db_identities(self) -> list[str]:
        return list(self.gallery.names)


def create_engine_from_embeddings_dir(
    model_path: Optional[str],
    embeddings_dir: str,
    model_type: str = "arcface",
    threshold: float = 0.5,
    detector: Optional[Any] = None,
) -> RecognitionEngine:
    """Build an engine from a directory of saved galleries
    (reference recognition_engine.py:438-464): loads ``face_db.npy`` or the
    first .npy dict found in ``embeddings_dir``."""
    engine = RecognitionEngine(
        model_type=model_type,
        checkpoint_path=model_path,
        threshold=threshold,
        detector=detector,
    )
    candidates = [os.path.join(embeddings_dir, "face_db.npy")] + [
        os.path.join(embeddings_dir, f)
        for f in sorted(os.listdir(embeddings_dir))
        if f.endswith(".npy")
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                engine.gallery = Gallery.load(path)
                break
            except (ValueError, OSError):
                continue
    return engine
