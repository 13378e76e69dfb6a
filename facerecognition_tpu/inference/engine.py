"""Recognition engine: detect → align → embed → match as one device pipeline.

API-parity rebuild of reference inference/recognition_engine.py:66-464. The
core difference: matching is a single matmul + ``lax.top_k`` against a
device-resident gallery matrix (replacing the python cosine loop :277-289 and
FAISS :291-326 — both collapse to the same exact inner-product search), and
the whole embed+match path is jitted with batch bucketing.
"""

from __future__ import annotations

import json
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
from facerecognition_tpu.ops.matcher import auto_cosine_topk, l2_normalize
from facerecognition_tpu.utils.imageio import load_image

#: Crowd-path (max_faces > 1) per-slot crop window. Must cover the sampled
#: source region of the largest crowd face: the curriculum contract caps
#: multi-face faces at 0.34 of the frame (training/synthetic_faces.py), so
#: a 0.34·256 ≈ 87px face samples ~120px with rotation margin — 160 is safe
#: for frames up to ~470² (0.34·470·1.4 ≈ 160). Exactness parity with the
#: full-frame warp is pinned in tests/test_warp_mxu.py.
_CROWD_WINDOW = 160


class Gallery:
    """Device-resident identity gallery: (N, D) normalized matrix + names.

    Replaces the reference's dict database and FAISS index with one object;
    persists as the same .npy dict format the reference writes
    (extract_embeddings.py:831, np.save of {name: embedding}).

    Enrollment scales to the ≥1M-identity regime this framework targets:
    a name→row dict (no O(N) list scans), geometric capacity growth (no
    per-add full-matrix copies), and a bulk ``add_many`` that normalizes and
    writes a whole batch in one vectorized pass (the reference enrolls one
    mean-embedding at a time, recognition_engine.py:391-422).
    """

    def __init__(self, dim: int = 512):
        self.dim = dim
        self.names: list[str] = []
        self._index: dict[str, int] = {}
        self._store = np.zeros((0, dim), np.float32)  # capacity >= len(names)
        self._device_matrix: Optional[jax.Array] = None
        self._device_quant: Optional[tuple[jax.Array, jax.Array]] = None
        self._device_store: Optional[jax.Array] = None
        self._device_qstore: Optional[tuple[jax.Array, jax.Array]] = None
        # Rows changed since each padded device cache was shipped — synced
        # by an on-device scatter of just these rows (shipping the whole
        # multi-GB store per enrollment would be slow AND leak host RSS on
        # the axon backend, which never frees host→device staging buffers).
        self._dirty_f32: set[int] = set()
        self._dirty_q: set[int] = set()

    def __len__(self) -> int:
        return len(self.names)

    @property
    def _matrix(self) -> np.ndarray:
        """Host view of the live rows (capacity trimmed)."""
        return self._store[: len(self.names)]

    @property
    def matrix(self) -> jax.Array:
        if self._device_matrix is None:
            self._device_matrix = jnp.asarray(self._matrix)
        return self._device_matrix

    def quantized(self) -> tuple[jax.Array, jax.Array]:
        """Device-resident int8 codes + per-row scales (cached).

        The 4x-smaller capacity representation for ``match_kernel='int8'``
        (ops.matcher.cosine_topk_int8): a 1M×512 gallery drops from 2 GB
        f32 to 512 MB int8 + 4 MB scales in HBM. Unlike ``matrix``, the
        f32 rows never touch the device — quantization runs host-side and
        only the codes transfer, so the two caches never coexist in HBM
        unless both paths are used.
        """
        if self._device_quant is None:
            from facerecognition_tpu.ops.matcher import (
                quantize_embeddings_int8_np,
            )

            q, scale = quantize_embeddings_int8_np(self._matrix)
            self._device_quant = (jnp.asarray(q), jnp.asarray(scale))
        return self._device_quant

    def device_store(self) -> tuple[jax.Array, int]:
        """(capacity-padded device matrix, live row count).

        Unlike :attr:`matrix` (exact N), the padded store's SHAPE changes
        only when capacity grows (geometric doubling in ``_reserve``), so a
        compiled match graph survives enrollment instead of recompiling per
        ``add`` — pass the count as the dynamic ``n_valid`` mask of
        ``ops.matcher.cosine_topk``; padding/stale rows must never be
        returned unmasked.
        """
        if self._device_store is None:
            self._device_store = jnp.asarray(self._store)
            self._dirty_f32.clear()
        elif self._dirty_f32:
            rows = np.fromiter(self._dirty_f32, np.int64)
            self._device_store = self._device_store.at[
                jnp.asarray(rows)
            ].set(jnp.asarray(self._store[rows]))
            self._dirty_f32.clear()
        return self._device_store, len(self.names)

    def quantized_store(self) -> tuple[jax.Array, jax.Array, int]:
        """int8 analogue of :func:`device_store`:
        (padded codes, padded scales, live row count)."""
        from facerecognition_tpu.ops.matcher import (
            quantize_embeddings_int8_np,
        )

        if self._device_qstore is None:
            q, scale = quantize_embeddings_int8_np(self._store)
            self._device_qstore = (jnp.asarray(q), jnp.asarray(scale))
            self._dirty_q.clear()
        elif self._dirty_q:
            rows = np.fromiter(self._dirty_q, np.int64)
            q, scale = quantize_embeddings_int8_np(self._store[rows])
            codes, scales = self._device_qstore
            ridx = jnp.asarray(rows)
            self._device_qstore = (
                codes.at[ridx].set(jnp.asarray(q)),
                scales.at[ridx].set(jnp.asarray(scale)),
            )
            self._dirty_q.clear()
        return (*self._device_qstore, len(self.names))

    def _invalidate_device(self, rows=None) -> None:
        """Mark device caches stale.

        ``rows``: the only store rows whose content changed (capacity and
        dtype unchanged) — the padded store caches then sync by scattering
        just those rows on next access. ``None`` = structural change
        (capacity growth, load, materialize): drop everything. The exact-N
        ``matrix``/``quantized`` caches always drop (their SHAPE tracks the
        live count, so they re-ship regardless; callers that mutate should
        prefer the padded stores).
        """
        self._device_matrix = None
        self._device_quant = None
        incremental = (
            rows is not None
            and self._device_store is not None
            and self._device_store.shape[0] == len(self._store)
        )
        # A huge dirty set loses to one bulk re-ship; 10% of capacity is
        # past the break-even for scattered row updates.
        if incremental and len(self._dirty_f32) + len(rows) <= max(
            1024, len(self._store) // 10
        ):
            self._dirty_f32.update(rows)
        else:
            self._device_store = None
            self._dirty_f32.clear()
        incremental_q = (
            rows is not None
            and self._device_qstore is not None
            and self._device_qstore[0].shape[0] == len(self._store)
        )
        if incremental_q and len(self._dirty_q) + len(rows) <= max(
            1024, len(self._store) // 10
        ):
            self._dirty_q.update(rows)
        else:
            self._device_qstore = None
            self._dirty_q.clear()

    def _reserve(self, extra: int) -> None:
        need = len(self.names) + extra
        if need <= len(self._store):
            return
        cap = max(need, 2 * len(self._store), 64)
        grown = np.zeros((cap, self.dim), np.float32)
        grown[: len(self.names)] = self._matrix
        self._store = grown

    def _materialize(self) -> None:
        """Copy a read-only memory-mapped store into RAM before mutation."""
        if isinstance(self._store, np.memmap):
            self._store = np.array(self._store)

    def add(self, name: str, embedding: np.ndarray) -> None:
        self._materialize()
        emb = np.asarray(embedding, np.float32).reshape(-1)
        emb = emb / (np.linalg.norm(emb) + 1e-12)
        idx = self._index.get(name)
        if idx is not None:
            self._store[idx] = emb
            row = idx
        else:
            self._reserve(1)
            row = len(self.names)
            self._index[name] = row
            self._store[row] = emb
            self.names.append(name)
        self._invalidate_device(rows=(row,))

    def add_many(self, names: Sequence[str], embeddings: np.ndarray) -> None:
        """Bulk enrollment: one vectorized normalize + one block write.

        Duplicate names (within the batch or vs existing rows) keep the last
        embedding, matching repeated ``add`` semantics. 100k identities
        enroll in milliseconds (vs seconds of per-add concat churn).
        """
        if len(names) == 0:
            return
        self._materialize()
        embs = np.ascontiguousarray(embeddings, np.float32).reshape(
            len(names), -1
        )
        embs = embs / np.maximum(
            np.linalg.norm(embs, axis=1, keepdims=True), 1e-12
        )
        self._reserve(len(names))
        row_of_batch: dict[int, int] = {}  # row -> last batch pos (last wins)
        for j, name in enumerate(names):
            idx = self._index.get(name)
            if idx is None:
                idx = len(self.names)
                self._index[name] = idx
                self.names.append(name)
            row_of_batch[idx] = j
        if row_of_batch:
            rows = np.fromiter(row_of_batch.keys(), np.int64)
            srcs = np.fromiter(row_of_batch.values(), np.int64)
            self._store[rows] = embs[srcs]
        self._invalidate_device(rows=row_of_batch.keys())

    def remove(self, name: str) -> bool:
        idx = self._index.pop(name, None)
        if idx is None:
            return False
        self._materialize()
        last = len(self.names) - 1
        if idx != last:  # swap-remove: O(1), order not part of the contract
            self._store[idx] = self._store[last]
            moved = self.names[last]
            self.names[idx] = moved
            self._index[moved] = idx
            changed = (idx,)
        else:
            changed = ()  # count-only change; padded rows untouched
        self.names.pop()
        self._invalidate_device(rows=changed)
        return True

    @classmethod
    def from_dict(cls, db: dict[str, np.ndarray]) -> "Gallery":
        first = next(iter(db.values()), None)
        g = cls(dim=len(np.ravel(first)) if first is not None else 512)
        if db:
            names = list(db.keys())
            g.add_many(names, np.stack([np.ravel(db[n]) for n in names]))
        return g

    def to_dict(self) -> dict[str, np.ndarray]:
        return {n: self._store[i].copy() for i, n in enumerate(self.names)}

    def save(self, path: str) -> None:
        """Persist the gallery.

        Two formats:

        - **native** (default, scalable): ``path`` is a directory holding one
          flat ``embeddings.npy`` float32 ``(N, dim)`` matrix (zero-copy
          memory-mappable on load) plus ``names.json``. A 1M-identity gallery
          saves/loads in seconds with no 1M-element python dict churn.
        - **compat** (reference extract_embeddings.py:831 format): if ``path``
          ends in ``.npy``, a pickled ``{name: (dim,) array}`` dict — the
          import/export interchange format, not the native one.
        """
        if path.endswith(".npy"):
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
            np.save(path, self.to_dict(), allow_pickle=True)
            return
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, f".tmp-{os.getpid()}")
        np.save(tmp + ".npy", np.ascontiguousarray(self._matrix))
        os.replace(tmp + ".npy", os.path.join(path, "embeddings.npy"))
        with open(tmp + ".json", "w") as f:
            json.dump(self.names, f)
        os.replace(tmp + ".json", os.path.join(path, "names.json"))

    @classmethod
    def load(cls, path: str, mmap: bool = False) -> "Gallery":
        """Load either format (auto-detected).

        ``mmap=True`` (native format only) memory-maps the embedding matrix —
        O(1) load for a multi-GB gallery; the store is copied into RAM
        transparently on first mutation.
        """
        native = os.path.join(path, "embeddings.npy")
        if os.path.isdir(path) and os.path.exists(native):
            mat = np.load(native, mmap_mode="r" if mmap else None)
            with open(os.path.join(path, "names.json")) as f:
                names = json.load(f)
            if len(names) != len(mat):
                raise ValueError(
                    f"gallery corrupt: {len(names)} names vs {len(mat)} rows"
                )
            g = cls(dim=mat.shape[1] if mat.ndim == 2 else 512)
            g._store = mat if mmap else np.ascontiguousarray(mat, np.float32)
            g.names = list(names)
            g._index = {n: i for i, n in enumerate(names)}
            return g
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

    ``checkpoint_path=None`` builds a RANDOM-INIT embedder (the loaders'
    testing contract) — to serve the shipped weights, pass
    ``default_arcface_checkpoint()`` / ``default_facenet_checkpoint()``
    (the web app does; examples/compare_all_models.py resolves them when
    its flags are unset).
    """

    def __init__(
        self,
        embedder: Optional[Embedder] = None,
        gallery: Optional[Gallery] = None,
        detector: Optional[Any] = None,
        threshold: float = 0.5,
        model_type: str = "arcface",
        checkpoint_path: Optional[str] = None,
        match_kernel: str = "auto",
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
        if match_kernel not in ("auto", "dense", "pallas", "int8"):
            raise ValueError(f"unknown match_kernel {match_kernel!r}")
        # 'auto'/'dense'/'pallas' pick the f32 path (ops.matcher.
        # auto_cosine_topk); 'int8' matches against the 4x-smaller quantized
        # gallery (ops.matcher.cosine_topk_int8) — the very-large-N capacity
        # mode (scores shift O(1e-3); see tests/test_matcher.py).
        self.match_kernel = match_kernel

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
        emb, _ = self._extract_with_info(img_input)
        return emb

    def _extract_with_info(
        self, img_input
    ) -> tuple[Optional[np.ndarray], bool]:
        """(embedding | None, face_found).

        When a detector is configured but finds nothing, the WHOLE resized
        image is embedded (the reference web app's align→crop→raw-resize
        fallback chain, web_app.py:417-439) — callers surface
        ``face_found=False`` so a wall photo doesn't masquerade as a
        confidently recognized face.
        """
        try:
            img = load_image(img_input)
        except (FileNotFoundError, OSError):
            return None, False
        face_found = self.detector is None
        if self.detector is not None:
            aligned = self.detect_and_align(img)
            if aligned is not None:
                img = aligned
                face_found = True
        return (
            self.embedder.embed_uint8(np.asarray(img, np.float32)[None])[0],
            face_found,
        )

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
        # Gallery rows are unit-norm by construction (add/add_many);
        # normalize only the (small) query block and skip the (N, D) pass.
        # Matching runs against the CAPACITY-PADDED store with a dynamic
        # n_valid mask (Gallery.device_store), so enrollment growth reuses
        # the compiled graph instead of recompiling per add; the explicit
        # pallas kernel (mask-free) keeps the exact-N matrix.
        if self.match_kernel == "int8":
            from facerecognition_tpu.ops.matcher import cosine_topk_int8

            gq, gs, n_valid = self.gallery.quantized_store()
            scores, idx = cosine_topk_int8(
                jnp.asarray(embeddings, jnp.float32),
                gq,
                gs,
                k_eff,
                np.int32(n_valid),
            )
        elif self.match_kernel == "pallas":
            scores, idx = auto_cosine_topk(
                l2_normalize(jnp.asarray(embeddings, jnp.float32)),
                self.gallery.matrix,
                k_eff,
                normalized=True,
                kernel="pallas",
            )
        else:
            from facerecognition_tpu.ops.matcher import (
                DENSE_SCORES_MAX_BYTES,
                _array_platform,
            )

            gal, n_valid = self.gallery.device_store()
            q = l2_normalize(jnp.asarray(embeddings, jnp.float32))
            pressure = (
                len(embeddings) * gal.shape[0] * 4 > DENSE_SCORES_MAX_BYTES
                and _array_platform(gal) not in ("cpu",)
            )
            if self.match_kernel == "auto" and pressure:
                # capacity regime: the streaming kernel (mask-free) on the
                # exact-N matrix — enrollment churn is rare at this scale
                scores, idx = auto_cosine_topk(
                    q, self.gallery.matrix, k_eff,
                    normalized=True, kernel="pallas",
                )
            else:
                scores, idx = auto_cosine_topk(
                    q,
                    gal,
                    k_eff,
                    normalized=True,
                    kernel=self.match_kernel,
                    n_valid=np.int32(n_valid),
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

    def _build_fused(
        self, frame_shape: tuple[int, int], k: int, max_faces: int
    ):
        """One jitted graph: detect → align → embed → match for a fixed
        frame shape, up to ``max_faces`` faces per frame. Single device
        dispatch per call — the production serving path (the staged path
        costs 4 dispatches, which matters on high-latency interconnects).

        All ``B * max_faces`` NMS slots are aligned/embedded/matched
        unconditionally (fixed shapes; invalid slots are masked host-side) —
        on the MXU this is cheaper than any data-dependent skip.
        """
        import functools

        from facerecognition_tpu.models.detector_net import (
            detect_best_face,
            detect_faces,
        )
        from facerecognition_tpu.ops.image import normalize_imagenet_style
        from facerecognition_tpu.ops.warp_mxu import (
            align_crop_mxu_batch,
            align_crop_mxu_window,
            bilinear_resize_mxu_batch,
        )

        det = self.detector
        size = self.embedder.config.input_size
        h, w = frame_shape
        det_size = det.input_size
        use_int8 = self.match_kernel == "int8"
        if use_int8:
            from facerecognition_tpu.ops.matcher import cosine_topk_int8

        @functools.partial(jax.jit, static_argnums=())
        def fused(det_vars, emb_vars, gallery, n_valid, frames):
            bsz = frames.shape[0]
            # Cast on DEVICE: callers ship uint8 frames (4x less host→device
            # traffic — the axon plugin leaks every transfer in host RSS, so
            # a long-running server must stream the smallest dtype).
            frames = frames.astype(jnp.float32)
            small = bilinear_resize_mxu_batch(frames, det_size, det_size, True)
            raw = det.net.apply(det_vars, small / 127.5 - 1.0)
            if max_faces == 1:
                # One face per frame: greedy NMS's first pick IS the score
                # argmax, so skip the all-anchor top-k + NMS loop entirely
                # (detect_best_face; exact-parity test in test_detector.py).
                b1, l1, s1 = jax.vmap(
                    lambda r: detect_best_face(r, det.anchors)
                )(raw)
                boxes = b1[:, None]
                lms = l1[:, None]
                det_scores = s1[:, None]
                valid = jnp.ones((bsz, 1), bool)
            else:
                boxes, lms, det_scores, valid = jax.vmap(
                    lambda r: detect_faces(
                        r, det.anchors, det.iou_threshold, max_faces
                    )
                )(raw)  # (B, M, 4), (B, M, 5, 2), (B, M), (B, M)
            scale = jnp.array([w / det_size, h / det_size], jnp.float32)
            lm = jnp.clip(
                lms * scale, 0.0, jnp.array([w - 1.0, h - 1.0])
            ).reshape(bsz * max_faces, 5, 2)
            boxes = boxes * jnp.tile(scale, 2)  # frame-pixel coords
            if max_faces > 1 and min(h, w) > _CROWD_WINDOW:
                # Crowd path: static-window crop per slot, then warp. The
                # two-pass warp's interpolation-weight tensors scale with
                # frame H·W, so warping M slots from full 256² frames (plus
                # the M-fold frame repeat buffer) was the measured M=8
                # bottleneck (docs/PROFILE.md). Cropping a 160² window around
                # each face first is exact for the crowd contract (faces
                # ≤0.34 of the frame — parity test in test_warp_mxu.py) and
                # cuts the weight working set (H·W)/160² ≈ 2.56× at 256².
                aligned = align_crop_mxu_window(
                    frames,
                    lm.reshape(bsz, max_faces, 5, 2),
                    size,
                    _CROWD_WINDOW,
                    True,
                )
            else:
                rep = jnp.repeat(frames, max_faces, axis=0)
                aligned = align_crop_mxu_batch(rep, lm, size, True)
            x = normalize_imagenet_style(aligned)
            emb = self.embedder.model.apply(emb_vars, x)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb.astype(jnp.float32), axis=1, keepdims=True),
                1e-12,
            )
            # The gallery is the CAPACITY-PADDED store + dynamic n_valid
            # mask (Gallery.device_store/quantized_store), so enrollment
            # growth reuses this compiled graph; only the mask-free pallas
            # kernel takes the exact-N matrix (n_valid is None then).
            if use_int8:
                scores, idx = cosine_topk_int8(
                    emb, gallery[0], gallery[1], k, n_valid
                )
            else:
                # honor an explicit dense/pallas choice like staged match()
                scores, idx = auto_cosine_topk(
                    emb,
                    gallery,
                    k,
                    normalized=True,
                    kernel=self.match_kernel,
                    n_valid=n_valid,
                )
            return (
                scores.reshape(bsz, max_faces, -1),
                idx.reshape(bsz, max_faces, -1),
                det_scores,
                boxes,
                valid,
                emb.reshape(bsz, max_faces, -1),
            )

        return fused

    def fused_recognize_frames(
        self, frames: np.ndarray, k: int = 5, max_faces: int = 1
    ) -> list[dict]:
        """Recognize a (B, H, W, 3) frame batch in ONE device dispatch.

        Requires a detector and a non-empty gallery. Returns one dict per
        frame whose top-level fields describe the highest-confidence face
        (identity/confidence/top_k/bbox — 'No face' when nothing clears
        detector.confidence_threshold) plus a ``'faces'`` list with the same
        fields for every detected face, mirroring the reference web app's
        draw-every-face behavior (web_app.py:40-81, detect_all usage).
        """
        if self.detector is None:
            raise ValueError("fused path needs a detector")
        if len(self.gallery) == 0:
            raise ValueError("fused path needs a non-empty gallery")
        # Keep uint8 frames uint8: the device graph casts to f32 on-chip,
        # and shipping the smaller dtype matters on this backend (the axon
        # plugin leaks every host→device transfer in host RSS — CLAUDE.md).
        frames = np.asarray(frames)
        if frames.dtype != np.uint8:
            frames = frames.astype(np.float32)
        key = (
            frames.shape[1],
            frames.shape[2],
            min(k, len(self.gallery)),
            max_faces,
            self.match_kernel,
        )
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        if key not in cache:
            cache[key] = self._build_fused(frames.shape[1:3], key[2], max_faces)
        fused = cache[key]
        if self.match_kernel == "int8":
            gq, gs, n = self.gallery.quantized_store()
            gal, n_valid = (gq, gs), np.int32(n)
        elif self.match_kernel == "pallas":
            gal, n_valid = self.gallery.matrix, None
        else:
            gal, n = self.gallery.device_store()
            n_valid = np.int32(n)
        scores, idx, det_scores, boxes, valid, emb = fused(
            self.detector.variables,
            self.embedder.variables,
            gal,
            n_valid,
            jnp.asarray(frames),
        )
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        det_scores = np.asarray(det_scores, np.float64)
        boxes = np.asarray(boxes)
        valid = np.asarray(valid)
        emb = np.asarray(emb)
        # Platt calibration lives host-side in FaceDetector._run; apply the
        # same transform here so fused scores/thresholds agree with the
        # staged detect_all path (monotone — NMS slot order is preserved).
        cal = getattr(self.detector, "_calibration", None)
        if cal is not None:
            a_c, b_c = cal
            s = np.clip(det_scores, 1e-9, 1 - 1e-9)
            det_scores = 1.0 / (
                1.0 + np.exp(-(a_c * np.log(s / (1.0 - s)) + b_c))
            )
        conf_thr = self.detector.confidence_threshold
        min_size = self.detector.min_face_size
        out = []
        for b in range(len(frames)):
            faces = []
            for m in range(det_scores.shape[1]):
                if not valid[b, m] or det_scores[b, m] < conf_thr:
                    continue
                bw = boxes[b, m, 2] - boxes[b, m, 0]
                bh = boxes[b, m, 3] - boxes[b, m, 1]
                if min(bw, bh) < min_size:  # detect_all parity
                    continue
                top = [
                    (self.gallery.names[int(i)], float(s))
                    for s, i in zip(scores[b, m], idx[b, m])
                ]
                name, score = top[0]
                if score < self.threshold:
                    name = "Unknown"
                faces.append(
                    {
                        "identity": name,
                        "confidence": score,
                        "top_k": top,
                        "bbox": boxes[b, m].tolist(),
                        "det_score": float(det_scores[b, m]),
                        "embedding": emb[b, m],
                    }
                )
            if not faces:
                out.append(
                    {
                        "identity": "No face",
                        "confidence": 0.0,
                        "top_k": [],
                        "bbox": None,
                        "status": "success",
                        "embedding": None,
                        "faces": [],
                    }
                )
                continue
            best = faces[0]  # NMS slots come score-descending
            out.append(
                {
                    "identity": best["identity"],
                    "confidence": best["confidence"],
                    "top_k": best["top_k"],
                    "bbox": best["bbox"],
                    "status": "success",
                    "embedding": best["embedding"],
                    "faces": faces,
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
        embedding, face_found = self._extract_with_info(img_input)
        if embedding is None:
            result["status"] = "error"
            result["message"] = "Cannot extract embedding (no face or invalid image)"
            return result
        result["embedding"] = embedding
        result["face_found"] = face_found
        if not face_found:
            result["message"] = (
                "no face detected — embedded the full image "
                "(reference fallback chain)"
            )
        if len(self.gallery) == 0:
            result["status"] = "error"
            result["message"] = "No database loaded"
            return result
        identity, confidence, top_k = self.match(embedding[None], k)[0]
        result.update(identity=identity, confidence=confidence, top_k=top_k)
        return result

    def recognize_all(
        self, img_input, k: int = 5, max_faces: int = 16
    ) -> dict:
        """Recognize EVERY face in one image (staged path, any image size).

        The reference web app draws all detected faces (web_app.py:40-81 +
        detect_all); this is the engine-level equivalent: one detect_all,
        one batched align on the MXU warp, ONE embed batch, ONE match
        matmul. For fixed-shape streams prefer ``fused_recognize_frames``.

        Returns {'status', 'faces': [{identity, confidence, top_k, bbox,
        det_score, embedding}, ...]} sorted by detection score.
        """
        if self.detector is None:
            raise ValueError("recognize_all needs a detector")
        try:
            img = load_image(img_input)
        except (FileNotFoundError, OSError):
            return {"status": "error", "message": "invalid image", "faces": []}
        dets = self.detector.detect_all(img)[:max_faces]
        if not dets:
            return {"status": "success", "faces": []}
        from facerecognition_tpu.inference.extract_embeddings import _bucket
        from facerecognition_tpu.ops.warp_mxu import align_crop_mxu_batch

        size = self.embedder.config.input_size
        frame = jnp.asarray(np.asarray(img, np.float32))
        # Pad the face count to a batch bucket: align_crop_mxu_batch is
        # jitted with the batch dim traced, so 2 faces then 3 faces would
        # otherwise compile two warp graphs (CLAUDE.md recompile discipline).
        n = len(dets)
        nb = _bucket(n)
        lms_np = np.zeros((nb, 5, 2), np.float32)
        lms_np[:n] = np.stack(
            [np.asarray(d["landmarks"], np.float32) for d in dets]
        )
        aligned = np.asarray(
            align_crop_mxu_batch(
                jnp.broadcast_to(frame, (nb,) + frame.shape),
                jnp.asarray(lms_np),
                size,
            )
        )[:n]
        embs = self.embedder.embed_uint8(aligned)
        matches = (
            self.match(embs, k)
            if len(self.gallery)
            else [("No database", 0.0, [])] * len(dets)
        )
        faces = []
        for d, emb, (name, score, top) in zip(dets, embs, matches):
            faces.append(
                {
                    "identity": name,
                    "confidence": score,
                    "top_k": top,
                    "bbox": list(d["bbox"]),
                    "det_score": float(d["confidence"]),
                    "embedding": emb,
                }
            )
        faces.sort(key=lambda f: -f["det_score"])
        return {"status": "success", "faces": faces}

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
    detector: Any = "default",
) -> RecognitionEngine:
    """Build an engine from a directory of saved galleries
    (reference recognition_engine.py:438-464): loads ``face_db.npy`` or the
    first .npy dict found in ``embeddings_dir``.

    Like the reference engine (recognition_engine.py:84,
    ``use_face_detection=True``), the returned engine detects+aligns by
    default: ``detector="default"`` constructs a :class:`FaceDetector` with
    the shipped checkpoint. Pass ``detector=None`` for whole-image
    embedding, or a ready detector instance to reuse one.
    """
    if detector == "default":
        from facerecognition_tpu.preprocessing.face_detector import (
            FaceDetector,
        )

        detector = FaceDetector()
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
