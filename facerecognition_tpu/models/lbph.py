"""TPU-native LBPH face recognizer (OpenCV ``cv2.face.LBPHFaceRecognizer``
parity, reimplemented as vectorized XLA ops).

Replaces the OpenCV-contrib C++ LBPH the reference delegates to
(models/lbphmodel/train_lbph.py:24-36, web_app.py:245). Semantics are
transcribed from OpenCV's documented extended-LBP operator:

- circular LBP, radius r, 8 neighbours, **bilinear-sampled** neighbour
  values (even at r=1 the diagonal taps are interpolated);
  bit n set when sampled >= center (with float eps).
- spatial histograms: the (H-2r, W-2r) code image is split into a
  grid_y x grid_x grid of floor-divided cells (remainder pixels dropped,
  row-major cell order), 2^8 = 256 bins per cell, each cell histogram
  normalized by its pixel count.
- matching: chi-square-alternative distance
  ``2 * Σ (h1-h2)² / (h1+h2)`` (HISTCMP_CHISQR_ALT), nearest neighbour over
  all training histograms, distance >= threshold → unknown (-1); lower
  distance = more confident (reference models/lbphmodel/evaluate_lbph.py:4-45).

The LBP-code + histogram computation is one jitted function — 8 static
shifted bilinear taps, bit-pack, one-hot segment-sum — so it fuses and runs
on the VPU; the distance scan is a vectorized reduce over the gallery.
"""

from __future__ import annotations

import math
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(1, 2))
def lbp_code_image(gray: jax.Array, radius: int = 1, neighbors: int = 8) -> jax.Array:
    """Extended (circular, bilinear-interpolated) LBP code image.

    Args:
      gray: (H, W) float32/uint8 grayscale image.
      radius, neighbors: LBP sampling parameters (OpenCV defaults 1, 8).

    Returns:
      (H - 2r, W - 2r) int32 code image in [0, 2^neighbors).
    """
    img = gray.astype(jnp.float32)
    h, w = img.shape
    r = radius
    center = img[r : h - r, r : w - r]
    code = jnp.zeros_like(center, dtype=jnp.int32)
    for n in range(neighbors):
        # Static neighbour offset + bilinear weights (python floats — traced
        # into constants; no dynamic control flow).
        x = radius * math.cos(2.0 * math.pi * n / neighbors)
        y = -radius * math.sin(2.0 * math.pi * n / neighbors)
        fx, fy = math.floor(x), math.floor(y)
        cx, cy = math.ceil(x), math.ceil(y)
        tx, ty = x - fx, y - fy
        w1 = (1 - tx) * (1 - ty)
        w2 = tx * (1 - ty)
        w3 = (1 - tx) * ty
        w4 = tx * ty

        def tap(dy: int, dx: int) -> jax.Array:
            return img[r + dy : h - r + dy, r + dx : w - r + dx]

        t = (
            w1 * tap(fy, fx)
            + w2 * tap(fy, cx)
            + w3 * tap(cy, fx)
            + w4 * tap(cy, cx)
        )
        bit = (t > center) | (jnp.abs(t - center) < jnp.finfo(jnp.float32).eps)
        code = code | (bit.astype(jnp.int32) << n)
    return code


@partial(jax.jit, static_argnums=(1, 2, 3))
def spatial_histogram(
    code: jax.Array, grid_x: int = 8, grid_y: int = 8, num_patterns: int = 256
) -> jax.Array:
    """Grid-cell histograms of an LBP code image, concatenated row-major.

    Cells are ``(H // grid_y, W // grid_x)``; remainder pixels are dropped
    (OpenCV convention). Each cell histogram is normalized by its pixel
    count. Returns (grid_y * grid_x * num_patterns,) float32.
    """
    h, w = code.shape
    ch, cw = h // grid_y, w // grid_x
    trimmed = code[: ch * grid_y, : cw * grid_x]
    # (grid_y, ch, grid_x, cw) → (grid_y*grid_x, ch*cw)
    cells = trimmed.reshape(grid_y, ch, grid_x, cw).transpose(0, 2, 1, 3)
    cells = cells.reshape(grid_y * grid_x, ch * cw)
    one_hot = jax.nn.one_hot(cells, num_patterns, dtype=jnp.float32)
    hist = jnp.sum(one_hot, axis=1) / float(ch * cw)
    return hist.reshape(-1)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def lbph_features(
    gray: jax.Array,
    radius: int = 1,
    neighbors: int = 8,
    grid_x: int = 8,
    grid_y: int = 8,
    num_patterns: int = 256,
) -> jax.Array:
    """Fused LBP code + spatial histogram for one image."""
    code = lbp_code_image(gray, radius, neighbors)
    return spatial_histogram(code, grid_x, grid_y, num_patterns)


@jax.jit
def chi2_alt_distances(query: jax.Array, gallery: jax.Array) -> jax.Array:
    """HISTCMP_CHISQR_ALT distances: ``2 Σ (q-g)²/(q+g)`` per gallery row.

    Args:
      query: (F,) histogram.
      gallery: (N, F) histograms.

    Returns:
      (N,) float32 distances.
    """
    q = query[None, :]
    num = (q - gallery) ** 2
    den = q + gallery
    return 2.0 * jnp.sum(jnp.where(den > 0, num / jnp.maximum(den, 1e-20), 0.0), axis=1)


# Batched chi2 with the gallery as a traced ARGUMENT - jitting a closure
# over the gallery inside predict_batch would retrace per call and bake the
# full (N, F) gallery into the graph as a constant.
_chi2_batch = jax.jit(jax.vmap(chi2_alt_distances, in_axes=(0, None)))


class LBPHModel:
    """Stateful shell over the jitted LBPH ops (train / predict / save / load).

    API parity with the reference's use of cv2.face.LBPHFaceRecognizer:
    - ``train(images, labels)`` (reference models/lbphmodel/train_lbph.py:24-36)
    - ``predict(image) -> (label, confidence)`` — nearest-neighbour chi2-alt,
      confidence = distance (lower is better), label -1 when
      distance >= threshold (reference inference_lbph.py:4-18)
    - ``update(images, labels)`` — incremental enrollment
    - ``save/load`` — npz (replaces the OpenCV XML)
    """

    def __init__(
        self,
        radius: int = 1,
        neighbors: int = 8,
        grid_x: int = 8,
        grid_y: int = 8,
        threshold: float = float("inf"),
    ):
        self.radius = radius
        self.neighbors = neighbors
        self.grid_x = grid_x
        self.grid_y = grid_y
        self.threshold = threshold
        self.histograms: np.ndarray | None = None  # (N, F)
        self.labels: np.ndarray | None = None  # (N,)
        self._features_batch = jax.jit(
            jax.vmap(
                lambda g: lbph_features(
                    g,
                    self.radius,
                    self.neighbors,
                    self.grid_x,
                    self.grid_y,
                    self.num_patterns,  # 2^neighbors bins, not the 256 default
                )
            )
        )

    @property
    def num_patterns(self) -> int:
        return 2**self.neighbors

    def _compute_histograms(self, images, chunk: int = 4096) -> np.ndarray:
        """Featurize a stack of grayscale images to (N, F) histograms.

        Chunked so reference-scale sets (the 9,343-id regime is ~75k train
        images) fit device memory: only one chunk of LBP-code intermediates
        is live at a time, and all chunks but the ragged tail reuse one
        compiled graph.
        """
        arr = np.asarray(images, dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[None]
        if len(arr) <= chunk:
            return np.asarray(self._features_batch(jnp.asarray(arr)))
        out = [
            np.asarray(self._features_batch(jnp.asarray(arr[i : i + chunk])))
            for i in range(0, len(arr), chunk)
        ]
        return np.concatenate(out)

    def train(self, images, labels) -> None:
        """(Re)train from a stack of same-size grayscale images."""
        hist = self._compute_histograms(images)
        lab = np.asarray(labels, dtype=np.int64).reshape(-1)
        if len(lab) != len(hist):  # validate BEFORE mutating state
            raise ValueError("images and labels length mismatch")
        self.histograms = hist
        self.labels = lab

    def update(self, images, labels) -> None:
        """Incrementally add samples (OpenCV ``update`` semantics)."""
        h = self._compute_histograms(images)
        l = np.asarray(labels, dtype=np.int64).reshape(-1)
        if self.histograms is None:
            self.histograms, self.labels = h, l
        else:
            self.histograms = np.concatenate([self.histograms, h])
            self.labels = np.concatenate([self.labels, l])

    def predict(self, image) -> tuple[int, float]:
        """Nearest-neighbour prediction for one grayscale image."""
        if self.histograms is None:
            raise RuntimeError("model not trained")
        feat = lbph_features(
            jnp.asarray(np.asarray(image, np.float32)),
            self.radius,
            self.neighbors,
            self.grid_x,
            self.grid_y,
            self.num_patterns,
        )
        dists = np.asarray(chi2_alt_distances(feat, jnp.asarray(self.histograms)))
        best = int(np.argmin(dists))
        conf = float(dists[best])
        label = int(self.labels[best]) if conf < self.threshold else -1
        return label, conf

    def predict_topk(self, image, k: int = 5) -> list[tuple[int, float]]:
        """Top-k identities by min distance over each identity's samples.

        The reference web app fakes LBPH top-k by re-predicting one sample
        image per identity from disk, capped at 30 ids (web_app.py:628-701);
        here it's exact and free: we already have every training histogram,
        so per-identity best distance is one segment-min.
        """
        if self.histograms is None:
            raise RuntimeError("model not trained")
        feat = lbph_features(
            jnp.asarray(np.asarray(image, np.float32)),
            self.radius,
            self.neighbors,
            self.grid_x,
            self.grid_y,
            self.num_patterns,
        )
        dists = np.asarray(chi2_alt_distances(feat, jnp.asarray(self.histograms)))
        best: dict[int, float] = {}
        for label, d in zip(self.labels, dists):
            l = int(label)
            if l not in best or d < best[l]:
                best[l] = float(d)
        ranked = sorted(best.items(), key=lambda t: t[1])
        return ranked[:k]

    def predict_batch(
        self, images, probe_chunk: int = 512
    ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized prediction: (labels, confidences) for a batch.

        The scan runs in probe chunks so the (B, N) distance matrix stays
        bounded at reference scale (N≈75k histograms for the 9,343-id set).
        """
        if self.histograms is None:
            raise RuntimeError("model not trained")
        feats = self._compute_histograms(images)
        gal = jnp.asarray(self.histograms)
        best_parts, conf_parts = [], []
        q = jnp.asarray(feats)
        for i in range(0, len(feats), probe_chunk):
            dists = np.asarray(_chi2_batch(q[i : i + probe_chunk], gal))
            b = np.argmin(dists, axis=1)
            best_parts.append(b)
            conf_parts.append(dists[np.arange(len(b)), b])
        best = np.concatenate(best_parts)
        conf = np.concatenate(conf_parts)
        labels = np.where(conf < self.threshold, self.labels[best], -1)
        return labels.astype(np.int64), conf.astype(np.float64)

    def save(self, path) -> None:
        np.savez(
            path,
            histograms=self.histograms,
            labels=self.labels,
            radius=self.radius,
            neighbors=self.neighbors,
            grid_x=self.grid_x,
            grid_y=self.grid_y,
            threshold=self.threshold,
        )

    @classmethod
    def load(cls, path) -> "LBPHModel":
        p = str(path)
        if not p.endswith(".npz"):
            p_path = Path(p)
            if not p_path.exists() and p_path.with_suffix(".npz").exists():
                p = str(p_path.with_suffix(".npz"))
        data = np.load(p, allow_pickle=False)
        model = cls(
            radius=int(data["radius"]),
            neighbors=int(data["neighbors"]),
            grid_x=int(data["grid_x"]),
            grid_y=int(data["grid_y"]),
            threshold=float(data["threshold"]),
        )
        model.histograms = data["histograms"]
        model.labels = data["labels"]
        return model
