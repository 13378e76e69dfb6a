"""Explainability: Grad-CAM via jax.grad — no hooks, just a functional split.

Rebuild of reference inference/explainability.py (525 LoC). The reference
registers forward/backward torch hooks on backbone.layer4 (:21-131); here
the models return their CAM feature map directly, and the gradient of the
score wrt that map is one ``jax.grad`` through the embedding head:

- ArcFace Grad-CAM: score = cosine(embedding, target) when a target
  embedding is given, else ||embedding||² (reference :103-107); CAM =
  ReLU(Σ_c w_c · A_c) with w = spatial-mean of ∂score/∂A.
- FaceNet activation-CAM: Σ_c |A_c| of the block8 map — no gradients,
  because they vanish through the final L2 normalize (reference :395-515
  documents the same workaround).

Heatmap/overlay utilities mirror :134-173 (jet colormap, alpha blend).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from facerecognition_tpu.ops.image import bilinear_resize, normalize_imagenet_style


class GradCAM:
    """Grad-CAM over an ArcFace-style model with a feature_map re-entry path.

    ``model.apply(vars, x, return_feature_map=True)`` must return
    (embedding, fmap) and ``model.apply(vars, None, feature_map=f)`` must
    return the embedding derived from ``f``.
    """

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

        def fwd(x):
            return self.model.apply(self.variables, x, return_feature_map=True)

        def emb_from_fmap(fmap):
            return self.model.apply(self.variables, None, feature_map=fmap)

        def cam_fn(x, target, use_target):
            emb, fmap = fwd(x)

            def score_fn(f):
                e = emb_from_fmap(f)
                e = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12
                )
                cos = jnp.sum(e * target, axis=-1)
                l2 = jnp.sum(
                    jnp.square(emb_from_fmap(f)), axis=-1
                )
                return jnp.sum(jnp.where(use_target, cos, l2))

            grads = jax.grad(score_fn)(fmap)  # (B, h, w, C)
            weights = jnp.mean(grads, axis=(1, 2), keepdims=True)
            cam = jnp.maximum(jnp.sum(weights * fmap, axis=-1), 0.0)
            return cam, emb

        self._cam = jax.jit(cam_fn)

    def generate(
        self,
        image: np.ndarray,
        target_embedding: Optional[np.ndarray] = None,
        out_size: Optional[int] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """image: (S, S, 3) uint8/float [0,255] (pre-aligned crop).

        Returns (cam (out, out) in [0,1], embedding (D,)).
        """
        x = normalize_imagenet_style(
            jnp.asarray(np.asarray(image, np.float32))
        )[None]
        if target_embedding is None:
            # Shape must match the model's embedding (the unused cos branch
            # still traces — a hardcoded 512 breaks non-default sizes).
            dim = getattr(self.model, "embedding_size", 512)
            target = jnp.zeros((1, dim), jnp.float32)
            use_target = jnp.asarray(False)
        else:
            t = np.asarray(target_embedding, np.float32).reshape(1, -1)
            t = t / max(np.linalg.norm(t), 1e-12)
            target = jnp.asarray(t)
            use_target = jnp.asarray(True)
        cam, emb = self._cam(x, target, use_target)
        cam = np.asarray(cam)[0]
        size = out_size or image.shape[0]
        cam = np.asarray(bilinear_resize(jnp.asarray(cam), size, size))
        lo, hi = cam.min(), cam.max()
        cam = (cam - lo) / (hi - lo) if hi > lo else np.zeros_like(cam)
        return cam, np.asarray(emb)[0]


class ActivationCAM:
    """Gradient-free CAM: channel-summed |activation| of the CAM map.

    For FaceNet, where gradients vanish after the output L2 normalize
    (reference explainability.py:395-515).
    """

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

        def fwd(x):
            emb, fmap = self.model.apply(
                self.variables, x, return_feature_map=True
            )
            cam = jnp.sum(jnp.abs(fmap), axis=-1)
            return cam, emb

        self._fwd = jax.jit(fwd)

    def generate(
        self, image: np.ndarray, out_size: Optional[int] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        x = normalize_imagenet_style(
            jnp.asarray(np.asarray(image, np.float32))
        )[None]
        cam, emb = self._fwd(x)
        cam = np.asarray(cam)[0]
        size = out_size or image.shape[0]
        cam = np.asarray(bilinear_resize(jnp.asarray(cam), size, size))
        lo, hi = cam.min(), cam.max()
        cam = (cam - lo) / (hi - lo) if hi > lo else np.zeros_like(cam)
        return cam, np.asarray(emb)[0]


def cam_to_heatmap(cam: np.ndarray) -> np.ndarray:
    """[0,1] CAM → RGB uint8 jet-style heatmap (reference :134-147)."""
    c = np.clip(cam, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * c - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * c - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * c - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def overlay_heatmap(
    image: np.ndarray, cam: np.ndarray, alpha: float = 0.45
) -> np.ndarray:
    """Alpha-blend the CAM heatmap onto the image (reference :150-173)."""
    heat = cam_to_heatmap(cam).astype(np.float32)
    img = np.asarray(image, np.float32)
    if img.shape[:2] != heat.shape[:2]:
        img = np.asarray(
            bilinear_resize(jnp.asarray(img), heat.shape[0], heat.shape[1])
        )
    out = (1 - alpha) * img + alpha * heat
    return np.clip(out, 0, 255).astype(np.uint8)


class ExplainabilityEngine:
    """ArcFace explainability: detect → align → Grad-CAM → overlay
    (reference ExplainabilityEngine, explainability.py:235-392)."""

    def __init__(self, embedder, detector=None):
        self.embedder = embedder
        self.detector = detector
        self.gradcam = GradCAM(embedder.model, embedder.variables)

    def _prepare(self, img_input) -> Optional[np.ndarray]:
        from facerecognition_tpu.utils.imageio import load_image
        from facerecognition_tpu.ops.image import align_crop

        img = load_image(img_input)
        size = self.embedder.config.input_size
        if self.detector is not None:
            det = self.detector.detect(img)
            if det is not None and det.get("landmarks") is not None:
                return np.asarray(
                    align_crop(
                        jnp.asarray(np.asarray(img, np.float32)),
                        jnp.asarray(np.asarray(det["landmarks"], np.float32)),
                        size,
                    )
                )
        if img.shape[0] != size or img.shape[1] != size:
            img = np.asarray(
                bilinear_resize(jnp.asarray(np.asarray(img, np.float32)), size, size)
            )
        return np.asarray(img)

    def explain(
        self, img_input, target_embedding: Optional[np.ndarray] = None
    ) -> Optional[dict]:
        """Returns {'cam', 'heatmap', 'overlay', 'embedding', 'face'}."""
        face = self._prepare(img_input)
        if face is None:
            return None
        cam, emb = self.gradcam.generate(face, target_embedding)
        return {
            "cam": cam,
            "heatmap": cam_to_heatmap(cam),
            "overlay": overlay_heatmap(face, cam),
            "embedding": emb,
            "face": np.clip(face, 0, 255).astype(np.uint8),
        }


class FaceNetExplainabilityEngine(ExplainabilityEngine):
    """FaceNet activation-CAM engine (reference :395-515)."""

    def __init__(self, embedder, detector=None):
        self.embedder = embedder
        self.detector = detector
        self.cam_engine = ActivationCAM(embedder.model, embedder.variables)

    def explain(self, img_input, target_embedding=None) -> Optional[dict]:
        face = self._prepare(img_input)
        if face is None:
            return None
        cam, emb = self.cam_engine.generate(face)
        return {
            "cam": cam,
            "heatmap": cam_to_heatmap(cam),
            "overlay": overlay_heatmap(face, cam),
            "embedding": emb,
            "face": np.clip(face, 0, 255).astype(np.uint8),
        }
