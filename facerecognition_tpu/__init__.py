"""facerecognition_tpu — TPU-native face recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
sin0235/FaceRecognition (detect → align → embed → match, with ArcFace /
FaceNet / LBPH backends, training pipelines, evaluation, explainability,
database building, and web apps), designed TPU-first:

- All compute paths are pure jitted functions over pytrees (static shapes,
  `lax` control flow) so XLA can tile them onto the MXU.
- Gallery matching is a single bf16 matmul + `lax.top_k` (replaces the
  reference's python cosine loop and FAISS; see
  reference inference/recognition_engine.py:267-326).
- Multi-chip scaling goes through `jax.sharding.Mesh` (data-parallel
  training, gallery-sharded search) — see `facerecognition_tpu.parallel`.
"""

__version__ = "0.1.0"

from facerecognition_tpu.ops.umeyama import ARCFACE_TEMPLATE, umeyama
from facerecognition_tpu.ops.matcher import cosine_similarity

__all__ = [
    "ARCFACE_TEMPLATE",
    "umeyama",
    "cosine_similarity",
    "__version__",
]
