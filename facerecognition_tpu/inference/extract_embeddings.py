"""Embedding extraction: model loading, preprocessing, batched extraction,
prototypes, gallery building.

TPU-native rebuild of reference inference/extract_embeddings.py. The
reference extracts one image per forward during DB build
(extract_embeddings.py:348-389, called per image at :714); here every path
is batched through one jitted embed function with shape bucketing so XLA
compiles a handful of graphs and the MXU stays fed.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from facerecognition_tpu.models.arcface import ArcFaceModel
from facerecognition_tpu.models.facenet import FaceNetModel
from facerecognition_tpu.ops.image import bilinear_resize, normalize_imagenet_style
from facerecognition_tpu.ops.matcher import compute_prototypes, l2_normalize
from facerecognition_tpu.utils.imageio import load_image
from facerecognition_tpu.utils.serialization import load_variables

# Batch-size buckets: inputs are padded up to the nearest bucket so jit
# compiles a bounded set of graphs (recompile discipline — SURVEY.md §7).
BATCH_BUCKETS = (1, 8, 32, 128, 512)


def _bucket(n: int) -> int:
    for b in BATCH_BUCKETS:
        if n <= b:
            return b
    return ((n + BATCH_BUCKETS[-1] - 1) // BATCH_BUCKETS[-1]) * BATCH_BUCKETS[-1]


@dataclasses.dataclass
class EmbedderConfig:
    """Which embedding model + input geometry to use."""

    model_type: str = "arcface"  # arcface | facenet
    embedding_size: int = 512
    input_size: int = 112  # 112 for arcface, 160 for facenet
    dtype: Any = jnp.float32


class Embedder:
    """Jitted image→embedding function with batch bucketing.

    The device pipeline is: uint8 HWC images → resize (if needed) →
    (x/255 - .5)/.5 normalize → backbone → L2 normalize, all inside one jit
    (the reference's transform+forward+F.normalize stack,
    extract_embeddings.py:170-185, 374-384).
    """

    def __init__(self, config: EmbedderConfig, variables: Any):
        self.config = config
        if config.model_type == "arcface":
            self.model = ArcFaceModel(
                embedding_size=config.embedding_size, dtype=config.dtype
            )
        elif config.model_type == "facenet":
            self.model = FaceNetModel(
                embedding_size=config.embedding_size, dtype=config.dtype
            )
        else:
            raise ValueError(f"unknown model_type {config.model_type}")
        self.variables = variables
        s = config.input_size

        def _embed(variables, images):
            # images: (B, s, s, 3) float32 in [0, 255]
            x = normalize_imagenet_style(images)
            emb = self.model.apply(variables, x)
            return l2_normalize(emb.astype(jnp.float32))

        self._embed = jax.jit(_embed)

    def embed_uint8(self, images: np.ndarray) -> np.ndarray:
        """Embed a (N, H, W, 3) uint8/float batch; resizes if H != input_size."""
        n = len(images)
        if n == 0:
            return np.zeros((0, self.config.embedding_size), np.float32)
        arr = np.asarray(images, np.float32)
        s = self.config.input_size
        if arr.shape[1] != s or arr.shape[2] != s:
            arr = np.asarray(bilinear_resize(jnp.asarray(arr), s, s))
        b = _bucket(n)
        if b != n:
            arr = np.concatenate(
                [arr, np.zeros((b - n,) + arr.shape[1:], np.float32)]
            )
        out = np.asarray(self._embed(self.variables, jnp.asarray(arr)))
        return out[:n]


def _load_variables_any(path: str, key_map) -> Any:
    """Load model variables from a flax msgpack file or a torch .pth."""
    if path.endswith((".pth", ".pt")):
        from facerecognition_tpu.models.port_torch import (
            load_torch_checkpoint,
            port_state_dict,
        )

        return port_state_dict(load_torch_checkpoint(path), key_map)
    return load_variables(path)


def load_arcface_model(
    checkpoint_path: Optional[str] = None,
    embedding_size: int = 512,
    dtype: Any = jnp.float32,
) -> Embedder:
    """Load an ArcFace embedder (reference extract_embeddings.py:80-134).

    Accepts flax msgpack checkpoints or reference torch .pth checkpoints
    (ported on the fly). ``checkpoint_path=None`` → random init (testing).
    """
    config = EmbedderConfig("arcface", embedding_size, 112, dtype)
    if checkpoint_path:
        from facerecognition_tpu.models.port_torch import arcface_key_map

        variables = _load_variables_any(checkpoint_path, arcface_key_map)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        model = ArcFaceModel(embedding_size=embedding_size, dtype=dtype)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3))
        )
    return Embedder(config, variables)


def load_facenet_model(
    checkpoint_path: Optional[str] = None,
    embedding_size: int = 512,
    dtype: Any = jnp.float32,
) -> Embedder:
    """Load a FaceNet embedder (reference extract_embeddings.py:137-167)."""
    config = EmbedderConfig("facenet", embedding_size, 160, dtype)
    if checkpoint_path:
        from facerecognition_tpu.models.port_torch import facenet_wrapper_key_map

        variables = _load_variables_any(checkpoint_path, facenet_wrapper_key_map)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        model = FaceNetModel(embedding_size=embedding_size, dtype=dtype)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3))
        )
    return Embedder(config, variables)


def extract_embedding_single(
    img_input, embedder: Embedder, preprocess: Optional[Callable] = None
) -> Optional[np.ndarray]:
    """Extract one L2-normalized embedding (reference :348-389 contract)."""
    try:
        img = load_image(img_input)
    except (FileNotFoundError, OSError):
        return None
    if preprocess is not None:
        img = preprocess(img)
        if img is None:
            return None
    return embedder.embed_uint8(np.asarray(img)[None])[0]


def extract_embeddings_batch(
    img_inputs: Sequence, embedder: Embedder, preprocess: Optional[Callable] = None
) -> tuple[np.ndarray, list[int]]:
    """Batched extraction with per-image failure skipping.

    Returns (embeddings (M, D), kept_indices) — failed loads are skipped,
    mirroring reference extract_embeddings.py:392-443 (:420-422 skip path).
    """
    images, kept = [], []
    size = None
    for i, inp in enumerate(img_inputs):
        try:
            img = load_image(inp)
            if preprocess is not None:
                img = preprocess(img)
                if img is None:
                    continue
            img = np.asarray(img)
            s = embedder.config.input_size
            if img.shape[0] != s or img.shape[1] != s:
                img = np.asarray(bilinear_resize(jnp.asarray(img.astype(np.float32)), s, s))
            images.append(img)
            kept.append(i)
        except (FileNotFoundError, OSError):
            continue
    if not images:
        return np.zeros((0, embedder.config.embedding_size), np.float32), []
    return embedder.embed_uint8(np.stack(images)), kept


def compute_prototypes_from_arrays(
    embeddings: np.ndarray, labels: np.ndarray, num_classes: Optional[int] = None
) -> np.ndarray:
    """Per-class mean prototypes (reference extract_embeddings.py:555-592)."""
    if num_classes is None:
        num_classes = int(labels.max()) + 1 if len(labels) else 0
    return np.asarray(
        compute_prototypes(jnp.asarray(embeddings), jnp.asarray(labels), num_classes)
    )


def build_db(
    dataset_dir: str,
    embedder: Embedder,
    preprocess: Optional[Callable] = None,
    output_path: Optional[str] = None,
    progress: Optional[Callable[[int, int, str], None]] = None,
) -> dict[str, np.ndarray]:
    """Build a {person: mean_embedding} gallery from a person-per-folder dir.

    Batched rebuild of reference ``build_db`` (extract_embeddings.py:714-835,
    which runs one forward per image): all images of a person go through the
    bucketed batch embedder, then mean + L2 normalize.
    """
    people = sorted(
        d
        for d in os.listdir(dataset_dir)
        if os.path.isdir(os.path.join(dataset_dir, d))
    )
    db: dict[str, np.ndarray] = {}
    for i, person in enumerate(people):
        pdir = os.path.join(dataset_dir, person)
        paths = [
            os.path.join(pdir, f)
            for f in sorted(os.listdir(pdir))
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp"))
        ]
        embs, _ = extract_embeddings_batch(paths, embedder, preprocess)
        if len(embs) == 0:
            continue
        mean = embs.mean(axis=0)
        db[person] = mean / (np.linalg.norm(mean) + 1e-8)
        if progress is not None:
            progress(i + 1, len(people), person)
    if output_path:
        d = os.path.dirname(output_path)
        if d:
            os.makedirs(d, exist_ok=True)
        np.save(output_path, db, allow_pickle=True)
    return db
