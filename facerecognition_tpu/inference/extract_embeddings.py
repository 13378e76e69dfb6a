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
    # ArcFace backbone depth: (3, 4, 6, 3) = ResNet50 (reference parity);
    # (2, 2, 2, 2) = the slim serving variant. Ignored for facenet.
    stage_sizes: tuple = (3, 4, 6, 3)


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
                embedding_size=config.embedding_size,
                dtype=config.dtype,
                stage_sizes=tuple(config.stage_sizes),
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


def load_arcface_checkpoint(
    checkpoint_path: str,
    embedding_size: int = 512,
    dtype: Any = jnp.float32,
) -> tuple[ArcFaceModel, dict]:
    """(model, variables) for a serving checkpoint, arch marker honored.

    The single place that understands the ``stage_sizes`` key — every
    consumer that builds its own jitted graph around the raw model
    (bench.py, scripts/profile_pipeline.py, examples/realtime_bench.py)
    must load through here or a slim checkpoint crashes on param-tree
    mismatch against a hard-coded ResNet50.
    """
    from facerecognition_tpu.models.port_torch import arcface_key_map

    variables = _load_variables_any(checkpoint_path, arcface_key_map)
    stages = (3, 4, 6, 3)
    if isinstance(variables, dict):
        raw = variables.pop("stage_sizes", None)
        if raw is not None:
            stages = tuple(int(v) for v in np.asarray(raw))
        variables = {
            k: variables[k] for k in ("params", "batch_stats") if k in variables
        }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = ArcFaceModel(
        embedding_size=embedding_size, dtype=dtype, stage_sizes=stages
    )
    return model, variables


def default_arcface_checkpoint() -> Optional[str]:
    """Best shipped ArcFace serving checkpoint, or None.

    Preference order on the synthid-9k eval (docs/SYNTHID9K_*_EVAL.json,
    round-5 A/B):

    | backbone | 9k top-1 | open-set 120-id | end-to-end faces/s |
    |---|---|---|---|
    | ultraslim (1,1,1,1) | 99.968% | 100.0% | 28,988 |
    | slim (2,2,2,2) | 99.982% | 100.0% | 24,159 |
    | (3,4,6,3) | 99.95% | — | ~20,000 |

    The ultraslim checkpoint ships as the serving default: it ties slim
    on the open-set test, sits ABOVE the reference-depth (3,4,6,3)
    backbone on the closed-set eval (99.968 vs 99.95), and is 20% faster
    end-to-end; the 0.014pp closed-set delta vs slim (~1 query in 7,000
    at 9,343 ids) buys the speed. Pin the slim checkpoint explicitly
    where that delta matters. bench.py and the web app resolve their
    default embedder through here so the whole stack ships the same
    weights.
    """
    assets = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "assets",
    )
    for name in (
        "arcface_synthid9k_ultraslim_512.msgpack",
        "arcface_synthid9k_slim_512.msgpack",
        "arcface_synthid9k_512.msgpack",
        "arcface_synthid_512.msgpack",
    ):
        path = os.path.join(assets, name)
        if os.path.exists(path):
            return path
    return None


def default_facenet_checkpoint() -> Optional[str]:
    """Best shipped FaceNet serving checkpoint, or None.

    Mirrors default_arcface_checkpoint: the 9,343-identity triplet run
    (two-phase semi-hard → batch-hard, training/train_facenet.py) is
    preferred over the legacy 2,000-id checkpoint.
    """
    assets = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "assets",
    )
    for name in (
        "facenet_synthid9k_512.msgpack",
        "facenet_synthid_512.msgpack",
    ):
        path = os.path.join(assets, name)
        if os.path.exists(path):
            return path
    return None


def load_arcface_model(
    checkpoint_path: Optional[str] = None,
    embedding_size: int = 512,
    dtype: Any = jnp.float32,
    stage_sizes: Optional[tuple] = None,
) -> Embedder:
    """Load an ArcFace embedder (reference extract_embeddings.py:80-134).

    Accepts flax msgpack checkpoints or reference torch .pth checkpoints
    (ported on the fly). ``checkpoint_path=None`` → random init (testing).
    Backbone depth rides in the checkpoint as a ``stage_sizes`` key (like
    the detector's ``arch`` marker); absent → ResNet50. An explicit
    ``stage_sizes`` argument overrides both.
    """
    ckpt_stages = None
    if checkpoint_path:
        model, variables = load_arcface_checkpoint(
            checkpoint_path, embedding_size, dtype
        )
        ckpt_stages = model.stage_sizes
    stages = tuple(stage_sizes or ckpt_stages or (3, 4, 6, 3))
    config = EmbedderConfig("arcface", embedding_size, 112, dtype, stages)
    if not checkpoint_path:
        model = ArcFaceModel(
            embedding_size=embedding_size, dtype=dtype, stage_sizes=stages
        )
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


def extract_embeddings_from_csv(
    csv_path: str,
    embedder: Embedder,
    image_root: Optional[str] = None,
    preprocess: Optional[Callable] = None,
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """CSV-driven extraction (reference extract_embeddings.py:446-552).

    Returns (embeddings (N, D), labels (N,), label_names) — failed images
    skipped.
    """
    from facerecognition_tpu.data.datasets import CSVDataset

    index = CSVDataset(csv_path, image_root)
    embs, kept = extract_embeddings_batch(index.paths, embedder, preprocess)
    return embs, index.labels[kept], index.label_names


class SearchIndex:
    """Exact inner-product top-k index — the FAISS IndexFlatIP replacement
    (reference extract_embeddings.py:595-645): a normalized device matrix +
    one matmul + lax.top_k, with the id→label mapping attached."""

    def __init__(self, embeddings: np.ndarray, labels: Optional[np.ndarray] = None):
        from facerecognition_tpu.ops.matcher import l2_normalize

        emb = np.asarray(embeddings, np.float32)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        self.matrix = jnp.asarray(emb / np.maximum(norm, 1e-12))
        self.labels = (
            np.asarray(labels) if labels is not None else np.arange(len(emb))
        )

    def __len__(self) -> int:
        return int(self.matrix.shape[0])

    def search(self, queries: np.ndarray, k: int = 5):
        """Returns (scores (B, k), ids (B, k)) where ids are the attached
        labels of the nearest rows."""
        from facerecognition_tpu.ops.matcher import cosine_topk

        k = min(k, len(self))
        scores, idx = cosine_topk(jnp.asarray(queries), self.matrix, k)
        return np.asarray(scores), self.labels[np.asarray(idx)]

    def save(self, path: str) -> None:
        np.savez(
            path, matrix=np.asarray(self.matrix), labels=self.labels
        )

    @classmethod
    def load(cls, path: str) -> "SearchIndex":
        data = np.load(path if path.endswith(".npz") else path + ".npz",
                       allow_pickle=False)
        return cls(data["matrix"], data["labels"])


# Back-compat alias for the reference's name.
build_faiss_index = SearchIndex


def visualize_tsne(
    embeddings: np.ndarray,
    labels: np.ndarray,
    output_path: str,
    max_classes: int = 20,
    perplexity: float = 30.0,
    seed: int = 0,
) -> str:
    """t-SNE embedding plot (reference extract_embeddings.py:648-711):
    subsamples to the most frequent ``max_classes`` identities."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    labels = np.asarray(labels)
    classes, counts = np.unique(labels, return_counts=True)
    top = classes[np.argsort(-counts)][:max_classes]
    mask = np.isin(labels, top)
    emb = np.asarray(embeddings)[mask]
    lab = labels[mask]
    perplexity = min(perplexity, max(len(emb) - 1, 1) / 3)
    proj = TSNE(
        n_components=2, perplexity=perplexity, random_state=seed, init="pca"
    ).fit_transform(emb)
    fig, ax = plt.subplots(figsize=(8, 8))
    for c in top:
        pts = proj[lab == c]
        ax.scatter(pts[:, 0], pts[:, 1], s=8, label=str(c))
    if len(top) <= 20:
        ax.legend(fontsize=6, markerscale=1.5)
    ax.set_title(f"t-SNE of {len(emb)} embeddings / {len(top)} identities")
    d = os.path.dirname(output_path)
    if d:
        os.makedirs(d, exist_ok=True)
    fig.savefig(output_path, dpi=120, bbox_inches="tight")
    import matplotlib.pyplot as plt2

    plt2.close(fig)
    return output_path


def full_pipeline(
    csv_path: str,
    embedder: Embedder,
    output_dir: str,
    image_root: Optional[str] = None,
    preprocess: Optional[Callable] = None,
) -> dict:
    """extract → prototypes → index → t-SNE (reference :838-889)."""
    os.makedirs(output_dir, exist_ok=True)
    embs, labels, names = extract_embeddings_from_csv(
        csv_path, embedder, image_root, preprocess
    )
    np.save(os.path.join(output_dir, "embeddings.npy"), embs)
    np.save(os.path.join(output_dir, "labels.npy"), labels)
    protos = compute_prototypes_from_arrays(embs, labels, len(names))
    np.save(os.path.join(output_dir, "prototypes.npy"), protos)
    index = SearchIndex(protos, np.arange(len(names)))
    index.save(os.path.join(output_dir, "search_index"))
    tsne_path = None
    if len(embs) >= 10:
        tsne_path = visualize_tsne(
            embs, labels, os.path.join(output_dir, "tsne.png")
        )
    return {
        "n_embeddings": len(embs),
        "n_classes": len(names),
        "embeddings_path": os.path.join(output_dir, "embeddings.npy"),
        "prototypes_path": os.path.join(output_dir, "prototypes.npy"),
        "index_path": os.path.join(output_dir, "search_index.npz"),
        "tsne_path": tsne_path,
    }


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


def main(argv: Optional[list[str]] = None):
    """CLI with db / csv / full modes (reference :891-950)."""
    import argparse

    parser = argparse.ArgumentParser(description="Embedding extraction")
    parser.add_argument("--mode", choices=["db", "csv", "full"], default="db")
    parser.add_argument("--model", choices=["arcface", "facenet"], default="arcface")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--data-dir", default=None, help="db mode: person folders")
    parser.add_argument("--csv", default=None, help="csv/full modes")
    parser.add_argument("--image-root", default=None)
    parser.add_argument("--output", default="databases/out")
    args = parser.parse_args(argv)

    loader = load_arcface_model if args.model == "arcface" else load_facenet_model
    embedder = loader(args.checkpoint)
    if args.mode == "db":
        if not args.data_dir:
            parser.error("--data-dir required for db mode")
        db = build_db(
            args.data_dir,
            embedder,
            output_path=os.path.join(args.output, "face_db.npy"),
        )
        print(f"built gallery: {len(db)} identities → {args.output}/face_db.npy")
    elif args.mode == "csv":
        if not args.csv:
            parser.error("--csv required for csv mode")
        embs, labels, names = extract_embeddings_from_csv(
            args.csv, embedder, args.image_root
        )
        os.makedirs(args.output, exist_ok=True)
        np.save(os.path.join(args.output, "embeddings.npy"), embs)
        np.save(os.path.join(args.output, "labels.npy"), labels)
        print(f"extracted {len(embs)} embeddings / {len(names)} classes")
    else:
        if not args.csv:
            parser.error("--csv required for full mode")
        result = full_pipeline(args.csv, embedder, args.output, args.image_root)
        print(result)


if __name__ == "__main__":
    main()
