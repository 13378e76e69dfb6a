"""Inference layer: recognition engine, embedding extraction, evaluation,
explainability, database builder — API parity with the reference's
inference/__init__.py:1-34 surface, dispatching to batched on-device compute."""

from facerecognition_tpu.inference.engine import (
    Gallery,
    RecognitionEngine,
    create_engine_from_embeddings_dir,
)
from facerecognition_tpu.ops.matcher import cosine_similarity
from facerecognition_tpu.inference.extract_embeddings import (
    EmbedderConfig,
    SearchIndex,
    build_db,
    build_faiss_index,
    compute_prototypes_from_arrays,
    extract_embedding_single,
    extract_embeddings_batch,
    extract_embeddings_from_csv,
    full_pipeline,
    default_arcface_checkpoint,
    default_facenet_checkpoint,
    load_arcface_model,
    load_facenet_model,
    visualize_tsne,
)
from facerecognition_tpu.inference.explainability import (
    ExplainabilityEngine,
    FaceNetExplainabilityEngine,
    GradCAM,
)
from facerecognition_tpu.inference.database_builder import (
    BuildJob,
    DatabaseBuilder,
    get_builder,
)

__all__ = [
    "SearchIndex",
    "build_faiss_index",
    "extract_embeddings_from_csv",
    "full_pipeline",
    "visualize_tsne",
    "ExplainabilityEngine",
    "FaceNetExplainabilityEngine",
    "GradCAM",
    "BuildJob",
    "DatabaseBuilder",
    "get_builder",
    "Gallery",
    "RecognitionEngine",
    "create_engine_from_embeddings_dir",
    "cosine_similarity",
    "EmbedderConfig",
    "build_db",
    "compute_prototypes_from_arrays",
    "extract_embedding_single",
    "extract_embeddings_batch",
    "default_arcface_checkpoint",
    "default_facenet_checkpoint",
    "load_arcface_model",
    "load_facenet_model",
]
