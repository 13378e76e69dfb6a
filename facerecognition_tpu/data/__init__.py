"""Data layer: dataset indexing, samplers, prefetching host loader, and
device-side augmentation. Replaces the reference's torch DataLoader +
albumentations stack (models/arcface/arcface_dataloader.py, 877 LoC): file
IO/decode happens on host threads; all augmentation math runs on-device
inside the jitted train step."""

from facerecognition_tpu.data.datasets import (
    CSVDataset,
    FolderDataset,
    check_identity_overlap,
    split_by_identity,
    split_by_image,
)
from facerecognition_tpu.data.sampler import (
    ClassBalancedSampler,
    PKSampler,
)
from facerecognition_tpu.data.loader import BatchLoader, benchmark_loader
from facerecognition_tpu.data.augment import AUG_TIERS, augment_batch

__all__ = [
    "CSVDataset",
    "FolderDataset",
    "check_identity_overlap",
    "split_by_identity",
    "split_by_image",
    "ClassBalancedSampler",
    "PKSampler",
    "BatchLoader",
    "benchmark_loader",
    "AUG_TIERS",
    "augment_batch",
]
