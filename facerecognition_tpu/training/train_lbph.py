"""LBPH training: from-directory pipeline, evaluation, threshold search.

Rebuild of reference components #12-14:
- ``train_lbph_from_directory`` (models/lbphmodel/train_lbph_script.py:135-
  227): directory → label map (sorted, digit-aware) → optional face-detect
  crop → 100x100 grayscale → train → save model + label_map + threshold.
- ``evaluate_lbph`` (evaluate_lbph.py:4-45): accuracy + coverage under a
  distance threshold (LBPH distance: lower = better; predictions above the
  threshold count as "not covered").
- ``find_optimal_threshold`` (threshold_lbph.py:7-96): predict-once cache,
  maximize accuracy x coverage s.t. coverage >= min_coverage over
  range(40, 121, 5), and write the winner back into the YAML config
  (train_lbph_script.py:287-309 feedback loop).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import yaml

from facerecognition_tpu.data.datasets import FolderDataset
from facerecognition_tpu.models.lbph import LBPHModel
from facerecognition_tpu.ops.image import bilinear_resize, rgb_to_grayscale
from facerecognition_tpu.utils.imageio import load_image


def load_faces_and_labels(
    data_dir: str,
    image_size: int = 100,
    detector=None,
    min_images: int = 1,
) -> tuple[np.ndarray, np.ndarray, dict[int, str]]:
    """Load a person-per-folder dir as grayscale crops + labels + label map.

    With a detector, faces are detected+cropped first (reference
    train_lbph_script.py:50-76); without, images are resized whole.
    """
    import jax.numpy as jnp

    index = FolderDataset(data_dir, min_images=min_images)
    images, labels = [], []
    for path, label in zip(index.paths, index.labels):
        try:
            img = load_image(path)
        except (FileNotFoundError, OSError):
            continue
        if detector is not None:
            crop = detector.crop_face(img, margin=0.1, target_size=image_size)
            if crop is None:
                continue
            img = crop
        gray = np.asarray(rgb_to_grayscale(jnp.asarray(np.asarray(img, np.float32))))
        if gray.shape != (image_size, image_size):
            gray = np.asarray(
                bilinear_resize(jnp.asarray(gray), image_size, image_size)
            )
        images.append(gray)
        labels.append(int(label))
    label_map = {i: n for i, n in enumerate(index.label_names)}
    return np.stack(images), np.asarray(labels, np.int64), label_map


def evaluate_lbph(
    model: LBPHModel,
    images: np.ndarray,
    labels: np.ndarray,
    threshold: float,
) -> dict:
    """Accuracy + coverage at a distance threshold (reference
    evaluate_lbph.py:4-45): covered = distance < threshold; accuracy is
    measured over covered samples only."""
    # Ignore the model's own threshold: use a clone with threshold=inf so
    # raw nearest-neighbour labels/distances come through, then apply the
    # sweep threshold here.
    m2 = LBPHModel(model.radius, model.neighbors, model.grid_x, model.grid_y)
    m2.histograms, m2.labels = model.histograms, model.labels
    pred_all, conf_all = m2.predict_batch(images)
    covered = conf_all < threshold
    n_cov = int(covered.sum())
    acc = (
        float((pred_all[covered] == labels[covered]).mean()) if n_cov else 0.0
    )
    return {
        "accuracy": acc,
        "coverage": n_cov / max(len(labels), 1),
        "n_covered": n_cov,
        "n_total": len(labels),
        "predictions": pred_all,
        "confidences": conf_all,
    }


def find_optimal_threshold(
    model: LBPHModel,
    images: np.ndarray,
    labels: np.ndarray,
    thresholds: Sequence[float] = tuple(range(40, 121, 5)),
    min_coverage: float = 0.3,
) -> tuple[float, dict, list[dict]]:
    """Predict once, sweep thresholds, maximize accuracy*coverage subject to
    coverage >= min_coverage (reference threshold_lbph.py:7-96).

    Returns (best_threshold, best_result, all_results).
    """
    m2 = LBPHModel(model.radius, model.neighbors, model.grid_x, model.grid_y)
    m2.histograms, m2.labels = model.histograms, model.labels
    pred, conf = m2.predict_batch(images)  # predict-once cache
    results = []
    for thr in thresholds:
        covered = conf < thr
        n_cov = int(covered.sum())
        acc = (
            float((pred[covered] == labels[covered]).mean()) if n_cov else 0.0
        )
        cov = n_cov / max(len(labels), 1)
        results.append(
            {
                "threshold": float(thr),
                "accuracy": acc,
                "coverage": cov,
                "score": acc * cov,
            }
        )
    eligible = [r for r in results if r["coverage"] >= min_coverage]
    pool = eligible if eligible else results
    best = max(pool, key=lambda r: r["score"])
    return best["threshold"], best, results


def write_threshold_to_config(config_path: str, threshold: float) -> None:
    """Write the tuned threshold back into the YAML config — the reference's
    feedback loop (train_lbph_script.py:287-309) that the web app reads at
    engine init (web_app.py:217-231)."""
    config = {}
    if os.path.exists(config_path):
        with open(config_path) as f:
            config = yaml.safe_load(f) or {}
    config["default_threshold"] = float(threshold)
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def train_lbph_from_directory(
    data_dir: str,
    output_dir: str = "checkpoints/lbph",
    image_size: int = 100,
    radius: int = 1,
    neighbors: int = 8,
    grid_x: int = 8,
    grid_y: int = 8,
    detector=None,
    val_dir: Optional[str] = None,
    search_threshold: bool = True,
    config_path: Optional[str] = None,
    min_images: int = 1,
) -> dict:
    """Full from-directory training (reference train_lbph_script.py:135-309).

    Trains, saves model + label_map.npy + optimal_threshold.txt, optionally
    searches the threshold on a val dir and writes it back into the config.
    """
    images, labels, label_map = load_faces_and_labels(
        data_dir, image_size, detector, min_images
    )
    model = LBPHModel(radius, neighbors, grid_x, grid_y)
    model.train(images, labels)

    os.makedirs(output_dir, exist_ok=True)
    result = {
        "n_images": len(images),
        "n_identities": len(label_map),
        "model_path": os.path.join(output_dir, "lbph_model.npz"),
        "label_map_path": os.path.join(output_dir, "label_map.npy"),
    }
    np.save(result["label_map_path"], label_map, allow_pickle=True)

    if search_threshold:
        if val_dir:
            v_images, v_labels, _ = load_faces_and_labels(
                val_dir, image_size, detector
            )
        else:
            v_images, v_labels = images, labels
        thr, best, sweep = find_optimal_threshold(model, v_images, v_labels)
        model.threshold = thr
        result.update(optimal_threshold=thr, best=best, sweep=sweep)
        with open(os.path.join(output_dir, "optimal_threshold.txt"), "w") as f:
            f.write(f"{thr}\n")
        if config_path:
            write_threshold_to_config(config_path, thr)

    model.save(result["model_path"])
    return result


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="Train LBPH from directory")
    parser.add_argument("data_dir")
    parser.add_argument("--output-dir", default="checkpoints/lbph")
    parser.add_argument("--val-dir", default=None)
    parser.add_argument("--image-size", type=int, default=100)
    parser.add_argument("--config", default=None, help="YAML to write threshold into")
    parser.add_argument("--no-threshold-search", action="store_true")
    args = parser.parse_args(argv)
    result = train_lbph_from_directory(
        args.data_dir,
        args.output_dir,
        image_size=args.image_size,
        val_dir=args.val_dir,
        search_threshold=not args.no_threshold_search,
        config_path=args.config,
    )
    print(
        f"trained {result['n_identities']} identities / {result['n_images']} "
        f"images; threshold={result.get('optimal_threshold')}"
    )


if __name__ == "__main__":
    main()
