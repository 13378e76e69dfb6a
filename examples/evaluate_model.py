"""Model evaluation driver — the script form of the reference's
evaluate_{arcface,facenet}_kaggle.ipynb notebooks (their de facto test
harness, SURVEY.md §4): embed a labeled test set, match against a
prototype gallery, report top-k / ROC / EER / latency / throughput, and
write plots + a JSON + markdown report.

Usage:
  python examples/evaluate_model.py --model arcface --data-dir /data/test \
      --checkpoint ckpt.msgpack --output-dir eval_out
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=["arcface", "facenet"], default="arcface")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--data-dir", required=True, help="person-per-folder test set")
    parser.add_argument("--output-dir", default="eval_out")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--measure-speed", action="store_true")
    args = parser.parse_args(argv)

    from facerecognition_tpu.data import FolderDataset
    from facerecognition_tpu.data.loader import _load_resize
    from facerecognition_tpu.inference.engine import RecognitionEngine
    from facerecognition_tpu.inference.evaluate import (
        evaluate_recognition_engine,
        generate_report,
    )
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    index = FolderDataset(args.data_dir, min_images=2)
    n = len(index) if args.max_images is None else min(len(index), args.max_images)
    size = 112 if args.model == "arcface" else 160
    images = np.stack([_load_resize(index.paths[i], size) for i in range(n)])
    labels = index.labels[:n]

    engine = RecognitionEngine(
        model_type=args.model, checkpoint_path=args.checkpoint, threshold=0.3
    )
    # enroll per-identity prototypes from half of each identity's images
    rng = np.random.default_rng(0)
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        enroll = idx[: max(len(idx) // 2, 1)]
        embs = engine.embedder.embed_uint8(images[enroll].astype(np.float32))
        mean = embs.mean(0)
        engine.gallery.add(index.label_names[int(c)], mean)

    results = evaluate_recognition_engine(
        engine,
        images,
        labels,
        index.label_names,
        output_dir=args.output_dir,
        measure_speed=args.measure_speed,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2, default=str)
    generate_report(
        results,
        os.path.join(args.output_dir, "report.md"),
        title=f"{args.model} evaluation",
    )
    print(json.dumps(results.get("metrics", {}), indent=2))
    for k in ("top_1_accuracy", "top_5_accuracy"):
        if k in results:
            print(f"{k}: {results[k]:.4f}")


if __name__ == "__main__":
    main()
