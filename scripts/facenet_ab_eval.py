"""FaceNet checkpoint A/B on the 120-id open-set benchmark.

Same protocol as examples/compare_all_models.py's embedding rows (enroll
the per-id mean prototype of the first half of each identity's renders,
top-1 over all capped images) but FaceNet-only, so a finetune candidate
can be scored against the shipped asset in one process without paying
the ArcFace/LBPH compiles.

Usage:
    PYTHONPATH=/root/repo python scripts/facenet_ab_eval.py \
        --data-dir /tmp/ids_test120 ckptA.msgpack [ckptB.msgpack ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="+")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--max-images", type=int, default=500)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from facerecognition_tpu.data import FolderDataset
    from facerecognition_tpu.data.loader import _load_resize
    from facerecognition_tpu.inference.extract_embeddings import (
        load_facenet_model,
    )
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    index = FolderDataset(args.data_dir, min_images=2)
    n = min(len(index), args.max_images)
    labels = np.asarray(index.labels[:n])
    images = np.stack(
        [_load_resize(index.paths[i], 160) for i in range(n)]
    ).astype(np.float32)

    report = {}
    for ck in args.ckpts:
        emb = load_facenet_model(ck)
        E = np.array(emb.embed_uint8(images))  # writable copy
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        prots = []
        for c in np.unique(labels):
            idx = np.flatnonzero(labels == c)
            p = E[idx[: max(len(idx) // 2, 1)]].mean(0)
            prots.append(p / (np.linalg.norm(p) + 1e-12))
        prots = np.stack(prots)
        pred = (E @ prots.T).argmax(1)
        acc = float((np.unique(labels)[pred] == labels).mean())
        report[os.path.basename(ck)] = {"top1": acc, "n": int(n)}
        print(f"{os.path.basename(ck)}: top-1 {acc:.4f} over {n} images")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
