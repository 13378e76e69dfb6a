"""Render a folder-per-identity dataset of aligned synthetic faces.

Produces the on-disk layout the data loaders / trainers / comparison
scripts consume (<out>/<identity>/<k>.png), using
`synthetic_faces.render_aligned_identity_sample`. Different --seed values
give disjoint identity pools (identities are sampled from the seed), so
train/test splits are open-set by construction.

Run: PYTHONPATH=/root/repo python scripts/render_id_folders.py \
        --out /tmp/ids_train --n-ids 500 --per-id 24 --size 160 --seed 0
"""

import argparse
import os
import time

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-ids", type=int, default=500)
    ap.add_argument("--per-id", type=int, default=24)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from facerecognition_tpu.training.synthetic_faces import (
        render_aligned_identity_sample,
        sample_identity,
    )

    t0 = time.time()
    for i in range(args.n_ids):
        p = sample_identity(
            np.random.default_rng(args.seed * 100003 + i)
        )
        d = os.path.join(args.out, f"id_{i:05d}")
        os.makedirs(d, exist_ok=True)
        for k in range(args.per_id):
            r = np.random.default_rng((args.seed, i, k))
            img = render_aligned_identity_sample(r, p, args.size)
            cv2.imwrite(
                os.path.join(d, f"{k:03d}.png"),
                img.astype(np.uint8)[..., ::-1],  # RGB -> BGR for imwrite
            )
        if i % 50 == 0:
            done = (i + 1) * args.per_id
            rate = done / max(time.time() - t0, 1e-9)
            print(
                f"{i + 1}/{args.n_ids} ids ({rate:.0f} img/s, "
                f"eta {((args.n_ids - i - 1) * args.per_id) / max(rate, 1e-9):.0f}s)",
                flush=True,
            )
    print(
        f"rendered {args.n_ids * args.per_id} images -> {args.out} "
        f"({time.time() - t0:.0f}s)"
    )


if __name__ == "__main__":
    main()
