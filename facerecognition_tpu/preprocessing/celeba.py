"""CelebA dataset pipeline: align-before-augment, balance, split, metadata.

Rebuild of reference preprocessing/celeba_preprocessing.py (649 LoC) and its
Colab variant (scripts/celeba_balanced_preprocessing.py). Steps:

1. load metadata — identity list (space-separated txt), landmark CSV,
   optional attributes/bbox (reference :92-139)
2. filter identities with < ``min_images`` images (:141)
3. group by identity (:178)
4. **align before augment**: ground-truth 5-point landmarks → Umeyama →
   112x112 ArcFace template (:209, 429-445) — here in device BATCHES via
   the MXU warp instead of per-image cv2.warpAffine
5. offline augmentation up to ``target_min_images`` per identity (:256),
   using the device augmentation tiers
6. train/val/test split, by_image or by_identity (:321)
7. person-per-folder output + per-split CSVs + global label map (:459)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class CelebAConfig:
    data_dir: str  # contains img_align_celeba/ + identity/landmark files
    output_dir: str
    identity_file: str = "identity_CelebA.txt"
    landmarks_file: str = "list_landmarks_align_celeba.csv"
    attributes_file: str = "list_attr_celeba.csv"
    bbox_file: str = "list_bbox_celeba.csv"
    images_subdir: str = "img_align_celeba"
    min_images: int = 5
    target_min_images: int = 10
    max_identities: Optional[int] = None
    image_size: int = 112
    split_mode: str = "by_image"  # by_image | by_identity
    train_frac: float = 0.8
    val_frac: float = 0.1
    seed: int = 0
    batch_size: int = 128  # device alignment batch
    augment_tier: str = "normal"


class CelebAPreprocessor:
    def __init__(self, config: CelebAConfig):
        self.config = config
        self.identity: dict[str, int] = {}  # image name → person id
        self.landmarks: dict[str, np.ndarray] = {}  # image name → (5, 2)
        self.by_person: dict[int, list[str]] = {}
        self.stats: dict = {}

    # -- step 1: metadata ---------------------------------------------------

    def load_metadata(self) -> None:
        import pandas as pd

        c = self.config
        ident_path = os.path.join(c.data_dir, c.identity_file)
        if not os.path.exists(ident_path):
            raise FileNotFoundError(ident_path)
        df = pd.read_csv(ident_path, sep=r"\s+", header=None,
                         names=["image", "identity_id"])
        self.identity = dict(zip(df["image"], df["identity_id"]))

        lm_path = os.path.join(c.data_dir, c.landmarks_file)
        if os.path.exists(lm_path):
            lm = pd.read_csv(lm_path)
            cols = [
                "lefteye_x", "lefteye_y", "righteye_x", "righteye_y",
                "nose_x", "nose_y", "leftmouth_x", "leftmouth_y",
                "rightmouth_x", "rightmouth_y",
            ]
            key = "image_id" if "image_id" in lm.columns else lm.columns[0]
            arr = lm[cols].to_numpy(np.float32).reshape(-1, 5, 2)
            self.landmarks = dict(zip(lm[key], arr))
        self.stats["n_images"] = len(self.identity)
        self.stats["n_identities"] = len(set(self.identity.values()))

    # -- steps 2-3: filter + group -------------------------------------------

    def analyze_and_filter(self) -> None:
        c = self.config
        counts: dict[int, int] = {}
        for pid in self.identity.values():
            counts[pid] = counts.get(pid, 0) + 1
        keep = {pid for pid, n in counts.items() if n >= c.min_images}
        if c.max_identities:
            keep = set(sorted(keep)[: c.max_identities])
        self.by_person = {}
        for img, pid in self.identity.items():
            if pid in keep:
                self.by_person.setdefault(pid, []).append(img)
        for imgs in self.by_person.values():
            imgs.sort()
        self.stats["n_identities_kept"] = len(self.by_person)
        self.stats["n_images_kept"] = sum(len(v) for v in self.by_person.values())

    # -- step 4: batched device alignment ------------------------------------

    def align_all(self) -> dict[int, list[np.ndarray]]:
        """Align every kept image to the 112 template in device batches."""
        import jax.numpy as jnp
        from PIL import Image

        from facerecognition_tpu.ops.warp_mxu import align_crop_mxu_batch
        from facerecognition_tpu.ops.image import bilinear_resize

        c = self.config
        img_root = os.path.join(c.data_dir, c.images_subdir)
        aligned: dict[int, list[np.ndarray]] = {p: [] for p in self.by_person}

        tasks = [
            (pid, name)
            for pid, names in self.by_person.items()
            for name in names
        ]
        for start in range(0, len(tasks), c.batch_size):
            chunk = tasks[start : start + c.batch_size]
            images, lms, owners = [], [], []
            for pid, name in chunk:
                path = os.path.join(img_root, name)
                try:
                    with Image.open(path) as im:
                        arr = np.asarray(im.convert("RGB"), np.float32)
                except (FileNotFoundError, OSError):
                    continue
                lm = self.landmarks.get(name)
                if lm is None:
                    # no landmarks → plain resize fallback
                    out = np.asarray(
                        bilinear_resize(jnp.asarray(arr), c.image_size, c.image_size)
                    )
                    aligned[pid].append(np.clip(out, 0, 255).astype(np.uint8))
                    continue
                images.append(arr)
                lms.append(lm)
                owners.append(pid)
            if not images:
                continue
            h = max(im.shape[0] for im in images)
            w = max(im.shape[1] for im in images)
            padded = np.zeros((len(images), h, w, 3), np.float32)
            for i, im in enumerate(images):
                padded[i, : im.shape[0], : im.shape[1]] = im
            out = np.asarray(
                align_crop_mxu_batch(
                    jnp.asarray(padded),
                    jnp.asarray(np.stack(lms)),
                    c.image_size,
                )
            )
            for pid, crop in zip(owners, out):
                aligned[pid].append(np.clip(crop, 0, 255).astype(np.uint8))
        return aligned

    # -- step 5: offline augmentation ----------------------------------------

    def augment_to_target(
        self, aligned: dict[int, list[np.ndarray]]
    ) -> dict[int, list[np.ndarray]]:
        import jax
        import jax.numpy as jnp

        from facerecognition_tpu.data.augment import augment_batch

        c = self.config
        rng = np.random.default_rng(c.seed)
        key = jax.random.PRNGKey(c.seed)
        for pid, imgs in aligned.items():
            needed = c.target_min_images - len(imgs)
            if needed <= 0 or not imgs:
                continue
            src = np.stack(
                [imgs[rng.integers(0, len(imgs))] for _ in range(needed)]
            ).astype(np.float32)
            key, sub = jax.random.split(key)
            out = np.asarray(augment_batch(sub, jnp.asarray(src), c.augment_tier))
            imgs.extend(np.clip(out, 0, 255).astype(np.uint8))
        return aligned

    # -- steps 6-7: split + write ---------------------------------------------

    def split_and_write(self, aligned: dict[int, list[np.ndarray]]) -> dict:
        import pandas as pd
        from PIL import Image

        c = self.config
        rng = np.random.default_rng(c.seed)
        splits: dict[str, list[tuple[int, np.ndarray]]] = {
            "train": [], "val": [], "test": [],
        }
        if c.split_mode == "by_image":
            for pid, imgs in aligned.items():
                perm = rng.permutation(len(imgs))
                n_train = max(int(round(len(imgs) * c.train_frac)), 1)
                n_val = int(round(len(imgs) * c.val_frac))
                for rank, i in enumerate(perm):
                    split = (
                        "train"
                        if rank < n_train
                        else "val"
                        if rank < n_train + n_val
                        else "test"
                    )
                    splits[split].append((pid, imgs[i]))
        elif c.split_mode == "by_identity":
            pids = rng.permutation(sorted(aligned))
            n_train = int(round(len(pids) * c.train_frac))
            n_val = int(round(len(pids) * c.val_frac))
            for rank, pid in enumerate(pids):
                split = (
                    "train"
                    if rank < n_train
                    else "val"
                    if rank < n_train + n_val
                    else "test"
                )
                splits[split].extend((pid, im) for im in aligned[pid])
        else:
            raise ValueError(f"unknown split_mode {c.split_mode}")

        # global label map over every identity seen in any split
        all_pids = sorted(aligned)
        global_map = {pid: i for i, pid in enumerate(all_pids)}
        meta_dir = os.path.join(c.output_dir, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        pd.DataFrame(
            [{"identity_id": p, "label": l} for p, l in global_map.items()]
        ).to_csv(os.path.join(meta_dir, "global_id_mapping.csv"), index=False)

        counters: dict[tuple[str, int], int] = {}
        records: dict[str, list[dict]] = {s: [] for s in splits}
        for split, items in splits.items():
            for pid, img in items:
                pdir = os.path.join(c.output_dir, split, str(pid))
                os.makedirs(pdir, exist_ok=True)
                k = counters.get((split, pid), 0)
                counters[(split, pid)] = k + 1
                path = os.path.join(pdir, f"{k:04d}.jpg")
                Image.fromarray(img).save(path, quality=95)
                records[split].append(
                    {
                        "image_path": path,
                        "identity_id": pid,
                        "label": global_map[pid],
                    }
                )
        for split, rows in records.items():
            pd.DataFrame(rows).to_csv(
                os.path.join(meta_dir, f"{split}_labels.csv"), index=False
            )
        counts = {s: len(r) for s, r in records.items()}
        self.stats["split_counts"] = counts
        return counts

    def run(self) -> dict:
        """Full pipeline (reference :574-612). Returns the stats dict."""
        self.load_metadata()
        self.analyze_and_filter()
        aligned = self.align_all()
        aligned = self.augment_to_target(aligned)
        self.split_and_write(aligned)
        return self.stats


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="CelebA preprocessing")
    parser.add_argument("data_dir")
    parser.add_argument("output_dir")
    parser.add_argument("--min-images", type=int, default=5)
    parser.add_argument("--target-min-images", type=int, default=10)
    parser.add_argument("--max-identities", type=int, default=None)
    parser.add_argument(
        "--split-mode", choices=["by_image", "by_identity"], default="by_image"
    )
    args = parser.parse_args(argv)
    config = CelebAConfig(
        data_dir=args.data_dir,
        output_dir=args.output_dir,
        min_images=args.min_images,
        target_min_images=args.target_min_images,
        max_identities=args.max_identities,
        split_mode=args.split_mode,
    )
    stats = CelebAPreprocessor(config).run()
    print(stats)


if __name__ == "__main__":
    main()
