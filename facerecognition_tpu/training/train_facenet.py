"""FaceNet trainer: P×K batches, fused online mining, verification eval.

Rebuild of reference models/facenet/train_facenet.py (769 LoC). The
reference's two-pass epoch (no-grad mining forward + grad forward,
:163-262) is fused into ONE jitted step (training/steps.py); batches come
from the P×K sampler; the identity-overlap guard raises before training
(facenet_dataloader.py:287-339 contract); best-on-val-loss checkpointing,
early stopping, history JSON, and triplet d(a,p)/d(a,n) metrics carry over.

Data parallelism: ``train.num_devices`` ("auto" default) builds a ``data``
mesh; params are replicated and each P×K batch is sharded over the axis.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facerecognition_tpu.data import (
    BatchLoader,
    FolderDataset,
    CSVDataset,
    PKSampler,
    augment_batch,
    check_identity_overlap,
    split_by_identity,
)
from facerecognition_tpu.models.facenet import FaceNetModel
from facerecognition_tpu.training.checkpoint import CheckpointManager
from facerecognition_tpu.training.config import deep_merge, load_config
from facerecognition_tpu.training.schedules import EarlyStopping, build_schedule
from facerecognition_tpu.training.steps import (
    ArcFaceTrainState,
    make_facenet_train_step,
    make_resident_step,
)
from facerecognition_tpu.training.train_arcface import (
    compute_verification_accuracy,
)

DEFAULT_CONFIG: dict[str, Any] = {
    "model": {"embedding_size": 512, "dropout": 0.6},
    "data": {
        "data_dir": None,
        "csv_path": None,
        "image_root": None,
        "image_size": 160,
        "min_images": 2,
        "val_frac": 0.1,
        "augmentation": "light",
        "num_workers": 8,
        # "auto": decode the train split once into an HBM-resident uint8
        # array when it fits (<=4GiB) and gather batches on device; False
        # forces the streaming BatchLoader (always used on a data mesh).
        "resident": "auto",
    },
    "train": {
        "p_identities": 8,
        "k_images": 4,
        "num_epochs": 30,
        "steps_per_epoch": None,
        "lr": 3e-4,
        "schedule": "step",
        "step_size_epochs": 10,
        "gamma": 0.5,
        "margin": 0.5,
        "mining": "semi_hard",  # semi_hard | batch_hard | random
        "early_stopping_patience": 8,
        "num_devices": "auto",  # data-parallel device count; 1 disables
        "seed": 0,
        # Rematerialize the backbone in the backward pass: fits big P*K
        # batches at 160^2 next to an HBM-resident dataset (one fwd of
        # extra FLOPs for near-zero residual memory).
        "remat": False,
        # Warm start for phase schedules (semi-hard warmup -> batch-hard
        # finetune): "<ckpt_dir>:<tag>" restores params+batch_stats from a
        # training checkpoint, "<file>.msgpack" from an exported serving
        # checkpoint. Optimizer state starts fresh (the phases use
        # different mining objectives and learning rates).
        "init_from": None,
    },
    "eval": {"num_pairs": 1000, "batch_size": 128},
    "checkpoint": {"dir": "checkpoints/facenet", "keep_last_n": 3},
}


class FaceNetTrainer:
    def __init__(
        self,
        config: Optional[dict | str] = None,
        overrides: Optional[list[str]] = None,
    ):
        if config is None or isinstance(config, str):
            config = load_config(config, overrides, DEFAULT_CONFIG)
        else:
            from facerecognition_tpu.training.config import (
                apply_dotted_overrides,
            )

            config = deep_merge(DEFAULT_CONFIG, config)
            if overrides:
                config = apply_dotted_overrides(config, overrides)
        self.config = config
        self.history: list[dict] = []
        self.epoch = 0
        self.best_val_loss = np.inf
        self._setup()

    def _setup(self):
        c = self.config
        d = c["data"]
        if d["data_dir"]:
            index = FolderDataset(d["data_dir"], min_images=d["min_images"])
        elif d["csv_path"]:
            index = CSVDataset(d["csv_path"], d["image_root"])
        else:
            raise ValueError("config.data needs data_dir or csv_path")
        # Disjoint identities + hard leakage guard (the FaceNet contract).
        self.train_index, self.val_index = split_by_identity(
            index, d["val_frac"], c["train"]["seed"]
        )
        check_identity_overlap(self.train_index, self.val_index)

        m = c["model"]
        self.model = FaceNetModel(
            embedding_size=m["embedding_size"], dropout=m["dropout"]
        )
        s = d["image_size"]
        variables = self.model.init(
            jax.random.PRNGKey(c["train"]["seed"]), jnp.zeros((2, s, s, 3))
        )
        t = c["train"]
        spe = self._steps_per_epoch()
        schedule = build_schedule(
            t["lr"],
            t["schedule"],
            total_steps=t["num_epochs"] * spe,
            step_size=t["step_size_epochs"] * spe,
            gamma=t["gamma"],
        )
        tx = optax.adam(schedule)
        if t.get("init_from"):
            variables = self._load_init(t["init_from"], variables)
        self.state = ArcFaceTrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=tx,
        )
        from facerecognition_tpu.parallel import replicate, resolve_data_mesh

        self.mesh = resolve_data_mesh(
            t.get("num_devices", 1), t["p_identities"] * t["k_images"]
        )
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)
        raw_step = make_facenet_train_step(
            self.model,
            margin=float(t["margin"]),
            mining=t["mining"],
            remat=bool(t.get("remat", False)),
        )
        tier = d["augmentation"]

        def step_with_aug(state, images_u8, labels, rng):
            rng_aug, rng_step = jax.random.split(rng)
            images = augment_batch(rng_aug, images_u8, tier)
            images = (images / 255.0 - 0.5) / 0.5
            return raw_step(state, images, labels, rng_step)

        self._train_step = jax.jit(step_with_aug, donate_argnums=(0,))
        # Resident data is stored FLAT (N, H*W*3) — see make_resident_step:
        # row-gather on a 2-D array avoids XLA's whole-dataset relayout copy.
        self._train_step_resident = make_resident_step(
            step_with_aug, image_shape=(s, s, 3)
        )
        self._resident_data = None

        def eval_fn(state, images_u8):
            x = (images_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            return self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x,
            )

        self._eval_step = jax.jit(eval_fn)
        self.ckpt = CheckpointManager(
            c["checkpoint"]["dir"], c["checkpoint"]["keep_last_n"]
        )
        self.early_stopping = EarlyStopping(
            patience=t["early_stopping_patience"], mode="min"
        )

    def _load_init(self, spec: str, variables: dict) -> dict:
        """Warm-start params/batch_stats from ``dir:tag`` or ``*.msgpack``.

        Tree structure must match the freshly-initialized model — a
        mismatch (different embedding size / architecture) raises rather
        than silently training from partial weights.
        """
        import jax.tree_util as jtu

        if spec.endswith(".msgpack"):
            from facerecognition_tpu.utils.serialization import load_variables

            loaded = load_variables(spec)
        else:
            d, _, tag = spec.rpartition(":")
            tree, _ = CheckpointManager(d or spec).restore(tag or "best")
            loaded = {
                "params": tree["params"],
                "batch_stats": tree["batch_stats"],
            }
        ref = {k: variables[k] for k in ("params", "batch_stats")}
        if jtu.tree_structure(loaded) != jtu.tree_structure(ref):
            raise ValueError(
                f"init_from {spec!r} tree does not match the configured model"
            )
        return {**variables, **loaded}

    def _steps_per_epoch(self) -> int:
        t = self.config["train"]
        per_batch = t["p_identities"] * t["k_images"]
        return t["steps_per_epoch"] or max(
            len(self.train_index) // per_batch, 1
        )

    def _device_batch(self, array: np.ndarray):
        """Shard a host batch over the data mesh (or plain device_put).

        GSPMD keeps mining semantics identical to single-device: the miner's
        full BxB distance matrix is computed across shards by XLA-inserted
        collectives, so sharding the P×K batch never changes which triplets
        are mined.
        """
        if self.mesh is not None:
            from facerecognition_tpu.parallel import shard_batch

            return shard_batch(jnp.asarray(array), self.mesh)
        return jnp.asarray(array)

    def _ensure_resident(self) -> bool:
        """Decode the whole train split into one HBM-resident uint8 array.

        Per-step host->device image transfers are both the throughput
        bottleneck (the loader thread feeds the axon tunnel) and a host
        memory hazard: the plugin leaks every transferred byte in RSS.
        Residency eliminates both for datasets within the HBM budget.
        Only used on the single-device path — the data-mesh path keeps the
        streaming loader whose GSPMD sharding is mesh-tested.
        """
        if self._resident_data is not None:
            return True
        d = self.config["data"]
        mode = d.get("resident", "auto")
        if mode is False or self.mesh is not None:
            return False
        n = len(self.train_index)
        s = d["image_size"]
        if mode == "auto" and n * s * s * 3 > (4 << 30):
            return False
        from concurrent.futures import ThreadPoolExecutor

        from facerecognition_tpu.data.loader import _load_resize

        arr = np.empty((n, s, s, 3), np.uint8)

        def _load(i):
            arr[i] = _load_resize(self.train_index.paths[i], s)

        with ThreadPoolExecutor(d["num_workers"]) as ex:
            list(ex.map(_load, range(n)))
        self._resident_data = jnp.asarray(arr.reshape(n, -1))
        self._resident_labels = jnp.asarray(
            self.train_index.labels, jnp.int32
        )
        return True

    def train_epoch(self) -> dict:
        c = self.config
        t = c["train"]
        sampler = iter(
            PKSampler(
                self.train_index,
                t["p_identities"],
                t["k_images"],
                seed=t["seed"] + self.epoch,
            )
        )
        rng = jax.random.PRNGKey(t["seed"] * 77 + self.epoch)
        losses, n_triplets = [], []
        t0 = time.time()
        if self._ensure_resident():
            for _ in range(self._steps_per_epoch()):
                idx = next(sampler)
                rng, sub = jax.random.split(rng)
                self.state, metrics = self._train_step_resident(
                    self.state,
                    self._resident_data,
                    self._resident_labels,
                    jnp.asarray(idx, jnp.int32),
                    sub,
                )
                losses.append(float(metrics["loss"]))
                n_triplets.append(float(metrics["n_triplets"]))
        else:
            loader = BatchLoader(
                self.train_index,
                sampler,
                image_size=c["data"]["image_size"],
                n_workers=c["data"]["num_workers"],
            )
            it = iter(loader)
            for _ in range(self._steps_per_epoch()):
                images, labels = next(it)
                rng, sub = jax.random.split(rng)
                self.state, metrics = self._train_step(
                    self.state,
                    # uint8 across the wire; cast on device (dtype note in
                    # train_arcface.train_epoch).
                    self._device_batch(images),
                    self._device_batch(labels),
                    sub,
                )
                losses.append(float(metrics["loss"]))
                n_triplets.append(float(metrics["n_triplets"]))
            loader.stop()
        return {
            "train_loss": float(np.mean(losses)),
            "avg_triplets": float(np.mean(n_triplets)),
            "epoch_seconds": time.time() - t0,
        }

    def validate(self) -> dict:
        """Val embeddings → triplet-style val loss + verification accuracy
        + mean d(a,p)/d(a,n) (reference train_facenet.py:322-404, :41-54)."""
        c = self.config
        bs = c["eval"]["batch_size"]
        idx = self.val_index
        from facerecognition_tpu.data.loader import _load_resize

        embs = []
        for start in range(0, len(idx), bs):
            chunk = list(range(start, min(start + bs, len(idx))))
            imgs = np.stack(
                [
                    _load_resize(idx.paths[i], c["data"]["image_size"])
                    for i in chunk
                ]
            )  # uint8: normalized on device (dtype note in train_epoch)
            n = len(imgs)
            if n < bs:
                # Pad the ragged tail to the compiled batch shape — a raw
                # remainder size would trigger a second multi-minute
                # InceptionResnetV1 compile (batch-bucket discipline).
                imgs = np.concatenate(
                    [imgs, np.zeros((bs - n,) + imgs.shape[1:], imgs.dtype)]
                )
            out = np.asarray(self._eval_step(self.state, jnp.asarray(imgs)))
            embs.append(out[:n])
        embeddings = np.concatenate(embs)
        labels = idx.labels

        ver_acc, thr = compute_verification_accuracy(
            embeddings, labels, c["eval"]["num_pairs"], c["train"]["seed"]
        )
        # triplet distance metrics over random valid triplets
        rng = np.random.default_rng(0)
        d_ap, d_an = [], []
        classes = [
            int(cl)
            for cl in np.unique(labels)
            if (labels == cl).sum() >= 2
        ]
        for _ in range(min(500, len(idx))):
            if len(classes) < 2:
                break
            cpos = int(rng.choice(classes))
            a, p = rng.choice(np.flatnonzero(labels == cpos), 2, replace=False)
            n = rng.choice(np.flatnonzero(labels != cpos))
            d_ap.append(np.linalg.norm(embeddings[a] - embeddings[p]))
            d_an.append(np.linalg.norm(embeddings[a] - embeddings[n]))
        margin = self.config["train"]["margin"]
        val_loss = float(
            np.mean(np.maximum(np.asarray(d_ap) - np.asarray(d_an) + margin, 0))
        ) if d_ap else 0.0
        return {
            "val_loss": val_loss,
            "ver_acc": ver_acc,
            "ver_threshold": thr,
            "d_ap": float(np.mean(d_ap)) if d_ap else 0.0,
            "d_an": float(np.mean(d_an)) if d_an else 0.0,
        }

    def train(self) -> list[dict]:
        t = self.config["train"]
        while self.epoch < t["num_epochs"]:
            record = {"epoch": self.epoch}
            record.update(self.train_epoch())
            record.update(self.validate())
            self.history.append(record)
            with open(
                os.path.join(self.ckpt.directory, "training_history.json"), "w"
            ) as f:
                json.dump(self.history, f, indent=2)
            if record["val_loss"] < self.best_val_loss:
                self.best_val_loss = record["val_loss"]
                self._save("best")
            self._save("last")
            self.epoch += 1
            if self.early_stopping(record["val_loss"]):
                break
        return self.history

    def _save(self, tag: str):
        self.ckpt.save(
            tag,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
            },
            metadata={
                "epoch": self.epoch,
                "best_val_loss": float(self.best_val_loss),
                "config": self.config,
                "history": self.history,
            },
        )


def main(argv: Optional[list[str]] = None):
    import argparse

    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    parser = argparse.ArgumentParser(description="Train FaceNet on TPU")
    parser.add_argument("--config", default=None)
    parser.add_argument(
        "--mining", default=None, choices=["semi_hard", "batch_hard", "random"]
    )
    parser.add_argument("--set", action="append", default=[])
    args = parser.parse_args(argv)
    overrides = list(args.set)
    if args.mining:
        overrides.append(f"train.mining={args.mining}")
    trainer = FaceNetTrainer(args.config, overrides)
    history = trainer.train()
    print(json.dumps(history[-1] if history else {}, indent=2))


if __name__ == "__main__":
    main()
