"""ArcFace trainer: YAML-driven, DP-sharded jitted hot loop, full resume.

Rebuild of the reference ArcFaceTrainer (models/arcface/train_arcface.py,
1086 LoC). Feature parity: warmup + step/cosine/plateau schedules, SGD/Adam/
AdamW, mixup, label smoothing, grad clip, layer freezing, class-balanced
sampling, augmentation tiers, pure-cosine train accuracy, pair-sampling
verification accuracy with threshold search, best/last/periodic checkpoints
with keep_last_n, early stopping, history JSON, resume incl. optimizer/
controller state with auto-extend epochs.

TPU-first differences: the whole step (augment → forward → loss → grads →
all-reduce → update) is ONE jitted function over a ``data``-sharded batch —
``train.num_devices`` ("auto" by default) builds a ``data`` mesh, params are
replicated, each batch is sharded over the axis, and XLA inserts the grad
all-reduce over ICI; augmentation runs on-device; no GradScaler (bf16/f32 on
TPU needs no loss scaling — AMP GradScaler is a CUDA fp16 artifact).
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
    ClassBalancedSampler,
    FolderDataset,
    CSVDataset,
    augment_batch,
    split_by_image,
)
from facerecognition_tpu.models.arcface import ArcFaceModel, freeze_mask
from facerecognition_tpu.training.checkpoint import CheckpointManager
from facerecognition_tpu.training.config import load_config
from facerecognition_tpu.training.schedules import (
    EarlyStopping,
    ReduceOnPlateau,
    build_schedule,
)
from facerecognition_tpu.training.steps import (
    ArcFaceTrainState,
    make_arcface_eval_step,
    make_arcface_train_step,
)

DEFAULT_CONFIG: dict[str, Any] = {
    "model": {
        "embedding_size": 512,
        "scale": 64.0,
        "margin": 0.2,
        "easy_margin": True,
        "dropout": 0.5,
        "freeze_ratio": 0.0,
    },
    "data": {
        "data_dir": None,
        "csv_path": None,
        "image_root": None,
        "image_size": 112,
        "min_images": 2,
        "val_frac": 0.1,
        "class_balanced": True,
        "augmentation": "normal",
        "num_workers": 8,
    },
    "train": {
        "batch_size": 128,
        "num_epochs": 50,
        "steps_per_epoch": None,  # None → dataset_size / batch_size
        "optimizer": "sgd",
        "lr": 0.01,
        "momentum": 0.9,
        "weight_decay": 5e-4,
        "schedule": "cosine",
        "warmup_epochs": 2,
        "step_size_epochs": 10,
        "gamma": 0.1,
        "grad_clip": 5.0,
        "label_smoothing": 0.1,
        "mixup_alpha": 0.0,
        "margin_warmup_epochs": 0,  # >0: ramp margin from margin_start
        "margin_start": 0.0,
        "early_stopping_patience": 15,
        "early_stopping_metric": "ver_acc",  # ver_acc | val_loss | train_loss
        "plateau_factor": 0.1,
        "plateau_patience": 5,
        "num_devices": "auto",  # data-parallel device count; 1 disables
        "seed": 0,
    },
    "eval": {"num_pairs": 2000, "batch_size": 256},
    "checkpoint": {
        "dir": "checkpoints/arcface",
        "keep_last_n": 3,
        "save_every_epochs": 5,
    },
}


def compute_verification_accuracy(
    embeddings: np.ndarray,
    labels: np.ndarray,
    num_pairs: int = 2000,
    seed: int = 0,
) -> tuple[float, float]:
    """Pair-sampling verification accuracy + best threshold.

    Samples num_pairs/2 same-identity and num_pairs/2 different-identity
    pairs, scans thresholds over observed cosine range, returns
    (best_accuracy, best_threshold) — reference train_arcface.py:114-210.
    """
    rng = np.random.default_rng(seed)
    by_class: dict[int, np.ndarray] = {}
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        if len(idx) >= 2:
            by_class[int(c)] = idx
    if not by_class or len(np.unique(labels)) < 2:
        # Need >=2 images of one identity for positives AND >=2 identities
        # for negatives — degrade instead of crashing every epoch on a
        # degenerate val split.
        return 0.0, 0.5
    classes = np.asarray(list(by_class))
    n_half = num_pairs // 2

    sims, truth = [], []
    for _ in range(n_half):  # positive pairs
        c = int(rng.choice(classes))
        i, j = rng.choice(by_class[c], 2, replace=False)
        sims.append(float(embeddings[i] @ embeddings[j]))
        truth.append(1)
    all_classes = np.unique(labels)
    for _ in range(n_half):  # negative pairs
        c1, c2 = rng.choice(all_classes, 2, replace=False)
        i = rng.choice(np.flatnonzero(labels == c1))
        j = rng.choice(np.flatnonzero(labels == c2))
        sims.append(float(embeddings[i] @ embeddings[j]))
        truth.append(0)
    sims = np.asarray(sims)
    truth = np.asarray(truth)

    best_acc, best_thr = 0.0, 0.5
    for thr in np.linspace(sims.min(), sims.max(), 200):
        acc = float(np.mean((sims >= thr) == truth))
        if acc > best_acc:
            best_acc, best_thr = acc, float(thr)
    return best_acc, best_thr


class ArcFaceTrainer:
    def __init__(
        self,
        config: Optional[dict | str] = None,
        overrides: Optional[list[str]] = None,
    ):
        if config is None or isinstance(config, str):
            config = load_config(config, overrides, DEFAULT_CONFIG)
        else:
            from facerecognition_tpu.training.config import deep_merge
            from facerecognition_tpu.training.config import (
                apply_dotted_overrides,
            )

            config = deep_merge(DEFAULT_CONFIG, config)
            if overrides:
                config = apply_dotted_overrides(config, overrides)
        self.config = config
        self.history: list[dict] = []
        self.epoch = 0
        self.global_step = 0
        # Mode-aware best tracking: ver_acc is maximized, losses minimized.
        self.metric_mode = (
            "max"
            if config["train"]["early_stopping_metric"] == "ver_acc"
            else "min"
        )
        self.best_metric = -np.inf if self.metric_mode == "max" else np.inf
        self._setup_data()
        self._setup_model()
        self._setup_optimizer()
        self.ckpt = CheckpointManager(
            config["checkpoint"]["dir"], config["checkpoint"]["keep_last_n"]
        )
        from facerecognition_tpu.utils.metrics import MetricsLogger

        self.metrics_logger = MetricsLogger(self.ckpt.directory)
        self.early_stopping = EarlyStopping(
            patience=config["train"]["early_stopping_patience"],
            mode=self.metric_mode,
        )
        self.plateau = ReduceOnPlateau(
            factor=config["train"]["plateau_factor"],
            patience=config["train"]["plateau_patience"],
            mode=self.metric_mode,
        )

    # -- setup --------------------------------------------------------------

    def _setup_data(self):
        d = self.config["data"]
        if d["data_dir"]:
            index = FolderDataset(d["data_dir"], min_images=d["min_images"])
        elif d["csv_path"]:
            index = CSVDataset(d["csv_path"], d["image_root"])
        else:
            raise ValueError("config.data needs data_dir or csv_path")
        self.train_index, self.val_index = split_by_image(
            index, d["val_frac"], self.config["train"]["seed"]
        )
        self.num_classes = index.num_classes

    def _setup_model(self):
        m = self.config["model"]
        self.model = ArcFaceModel(
            num_classes=self.num_classes,
            embedding_size=m["embedding_size"],
            scale=m["scale"],
            margin=m["margin"],
            easy_margin=m["easy_margin"],
            dropout=m["dropout"],
        )
        s = self.config["data"]["image_size"]
        self.variables = self.model.init(
            jax.random.PRNGKey(self.config["train"]["seed"]),
            jnp.zeros((2, s, s, 3)),
            labels=jnp.zeros((2,), jnp.int32),
        )

    def _steps_per_epoch(self) -> int:
        t = self.config["train"]
        return t["steps_per_epoch"] or max(
            len(self.train_index) // t["batch_size"], 1
        )

    def _build_tx(self):
        """Optimizer chain for the CURRENT config (schedule horizons derive
        from train.num_epochs — rebuild after changing it, e.g. on an
        epoch-extending resume, or a cosine schedule decays to min_lr=0
        and every extended epoch silently trains at LR 0)."""
        t = self.config["train"]
        spe = self._steps_per_epoch()
        schedule = build_schedule(
            t["lr"],
            t["schedule"],
            total_steps=t["num_epochs"] * spe,
            warmup_steps=t["warmup_epochs"] * spe,
            step_size=t["step_size_epochs"] * spe,
            gamma=t["gamma"],
        )
        opt_name = t["optimizer"].lower()
        if opt_name == "sgd":
            base = optax.sgd(schedule, momentum=t["momentum"], nesterov=False)
        elif opt_name == "adam":
            base = optax.adam(schedule)
        elif opt_name == "adamw":
            base = optax.adamw(schedule, weight_decay=t["weight_decay"])
        else:
            raise ValueError(f"unknown optimizer {opt_name}")
        chain = [optax.clip_by_global_norm(t["grad_clip"]), base]
        if opt_name == "sgd" and t["weight_decay"]:
            chain.insert(1, optax.add_decayed_weights(t["weight_decay"]))
        if t["schedule"] == "plateau":
            # Host-side ReduceOnPlateau controller scales the constant base
            # LR by writing into this injected hyperparam each epoch.
            chain.append(optax.inject_hyperparams(optax.scale)(step_size=1.0))
        tx = optax.chain(*chain)
        ratio = self.config["model"]["freeze_ratio"]
        if ratio > 0:
            # multi_transform with set_to_zero for the frozen subset:
            # optax.masked would pass the RAW gradient through unchanged
            # for unmasked params (params += grad — gradient ascent!).
            mask = freeze_mask(self.variables["params"], ratio)
            labels = jax.tree_util.tree_map(
                lambda trainable: "train" if trainable else "freeze", mask
            )
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels
            )
        return tx

    def _setup_optimizer(self):
        t = self.config["train"]
        spe = self._steps_per_epoch()
        tx = self._build_tx()
        self.state = ArcFaceTrainState.create(
            apply_fn=self.model.apply,
            params=self.variables["params"],
            batch_stats=self.variables["batch_stats"],
            tx=tx,
        )
        # Data-parallel mesh: replicate state, shard batches (train.num_devices).
        from facerecognition_tpu.parallel import replicate, resolve_data_mesh

        self.mesh = resolve_data_mesh(t.get("num_devices", 1), t["batch_size"])
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)
        aug_tier = self.config["data"]["augmentation"]
        margin_schedule = None
        if t.get("margin_warmup_epochs", 0) > 0:
            import jax.numpy as _jnp

            m_final = self.config["model"]["margin"]
            m_start = t.get("margin_start", 0.0)
            warm_steps = t["margin_warmup_epochs"] * spe

            def margin_schedule(step):
                frac = _jnp.clip(step.astype(_jnp.float32) / warm_steps, 0, 1)
                return m_start + frac * (m_final - m_start)

        raw_step = make_arcface_train_step(
            self.model,
            label_smoothing=t["label_smoothing"],
            mixup_alpha=t["mixup_alpha"],
            margin_schedule=margin_schedule,
        )

        def step_with_aug(state, images_u8, labels, rng):
            rng_aug, rng_step = jax.random.split(rng)
            images = augment_batch(rng_aug, images_u8, aug_tier)
            images = (images / 255.0 - 0.5) / 0.5
            return raw_step(state, images, labels, rng_step)

        self._train_step = jax.jit(step_with_aug, donate_argnums=(0,))
        _raw_eval = make_arcface_eval_step(self.model)

        def eval_u8(state, images_u8):
            x = (images_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            return _raw_eval(state, x)

        self._eval_step = jax.jit(eval_u8)

    # -- loops --------------------------------------------------------------

    def _make_loader(self) -> BatchLoader:
        t, d = self.config["train"], self.config["data"]
        if d["class_balanced"]:
            sampler = iter(
                ClassBalancedSampler(
                    self.train_index, t["batch_size"], seed=t["seed"] + self.epoch
                )
            )
        else:
            rng = np.random.default_rng(t["seed"] + self.epoch)

            def random_batches():
                while True:
                    yield rng.choice(len(self.train_index), t["batch_size"])

            sampler = random_batches()
        return BatchLoader(
            self.train_index,
            sampler,
            image_size=d["image_size"],
            n_workers=d["num_workers"],
        )

    def _device_batch(self, array: np.ndarray):
        """Shard a host batch over the data mesh (or plain device_put)."""
        if self.mesh is not None:
            from facerecognition_tpu.parallel import shard_batch

            return shard_batch(jnp.asarray(array), self.mesh)
        return jnp.asarray(array)

    def train_epoch(self) -> dict:
        loader = self._make_loader()
        spe = self._steps_per_epoch()
        losses, accs = [], []
        rng = jax.random.PRNGKey(self.config["train"]["seed"] * 1000 + self.epoch)
        t0 = time.time()
        it = iter(loader)
        for step in range(spe):
            images, labels = next(it)
            rng, sub = jax.random.split(rng)
            self.state, metrics = self._train_step(
                self.state,
                # Ship uint8; the jitted step casts on device. f32 host
                # transfers are 4x the bytes AND the axon plugin leaks every
                # transferred byte in host RSS (never freed) — a 9k-id run
                # OOM-killed the host at 130GB before this was diagnosed.
                self._device_batch(images),
                self._device_batch(labels),
                sub,
            )
            self.global_step += 1
            if step % 20 == 0 or step == spe - 1:
                losses.append(float(metrics["loss"]))
                accs.append(float(metrics["train_acc"]))
        loader.stop()
        return {
            "train_loss": float(np.mean(losses)),
            "train_acc": float(np.mean(accs)),
            "epoch_seconds": time.time() - t0,
        }

    def validate(self) -> dict:
        """Embed the val split and compute verification accuracy."""
        d = self.config["data"]
        e = self.config["eval"]
        bs = e["batch_size"]
        embs, labels = [], []
        idx = self.val_index
        from facerecognition_tpu.data.loader import _load_resize

        for start in range(0, len(idx), bs):
            chunk = list(range(start, min(start + bs, len(idx))))
            imgs = np.stack(
                [_load_resize(idx.paths[i], d["image_size"]) for i in chunk]
            )  # uint8: normalized on device (see train_epoch dtype note)
            emb = np.asarray(self._eval_step(self.state, jnp.asarray(imgs)))
            embs.append(emb)
            labels.append(idx.labels[chunk])
        embeddings = np.concatenate(embs)
        labels = np.concatenate(labels)
        ver_acc, thr = compute_verification_accuracy(
            embeddings, labels, e["num_pairs"], self.config["train"]["seed"]
        )
        # Real validation loss: CE over margin-free scaled-cosine logits
        # (the margin is a training-only perturbation; val classification
        # uses the same pure-cosine logits the reference's accuracy does).
        w = np.asarray(
            jax.device_get(self.state.params["arcface"]["weight"])
        )
        w = w / np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        logits = self.config["model"]["scale"] * embeddings @ w.T
        logits -= logits.max(axis=1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
        val_loss = float(-logp[np.arange(len(labels)), labels].mean())
        val_acc = float((logits.argmax(axis=1) == labels).mean())
        return {
            "ver_acc": ver_acc,
            "ver_threshold": thr,
            "val_loss": val_loss,
            "val_acc": val_acc,
        }

    def train(self) -> list[dict]:
        t = self.config["train"]
        ck = self.config["checkpoint"]
        while self.epoch < t["num_epochs"]:
            train_metrics = self.train_epoch()
            val_metrics = self.validate()
            record = {
                "epoch": self.epoch,
                "global_step": self.global_step,
                **train_metrics,
                **val_metrics,
            }

            name = t["early_stopping_metric"]
            if name == "ver_acc":
                metric = val_metrics["ver_acc"]
            elif name == "val_loss":
                metric = val_metrics["val_loss"]
            elif name == "train_loss":
                metric = train_metrics["train_loss"]
            else:
                raise ValueError(f"unknown early_stopping_metric {name!r}")
            improved = (
                metric > self.best_metric
                if self.metric_mode == "max"
                else metric < self.best_metric
            )
            if improved:
                self.best_metric = metric
                self.save_checkpoint("best")
            if t["schedule"] == "plateau":
                # Before the history write so lr_scale lands in THIS
                # epoch's persisted record, not one epoch late.
                record["lr_scale"] = self._apply_plateau_scale(
                    self.plateau.update(metric)
                )
            self.history.append(record)
            self._write_history()
            self.metrics_logger.log(self.global_step, record, prefix="arcface/")
            self.save_checkpoint("last")
            if ck["save_every_epochs"] and (
                (self.epoch + 1) % ck["save_every_epochs"] == 0
            ):
                self.save_checkpoint(f"epoch_{self.epoch}")
            self.epoch += 1
            if self.early_stopping(metric):
                break
        return self.history

    def _apply_plateau_scale(self, scale: float) -> float:
        """Write the plateau LR scale into the injected optax hyperparam."""

        def find_inject(s):
            if hasattr(s, "hyperparams"):
                return s
            if isinstance(s, (tuple, list)):
                for x in s:
                    r = find_inject(x)
                    if r is not None:
                        return r
            inner = getattr(s, "inner_state", None)
            return find_inject(inner) if inner is not None else None

        st = find_inject(self.state.opt_state)
        if st is None:  # schedule != plateau → no injected scale in the chain
            return scale
        old = st.hyperparams["step_size"]
        st.hyperparams["step_size"] = jax.device_put(
            jnp.asarray(scale, old.dtype), old.sharding
        )
        return scale

    # -- persistence --------------------------------------------------------

    def _write_history(self):
        path = os.path.join(self.ckpt.directory, "training_history.json")
        with open(path, "w") as f:
            json.dump(self.history, f, indent=2)

    def save_checkpoint(self, tag: str):
        tree = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        self.ckpt.save(
            tag,
            tree,
            metadata={
                "epoch": self.epoch,
                "global_step": self.global_step,
                "best_metric": float(self.best_metric),
                "num_classes": self.num_classes,
                "config": self.config,
                "history": self.history,
                "early_stopping": self.early_stopping.state_dict(),
                "plateau": self.plateau.state_dict(),
            },
        )

    def resume(
        self,
        tag: str = "last",
        reset_optimizer: bool = False,
        extend_epochs: Optional[int] = None,
    ):
        """Restore model/optimizer/controllers (reference :949-1024).

        ``extend_epochs`` adds epochs past the stored num_epochs (the
        reference auto-extends when the checkpoint is already at the end).
        """
        target = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        tree, meta = self.ckpt.restore(tag, target)
        self.state = self.state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=self.state.opt_state
            if reset_optimizer
            else tree["opt_state"],
            step=tree["step"],
        )
        if self.mesh is not None:
            from facerecognition_tpu.parallel import replicate

            self.state = replicate(self.state, self.mesh)
        self.epoch = meta.get("epoch", 0) + 1
        self.global_step = meta.get("global_step", 0)
        self.best_metric = meta.get(
            "best_metric", -np.inf if self.metric_mode == "max" else np.inf
        )
        self.history = meta.get("history", [])
        if meta.get("early_stopping"):
            self.early_stopping.load_state_dict(meta["early_stopping"])
        if meta.get("plateau"):
            self.plateau.load_state_dict(meta["plateau"])
        old_epochs = self.config["train"]["num_epochs"]
        if extend_epochs:
            self.config["train"]["num_epochs"] = self.epoch + extend_epochs
        elif self.epoch >= self.config["train"]["num_epochs"]:
            self.config["train"]["num_epochs"] = self.epoch + 10  # auto-extend
        if self.config["train"]["num_epochs"] != old_epochs:
            # Schedule horizons are baked into tx — without a rebuild a
            # decayed cosine would hold min_lr (0.0 by default) for every
            # extended epoch. The restored opt_state structure is unchanged.
            self.state = self.state.replace(tx=self._build_tx())
        return meta


def main(argv: Optional[list[str]] = None):
    import argparse

    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    parser = argparse.ArgumentParser(description="Train ArcFace on TPU")
    parser.add_argument("--config", default=None)
    parser.add_argument("--resume", default=None, help="checkpoint tag")
    parser.add_argument(
        "--set", action="append", default=[], help="override key=value"
    )
    args = parser.parse_args(argv)
    trainer = ArcFaceTrainer(args.config, args.set)
    if args.resume:
        trainer.resume(args.resume)
    history = trainer.train()
    print(json.dumps(history[-1] if history else {}, indent=2))


if __name__ == "__main__":
    main()
