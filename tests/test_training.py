"""Training-stack tests: config, schedules, data layer, end-to-end trainers."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facerecognition_tpu.data import (
    AUG_TIERS,
    BatchLoader,
    ClassBalancedSampler,
    CSVDataset,
    FolderDataset,
    PKSampler,
    augment_batch,
    check_identity_overlap,
    split_by_identity,
    split_by_image,
)
from facerecognition_tpu.training.config import (
    apply_dotted_overrides,
    deep_merge,
    load_config,
)
from facerecognition_tpu.training.schedules import (
    EarlyStopping,
    ReduceOnPlateau,
    build_schedule,
)


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    """Synthetic person-per-folder dataset: 6 identities x 6 images, 64px.

    Images are identity-colored patterns so a tiny model can actually learn.
    """
    from PIL import Image

    root = tmp_path_factory.mktemp("faces")
    rng = np.random.default_rng(0)
    for pid in range(6):
        pdir = root / f"person{pid}"
        pdir.mkdir()
        base = rng.integers(40, 200, 3)
        for i in range(6):
            img = rng.integers(0, 60, (64, 64, 3)).astype(np.int64)
            img[10 + pid * 6 : 18 + pid * 6, :, :] += base  # identity stripe
            img[:, 10 + pid * 8 : 14 + pid * 8, :] += base
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                pdir / f"{i}.png"
            )
    return str(root)


class TestConfig:
    def test_deep_merge(self):
        base = {"a": {"b": 1, "c": 2}, "d": 3}
        out = deep_merge(base, {"a": {"b": 9}, "e": 5})
        assert out == {"a": {"b": 9, "c": 2}, "d": 3, "e": 5}
        assert base["a"]["b"] == 1  # no mutation

    def test_dotted_overrides(self):
        cfg = apply_dotted_overrides(
            {"train": {"lr": 0.1}}, ["train.lr=0.5", "train.opt=adam", "x.y=true"]
        )
        assert cfg["train"]["lr"] == 0.5
        assert cfg["train"]["opt"] == "adam"
        assert cfg["x"]["y"] is True

    def test_load_yaml(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("train:\n  lr: 0.2\n")
        cfg = load_config(str(p), ["train.bs=64"], {"train": {"lr": 0.1, "bs": 32}})
        assert cfg["train"] == {"lr": 0.2, "bs": 64}


class TestSchedules:
    def test_warmup_cosine(self):
        s = build_schedule(1.0, "cosine", total_steps=100, warmup_steps=10)
        assert float(s(0)) == pytest.approx(0.1)
        assert float(s(10)) == pytest.approx(1.0, abs=0.01)
        assert float(s(99)) < 0.01

    def test_step_schedule(self):
        s = build_schedule(1.0, "step", step_size=10, gamma=0.1)
        assert float(s(5)) == pytest.approx(1.0)
        assert float(s(15)) == pytest.approx(0.1)

    def test_early_stopping(self):
        es = EarlyStopping(patience=2, mode="max")
        assert not es(0.5) and not es(0.6)
        assert not es(0.55)  # 1 bad epoch
        assert es(0.58)  # 2nd bad epoch → stop
        assert es.should_stop

    def test_plateau(self):
        pl = ReduceOnPlateau(factor=0.5, patience=1)
        assert pl.update(1.0) == 1.0
        assert pl.update(0.9) == 1.0
        pl.update(0.95)
        assert pl.update(0.96) == 0.5  # two non-improving → scale down


class TestDataLayer:
    def test_folder_dataset(self, image_tree):
        ds = FolderDataset(image_tree, min_images=2)
        assert ds.num_classes == 6
        assert len(ds) == 36
        assert ds.label_names == [f"person{i}" for i in range(6)]

    def test_csv_dataset(self, image_tree, tmp_path):
        import pandas as pd

        ds = FolderDataset(image_tree)
        csv = tmp_path / "idx.csv"
        pd.DataFrame(
            {"image_path": ds.paths, "identity": [ds.label_names[l] for l in ds.labels]}
        ).to_csv(csv, index=False)
        ds2 = CSVDataset(str(csv))
        assert len(ds2) == len(ds)
        assert ds2.num_classes == 6

    def test_csv_headerless_keeps_first_row(self, image_tree, tmp_path):
        """Layout 3 (two unnamed columns): the first data row must not be
        consumed as a header."""
        ds = FolderDataset(image_tree)
        csv = tmp_path / "plain.csv"
        with open(csv, "w") as f:
            for p, l in zip(ds.paths, ds.labels):
                f.write(f"{p},{ds.label_names[l]}\n")
        ds2 = CSVDataset(str(csv))
        assert len(ds2) == len(ds)
        assert ds2.num_classes == ds.num_classes

    def test_splits_and_overlap_guard(self, image_tree):
        ds = FolderDataset(image_tree)
        tr, va = split_by_image(ds, 0.2)
        assert len(tr) + len(va) == len(ds)
        tr2, va2 = split_by_identity(ds, 0.34)
        assert not (
            set(tr2.labels.tolist()) & set(va2.labels.tolist())
        )
        with pytest.raises(ValueError, match="leakage"):
            check_identity_overlap(tr, va)  # by_image split overlaps

    def test_class_balanced_sampler(self, image_tree):
        ds = FolderDataset(image_tree)
        s = ClassBalancedSampler(ds, 12, seed=0)
        batch = next(iter(s))
        assert batch.shape == (12,)

    def test_pk_sampler(self, image_tree):
        ds = FolderDataset(image_tree)
        s = PKSampler(ds, p_identities=3, k_images=2, seed=0)
        batch = next(iter(s))
        labels = ds.labels[batch]
        assert len(batch) == 6
        assert len(np.unique(labels)) == 3
        for c in np.unique(labels):
            assert (labels == c).sum() == 2

    def test_batch_loader(self, image_tree):
        ds = FolderDataset(image_tree)
        s = ClassBalancedSampler(ds, 8, seed=0)
        loader = BatchLoader(ds, iter(s), image_size=64, n_workers=2)
        imgs, labels = next(iter(loader))
        loader.stop()
        assert imgs.shape == (8, 64, 64, 3)
        assert imgs.dtype == np.uint8
        assert labels.shape == (8,)

    def test_augment_tiers(self, rng):
        imgs = jnp.asarray(
            rng.integers(0, 256, (4, 64, 64, 3)).astype(np.float32)
        )
        key = jax.random.PRNGKey(0)
        for tier in AUG_TIERS:
            out = augment_batch(key, imgs, tier)
            assert out.shape == imgs.shape
            assert float(out.min()) >= 0 and float(out.max()) <= 255
        # 'none' tier is identity
        none = augment_batch(key, imgs, "none")
        np.testing.assert_allclose(np.asarray(none), np.asarray(imgs), atol=1e-4)


@pytest.mark.slow
class TestArcFaceTrainerEndToEnd:
    def test_train_checkpoint_resume(self, image_tree, tmp_path):
        from facerecognition_tpu.training.train_arcface import ArcFaceTrainer

        cfg = {
            "data": {
                "data_dir": image_tree,
                "image_size": 64,
                "val_frac": 0.25,
                "augmentation": "light",
                "num_workers": 2,
                "min_images": 1,
            },
            "train": {
                "batch_size": 12,
                "num_epochs": 2,
                "steps_per_epoch": 4,
                "lr": 0.01,
                "warmup_epochs": 0,
                "early_stopping_patience": 50,
            },
            "eval": {"num_pairs": 60, "batch_size": 32},
            "checkpoint": {
                "dir": str(tmp_path / "ck"),
                "keep_last_n": 2,
                "save_every_epochs": 1,
            },
        }
        trainer = ArcFaceTrainer(cfg)
        history = trainer.train()
        assert len(history) == 2
        assert all(np.isfinite(h["train_loss"]) for h in history)
        assert trainer.ckpt.exists("best") and trainer.ckpt.exists("last")
        hist_file = os.path.join(trainer.ckpt.directory, "training_history.json")
        assert json.load(open(hist_file)) == history

        # resume: new trainer, restore, auto-extends epochs and keeps history
        t2 = ArcFaceTrainer(cfg)
        meta = t2.resume("last")
        assert t2.epoch == 2
        assert t2.history == history
        assert t2.config["train"]["num_epochs"] > 2  # auto-extend
        t2.config["train"]["num_epochs"] = 3
        h2 = t2.train()
        assert len(h2) == 3


@pytest.mark.slow
class TestFaceNetTrainerEndToEnd:
    def test_train_one_epoch(self, image_tree, tmp_path):
        from facerecognition_tpu.training.train_facenet import FaceNetTrainer

        cfg = {
            "data": {
                "data_dir": image_tree,
                "image_size": 80,  # IRv1 minimum is 71px
                "val_frac": 0.34,
                "augmentation": "none",
                "num_workers": 2,
                "min_images": 1,
            },
            "train": {
                "p_identities": 3,
                "k_images": 2,
                "num_epochs": 1,
                "steps_per_epoch": 3,
                "lr": 1e-4,
            },
            "eval": {"num_pairs": 40, "batch_size": 16},
            "checkpoint": {"dir": str(tmp_path / "fn"), "keep_last_n": 2},
        }
        trainer = FaceNetTrainer(cfg)
        history = trainer.train()
        assert len(history) == 1
        rec = history[0]
        assert np.isfinite(rec["train_loss"])
        assert {"val_loss", "ver_acc", "d_ap", "d_an"} <= set(rec)
        assert trainer.ckpt.exists("last")

        # Phase-two warm start (semi-hard -> batch-hard finetune): params
        # carry over bit-exact from the phase-one checkpoint, mining and lr
        # change, optimizer state starts fresh.
        import jax

        cfg2 = {
            **cfg,
            "train": {
                **cfg["train"],
                "mining": "batch_hard",
                "lr": 1e-5,
                "init_from": f"{tmp_path / 'fn'}:last",
            },
            "checkpoint": {"dir": str(tmp_path / "fn2"), "keep_last_n": 2},
        }
        t2 = FaceNetTrainer(cfg2)
        restored, _ = trainer.ckpt.restore("last")
        for a, b in zip(
            jax.tree_util.tree_leaves(t2.state.params),
            jax.tree_util.tree_leaves(restored["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(t2.state.step) == 0

    def test_init_from_rejects_mismatched_model(self, image_tree, tmp_path):
        from facerecognition_tpu.training.train_facenet import FaceNetTrainer
        from facerecognition_tpu.utils.serialization import save_variables

        save_variables(
            str(tmp_path / "wrong.msgpack"),
            {"params": {"x": np.zeros(3)}, "batch_stats": {}},
        )
        cfg = {
            "data": {
                "data_dir": image_tree,
                "image_size": 80,
                "min_images": 1,
                "val_frac": 0.34,
            },
            "train": {
                "p_identities": 2,
                "k_images": 2,
                "init_from": str(tmp_path / "wrong.msgpack"),
            },
            "checkpoint": {"dir": str(tmp_path / "fn3")},
        }
        with pytest.raises(ValueError, match="init_from"):
            FaceNetTrainer(cfg)


class TestLBPHTraining:
    def test_from_directory_with_threshold(self, image_tree, tmp_path):
        from facerecognition_tpu.training.train_lbph import (
            train_lbph_from_directory,
        )
        import yaml

        config_path = str(tmp_path / "lbph.yaml")
        result = train_lbph_from_directory(
            image_tree,
            output_dir=str(tmp_path / "lbph"),
            image_size=64,
            config_path=config_path,
        )
        assert result["n_identities"] == 6
        assert os.path.exists(result["model_path"])
        assert os.path.exists(result["label_map_path"])
        assert os.path.exists(str(tmp_path / "lbph" / "optimal_threshold.txt"))
        # config writeback feedback loop
        cfg = yaml.safe_load(open(config_path))
        assert cfg["default_threshold"] == result["optimal_threshold"]

    def test_threshold_search_semantics(self, rng):
        from facerecognition_tpu.models.lbph import LBPHModel
        from facerecognition_tpu.training.train_lbph import (
            evaluate_lbph,
            find_optimal_threshold,
        )

        images = rng.integers(0, 256, (12, 40, 40)).astype(np.uint8)
        labels = np.repeat(np.arange(4), 3)
        model = LBPHModel()
        model.train(images, labels)
        thr, best, sweep = find_optimal_threshold(
            model, images, labels, thresholds=range(5, 100, 10)
        )
        assert best["score"] == max(r["score"] for r in sweep if r["coverage"] >= 0.3)
        # coverage is monotone nondecreasing in threshold (reference
        # test_lbph_logic.py:115-143 invariant)
        covs = [r["coverage"] for r in sweep]
        assert all(a <= b + 1e-9 for a, b in zip(covs, covs[1:]))
        ev = evaluate_lbph(model, images, labels, thr)
        assert 0.0 <= ev["accuracy"] <= 1.0
        assert 0.0 <= ev["coverage"] <= 1.0


@pytest.mark.slow
class TestArcFaceLearns:
    def test_loss_decreases_on_separable_classes(self, rng):
        """30 steps on trivially-separable synthetic classes must cut the
        ArcFace margin loss by >50% and push cosine train accuracy up."""
        import optax

        from facerecognition_tpu.models.arcface import ArcFaceModel
        from facerecognition_tpu.training.steps import (
            ArcFaceTrainState,
            make_arcface_train_step,
        )

        n_classes, batch = 4, 32
        model = ArcFaceModel(
            num_classes=n_classes, embedding_size=64, margin=0.2, easy_margin=True
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 56, 56, 3)),
            labels=jnp.zeros((2,), jnp.int32),
        )
        state = ArcFaceTrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3)),
        )
        step = jax.jit(
            make_arcface_train_step(model, label_smoothing=0.0, mixup_alpha=0.0),
            donate_argnums=(0,),
        )
        # class c = constant image of distinct color + small noise
        palette = rng.normal(size=(n_classes, 1, 1, 3)).astype(np.float32)
        losses, accs = [], []
        key = jax.random.PRNGKey(1)
        for i in range(30):
            labels = rng.integers(0, n_classes, batch)
            images = palette[labels] + 0.05 * rng.normal(
                size=(batch, 56, 56, 3)
            ).astype(np.float32)
            key, sub = jax.random.split(key)
            state, metrics = step(
                state, jnp.asarray(images), jnp.asarray(labels), sub
            )
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["train_acc"]))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
        assert np.mean(accs[-5:]) > np.mean(accs[:5])


class TestMarginSchedule:
    def test_scheduled_margin_step(self, rng):
        """Margin ramp inside the jit: step runs, and margin=0 at step 0
        reproduces the no-margin logits."""
        import optax

        from facerecognition_tpu.models.arcface import ArcFaceModel, arc_margin_logits
        from facerecognition_tpu.training.steps import (
            ArcFaceTrainState,
            make_arcface_train_step,
        )

        model = ArcFaceModel(num_classes=4, embedding_size=32, margin=0.5)
        v = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 56, 56, 3)),
            labels=jnp.zeros((2,), jnp.int32),
        )
        state = ArcFaceTrainState.create(
            apply_fn=model.apply,
            params=v["params"],
            batch_stats=v["batch_stats"],
            tx=optax.sgd(1e-3),
        )
        sched = lambda step: jnp.clip(step.astype(jnp.float32) / 10.0, 0, 1) * 0.5
        step = jax.jit(make_arcface_train_step(model, 0.0, 0.0, sched))
        imgs = jnp.asarray(rng.normal(size=(4, 56, 56, 3)).astype(np.float32))
        labels = jnp.asarray([0, 1, 2, 3])
        s1, m1 = step(state, imgs, labels, jax.random.PRNGKey(1))
        assert np.isfinite(float(m1["loss"]))
        # traced margin matches static margin in the pure function
        emb = rng.normal(size=(3, 8)).astype(np.float32)
        w = rng.normal(size=(5, 8)).astype(np.float32)
        lab = jnp.asarray([0, 1, 2])
        a = arc_margin_logits(jnp.asarray(emb), jnp.asarray(w), lab, 64.0, 0.3)
        b = arc_margin_logits(
            jnp.asarray(emb), jnp.asarray(w), lab, 64.0, jnp.float32(0.3)
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestDataParallelTraining:
    def test_resolve_data_mesh(self):
        from facerecognition_tpu.parallel import resolve_data_mesh

        assert resolve_data_mesh(1, 128) is None
        assert resolve_data_mesh(None, 128) is None
        m = resolve_data_mesh("auto", 128)
        assert m is not None and m.shape["data"] == 8
        # batch 12 → largest divisor ≤ 8 is 6
        m = resolve_data_mesh("auto", 12)
        assert m.shape["data"] == 6
        m = resolve_data_mesh(4, 128)
        assert m.shape["data"] == 4
        m = resolve_data_mesh("auto", 7)  # prime 7 < 8 → 7-device mesh
        assert m.shape["data"] == 7
        assert resolve_data_mesh("auto", 1) is None  # batch 1 → off

    @pytest.mark.slow
    def test_arcface_dp_step_8dev(self, rng):
        """The DP ArcFace train step on the 8-device mesh: ≥2 steps, finite
        decreasing loss, params bit-identical across devices (VERDICT r1 #3)."""
        import optax

        from facerecognition_tpu.models.arcface import ArcFaceModel
        from facerecognition_tpu.parallel import (
            create_mesh,
            replicate,
            shard_batch,
        )
        from facerecognition_tpu.training.steps import (
            ArcFaceTrainState,
            make_arcface_train_step,
        )

        mesh = create_mesh(jax.devices()[:8], data=8)
        model = ArcFaceModel(num_classes=4, embedding_size=32, margin=0.2)
        v = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 56, 56, 3)),
            labels=jnp.zeros((2,), jnp.int32),
        )
        state = ArcFaceTrainState.create(
            apply_fn=model.apply,
            params=v["params"],
            batch_stats=v["batch_stats"],
            tx=optax.adam(1e-2),
        )
        state = replicate(state, mesh)
        step = jax.jit(make_arcface_train_step(model), donate_argnums=(0,))
        palette = rng.normal(size=(4, 1, 1, 3)).astype(np.float32)
        losses = []
        for i in range(20):
            labels = rng.integers(0, 4, 16)
            images = palette[labels] + 0.05 * rng.normal(
                size=(16, 56, 56, 3)
            ).astype(np.float32)
            state, metrics = step(
                state,
                shard_batch(jnp.asarray(images), mesh),
                shard_batch(jnp.asarray(labels), mesh),
                jax.random.PRNGKey(i),
            )
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
        # params replicated: every device shard is bit-identical
        leaf = state.params["arcface"]["weight"]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == 8
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    @pytest.mark.slow
    def test_trainer_uses_mesh_by_default(self, image_tree, tmp_path):
        """ArcFaceTrainer with default num_devices='auto' trains DP-sharded."""
        from facerecognition_tpu.training.train_arcface import ArcFaceTrainer

        cfg = {
            "data": {
                "data_dir": image_tree,
                "image_size": 64,
                "val_frac": 0.25,
                "augmentation": "none",
                "num_workers": 2,
                "min_images": 1,
            },
            "train": {
                "batch_size": 16,
                "num_epochs": 1,
                "steps_per_epoch": 2,
                "warmup_epochs": 0,
            },
            "eval": {"num_pairs": 40, "batch_size": 32},
            "checkpoint": {"dir": str(tmp_path / "dp"), "keep_last_n": 1,
                           "save_every_epochs": 0},
        }
        trainer = ArcFaceTrainer(cfg)
        assert trainer.mesh is not None
        assert trainer.mesh.shape["data"] == 8
        hist = trainer.train()
        assert np.isfinite(hist[0]["train_loss"])
        assert {"val_loss", "val_acc", "ver_acc"} <= set(hist[0])
        # state actually lives replicated on the mesh
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        assert len(leaf.addressable_shards) == 8


class TestBestCheckpointModes:
    @pytest.mark.slow
    def test_val_loss_mode_saves_lowest(self, image_tree, tmp_path):
        """early_stopping_metric=val_loss → best tracks the MINIMUM actual
        validation loss (ADVICE r1: was inverted + used train_loss)."""
        from facerecognition_tpu.training.train_arcface import ArcFaceTrainer

        cfg = {
            "data": {
                "data_dir": image_tree,
                "image_size": 64,
                "val_frac": 0.25,
                "augmentation": "none",
                "num_workers": 2,
                "min_images": 1,
            },
            "train": {
                "batch_size": 12,
                "num_epochs": 2,
                "steps_per_epoch": 2,
                "warmup_epochs": 0,
                "early_stopping_metric": "val_loss",
                "num_devices": 1,
            },
            "eval": {"num_pairs": 40, "batch_size": 32},
            "checkpoint": {"dir": str(tmp_path / "vl"), "keep_last_n": 1,
                           "save_every_epochs": 0},
        }
        trainer = ArcFaceTrainer(cfg)
        assert trainer.metric_mode == "min"
        hist = trainer.train()
        assert trainer.best_metric == min(h["val_loss"] for h in hist)
        assert trainer.ckpt.exists("best")


class TestPlateauWiring:
    def test_plateau_scale_reaches_optimizer(self, image_tree, tmp_path):
        """schedule='plateau' injects a scale hyperparam that the host
        controller actually writes (ADVICE r1: update() was never called)."""
        from facerecognition_tpu.training.train_arcface import ArcFaceTrainer

        cfg = {
            "data": {
                "data_dir": image_tree,
                "image_size": 64,
                "val_frac": 0.25,
                "augmentation": "none",
                "num_workers": 2,
                "min_images": 1,
            },
            "train": {
                "batch_size": 12,
                "num_epochs": 1,
                "steps_per_epoch": 1,
                "schedule": "plateau",
                "warmup_epochs": 0,
                "num_devices": 1,
                "plateau_patience": 0,
            },
            "eval": {"num_pairs": 40, "batch_size": 32},
            "checkpoint": {"dir": str(tmp_path / "pl"), "keep_last_n": 1,
                           "save_every_epochs": 0},
        }
        trainer = ArcFaceTrainer(cfg)
        applied = trainer._apply_plateau_scale(0.25)
        assert applied == 0.25

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

        st = find_inject(trainer.state.opt_state)
        assert st is not None
        assert float(st.hyperparams["step_size"]) == 0.25
        # and train() records the applied scale each epoch
        hist = trainer.train()
        assert "lr_scale" in hist[0]


class TestFreezeSemantics:
    def test_frozen_params_stay_fixed_after_step(self, image_tree, tmp_path):
        """freeze_ratio>0 must leave frozen params bit-identical after a
        train step — optax.masked would have passed RAW gradients through
        (params += grad) for the frozen subset."""
        from facerecognition_tpu.models.arcface import freeze_mask
        from facerecognition_tpu.training.train_arcface import ArcFaceTrainer

        tr = ArcFaceTrainer(
            {
                "data": {
                    "data_dir": image_tree,
                    "image_size": 56,
                    "augmentation": "none",
                    "min_images": 1,
                },
                "model": {"freeze_ratio": 0.5, "embedding_size": 32},
                "train": {
                    "num_epochs": 1,
                    "batch_size": 4,
                    "steps_per_epoch": 2,
                    "num_devices": 1,
                    "warmup_epochs": 0,
                },
                "eval": {"num_pairs": 20, "batch_size": 8},
                "checkpoint": {"dir": str(tmp_path)},
            }
        )
        mask = freeze_mask(tr.state.params, 0.5)
        before = jax.tree_util.tree_map(np.asarray, tr.state.params)
        tr.train_epoch()
        after = jax.tree_util.tree_map(np.asarray, tr.state.params)
        flat_mask = jax.tree_util.tree_leaves_with_path(mask)
        frozen_checked = trained_changed = 0
        for (path, trainable), b, a in zip(
            flat_mask,
            jax.tree_util.tree_leaves(before),
            jax.tree_util.tree_leaves(after),
        ):
            if not trainable:
                np.testing.assert_array_equal(b, a, err_msg=str(path))
                frozen_checked += 1
            elif not np.array_equal(b, a):
                trained_changed += 1
        assert frozen_checked > 0
        assert trained_changed > 0  # the unfrozen subset actually trains


@pytest.mark.slow
class TestSynthIdTraining:
    def test_smoke_train_and_eval(self, tmp_path):
        """train_synthid end-to-end at toy scale: finite losses, rising
        train accuracy signal, eval dict with the full metric set, and a
        margin-head-free serving checkpoint."""
        from facerecognition_tpu.training.train_synthid import (
            SynthIdConfig,
            train_synthid,
        )

        cfg = SynthIdConfig(
            n_ids=8,
            train_per_id=6,
            val_per_id=2,
            batch_size=16,
            epochs=2,
            lr=0.02,
        )
        variables, history, final = train_synthid(cfg, log=lambda *a: None)
        assert len(history) == 2
        assert all(np.isfinite(h["loss"]) for h in history)
        for key in ("top_1_accuracy", "top_5_accuracy", "auc", "eer"):
            assert key in final and np.isfinite(final[key])
        assert "arcface" in variables["params"]  # margin head present here
        # main() strips it for serving; emulate and load through the engine
        from facerecognition_tpu.inference.extract_embeddings import (
            load_arcface_model,
        )
        from facerecognition_tpu.utils.serialization import save_variables

        params = {
            k: v for k, v in variables["params"].items() if k != "arcface"
        }
        p = tmp_path / "synthid.msgpack"
        save_variables(
            str(p),
            {"params": params, "batch_stats": variables["batch_stats"]},
        )
        emb = load_arcface_model(str(p))
        out = emb.embed_uint8(
            np.zeros((2, 112, 112, 3), np.float32)
        )
        assert out.shape == (2, 512)
        assert np.isfinite(out).all()

    def test_cache_fingerprint_rejects_mismatch(self, tmp_path):
        """A dataset cache rendered under one (ids, split, seed) config must
        not be silently reused by a different one."""
        from facerecognition_tpu.training.train_synthid import (
            SynthIdConfig,
            train_synthid,
        )

        cache = str(tmp_path / "ds.npz")
        base = dict(
            n_ids=8, train_per_id=4, val_per_id=2, batch_size=16, epochs=1,
            lr=0.02, cache=cache,
        )
        train_synthid(SynthIdConfig(**base), log=lambda *a: None)
        assert os.path.exists(cache)
        # same config reuses the cache fine
        train_synthid(SynthIdConfig(**base), log=lambda *a: None)
        # different seed, same sample count -> rejected (count check alone
        # would pass)
        with pytest.raises(ValueError, match="rendered with"):
            train_synthid(
                SynthIdConfig(**{**base, "seed": 1}), log=lambda *a: None
            )
        # legacy cache (no fingerprint): count check + loud warning
        import numpy as _np

        with _np.load(cache) as z:
            imgs, labels = z["imgs"], z["labels"]
        _np.savez(cache, imgs=imgs, labels=labels)
        logs = []
        train_synthid(SynthIdConfig(**base), log=lambda *a: logs.append(a))
        assert any("no fingerprint" in str(line) for line in logs)

    def test_resume_survives_torn_meta(self, tmp_path):
        """Kill between the two crash_save replaces leaves ckpt+stale/absent
        meta; resume must keep the weights and restart the epoch count."""
        from facerecognition_tpu.training.train_synthid import (
            SynthIdConfig,
            train_synthid,
        )

        ckpt = str(tmp_path / "crash.msgpack")
        cache = str(tmp_path / "ds.npz")
        base = dict(
            n_ids=8, train_per_id=4, val_per_id=2, batch_size=16, epochs=1,
            lr=0.02, ckpt_path=ckpt, cache=cache,
        )
        train_synthid(SynthIdConfig(**base), log=lambda *a: None)
        assert os.path.exists(ckpt) and os.path.exists(ckpt + ".meta.json")
        os.remove(ckpt + ".meta.json")  # simulate the torn pair
        logs = []
        _, history, _ = train_synthid(
            SynthIdConfig(**{**base, "resume": True}),
            log=lambda *a: logs.append(" ".join(map(str, a))),
        )
        assert any("meta unreadable" in line for line in logs)
        assert len(history) == 1  # epoch count restarted, run completed
