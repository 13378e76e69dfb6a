"""Tests: CelebA pipeline, full_pipeline/SearchIndex/t-SNE, LBPH tools, scripts."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def celeba_dir(tmp_path, rng):
    """Minimal synthetic CelebA layout: images + identity + landmarks."""
    from PIL import Image

    root = tmp_path / "celeba"
    img_dir = root / "img_align_celeba"
    img_dir.mkdir(parents=True)
    names, idents, lms = [], [], []
    for pid in range(3):
        # person 0/1: 6 images (kept), person 2: 2 images (filtered at min 5)
        n = 6 if pid < 2 else 2
        for i in range(n):
            name = f"{pid:03d}{i:03d}.jpg"
            arr = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)
            Image.fromarray(arr).save(img_dir / name)
            names.append(name)
            idents.append(pid + 1)
            lms.append([69, 111, 108, 111, 89, 133, 73, 152, 105, 152])
    with open(root / "identity_CelebA.txt", "w") as f:
        for n, p in zip(names, idents):
            f.write(f"{n} {p}\n")
    import pandas as pd

    cols = [
        "lefteye_x", "lefteye_y", "righteye_x", "righteye_y", "nose_x",
        "nose_y", "leftmouth_x", "leftmouth_y", "rightmouth_x", "rightmouth_y",
    ]
    df = pd.DataFrame(lms, columns=cols)
    df.insert(0, "image_id", names)
    df.to_csv(root / "list_landmarks_align_celeba.csv", index=False)
    return str(root)


class TestCelebAPipeline:
    def test_full_run(self, celeba_dir, tmp_path):
        from facerecognition_tpu.preprocessing.celeba import (
            CelebAConfig,
            CelebAPreprocessor,
        )

        out = str(tmp_path / "out")
        config = CelebAConfig(
            data_dir=celeba_dir,
            output_dir=out,
            min_images=5,
            target_min_images=8,
            batch_size=8,
        )
        pre = CelebAPreprocessor(config)
        stats = pre.run()
        assert stats["n_identities"] == 3
        assert stats["n_identities_kept"] == 2  # person 3 filtered
        # augmentation brought each kept identity to >= 8 images
        total = sum(stats["split_counts"].values())
        assert total >= 16
        # outputs exist
        assert os.path.exists(os.path.join(out, "metadata", "global_id_mapping.csv"))
        assert os.path.exists(os.path.join(out, "metadata", "train_labels.csv"))
        import pandas as pd

        train = pd.read_csv(os.path.join(out, "metadata", "train_labels.csv"))
        assert {"image_path", "identity_id", "label"} <= set(train.columns)
        # aligned crops are 112x112
        from PIL import Image

        img = Image.open(train.iloc[0]["image_path"])
        assert img.size == (112, 112)

    def test_by_identity_split(self, celeba_dir, tmp_path):
        from facerecognition_tpu.preprocessing.celeba import (
            CelebAConfig,
            CelebAPreprocessor,
        )

        out = str(tmp_path / "out2")
        config = CelebAConfig(
            data_dir=celeba_dir,
            output_dir=out,
            min_images=5,
            target_min_images=5,
            split_mode="by_identity",
            train_frac=0.5,
            val_frac=0.5,
        )
        stats = CelebAPreprocessor(config).run()
        # identities fully separated between splits
        import pandas as pd

        train = pd.read_csv(os.path.join(out, "metadata", "train_labels.csv"))
        val = pd.read_csv(os.path.join(out, "metadata", "val_labels.csv"))
        assert not (
            set(train["identity_id"]) & set(val["identity_id"])
        )


@pytest.mark.slow
class TestFullPipeline:
    def test_full_pipeline_outputs(self, tmp_path, rng):
        import pandas as pd

        from tests.test_engine import SmallEmbedder
        from facerecognition_tpu.inference.extract_embeddings import (
            SearchIndex,
            full_pipeline,
        )
        from PIL import Image

        # dataset CSV with 3 classes x 5 images
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rows = []
        for c in range(3):
            base = rng.integers(0, 200, (112, 112, 3))
            for i in range(5):
                arr = np.clip(
                    base + rng.integers(-20, 20, base.shape), 0, 255
                ).astype(np.uint8)
                p = img_dir / f"c{c}_{i}.png"
                Image.fromarray(arr).save(p)
                rows.append({"image_path": str(p), "label": f"person{c}"})
        csv = tmp_path / "index.csv"
        pd.DataFrame(rows).to_csv(csv, index=False)

        out = str(tmp_path / "pipe")
        result = full_pipeline(str(csv), SmallEmbedder(), out)
        assert result["n_embeddings"] == 15
        assert result["n_classes"] == 3
        for key in ("embeddings_path", "prototypes_path", "index_path", "tsne_path"):
            assert result[key] and os.path.exists(result[key]), key

        # index round-trip + search correctness
        index = SearchIndex.load(result["index_path"])
        embs = np.load(result["embeddings_path"])
        labels = np.load(os.path.join(out, "labels.npy"))
        scores, ids = index.search(embs[:6], k=1)
        assert (ids[:, 0] == labels[:6]).mean() >= 0.8


class TestLBPHTools:
    def test_recognize_face_and_histogram(self, rng, tmp_path):
        from facerecognition_tpu.models.lbph import LBPHModel
        from facerecognition_tpu.models.lbph_tools import (
            plot_confidence_histogram,
            recognize_face,
        )

        images = rng.integers(0, 256, (9, 50, 50)).astype(np.uint8)
        labels = np.repeat(np.arange(3), 3)
        model = LBPHModel()
        model.train(images, labels)
        label_map = {0: "alice", 1: "bob", 2: "carol"}
        r = recognize_face(model, images[4], label_map, threshold=50.0)
        assert r["identity"] == "bob" and r["recognized"]
        r2 = recognize_face(model, images[4] // 3, label_map, threshold=1e-9)
        assert r2["identity"] == "Unknown" and not r2["recognized"]

        path = plot_confidence_histogram(
            [10, 20, 30, 80], str(tmp_path / "h.png"), threshold=50
        )
        assert os.path.exists(path)

    def test_load_faces_capped(self, tmp_path, rng):
        from PIL import Image

        from facerecognition_tpu.models.lbph_tools import load_faces_capped

        for p in range(2):
            d = tmp_path / "data" / f"p{p}"
            d.mkdir(parents=True)
            for i in range(5):
                Image.fromarray(
                    rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
                ).save(d / f"{i}.png")
        images, labels, label_map = load_faces_capped(
            str(tmp_path / "data"), image_size=40, max_per_class=3
        )
        assert len(images) == 6  # capped at 3 per class
        assert images.shape[1:] == (40, 40)
        assert label_map == {0: "p0", 1: "p1"}


class TestScripts:
    def test_create_label_map_from_csv_and_dir(self, tmp_path, rng):
        import pandas as pd

        from facerecognition_tpu.scripts.create_label_map import create_label_map

        csv = tmp_path / "map.csv"
        pd.DataFrame(
            {"identity_id": ["a", "b"], "label": [0, 1]}
        ).to_csv(csv, index=False)
        m = create_label_map(str(csv), output_path=str(tmp_path / "lm.npy"))
        assert m == {0: "a", 1: "b"}

        from PIL import Image

        d = tmp_path / "ds" / "zed"
        d.mkdir(parents=True)
        Image.fromarray(
            rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
        ).save(d / "0.png")
        m2 = create_label_map(
            dataset_dir=str(tmp_path / "ds"), output_path=str(tmp_path / "lm2.npy")
        )
        assert m2 == {0: "zed"}

        with pytest.raises(ValueError):
            create_label_map(output_path=str(tmp_path / "nope.npy"))

    def test_inspect_checkpoint(self, tmp_path):
        from facerecognition_tpu.scripts.inspect_checkpoint import inspect
        from facerecognition_tpu.utils.serialization import save_variables

        tree = {"params": {"layer": {"kernel": np.zeros((4, 8), np.float32)}}}
        path = str(tmp_path / "ck.msgpack")
        save_variables(path, tree)
        info = inspect(path)
        assert info["n_params"] == 32
        assert any("kernel" in l for l in info["lines"])

    def test_visualize_logs_and_overfit(self, tmp_path):
        from facerecognition_tpu.scripts.visualize_logs import (
            analyze_overfit,
            merge_histories,
            plot_history,
        )

        h1 = [{"epoch": i, "train_loss": 1.0 - i * 0.05, "ver_acc": 0.5 + i * 0.02}
              for i in range(10)]
        h2 = [{"epoch": i, "train_loss": 0.5 - (i - 10) * 0.03,
               "ver_acc": 0.7 - (i - 10) * 0.03} for i in range(10, 20)]
        p1, p2 = tmp_path / "h1.json", tmp_path / "h2.json"
        p1.write_text(json.dumps(h1))
        p2.write_text(json.dumps(h2))
        merged = merge_histories([str(p1), str(p2)])
        assert len(merged) == 20
        result = analyze_overfit(merged)
        assert result["overfitting"] is True  # train down, val down
        assert result["best_epoch"] == 10
        out = plot_history(merged, str(tmp_path / "curves.png"))
        assert os.path.exists(out)
