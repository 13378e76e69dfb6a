"""Utils tests: metrics logger, profiling counters, batch visualizer."""

import json
import os

import numpy as np

from facerecognition_tpu.utils.metrics import MetricsLogger
from facerecognition_tpu.utils.profiling import ThroughputCounter
from facerecognition_tpu.data.visualize import visualize_batch


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), enable_tensorboard=False)
    logger.log(1, {"loss": 0.5, "acc": 0.9})
    logger.log(2, {"loss": 0.4})
    lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 1 and rec["loss"] == 0.5


def test_throughput_counter():
    c = ThroughputCounter()
    c.record(10, 0.1)
    c.record(10, 0.2)
    s = c.stats()
    assert abs(s["items_per_sec"] - 20 / 0.3) < 1e-6
    assert s["p50_ms"] > 0
    with c.measure(5):
        pass
    assert c.stats()["n"] == 3


def test_visualize_batch(tmp_path, rng):
    imgs = rng.integers(0, 256, (6, 32, 32, 3)).astype(np.uint8)
    labels = np.arange(6) % 3
    out = visualize_batch(
        imgs, labels, ["a", "b", "c"], str(tmp_path / "b.png"),
        augmented=imgs[::-1].copy(),
    )
    assert os.path.exists(out)


def test_default_checkpoint_resolvers():
    """Both serving-default resolvers return shipped, loadable asset paths,
    and FaceNet's prefers the 9k-scale checkpoint when present (mirrors
    default_arcface_checkpoint's slim-9k preference)."""
    import os

    from facerecognition_tpu.inference import (
        default_arcface_checkpoint,
        default_facenet_checkpoint,
    )

    a = default_arcface_checkpoint()
    f = default_facenet_checkpoint()
    assert a and os.path.exists(a) and a.endswith(".msgpack")
    assert f and os.path.exists(f) and f.endswith(".msgpack")
    if os.path.exists(
        os.path.join(os.path.dirname(f), "facenet_synthid9k_512.msgpack")
    ):
        assert f.endswith("facenet_synthid9k_512.msgpack")
