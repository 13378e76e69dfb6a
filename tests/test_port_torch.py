"""Numeric parity: torch reference nets → ported Flax models.

The parity bar from SURVEY.md §7 / BASELINE.md: embeddings within 1e-3
cosine. These tests hold the ported backbones to much tighter tolerances on
random weights + random inputs (CPU, f32).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from facerecognition_tpu.models.inception_resnet_v1 import InceptionResnetV1
from facerecognition_tpu.models.port_torch import (
    inception_resnet_v1_key_map,
    port_state_dict,
    resnet50_key_map,
)
from facerecognition_tpu.models.resnet import ResNet50Backbone

from torch_refs import TorchInceptionResnetV1, TorchResNet50


def _randomize_bn_stats(module):
    """Give BN layers nontrivial running stats so parity covers them."""
    g = torch.Generator().manual_seed(7)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


@pytest.mark.slow
def test_resnet50_parity():
    tmodel = TorchResNet50().eval()
    _randomize_bn_stats(tmodel)
    variables = port_state_dict(tmodel.state_dict(), resnet50_key_map)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = np.random.default_rng(0).normal(size=(2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = ResNet50Backbone()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == ref.shape == (2, 2048)
    # max abs deviation relative to activation scale
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 1e-4


@pytest.mark.slow
def test_resnet26_slim_parity():
    """The slim (2,2,2,2) backbone ports and matches torch numerically —
    the same parity bar the full ResNet50 meets."""
    stages = (2, 2, 2, 2)
    tmodel = TorchResNet50(stage_sizes=stages).eval()
    _randomize_bn_stats(tmodel)
    variables = port_state_dict(tmodel.state_dict(), resnet50_key_map)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = np.random.default_rng(3).normal(size=(2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = ResNet50Backbone(stage_sizes=stages)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == ref.shape == (2, 2048)
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 1e-4


@pytest.mark.slow
def test_resnet_ultraslim_parity():
    """The ultraslim (1,1,1,1) backbone (assets/
    arcface_synthid9k_ultraslim_512.msgpack) meets the same torch parity
    bar as the other depths."""
    stages = (1, 1, 1, 1)
    tmodel = TorchResNet50(stage_sizes=stages).eval()
    _randomize_bn_stats(tmodel)
    variables = port_state_dict(tmodel.state_dict(), resnet50_key_map)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = np.random.default_rng(5).normal(size=(2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = ResNet50Backbone(stage_sizes=stages)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == ref.shape == (2, 2048)
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 1e-4


@pytest.mark.slow
def test_inception_resnet_v1_parity():
    tmodel = TorchInceptionResnetV1().eval()
    _randomize_bn_stats(tmodel)
    variables = port_state_dict(tmodel.state_dict(), inception_resnet_v1_key_map)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = np.random.default_rng(1).normal(size=(2, 160, 160, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = InceptionResnetV1()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == ref.shape == (2, 512)

    # cosine parity per row (the BASELINE.md contract is <=1e-3 cosine)
    for i in range(2):
        cos = np.dot(out[i], ref[i]) / (
            np.linalg.norm(out[i]) * np.linalg.norm(ref[i])
        )
        assert cos > 1 - 1e-5, f"cosine {cos}"
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-3


def test_arcface_margin_head_kept_verbatim():
    """arcface.weight (C, D) must port as params/arcface/weight, untransposed
    (ADVICE r1: it was renamed to kernel and flipped to (D, C))."""
    from facerecognition_tpu.models.port_torch import (
        arcface_key_map,
        port_state_dict,
    )

    w = np.arange(12, dtype=np.float32).reshape(6, 2)  # (C=6, D=2)
    sd = {"arcface.weight": w, "fc.weight": np.zeros((2, 4), np.float32)}
    out = port_state_dict(sd, arcface_key_map)
    assert "weight" in out["params"]["arcface"]
    np.testing.assert_array_equal(out["params"]["arcface"]["weight"], w)
    # the plain linear still transposes OI → IO
    assert out["params"]["fc"]["kernel"].shape == (4, 2)


# ----------------------------- flax → torch export -------------------------


def _tree_equal(a, b, path=""):
    assert sorted(a) == sorted(b), f"{path}: {sorted(a)} != {sorted(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}"
            )


def test_export_resnet50_roundtrips_to_original_state_dict():
    """torch → flax (port) → torch (export) reproduces the original state
    dict exactly, keys and values, including num_batches_tracked."""
    from facerecognition_tpu.models.port_torch import (
        export_state_dict,
        resnet50_inverse_path,
    )

    tmodel = TorchResNet50(stage_sizes=(1, 1, 1, 1)).eval()
    _randomize_bn_stats(tmodel)
    orig = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = port_state_dict(orig, resnet50_key_map)
    exported = export_state_dict(variables, resnet50_inverse_path)
    assert sorted(exported) == sorted(orig)
    for k in orig:
        np.testing.assert_array_equal(exported[k], orig[k], err_msg=k)
    # and torch itself accepts it strictly
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
        strict=True,
    )


def test_export_arcface_roundtrip_and_margin_head():
    """flax ArcFaceModel → reference-layout torch dict → flax again, exact."""
    from facerecognition_tpu.models.arcface import ArcFaceModel
    from facerecognition_tpu.models.port_torch import (
        arcface_key_map,
        export_arcface_state_dict,
    )

    model = ArcFaceModel(
        num_classes=7, embedding_size=16, stage_sizes=(1, 1, 1, 1)
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 56, 56, 3)),
        labels=jnp.zeros((1,), jnp.int32),
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    exported = export_arcface_state_dict(variables)
    # reference layout: backbone./bn1/fc/bn2/arcface.weight keys
    assert any(k.startswith("backbone.conv1") for k in exported)
    assert "arcface.weight" in exported
    assert exported["arcface.weight"].shape == (7, 16)
    back = port_state_dict(exported, arcface_key_map)
    _tree_equal(back["params"], variables["params"])
    _tree_equal(back["batch_stats"], variables["batch_stats"])


@pytest.mark.slow
def test_export_inception_roundtrips_to_original_state_dict():
    from facerecognition_tpu.models.port_torch import (
        export_state_dict,
        inception_resnet_v1_inverse_path,
    )

    tmodel = TorchInceptionResnetV1().eval()
    _randomize_bn_stats(tmodel)
    orig = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = port_state_dict(orig, inception_resnet_v1_key_map)
    exported = export_state_dict(variables, inception_resnet_v1_inverse_path)
    assert sorted(exported) == sorted(orig)
    for k in orig:
        np.testing.assert_array_equal(exported[k], orig[k], err_msg=k)


def test_export_facenet_wrapper_prefix_roundtrip():
    """model.-prefixed export ports back through the prefix-tolerant map."""
    from facerecognition_tpu.models.port_torch import (
        export_facenet_state_dict,
        facenet_wrapper_key_map,
    )

    # tiny synthetic facenet-shaped tree (full net covered by the slow test)
    variables = {
        "params": {
            "backbone": {
                "conv2d_1a": {
                    "conv": {"kernel": np.ones((3, 3, 3, 4), np.float32)},
                    "bn": {
                        "scale": np.ones((4,), np.float32),
                        "bias": np.zeros((4,), np.float32),
                    },
                },
                "repeat_1_0": {
                    "branch1_0": {
                        "conv": {"kernel": np.ones((1, 1, 4, 2), np.float32)}
                    }
                },
            },
            "projection": {"kernel": np.ones((512, 128), np.float32)},
        },
        "batch_stats": {
            "backbone": {
                "conv2d_1a": {
                    "bn": {
                        "mean": np.zeros((4,), np.float32),
                        "var": np.ones((4,), np.float32),
                    }
                }
            }
        },
    }
    exported = export_facenet_state_dict(variables)
    assert "model.conv2d_1a.conv.weight" in exported
    assert "model.repeat_1.0.branch1.0.conv.weight" in exported
    assert "projection.weight" in exported
    assert exported["projection.weight"].shape == (128, 512)
    back = port_state_dict(exported, facenet_wrapper_key_map)
    _tree_equal(back["params"], variables["params"])
    _tree_equal(back["batch_stats"], variables["batch_stats"])
