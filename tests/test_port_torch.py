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
