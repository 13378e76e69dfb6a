"""InceptionResnetV1 (FaceNet backbone) in Flax, NHWC.

Architecture-parity rebuild of facenet-pytorch's InceptionResnetV1, which the
reference wraps as its FaceNet embedding model (reference
models/facenet/facenet_model.py:7-46). Module naming mirrors the torch
state-dict keys (conv2d_1a, repeat_1.0.branch0, ...) so pretrained vggface2
checkpoints port mechanically via `models/port_torch.py`.

Padding conventions: torch Conv2d default padding=0 == VALID; explicit pads
are expressed per-dimension. BN uses eps=1e-3 (facenet-pytorch convention,
different from ResNet's 1e-5).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# facenet-pytorch BatchNorm: eps=0.001, torch momentum 0.1 → flax 0.9.
BN_KW = dict(momentum=0.9, epsilon=1e-3, dtype=jnp.float32)


class BasicConv2d(nn.Module):
    """Conv(bias=False) → BN → ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.strides, self.strides),
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn", **BN_KW)(x)
        return nn.relu(x)


def _maxpool_valid(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="VALID")


class Block35(nn.Module):
    """Inception-A residual block (input/output 256 channels)."""

    scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(32, (1, 1), dtype=self.dtype, name="branch0")(x, train)
        b1 = BasicConv2d(32, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = BasicConv2d(32, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch1_1")(b1, train)
        b2 = BasicConv2d(32, (1, 1), dtype=self.dtype, name="branch2_0")(x, train)
        b2 = BasicConv2d(32, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch2_1")(b2, train)
        b2 = BasicConv2d(32, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch2_2")(b2, train)
        up = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(256, (1, 1), use_bias=True, dtype=self.dtype, name="conv2d")(up)
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    """Inception-B residual block (input/output 896 channels)."""

    scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(128, (1, 1), dtype=self.dtype, name="branch0")(x, train)
        b1 = BasicConv2d(128, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = BasicConv2d(128, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch1_1")(b1, train)
        b1 = BasicConv2d(128, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch1_2")(b1, train)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(896, (1, 1), use_bias=True, dtype=self.dtype, name="conv2d")(up)
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    """Inception-C residual block (input/output 1792 channels)."""

    scale: float = 1.0
    no_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch0")(x, train)
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = BasicConv2d(192, (1, 3), padding=(0, 1), dtype=self.dtype, name="branch1_1")(b1, train)
        b1 = BasicConv2d(192, (3, 1), padding=(1, 0), dtype=self.dtype, name="branch1_2")(b1, train)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(1792, (1, 1), use_bias=True, dtype=self.dtype, name="conv2d")(up)
        out = x + self.scale * up
        return out if self.no_relu else nn.relu(out)


class Mixed6a(nn.Module):
    """Reduction-A: 256 → 896 channels, spatial /2."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(384, (3, 3), strides=2, dtype=self.dtype, name="branch0")(x, train)
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = BasicConv2d(192, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch1_1")(b1, train)
        b1 = BasicConv2d(256, (3, 3), strides=2, dtype=self.dtype, name="branch1_2")(b1, train)
        b2 = _maxpool_valid(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Mixed7a(nn.Module):
    """Reduction-B: 896 → 1792 channels, spatial /2."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(256, (1, 1), dtype=self.dtype, name="branch0_0")(x, train)
        b0 = BasicConv2d(384, (3, 3), strides=2, dtype=self.dtype, name="branch0_1")(b0, train)
        b1 = BasicConv2d(256, (1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        b1 = BasicConv2d(256, (3, 3), strides=2, dtype=self.dtype, name="branch1_1")(b1, train)
        b2 = BasicConv2d(256, (1, 1), dtype=self.dtype, name="branch2_0")(x, train)
        b2 = BasicConv2d(256, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch2_1")(b2, train)
        b2 = BasicConv2d(256, (3, 3), strides=2, dtype=self.dtype, name="branch2_2")(b2, train)
        b3 = _maxpool_valid(x)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionResnetV1(nn.Module):
    """Full InceptionResnetV1 → 512-d embedding (before L2 normalization).

    Input: (B, 160, 160, 3) normalized float NHWC. Output: (B, 512) —
    the last_bn output; callers L2-normalize (the FaceNetModel contract,
    reference models/facenet/facenet_model.py:28-36).
    """

    dropout: float = 0.6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature_map: bool = False):
        if x.shape[1] < 75 or x.shape[2] < 75:
            # Below 75px the VALID-padded reduction chain bottoms out in a
            # zero-size feature map at mixed_7a (verified: 71-74px inputs
            # return all-NaN embeddings from the empty global pool).
            raise ValueError(
                f"InceptionResnetV1 needs inputs >= 75px, got {x.shape[1:3]} "
                "(the FaceNet contract is 160x160)"
            )
        x = x.astype(self.dtype)
        x = BasicConv2d(32, (3, 3), strides=2, dtype=self.dtype, name="conv2d_1a")(x, train)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="conv2d_2a")(x, train)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=self.dtype, name="conv2d_2b")(x, train)
        x = _maxpool_valid(x)
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="conv2d_3b")(x, train)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="conv2d_4a")(x, train)
        x = BasicConv2d(256, (3, 3), strides=2, dtype=self.dtype, name="conv2d_4b")(x, train)

        for i in range(5):
            x = Block35(scale=0.17, dtype=self.dtype, name=f"repeat_1_{i}")(x, train)
        x = Mixed6a(dtype=self.dtype, name="mixed_6a")(x, train)
        for i in range(10):
            x = Block17(scale=0.10, dtype=self.dtype, name=f"repeat_2_{i}")(x, train)
        x = Mixed7a(dtype=self.dtype, name="mixed_7a")(x, train)
        for i in range(5):
            x = Block8(scale=0.20, dtype=self.dtype, name=f"repeat_3_{i}")(x, train)
        x = Block8(no_relu=True, dtype=self.dtype, name="block8")(x, train)

        fmap = x.astype(jnp.float32)  # block8 output — activation-CAM taps
        # this (the reference hooks block8.conv2d, explainability.py:395-515)
        x = jnp.mean(fmap, axis=(1, 2))  # adaptive avg pool → (B, 1792)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(512, use_bias=False, name="last_linear")(x)
        # torch BatchNorm1d(512, eps=0.001, momentum=0.1)
        x = nn.BatchNorm(use_running_average=not train, name="last_bn", **BN_KW)(x)
        if return_feature_map:
            return x, fmap
        return x
