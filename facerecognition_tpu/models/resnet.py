"""ResNet50 backbone in Flax (NHWC, TPU layout).

Architecture-parity rebuild of the reference's ArcFace backbone — torchvision
ResNet50 v1.5 (stride on the 3x3 conv) feeding a 2048-d pooled feature
(reference models/arcface/arcface_model.py:65-132). Module/param naming
mirrors the torch state-dict keys so `models/port_torch.py` can remap
pretrained checkpoints mechanically.

TPU notes: data layout is NHWC (lane dim = channels), compute dtype is
configurable and DEFAULTS TO float32 (bf16 convs are pathological on this
backend — see CLAUDE.md; f32 convs already hit the fast MXU mode) while
params and batch norm statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

# torchvision BatchNorm: eps=1e-5, momentum=0.1 (torch "new-value" momentum
# == flax momentum 0.9 on the running stat).
BN_KW = dict(momentum=0.9, epsilon=1e-5, dtype=jnp.float32)


class Bottleneck(nn.Module):
    """torchvision Bottleneck block (expansion 4, stride on conv2)."""

    width: int
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1", **BN_KW)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.width,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2", **BN_KW)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.width * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn3", **BN_KW)(y)
        if self.downsample:
            residual = nn.Conv(
                self.width * 4,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, name="downsample_bn", **BN_KW
            )(residual)
        return nn.relu(y + residual)


class ResNet50Backbone(nn.Module):
    """ResNet50 → global-average-pooled 2048-d features.

    Input: (B, H, W, 3) float (normalized). Output: (B, 2048).
    """

    dtype: Dtype = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature_map: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1", **BN_KW)(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): pad with -inf so padding
        # never wins the max.
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        for stage, (n_blocks, width, stride) in enumerate(
            zip(self.stage_sizes, (64, 128, 256, 512), (1, 2, 2, 2))
        ):
            for block in range(n_blocks):
                x = Bottleneck(
                    width=width,
                    strides=stride if block == 0 else 1,
                    downsample=block == 0,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)

        fmap = x.astype(jnp.float32)  # (B, H/32, W/32, 2048) — layer4 output
        pooled = jnp.mean(fmap, axis=(1, 2))  # adaptive avg pool → (B, 2048)
        if return_feature_map:
            # Grad-CAM taps this (the reference hooks backbone.layer4,
            # explainability.py:21-131; here it's just a second output).
            return pooled, fmap
        return pooled
