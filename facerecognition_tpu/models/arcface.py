"""ArcFace model: ResNet50 backbone → BN → Dropout → FC(512) → BN → ArcMargin.

Functional-core rebuild of the reference ArcFace stack
(models/arcface/arcface_model.py:23-202): the additive-angular-margin head is
a pure function (`arc_margin_logits`) applied only in the training branch;
inference returns embeddings directly (labels=None contract, reference
arcface_model.py:198-202).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from facerecognition_tpu.models.resnet import BN_KW, ResNet50Backbone

Dtype = Any


def arc_margin_logits(
    embeddings: jax.Array,
    weight: jax.Array,
    labels: jax.Array,
    scale: float = 64.0,
    margin: float = 0.5,
    easy_margin: bool = False,
) -> jax.Array:
    """Additive angular margin logits: ``s * cos(θ + m)`` on the true class.

    Pure-function equivalent of the reference ``ArcMarginProduct.forward``
    (models/arcface/arcface_model.py:45-62), including the easy-margin and
    θ+m > π fallback (cos θ - m·sin m) branches.

    Args:
      embeddings: (B, D) un-normalized embeddings.
      weight: (C, D) class weight matrix (normalized internally).
      labels: (B,) int class ids.
      scale: logit scale s.
      margin: angular margin m in radians.
      easy_margin: use the cos θ > 0 gate instead of the θ+m > π gate.

    Returns:
      (B, C) scaled logits for softmax cross-entropy.
    """
    emb_n = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12
    )
    w_n = weight / jnp.maximum(
        jnp.linalg.norm(weight, axis=1, keepdims=True), 1e-12
    )
    cosine = jnp.dot(
        emb_n, w_n.T, preferred_element_type=jnp.float32
    )
    sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 1e-7, 1.0))

    # jnp trig (not math.*) so ``margin`` may be a traced scalar — this is
    # what lets trainers ramp the margin across epochs without recompiling.
    margin = jnp.asarray(margin, jnp.float32)
    cos_m = jnp.cos(margin)
    sin_m = jnp.sin(margin)
    phi = cosine * cos_m - sine * sin_m  # cos(θ + m)

    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        th = jnp.cos(math.pi - margin)
        mm = jnp.sin(math.pi - margin) * margin
        phi = jnp.where(cosine > th, phi, cosine - mm)

    one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=cosine.dtype)
    return (one_hot * phi + (1.0 - one_hot) * cosine) * scale


class ArcMarginProduct(nn.Module):
    """Thin Module shell over :func:`arc_margin_logits` owning the weight."""

    num_classes: int
    embedding_size: int = 512
    scale: float = 64.0
    margin: float = 0.5
    easy_margin: bool = False

    @nn.compact
    def __call__(self, embeddings, labels, margin_override=None):
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.num_classes, self.embedding_size),
            jnp.float32,
        )
        return arc_margin_logits(
            embeddings,
            weight,
            labels,
            scale=self.scale,
            margin=self.margin if margin_override is None else margin_override,
            easy_margin=self.easy_margin,
        )


class ArcFaceModel(nn.Module):
    """Full ArcFace model (reference models/arcface/arcface_model.py:135-202).

    ``__call__(x, labels=None)``: labels given → (logits, embeddings) for the
    training loss; labels None → embeddings only (inference contract).
    Input images are (B, S, S, 3) normalized float (NHWC).
    """

    num_classes: int = 0
    embedding_size: int = 512
    scale: float = 64.0
    margin: float = 0.5
    easy_margin: bool = False
    dropout: float = 0.5
    dtype: Dtype = jnp.float32
    #: Bottleneck blocks per stage. (3, 4, 6, 3) = ResNet50 (the reference
    #: backbone); (2, 2, 2, 2) = "ResNet26", ~55% of the block FLOPs for
    #: latency-critical serving (checkpoints carry the marker — see
    #: inference.extract_embeddings.load_arcface_model).
    stage_sizes: tuple = (3, 4, 6, 3)

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        labels: Optional[jax.Array] = None,
        train: bool = False,
        return_feature_map: bool = False,
        feature_map: Optional[jax.Array] = None,
        margin_override: Optional[jax.Array] = None,
    ):
        fmap = None
        if feature_map is not None:
            # Grad-CAM re-entry: embed directly from a (possibly perturbed)
            # layer4 feature map; the backbone submodule's params are simply
            # unused on this path.
            feats = jnp.mean(feature_map.astype(jnp.float32), axis=(1, 2))
        elif return_feature_map:
            feats, fmap = ResNet50Backbone(
                dtype=self.dtype,
                stage_sizes=self.stage_sizes,
                name="backbone",
            )(x, train=train, return_feature_map=True)
        else:
            feats = ResNet50Backbone(
                dtype=self.dtype,
                stage_sizes=self.stage_sizes,
                name="backbone",
            )(x, train=train)  # (B, 2048)
        feats = nn.BatchNorm(use_running_average=not train, name="bn1", **BN_KW)(
            feats
        )
        feats = nn.Dropout(self.dropout, deterministic=not train)(feats)
        emb = nn.Dense(
            self.embedding_size,
            kernel_init=nn.initializers.kaiming_normal(),
            name="fc",
        )(feats)
        emb = nn.BatchNorm(use_running_average=not train, name="bn2", **BN_KW)(
            emb
        )
        if labels is None:
            return (emb, fmap) if return_feature_map else emb
        logits = ArcMarginProduct(
            num_classes=self.num_classes,
            embedding_size=self.embedding_size,
            scale=self.scale,
            margin=self.margin,
            easy_margin=self.easy_margin,
            name="arcface",
        )(emb, labels, margin_override=margin_override)
        return logits, emb


def freeze_mask(params, freeze_ratio: float = 0.8):
    """Optax-style mask pytree: True = trainable, False = frozen.

    TPU-native equivalent of the reference's ``freeze_layers``
    (models/arcface/arcface_model.py:223-262): freezes the first
    ``freeze_ratio`` fraction of backbone stages (conv1/bn1 + layer1..4 in
    order); the embedding head and margin head always train. Use with
    ``optax.masked`` or ``optax.multi_transform``.
    """
    order = ["conv1", "bn1", "layer1", "layer2", "layer3", "layer4"]
    n_freeze = int(len(order) * freeze_ratio)
    frozen_prefixes = set(order[:n_freeze])

    def mask_tree(tree, path=()):
        if isinstance(tree, dict):
            return {k: mask_tree(v, path + (k,)) for k, v in tree.items()}
        if len(path) >= 2 and path[0] == "backbone":
            stage = path[1].split("_")[0]
            return stage not in frozen_prefixes
        return True

    return mask_tree(params)
