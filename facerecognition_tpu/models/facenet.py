"""FaceNet model wrapper + triplet loss + vectorized online miners.

Rebuild of the reference FaceNet stack (models/facenet/facenet_model.py and
the miners in models/facenet/facenet_dataloader.py:169-284) with the mining
loops fully vectorized: one (B, B) distance matrix + masked argmin/argmax —
no python loops, so the whole two-pass mining epoch jits.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from facerecognition_tpu.models.inception_resnet_v1 import InceptionResnetV1
from facerecognition_tpu.ops.matcher import pairwise_sq_dists

Dtype = Any


class FaceNetModel(nn.Module):
    """InceptionResnetV1 → optional projection → L2-normalized embedding.

    Mirrors reference models/facenet/facenet_model.py:7-46: when
    ``embedding_size != 512`` a Linear projection maps 512 → N before the
    final normalize.
    """

    embedding_size: int = 512
    dropout: float = 0.6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature_map: bool = False):
        backbone = InceptionResnetV1(
            dropout=self.dropout, dtype=self.dtype, name="backbone"
        )
        if return_feature_map:
            emb, fmap = backbone(x, train=train, return_feature_map=True)
        else:
            emb = backbone(x, train=train)
            fmap = None
        if self.embedding_size != 512:
            emb = nn.Dense(self.embedding_size, name="projection")(emb)
        norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / jnp.maximum(norm, 1e-12)
        return (emb, fmap) if return_feature_map else emb


def triplet_loss(
    anchor: jax.Array,
    positive: jax.Array,
    negative: jax.Array,
    margin: float = 0.5,
) -> jax.Array:
    """torch ``nn.TripletMarginLoss(margin, p=2)`` semantics (mean reduction).

    (reference models/facenet/facenet_model.py:53-64). Uses the true eps-free
    euclidean norm like torch (with a tiny clamp for grad stability at 0).
    """
    d_ap = jnp.sqrt(
        jnp.maximum(jnp.sum((anchor - positive) ** 2, axis=-1), 1e-16)
    )
    d_an = jnp.sqrt(
        jnp.maximum(jnp.sum((anchor - negative) ** 2, axis=-1), 1e-16)
    )
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def mine_semi_hard(
    embeddings: jax.Array,
    labels: jax.Array,
    margin: float = 0.5,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Vectorized semi-hard triplet mining over a (B, D) batch.

    Semantics match reference ``mine_semi_hard_triplets``
    (models/facenet/facenet_dataloader.py:169-235): for every (anchor,
    positive) ordered pair, pick the **hardest negative inside the semi-hard
    band** ``d(a,p) < d(a,n) < d(a,p) + margin`` (max d(a,n) in band); if the
    band is empty, fall back to the **hardest negative overall** (min d(a,n)).

    Returns fixed-shape padded index arrays (XLA-friendly — no dynamic
    counts): ``(anchor_idx, pos_idx, neg_idx, valid_mask)`` each of shape
    (B*(K-1),) where rows with ``valid_mask == False`` are padding. Works for
    any batch where each label appears the same number of times K.
    """
    b = embeddings.shape[0]
    d = jnp.sqrt(jnp.maximum(pairwise_sq_dists(embeddings, embeddings), 1e-16))
    same = labels[:, None] == labels[None, :]  # (B, B)
    eye = jnp.eye(b, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same

    # For every anchor a and candidate positive p: d_ap = d[a, p].
    # Band mask over negatives n: d_ap < d[a, n] < d_ap + margin.
    d_an = d[:, None, :]  # (B, 1, B) anchor→neg
    d_ap = d[:, :, None]  # (B, B, 1) anchor→pos
    band = (d_an > d_ap) & (d_an < d_ap + margin) & neg_mask[:, None, :]

    # Hardest-in-band: max d(a,n) within band (reference picks the triplet
    # whose negative is farthest while still inside the band).
    neg_inf = jnp.float32(-1e9)
    band_scores = jnp.where(band, d_an, neg_inf)  # (B, B, B)
    best_in_band = jnp.argmax(band_scores, axis=-1)  # (B, B)
    has_band = jnp.any(band, axis=-1)  # (B, B)

    # Fallback: hardest negative overall = closest negative to the anchor.
    pos_inf = jnp.float32(1e9)
    neg_scores = jnp.where(neg_mask, d, pos_inf)  # (B, B)
    hardest_neg = jnp.argmin(neg_scores, axis=-1)  # (B,)

    neg_idx = jnp.where(has_band, best_in_band, hardest_neg[:, None])  # (B, B)

    anchor_idx = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    pos_idx = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    valid = pos_mask & jnp.any(neg_mask, axis=-1)[:, None]

    return (
        anchor_idx.reshape(-1),
        pos_idx.reshape(-1),
        neg_idx.reshape(-1),
        valid.reshape(-1),
    )


def mine_batch_hard(
    embeddings: jax.Array, labels: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batch-hard mining: per anchor, hardest positive + hardest negative.

    Matches reference ``mine_batch_hard_triplets``
    (models/facenet/facenet_dataloader.py:238-284). Returns
    ``(anchor_idx, pos_idx, neg_idx, valid)`` of shape (B,).
    """
    b = embeddings.shape[0]
    d = jnp.sqrt(jnp.maximum(pairwise_sq_dists(embeddings, embeddings), 1e-16))
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(b, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same

    pos_scores = jnp.where(pos_mask, d, -1e9)
    hardest_pos = jnp.argmax(pos_scores, axis=-1)
    neg_scores = jnp.where(neg_mask, d, 1e9)
    hardest_neg = jnp.argmin(neg_scores, axis=-1)

    anchor_idx = jnp.arange(b, dtype=jnp.int32)
    valid = jnp.any(pos_mask, axis=-1) & jnp.any(neg_mask, axis=-1)
    return anchor_idx, hardest_pos, hardest_neg, valid


def masked_triplet_loss(
    embeddings: jax.Array,
    anchor_idx: jax.Array,
    pos_idx: jax.Array,
    neg_idx: jax.Array,
    valid: jax.Array,
    margin: float = 0.5,
) -> jax.Array:
    """Triplet loss over mined (padded) index triples, mean over valid rows."""
    a = embeddings[anchor_idx]
    p = embeddings[pos_idx]
    n = embeddings[neg_idx]
    d_ap = jnp.sqrt(jnp.maximum(jnp.sum((a - p) ** 2, axis=-1), 1e-16))
    d_an = jnp.sqrt(jnp.maximum(jnp.sum((a - n) ** 2, axis=-1), 1e-16))
    per = jnp.maximum(d_ap - d_an + margin, 0.0)
    per = jnp.where(valid, per, 0.0)
    count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(per) / count
