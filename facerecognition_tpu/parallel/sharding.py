"""Sharded gallery search + sharding helpers.

Design (SURVEY.md §2.9 "TPU-native plan"): the (N, D) gallery matrix is
sharded row-wise across the ``gallery`` mesh axis; each device computes its
local ``scores = q @ shardᵀ`` + local top-k, then the per-shard candidates
(k per device) are all-gathered and reduced to a global top-k. Collectives
ride ICI via ``shard_map``; no host round-trips.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerecognition_tpu.ops.matcher import (
    l2_normalize,
    quantize_embeddings_int8,
    quantize_embeddings_int8_np,
)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(array: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Shard a batch array along its leading dim over ``axis``."""
    ndim = np.ndim(array)
    spec = P(axis, *([None] * (ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def _local_scores_f32(q, g_shard):
    return jnp.dot(q, g_shard.T, preferred_element_type=jnp.float32)


def _local_scores_int8(q_pack, g_pack):
    """Local (B, n_local) scores from int8 codes + per-row scales.

    The score matmul runs at int8 input width on the MXU, accumulating in
    int32 (see ops.matcher.cosine_topk_int8); the rank-1 dequantization
    rescale fuses into the epilogue.
    """
    qq, q_scale = q_pack
    gq, g_scale = g_pack
    acc = jax.lax.dot_general(
        qq, gq, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (
        acc.astype(jnp.float32)
        * (q_scale[:, None] / 127.0)
        * (g_scale[None, :] / 127.0)
    )


def _local_then_global_topk(q, g_shard, k, axis_name, n_real, scores_fn):
    """shard_map body: local matmul+topk, gather candidates, global topk."""
    g_rows = g_shard[0] if isinstance(g_shard, tuple) else g_shard
    n_local = g_rows.shape[0]
    my_idx = jax.lax.axis_index(axis_name)
    scores = scores_fn(q, g_shard)
    # Padding sentinel rows (global id >= n_real) must lose to EVERY real
    # row — their zero vectors score cosine 0, which would evict real
    # negative-similarity matches from the top-k irrecoverably.
    row = (
        jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        + my_idx * n_local
    )
    scores = jnp.where(row < n_real, scores, -1e30)
    k_local = min(k, n_local)
    local_s, local_i = jax.lax.top_k(scores, k_local)  # (B, k_local)
    local_i = local_i + my_idx * n_local  # globalize row ids
    # Gather candidates from every shard: (B, n_shards * k_local)
    all_s = jax.lax.all_gather(local_s, axis_name, axis=1, tiled=True)
    all_i = jax.lax.all_gather(local_i, axis_name, axis=1, tiled=True)
    final_s, pos = jax.lax.top_k(all_s, k)
    final_i = jnp.take_along_axis(all_i, pos, axis=1)
    # Sentinel slots (only possible when k > n_real) clamp to row 0 so a
    # caller indexing names[i] can never go out of bounds; their -1e30
    # score keeps them below any threshold.
    final_i = jnp.clip(final_i, 0, n_real - 1)
    return final_s, final_i


def sharded_topk(
    queries: jax.Array,
    gallery_sharded: jax.Array,
    mesh: Mesh,
    k: int = 5,
    axis: str = "gallery",
    n_real: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k cosine search over a row-sharded gallery.

    Args:
      queries: (B, D) — will be L2-normalized; replicated across shards.
      gallery_sharded: (N, D) gallery, rows sharded over ``axis`` (must be
        pre-normalized; N divisible by the axis size).
      mesh: mesh containing ``axis``.
      k: global top-k (ties broken by shard order, same as lax.top_k).

    Returns:
      (scores, indices) both (B, k), indices into the global gallery row
      order. Exact — every candidate that could be in the global top-k is
      (each shard contributes its own top-k).
    """
    q = l2_normalize(queries.astype(jnp.float32))
    if n_real is None:
        n_real = gallery_sharded.shape[0]
    return _compiled_sharded_topk(mesh, axis, k, n_real, False)(
        q, gallery_sharded
    )


def _int8_body(qq, q_scale, gq, g_scale, *, k, axis_name, n_real):
    return _local_then_global_topk(
        (qq, q_scale),
        (gq, g_scale),
        k=k,
        axis_name=axis_name,
        n_real=n_real,
        scores_fn=_local_scores_int8,
    )


@lru_cache(maxsize=128)
def _compiled_sharded_topk(mesh: Mesh, axis: str, k: int, n_real: int, int8: bool):
    """jit(shard_map(...)) cached on (mesh, axis, k, n_real, dtype path).

    Rebuilding the closure per call would defeat JAX's executable cache
    (it is keyed on the function object), making every ``topk`` retrace.
    """
    if int8:
        body = partial(_int8_body, k=k, axis_name=axis, n_real=n_real)
        in_specs = (P(), P(), P(axis, None), P(axis))
    else:
        body = partial(
            _local_then_global_topk,
            k=k,
            axis_name=axis,
            n_real=n_real,
            scores_fn=_local_scores_f32,
        )
        in_specs = (P(), P(axis, None))
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            # Outputs are replicated by construction (all_gather + identical
            # top_k on every shard); the static VMA check can't prove it.
            check_vma=False,
        )
    )


def sharded_topk_int8(
    queries: jax.Array,
    gallery_q_sharded: jax.Array,
    gallery_scale_sharded: jax.Array,
    mesh: Mesh,
    k: int = 5,
    axis: str = "gallery",
    n_real: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """`sharded_topk` over an int8-quantized row-sharded gallery.

    The capacity configuration: int8 codes hold 4x the identities per chip
    HBM, and sharding multiplies by the mesh axis — a v5e-8 ``gallery`` axis
    holds ~200M 512-d identities in code form (8 x 16 GB / 516 B per row).
    Queries are quantized per-row on the fly (replicated); scores carry the
    same O(1e-3) quantization shift as ops.matcher.cosine_topk_int8.
    """
    q = l2_normalize(queries.astype(jnp.float32))
    qq, q_scale = quantize_embeddings_int8(q)
    if n_real is None:
        n_real = gallery_q_sharded.shape[0]
    return _compiled_sharded_topk(mesh, axis, k, n_real, True)(
        qq, q_scale, gallery_q_sharded, gallery_scale_sharded
    )


class ShardedGallery:
    """Gallery sharded over a mesh axis for ≥1M-identity search.

    Host keeps the name list; the device matrix lives row-sharded. Rows are
    padded to a multiple of the axis size with -inf-scoring sentinels.
    """

    def __init__(
        self,
        mesh: Mesh,
        axis: str = "gallery",
        dim: int = 512,
        quantize: bool = False,
    ):
        self.mesh = mesh
        self.axis = axis
        self.dim = dim
        self.quantize = quantize  # int8 codes: 4x rows per chip HBM
        self.names: list[str] = []
        self._matrix: Optional[jax.Array] = None  # (N_padded, D) sharded
        self._codes: Optional[jax.Array] = None  # int8 (N_padded, D) sharded
        self._scales: Optional[jax.Array] = None  # f32 (N_padded,) sharded
        self._n_real = 0

    def __len__(self) -> int:
        return self._n_real

    @property
    def axis_size(self) -> int:
        return self.mesh.shape[self.axis]

    def set_all(self, names: list[str], matrix: np.ndarray) -> None:
        """Load the full gallery: normalize, pad, shard."""
        n = len(names)
        assert matrix.shape == (n, self.dim)
        norm = matrix / np.maximum(
            np.linalg.norm(matrix, axis=1, keepdims=True), 1e-12
        )
        pad = (-n) % self.axis_size
        if pad:
            # Zero sentinel rows; masked to -inf INSIDE the shard_map body
            # (by global row id) so they can never beat a real match.
            norm = np.concatenate([norm, np.zeros((pad, self.dim), np.float32)])
        self.names = list(names)
        self._n_real = n
        if self.quantize:
            # Quantize host-side and ship only codes + scales (4x smaller
            # transfer AND footprint; the f32 rows never touch HBM).
            codes, scale = quantize_embeddings_int8_np(norm)
            self._codes = jax.device_put(
                jnp.asarray(codes),
                NamedSharding(self.mesh, P(self.axis, None)),
            )
            self._scales = jax.device_put(
                jnp.asarray(scale),
                NamedSharding(self.mesh, P(self.axis)),
            )
            self._matrix = None
        else:
            self._matrix = jax.device_put(
                jnp.asarray(norm), NamedSharding(self.mesh, P(self.axis, None))
            )
            self._codes = self._scales = None

    def topk(self, queries: np.ndarray, k: int = 5):
        """Global top-k over the sharded gallery; filters padding host-side."""
        if self._n_real == 0 or (self._matrix is None and self._codes is None):
            return np.zeros((len(queries), 0)), np.zeros((len(queries), 0), int)
        k_eff = min(k, self._n_real)
        if self.quantize:
            s, i = sharded_topk_int8(
                jnp.asarray(queries),
                self._codes,
                self._scales,
                self.mesh,
                k_eff,
                self.axis,
                n_real=self._n_real,
            )
        else:
            s, i = sharded_topk(
                jnp.asarray(queries),
                self._matrix,
                self.mesh,
                k_eff,
                self.axis,
                n_real=self._n_real,
            )
        return np.asarray(s), np.asarray(i)
