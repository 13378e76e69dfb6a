"""Pallas fused gallery-match kernel: matmul + streaming top-k in VMEM.

The XLA path (`ops.matcher.cosine_topk`) materializes the full (B, N) score
matrix in HBM before ``lax.top_k`` — for production galleries (N ≥ 1M) that
is the dominant HBM traffic (B=256, N=1M → 1 GB written + re-read per
batch). This kernel tiles the gallery over the grid, computes each (B, T)
score block on the MXU, and folds it into a running top-k held in VMEM
scratch — scores never leave the chip.

Top-k maintenance: per tile, concatenate the running (B, K) with the tile's
(B, T) scores and extract K maxima by K rounds of max + one-hot argmax
masking (K is small and static — unrolled; cost K·(K+T) VPU ops per tile,
negligible next to the B·T·D MXU matmul).

Falls back to interpret mode off-TPU so the same code path is testable on
the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facerecognition_tpu.ops.matcher import l2_normalize

NEG_INF = -1e30  # python float: jnp scalars would be captured tracers in pallas


def _topk_tile_kernel(
    q_ref,      # (B, D) queries, VMEM (revisited every step)
    g_ref,      # (T, D) gallery tile, VMEM
    out_s_ref,  # (B, K) output scores
    out_i_ref,  # (B, K) output indices
    top_s,      # (B, K) scratch — running top scores
    top_i,      # (B, K) scratch — running top indices (f32-coded)
    *,
    k: int,
    tile: int,
    n_real: int,
):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        top_s[:] = jnp.full_like(top_s[:], NEG_INF)
        top_i[:] = jnp.full_like(top_i[:], -1)

    scores = jnp.dot(
        q_ref[:], g_ref[:].T, preferred_element_type=jnp.float32
    )  # (B, T) on the MXU

    b = scores.shape[0]
    # Indices stay int32 end to end: float32 carries would silently round
    # consecutive row ids above 2^24 (~16.7M) — exactly the gallery sizes
    # this kernel exists for.
    tile_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1) + step * tile
    )

    # Padding rows (index >= n_real) must lose to ANY real score — a zero
    # vector's 0 cosine would otherwise beat negative real cosines and
    # evict real candidates from the running top-k irrecoverably.
    scores = jnp.where(tile_idx < n_real, scores, NEG_INF)

    comb_s = jnp.concatenate([top_s[:], scores], axis=1)      # (B, K+T)
    comb_i = jnp.concatenate([top_i[:], tile_idx], axis=1)

    width = comb_s.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
    new_s = []
    new_i = []
    for _ in range(k):  # static unroll
        m = jnp.max(comb_s, axis=1)                           # (B,)
        am = jnp.argmax(comb_s, axis=1)                       # (B,)
        onehot = (col == am[:, None]).astype(jnp.int32)
        picked_i = jnp.sum(onehot * comb_i, axis=1)
        new_s.append(m)
        new_i.append(picked_i)
        comb_s = jnp.where(col == am[:, None], NEG_INF, comb_s)
    top_s[:] = jnp.stack(new_s, axis=1)
    top_i[:] = jnp.stack(new_i, axis=1)

    @pl.when(step == n_steps - 1)
    def _():
        out_s_ref[:] = top_s[:]
        out_i_ref[:] = top_i[:]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def pallas_cosine_topk(
    queries: jax.Array,
    gallery: jax.Array,
    k: int = 5,
    tile: int = 2048,  # 2048*512*4 = 4.2MB/tile; 8192 OOMs VMEM (16MB) with double buffering
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused exact top-k cosine search.

    Args:
      queries: (B, D) — L2-normalized internally.
      gallery: (N, D) — L2-normalized internally; N padded to ``tile``
        internally (padding rows score -inf via zero vectors + masking).
      k: static neighbour count.
      tile: gallery rows per grid step (VMEM working set ≈ tile·D·4 bytes).
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      (scores, indices) both (B, k), exact, sorted descending.
    """
    q = l2_normalize(queries.astype(jnp.float32))
    g = l2_normalize(gallery.astype(jnp.float32))
    n = g.shape[0]
    b, d = q.shape
    pad = (-n) % tile
    if pad:
        g = jnp.concatenate([g, jnp.zeros((pad, d), jnp.float32)])
    n_padded = n + pad
    grid = n_padded // tile

    kernel = functools.partial(_topk_tile_kernel, k=k, tile=tile, n_real=n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_padded * d,
            bytes_accessed=(n_padded * d + b * d + 2 * b * k) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, g)
    # Padding rows score NEG_INF inside the kernel, so they can only appear
    # when k > n (nothing real left); slots never filled keep the scratch
    # init index -1. Clamp both to a valid row so a consumer indexing
    # names[i] can never go out of bounds — the NEG_INF score keeps such
    # entries below any threshold.
    out_i = jnp.where((out_i >= 0) & (out_i < n), out_i, 0)
    return out_s, out_i
