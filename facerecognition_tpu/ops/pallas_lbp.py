"""Pallas fused LBP: code image + grid histograms in one VMEM-resident pass.

The XLA LBPH path (`models/lbph.py`) computes the LBP code image, writes it
to HBM, then builds histograms via a (cells, pixels, 256) one-hot — that
one-hot is ~9 MB of HBM traffic per 100² image. This kernel keeps
everything in VMEM: 8 shifted bilinear taps → bit-pack → per-cell bincount
via 256 masked reductions, emitting only the (grid_y·grid_x, 256) histogram.

Grid: one program per image (batch dim). Shapes are static per (H, W,
grid) configuration. Numerics identical to `lbph_features` (same OpenCV
transcription; golden-tested against it).

KNOWN LIMITATION: the Mosaic toolchain in this environment crashes
(compile-helper exit 1, no diagnostic) on this kernel's odd, non-128-aligned
shapes (100² images → 98² code → 12² cells), even after restructuring to
2D-only ops. The kernel is correct under the Pallas interpreter (see
tests/test_pallas_lbp.py); production LBPH stays on the XLA path
(`models/lbph.py`) until the toolchain accepts it. The TPU-validated Pallas
path in this codebase is `ops/pallas_topk.py`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lbp_hist_kernel(
    img_ref,   # (1, H, W) f32 block
    out_ref,   # (1, grid_y * grid_x, 256) f32 block
    *,
    radius: int,
    neighbors: int,
    grid_x: int,
    grid_y: int,
):
    img = img_ref[0]
    h, w = img.shape
    r = radius
    center = img[r : h - r, r : w - r]
    code = jnp.zeros_like(center, dtype=jnp.int32)
    for n in range(neighbors):
        x = radius * math.cos(2.0 * math.pi * n / neighbors)
        y = -radius * math.sin(2.0 * math.pi * n / neighbors)
        fx, fy = math.floor(x), math.floor(y)
        cx, cy = math.ceil(x), math.ceil(y)
        tx, ty = x - fx, y - fy
        w1 = (1 - tx) * (1 - ty)
        w2 = tx * (1 - ty)
        w3 = (1 - tx) * ty
        w4 = tx * ty

        def tap(dy: int, dx: int):
            return img[r + dy : h - r + dy, r + dx : w - r + dx]

        t = (
            w1 * tap(fy, fx)
            + w2 * tap(fy, cx)
            + w3 * tap(cy, fx)
            + w4 * tap(cy, cx)
        )
        bit = (t > center) | (jnp.abs(t - center) < jnp.finfo(jnp.float32).eps)
        code = code | (bit.astype(jnp.int32) << n)

    ch = (h - 2 * r) // grid_y
    cw = (w - 2 * r) // grid_x
    num_patterns = 2**neighbors
    # Per-cell bincount with 2D ops only (Mosaic rejects 4D transposes /
    # 3D one-hots): static python loop over cells, each a static slice.
    bins = jax.lax.broadcasted_iota(
        jnp.int32, (num_patterns, ch * cw), 0
    )  # (256, pixels)
    inv = 1.0 / float(ch * cw)
    for cy in range(grid_y):
        for cx in range(grid_x):
            cell = code[cy * ch : (cy + 1) * ch, cx * cw : (cx + 1) * cw]
            flat = cell.reshape(1, ch * cw)
            onehot = (flat == bins).astype(jnp.float32)  # (256, pixels)
            out_ref[0, cy * grid_x + cx, :] = jnp.sum(onehot, axis=1) * inv


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def pallas_lbph_features_batch(
    grays: jax.Array,
    radius: int = 1,
    neighbors: int = 8,
    grid_x: int = 8,
    grid_y: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused LBP histograms for a (B, H, W) grayscale batch.

    Returns (B, grid_y * grid_x * 2^neighbors) float32, identical to
    ``models.lbph.lbph_features`` applied per image.
    """
    b, h, w = grays.shape
    num_patterns = 2**neighbors
    cells = grid_y * grid_x
    kernel = functools.partial(
        _lbp_hist_kernel,
        radius=radius,
        neighbors=neighbors,
        grid_x=grid_x,
        grid_y=grid_y,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, cells, num_patterns), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, cells, num_patterns), jnp.float32),
        interpret=interpret,
    )(grays.astype(jnp.float32))
    return out.reshape(b, cells * num_patterns)
