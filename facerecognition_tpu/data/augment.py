"""Device-side augmentation: the 4-tier policy as one jitted batch function.

The reference runs albumentations tiers (light/normal/strong/heavy) on CPU
dataloader workers (arcface_dataloader.py:303-506) and budgets ≥100 img/s;
here the same families — flip, shift/scale/rotate, brightness/contrast,
desaturate/grayscale, cutout — run on-device inside the train step via the
MXU warp, so augmentation costs microseconds and zero host CPU.

All randomness is jax.random (per-batch key), all shapes static, the tier
resolves to static python floats at trace time.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from facerecognition_tpu.ops.warp_mxu import affine_warp_mxu_batch

# Tier parameter table (families/strengths mirror the reference's tiers).
AUG_TIERS: Dict[str, Dict[str, Any]] = {
    "none": dict(
        p_flip=0.0, rot=0.0, shift=0.0, scale=0.0, p_affine=0.0,
        brightness=0.0, contrast=0.0, p_gray=0.0, p_cutout=0.0, cutout_frac=0.0,
    ),
    "light": dict(
        p_flip=0.5, rot=5.0, shift=0.02, scale=0.05, p_affine=0.3,
        brightness=0.1, contrast=0.1, p_gray=0.0, p_cutout=0.0, cutout_frac=0.0,
    ),
    "normal": dict(
        p_flip=0.5, rot=10.0, shift=0.05, scale=0.1, p_affine=0.5,
        brightness=0.2, contrast=0.2, p_gray=0.05, p_cutout=0.2, cutout_frac=0.15,
    ),
    "strong": dict(
        p_flip=0.5, rot=15.0, shift=0.08, scale=0.15, p_affine=0.7,
        brightness=0.3, contrast=0.3, p_gray=0.1, p_cutout=0.3, cutout_frac=0.2,
    ),
    "heavy": dict(
        p_flip=0.5, rot=20.0, shift=0.1, scale=0.2, p_affine=0.8,
        brightness=0.4, contrast=0.4, p_gray=0.15, p_cutout=0.5, cutout_frac=0.25,
    ),
}


@partial(jax.jit, static_argnums=(2,))
def augment_batch(rng: jax.Array, images: jax.Array, tier: str = "normal") -> jax.Array:
    """Augment a (B, S, S, 3) float [0, 255] batch. Returns same shape/range."""
    p = AUG_TIERS[tier]
    b, s = images.shape[0], images.shape[1]
    imgs = images.astype(jnp.float32)
    keys = jax.random.split(rng, 8)

    # Horizontal flip.
    if p["p_flip"] > 0:
        do = jax.random.bernoulli(keys[0], p["p_flip"], (b, 1, 1, 1))
        imgs = jnp.where(do, imgs[:, :, ::-1, :], imgs)

    # Shift / scale / rotate via one batched MXU warp.
    if p["p_affine"] > 0:
        theta = (
            jax.random.uniform(keys[1], (b,), minval=-1.0, maxval=1.0)
            * p["rot"]
            * jnp.pi
            / 180.0
        )
        scale = 1.0 + jax.random.uniform(
            keys[2], (b,), minval=-p["scale"], maxval=p["scale"]
        )
        shift = (
            jax.random.uniform(keys[3], (b, 2), minval=-p["shift"], maxval=p["shift"])
            * s
        )
        do = jax.random.bernoulli(keys[4], p["p_affine"], (b,))
        theta = jnp.where(do, theta, 0.0)
        scale = jnp.where(do, scale, 1.0)
        shift = jnp.where(do[:, None], shift, 0.0)
        cos, sin = jnp.cos(theta) * scale, jnp.sin(theta) * scale
        c = (s - 1) / 2.0
        # rotate/scale about the image center, then shift
        tx = c - cos * c + sin * c + shift[:, 0]
        ty = c - sin * c - cos * c + shift[:, 1]
        ms = jnp.stack(
            [
                jnp.stack([cos, -sin, tx], -1),
                jnp.stack([sin, cos, ty], -1),
            ],
            axis=1,
        )  # (B, 2, 3)
        imgs = affine_warp_mxu_batch(imgs, ms, s, s)

    # Brightness / contrast.
    if p["brightness"] > 0 or p["contrast"] > 0:
        bright = jax.random.uniform(
            keys[5], (b, 1, 1, 1), minval=-p["brightness"], maxval=p["brightness"]
        )
        contr = 1.0 + jax.random.uniform(
            jax.random.fold_in(keys[5], 1),  # independent of brightness
            (b, 1, 1, 1),
            minval=-p["contrast"],
            maxval=p["contrast"],
        )
        imgs = (imgs - 127.5) * contr + 127.5 + bright * 255.0

    # Random grayscale.
    if p["p_gray"] > 0:
        w = jnp.array([0.299, 0.587, 0.114])
        gray = jnp.sum(imgs * w, axis=-1, keepdims=True)
        do = jax.random.bernoulli(keys[6], p["p_gray"], (b, 1, 1, 1))
        imgs = jnp.where(do, jnp.broadcast_to(gray, imgs.shape), imgs)

    # Cutout (coarse dropout).
    if p["p_cutout"] > 0:
        frac = p["cutout_frac"]
        size = max(int(s * frac), 1)
        cx = jax.random.randint(keys[7], (b, 1, 1), 0, s - size)
        cy = jax.random.randint(jax.random.fold_in(keys[7], 1), (b, 1, 1), 0, s - size)
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 2)
        ys = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 1)
        hole = (
            (xs >= cx) & (xs < cx + size) & (ys >= cy) & (ys < cy + size)
        )[..., None]
        do = jax.random.bernoulli(
            jax.random.fold_in(keys[7], 2), p["p_cutout"], (b, 1, 1, 1)
        )
        imgs = jnp.where(hole & do, 127.5, imgs)

    return jnp.clip(imgs, 0.0, 255.0)
