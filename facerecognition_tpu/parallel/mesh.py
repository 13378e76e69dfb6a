"""Device mesh construction.

Axis convention:
- ``data``    — batch data parallelism (training) / query parallelism
- ``gallery`` — gallery-row sharding for large-scale identity search

A v5e-8 slice is typically ``create_mesh(data=8)`` for training and
``create_mesh(gallery=8)`` (or a 2D ``data x gallery``) for serving with
many-million-identity galleries.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None, **axis_sizes: int
) -> Mesh:
    """Create a named mesh over ``devices`` with the given axis sizes.

    ``create_mesh(data=4, gallery=2)`` → 4x2 mesh. Axis sizes must multiply
    to the device count; a single axis of size -1 is inferred.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    names = tuple(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    n = len(devices)
    if sizes.count(-1) == 1:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"axis sizes {dict(zip(names, sizes))} != {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def local_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over all local devices (the common single-host case)."""
    return create_mesh(**{axis: -1})


def resolve_data_mesh(num_devices, batch_size: int) -> Optional[Mesh]:
    """Resolve a trainer config knob into a ``data`` mesh (or None).

    ``num_devices``: ``"auto"`` → all local devices; an int → at most that
    many; None/0/1 → data parallelism off. The device count is reduced to
    the largest value that divides ``batch_size`` so every shard gets an
    equal slice (XLA requires even sharding of the batch axis).
    """
    if num_devices in (None, 0, 1, False):
        return None
    avail = jax.devices()
    n = len(avail) if num_devices == "auto" else min(int(num_devices), len(avail))
    while n > 1 and batch_size % n:
        n -= 1
    if n <= 1:
        return None
    return create_mesh(avail[:n], data=n)
