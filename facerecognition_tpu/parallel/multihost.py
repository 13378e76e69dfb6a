"""Multi-host (DCN) mesh construction — the scale-out layer.

The single-host layer (``parallel.mesh``) covers one ICI-connected slice.
Past one host, TPU pods connect slices over the data-center network (DCN),
which is orders of magnitude slower than ICI — so axis PLACEMENT is the
whole game (jax-ml.github.io/scaling-book): axes with heavy collectives
(gallery-shard top-k merges, tensor-ish reductions) must ride ICI inside a
slice; only the axis whose collective is one small gradient all-reduce per
step (data parallelism) may span DCN.

The reference stack is single-process/single-GPU (SURVEY.md §2.9 — no
torch.distributed anywhere); this layer is new design, kept thin:

- :func:`initialize_multihost` — one-call ``jax.distributed`` bootstrap.
- :func:`create_hybrid_mesh` — DCN axes × ICI axes mesh with the slow
  axes OUTERMOST (jax's hybrid mesh contract).

Typical pod-slice deployment::

    initialize_multihost(coordinator, num_processes, process_id)
    mesh = create_hybrid_mesh(dcn={"data": 4}, ici={"gallery": 8})
    # 4 hosts x 8 chips: gradients all-reduce over DCN once per step;
    # every gallery-shard collective stays on ICI.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Bootstrap ``jax.distributed`` for a multi-host run.

    Call before any other jax API in every process (one process per host,
    the standard TPU pod topology). After this, ``jax.devices()`` is
    GLOBAL (all hosts' chips) and ``jax.local_devices()`` is this host's —
    meshes built over the global list drive XLA's DCN collectives.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def create_hybrid_mesh(
    dcn: Optional[dict] = None,
    ici: Optional[dict] = None,
    devices: Optional[Sequence] = None,
    slice_of: Optional[Callable] = None,
) -> Mesh:
    """Mesh with ``dcn`` axes spanning hosts/slices and ``ici`` axes inside.

    Axis order in the mesh is DCN-outer, ICI-inner — XLA then lowers
    collectives along ICI axes to in-slice all-reduces/gathers and only the
    DCN axes touch the network. Sizes: each dict maps axis name → size;
    DCN sizes must multiply to the slice count, ICI sizes to the
    per-slice device count (one ``-1`` per dict is inferred).

    Single-slice processes (tests, one host) degrade transparently: with
    one slice, the DCN axes get size 1 (or whatever the inferred -1
    yields) and the result equals a plain ``create_mesh``.

    ``devices``/``slice_of`` override the device list and the
    device→slice assignment (default: the backend's ``slice_index``).
    The override exists so the DCN-outer topology is exercisable on
    backends that expose no slice structure — the virtual CPU mesh the
    test suite and the driver dryrun run on.
    """
    grid, names = _plan_hybrid(
        jax.devices() if devices is None else devices, dcn, ici, slice_of
    )
    return Mesh(grid, names)


def _plan_hybrid(
    devices: Sequence,
    dcn: Optional[dict],
    ici: Optional[dict],
    slice_of: Optional[Callable] = None,
) -> tuple[np.ndarray, tuple]:
    """(device grid, axis names) for :func:`create_hybrid_mesh`.

    Pure planning function so the slice-grouping logic is testable with
    synthetic device handles (real multi-slice hardware is required to
    construct the actual Mesh).
    """
    dcn = dict(dcn or {})
    ici = dict(ici or {})
    if not ici:
        raise ValueError("need at least one ICI axis")
    if slice_of is None:
        # TPU backends expose slice_index on pods; single-slice (or CPU
        # test) backends do not — one slice then.
        slice_of = lambda d: getattr(d, "slice_index", 0)  # noqa: E731

    slice_ids = sorted({slice_of(d) for d in devices})
    n_slices = len(slice_ids)
    per_slice = len(devices) // n_slices
    if per_slice * n_slices != len(devices):
        raise ValueError(
            f"uneven slices: {len(devices)} devices over {n_slices} slices"
        )

    def _resolve(sizes: dict, total: int, kind: str) -> dict:
        sizes = dict(sizes)
        vals = list(sizes.values())
        if vals.count(-1) == 1:
            known = int(np.prod([v for v in vals if v != -1]))
            if known == 0 or total % known:
                raise ValueError(f"{kind} sizes {sizes} don't divide {total}")
            sizes[next(k for k, v in sizes.items() if v == -1)] = (
                total // known
            )
        if int(np.prod(list(sizes.values()))) != total:
            raise ValueError(f"{kind} sizes {sizes} != {total}")
        return sizes

    dcn = _resolve(dcn, n_slices, "dcn") if dcn else {}
    ici = _resolve(ici, per_slice, "ici")

    # (n_slices, per_slice) device grid, slices outermost, then reshape to
    # the named axis sizes: DCN axes over the slice dim, ICI axes within.
    by_slice = {s: [] for s in slice_ids}
    for d in devices:
        by_slice[slice_of(d)].append(d)
    grid = np.asarray(
        [sorted(by_slice[s], key=lambda d: d.id) for s in slice_ids],
        dtype=object,
    )  # (n_slices, per_slice)
    shape = tuple(dcn.values()) + tuple(ici.values())
    names = tuple(dcn.keys()) + tuple(ici.keys())
    return grid.reshape(shape), names
