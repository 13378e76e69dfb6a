"""Multi-host (DCN x ICI) mesh planning — parallel/multihost.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_tpu.parallel.multihost import (
    _plan_hybrid,
    create_hybrid_mesh,
)


class FakeDev:
    """Synthetic device handle: slice_index + id (pods expose both)."""

    def __init__(self, id, slice_index):
        self.id = id
        self.slice_index = slice_index

    def __lt__(self, other):
        return self.id < other.id

    def __repr__(self):
        return f"d{self.id}s{self.slice_index}"


def test_plan_groups_slices_outermost():
    # 2 slices x 4 chips, interleaved arrival order
    devs = [FakeDev(i, i % 2) for i in range(8)]
    grid, names = _plan_hybrid(devs, dcn={"data": 2}, ici={"gallery": 4})
    assert names == ("data", "gallery")
    assert grid.shape == (2, 4)
    # every row is one slice — no DCN axis cuts through a slice
    for row in grid:
        assert len({d.slice_index for d in row}) == 1
    assert {grid[0, 0].slice_index, grid[1, 0].slice_index} == {0, 1}


def test_plan_infers_minus_one_sizes():
    devs = [FakeDev(i, i // 4) for i in range(8)]
    grid, names = _plan_hybrid(devs, dcn={"data": -1}, ici={"gallery": -1})
    assert grid.shape == (2, 4)


def test_plan_rejects_bad_sizes():
    devs = [FakeDev(i, 0) for i in range(8)]
    with pytest.raises(ValueError, match="ici"):
        _plan_hybrid(devs, dcn=None, ici={"gallery": 3})
    with pytest.raises(ValueError, match="ICI"):
        _plan_hybrid(devs, dcn={"data": 1}, ici=None)


def test_slice_of_override_builds_real_2x4_hybrid_mesh():
    """slice_of lets the DCN-outer topology run on backends with no slice
    structure (the CPU test mesh): a real 2x4 Mesh carrying a sharded
    gallery search over the ICI-inner axis."""
    from facerecognition_tpu.parallel import ShardedGallery

    devs = jax.devices()[:8]
    mesh = create_hybrid_mesh(
        dcn={"data": 2},
        ici={"gallery": 4},
        devices=devs,
        slice_of=lambda d: devs.index(d) // 4,
    )
    assert mesh.axis_names == ("data", "gallery")
    assert mesh.devices.shape == (2, 4)
    # inner rows are contiguous device groups ("slices")
    for r, row in enumerate(mesh.devices):
        assert [devs.index(d) // 4 for d in row] == [r] * 4

    rng = np.random.default_rng(0)
    mat = rng.normal(size=(64, 16)).astype(np.float32)
    gal = ShardedGallery(mesh, dim=16)
    gal.set_all([f"id_{i}" for i in range(64)], mat)
    _, idx = gal.topk(mat[[3, 40]], k=3)
    assert list(np.asarray(idx)[:, 0]) == [3, 40]


def test_single_slice_hybrid_mesh_is_usable():
    """On the 8-device CPU test backend (one slice), the hybrid mesh
    degrades to a plain mesh and runs a psum across the ICI axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_hybrid_mesh(dcn={"data": 1}, ici={"gallery": -1})
    assert mesh.axis_names == ("data", "gallery")
    n = mesh.devices.size
    assert mesh.shape["gallery"] == n

    x = jnp.arange(4 * n, dtype=jnp.float32).reshape(n, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P(("data", "gallery"))))

    def summed(v):
        return jax.lax.psum(v, ("data", "gallery"))

    out = jax.jit(
        jax.shard_map(
            summed, mesh=mesh, in_specs=P(("data", "gallery")),
            out_specs=P(),
        )
    )(xs)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(x).sum(0))
