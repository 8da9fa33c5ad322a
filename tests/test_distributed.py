"""Multi-host layer (parallel/distributed.py) exercised on the
8-device virtual CPU mesh (single process; the process-local code path
is shared with real multi-host runs via
jax.make_array_from_process_local_data)."""

import jax
import numpy as np
import pytest

from fabber_core_tpu.core.volume import VolumeGeometry
from fabber_core_tpu.parallel import distributed as dist


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    assert dist.initialize() is False


def test_pad_and_range():
    mesh = dist.global_voxel_mesh()
    n = mesh.devices.size
    assert dist.pad_voxels(n * 3, mesh) == n * 3
    assert dist.pad_voxels(n * 3 + 1, mesh) == n * 4
    lo, hi = dist.process_voxel_range(n * 4)
    assert (lo, hi) == (0, n * 4)  # single process feeds everything


def test_load_voxel_data_sharded_roundtrip():
    rng = np.random.default_rng(0)
    nx, ny, nz, nt = 5, 4, 2, 7
    mask = rng.random((nx, ny, nz)) > 0.3
    vol = rng.normal(size=(nx, ny, nz, nt))
    geom = VolumeGeometry((nx, ny, nz), mask)

    mesh = dist.global_voxel_mesh()
    arr, v_pad = dist.load_voxel_data_sharded(geom, vol, mesh)
    assert arr.shape == (nt, v_pad)
    assert v_pad % mesh.devices.size == 0
    # sharded over the voxel axis
    assert arr.sharding.spec == jax.sharding.PartitionSpec(None, "vox")
    # values identical to the host packing; padding repeats last voxel
    expect = geom.to_voxels(vol).T
    np.testing.assert_allclose(np.asarray(arr)[:, :geom.nvoxels], expect)
    np.testing.assert_allclose(
        np.asarray(arr)[:, geom.nvoxels:],
        np.repeat(expect[:, -1:], v_pad - geom.nvoxels, axis=1))


def test_sharded_vb_run_matches_unsharded():
    """A VB run whose data plane is globally sharded produces the same
    numbers as the plain single-device run."""
    from fabber_core_tpu.options import RunOptions
    from fabber_core_tpu.models import get_model_class
    from fabber_core_tpu.inference.vb import VBInference
    from fabber_core_tpu.parallel.mesh import shard_engine

    rng = np.random.default_rng(3)
    mesh = dist.global_voxel_mesh()
    nv = mesh.devices.size * 8
    nt = 12
    t = np.arange(1, nt + 1, dtype=float)
    data = 1.5 + 0.2 * t[None, :] + rng.normal(0, 0.1, (nv, nt))
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    mk = lambda: RunOptions({"model": "poly", "degree": "1",
                             "noise": "white", "max-iterations": "8"})
    o1 = mk()
    e1 = VBInference(get_model_class("poly")(o1), o1, data, coords)
    r1 = e1.run()

    o2 = mk()
    e2 = VBInference(get_model_class("poly")(o2), o2, data, coords)
    shard_engine(e2)
    r2 = e2.run()
    np.testing.assert_allclose(r1.means, r2.means, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(r1.noise_means, r2.noise_means, rtol=1e-12)
