"""Chunked execution must be bit-identical to single-pass execution."""

import numpy as np

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def build(data, coords, extra):
    opts = {"model": "exp", "dt": "0.05", "noise": "white",
            "convergence": "trialmode", "max-iterations": "20",
            "save-free-energy": True, "save-free-energy-history": True}
    opts.update(extra)
    options = RunOptions(opts)
    eng = VBInference(get_model_class("exp")(options), options, data, coords)
    return eng.run()


def test_chunked_equals_single_pass():
    rng = np.random.default_rng(0)
    nv, nt = 103, 30  # odd count: exercises the slid final window
    t = np.arange(nt) * 0.05
    amp = rng.uniform(0.5, 2.0, nv)
    data = amp[:, None] * np.exp(-t)[None, :] + rng.normal(0, 0.05, (nv, nt))
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)

    full = build(data, coords, {})
    chunked = build(data, coords, {"voxel-chunk-size": "40"})

    np.testing.assert_array_equal(full.means, chunked.means)
    np.testing.assert_array_equal(full.cov, chunked.cov)
    np.testing.assert_array_equal(full.noise_means, chunked.noise_means)
    np.testing.assert_array_equal(full.free_energy, chunked.free_energy)
    np.testing.assert_array_equal(full.iterations, chunked.iterations)
    # histories may differ in padded length, but shared rows must match
    rows = min(full.fhistory.shape[0], chunked.fhistory.shape[0])
    np.testing.assert_array_equal(full.fhistory[rows - 1],
                                  chunked.fhistory[rows - 1])


def test_auto_chunk_size_reasonable():
    nv, nt = 50, 20
    data = np.ones((nv, nt))
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    options = RunOptions({"model": "poly", "degree": "2", "noise": "white",
                          "max-iterations": "2"})
    eng = VBInference(get_model_class("poly")(options), options, data, coords)
    chunk = eng._chunk_size()
    assert chunk >= 16384  # auto budget should allow large chunks


def test_shard_voxels_matches_unsharded():
    """--shard-voxels over the 8-device CPU mesh: identical results."""
    import jax
    from fabber_core_tpu.api import FabberTpu
    rng = np.random.default_rng(5)
    shape, nt = (8, 4, 2), 12
    vol = (2.0 + rng.normal(0, 0.5, shape + (nt,))).astype(np.float32)
    base = {"model": "poly", "degree": "0", "method": "spatialvb",
            "noise": "white", "param-spatial-priors": "M",
            "max-iterations": "4", "save-mean": True}
    fab = FabberTpu()
    plain = fab.run_with_data(dict(base), {"data": vol})
    sharded = fab.run_with_data(dict(base, **{"shard-voxels": True}),
                                {"data": vol})
    np.testing.assert_array_equal(plain.data["mean_c0"],
                                  sharded.data["mean_c0"])

    # voxelwise method shards too
    base2 = {"model": "poly", "degree": "0", "method": "vb",
             "noise": "white", "max-iterations": "4", "save-mean": True}
    plain = fab.run_with_data(dict(base2), {"data": vol})
    sharded = fab.run_with_data(dict(base2, **{"shard-voxels": True}),
                                {"data": vol})
    np.testing.assert_array_equal(plain.data["mean_c0"],
                                  sharded.data["mean_c0"])
