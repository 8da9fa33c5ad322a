"""Beyond-HBM spatial VB (VERDICT r2 item 2): the capacity pre-check
and the blocked streaming sweep. Block-sequential execution of the
Jacobi sweep reads cross-voxel state only through the host-computed
previous-sweep neighbour sums, so blocked results must match the
unblocked run to roundoff, at ANY block size (including non-divisible
ones)."""

import numpy as np
import pytest

from fabber_core_tpu.exceptions import FabberError, InvalidOptionValue
from fabber_core_tpu.inference.spatial import SpatialVBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def grid_coords(nx, ny, nz):
    coords = []
    for z in range(nz):
        for y in range(ny):
            for x in range(nx):
                coords.append([x, y, z])
    return np.array(coords, float)


def make_data(nv, nt, coords, seed=0, noise=0.05):
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1, dtype=float)
    truth = 1.0 + 0.1 * coords[:, 0] - 0.05 * coords[:, 1]
    data = (truth[:, None] * (1.0 + 0.02 * t[None, :])
            + noise * rng.standard_normal((nv, nt)))
    return data.astype(np.float32)


def build(opts, data, coords):
    options = RunOptions(opts)
    model = get_model_class(options.get_string("model"))(options)
    return SpatialVBInference(model, options, data, coords)


BASE = {"model": "poly", "degree": "1", "noise": "white",
        "method": "spatialvb", "max-iterations": "6",
        "dtype": "single", "print-free-energy": True}


def assert_equivalent(r_ref, r_blk, eng_ref, eng_blk):
    np.testing.assert_allclose(r_blk.means, r_ref.means,
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(r_blk.cov, r_ref.cov, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(r_blk.noise_means, r_ref.noise_means,
                               rtol=2e-4)
    np.testing.assert_allclose(
        r_blk.free_energy, r_ref.free_energy,
        rtol=1e-4, atol=1e-3 * np.abs(r_ref.free_energy).max())
    np.testing.assert_allclose(eng_blk.final_ak, eng_ref.final_ak,
                               rtol=2e-4)
    np.testing.assert_allclose(eng_blk.coefficient_resels,
                               eng_ref.coefficient_resels, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_array_equal(r_blk.bad_voxels, r_ref.bad_voxels)


@pytest.mark.parametrize("prior,block", [("M", 64), ("M", 37), ("m", 50),
                                         ("P", 48), ("p", 96)])
def test_blocked_matches_unblocked(prior, block):
    """Stats (fixed-design) route, every spatial prior family, both
    divisible and prime block sizes (the last block is edge-padded)."""
    coords = grid_coords(8, 6, 4)
    data = make_data(len(coords), 14, coords)
    opts = {**BASE, "param-spatial-priors": prior + "N"}
    e_ref = build(opts, data, coords)
    r_ref = e_ref.run()
    e_blk = build({**opts, "spatial-block-voxels": str(block)},
                  data, coords)
    assert e_blk.block_voxels == block
    assert isinstance(e_blk.data, np.ndarray)  # host-resident plane
    r_blk = e_blk.run()
    assert_equivalent(r_ref, r_blk, e_ref, e_blk)


def test_blocked_generic_route():
    """Non-fixed-design (nonlinear exp model): the blocked step ships
    [T,Vb] data blocks and relinearizes in-block."""
    coords = grid_coords(6, 5, 1)
    nv, nt = len(coords), 20
    rng = np.random.default_rng(2)
    tt = np.arange(nt) * 0.1
    amp = 1.0 + 0.05 * coords[:, 0]
    data = (amp[:, None] * np.exp(-0.8 * tt[None, :])
            + 0.02 * rng.standard_normal((nv, nt))).astype(np.float32)
    opts = {"model": "exp", "dt": "0.1", "noise": "white",
            "method": "spatialvb", "max-iterations": "5",
            "dtype": "single", "print-free-energy": True,
            "param-spatial-priors": "MN"}
    e_ref = build(opts, data, coords)
    assert not e_ref.use_stats
    r_ref = e_ref.run()
    e_blk = build({**opts, "spatial-block-voxels": "11"}, data, coords)
    r_blk = e_blk.run()
    assert_equivalent(r_ref, r_blk, e_ref, e_blk)


def test_blocked_excises_bad_voxels():
    """A NaN-data voxel is excised from the MRF graph identically in
    both modes."""
    coords = grid_coords(5, 4, 1)
    data = make_data(len(coords), 12, coords)
    data[7] = np.nan
    opts = {**BASE, "param-spatial-priors": "MM",
            "allow-bad-voxels": True}
    e_ref = build(opts, data, coords)
    r_ref = e_ref.run()
    e_blk = build({**opts, "spatial-block-voxels": "8"}, data, coords)
    r_blk = e_blk.run()
    np.testing.assert_array_equal(r_blk.bad_voxels, r_ref.bad_voxels)
    assert r_blk.bad_voxels[7]
    good = ~r_ref.bad_voxels
    np.testing.assert_allclose(r_blk.means[good], r_ref.means[good],
                               rtol=2e-4, atol=1e-5)


def test_capacity_precheck_raises_with_escapes_named():
    """An unblocked run over the device budget fails FAST with the
    escape hatches named; the blocked run under the same tiny budget
    succeeds (memory now bounded by the block size)."""
    coords = grid_coords(6, 4, 1)
    data = make_data(len(coords), 10, coords)
    opts = {**BASE, "param-spatial-priors": "MN",
            "spatial-mem-gb": "1e-6"}
    with pytest.raises(FabberError) as exc:
        build(opts, data, coords).run()
    msg = str(exc.value)
    assert "spatial-block-voxels" in msg
    assert "--distributed" in msg
    assert "bf16" in msg
    r = build({**opts, "spatial-block-voxels": "8"}, data, coords).run()
    assert r.bad_voxels.sum() == 0


def test_spatial_fchange_early_stop():
    """--spatial-fchange stops sweeping when the global F change drops
    below the tolerance (an opt-in beyond the reference, whose counting
    detector ignores Fglobal); the blocked runner agrees on the sweep
    count and the results."""
    coords = grid_coords(8, 6, 1)
    data = make_data(len(coords), 14, coords, noise=0.02)
    opts = {**BASE, "param-spatial-priors": "MN",
            "max-iterations": "30", "spatial-fchange": "0.05"}
    e1 = build(opts, data, coords)
    r1 = e1.run()
    assert r1.iterations[0] < 30          # early stop engaged
    assert (r1.iterations == r1.iterations[0]).all()

    # blind-count run for reference: the early-stopped posterior is
    # already converged to well within the F tolerance
    r_full = build({**opts, "spatial-fchange": "0"}, data, coords).run()
    assert (r_full.iterations == 30).all()
    np.testing.assert_allclose(r1.means, r_full.means,
                               rtol=1e-3, atol=1e-4)

    e2 = build({**opts, "spatial-block-voxels": "13"}, data, coords)
    r2 = e2.run()
    np.testing.assert_array_equal(r2.iterations, r1.iterations)
    np.testing.assert_allclose(r2.means, r1.means, rtol=2e-4, atol=1e-5)


def test_blocked_rejects_gauss_seidel():
    coords = grid_coords(4, 3, 1)
    data = make_data(len(coords), 8, coords)
    opts = {**BASE, "param-spatial-priors": "MN",
            "spatial-sweep-mode": "gauss-seidel",
            "spatial-block-voxels": "4"}
    with pytest.raises(InvalidOptionValue):
        build(opts, data, coords)


def test_blocked_progress_and_image_prior():
    """Per-sweep progress callbacks fire; image-prior means thread
    through the per-block prior_base_means slices."""
    coords = grid_coords(6, 4, 1)
    nv = len(coords)
    data = make_data(nv, 12, coords)
    img = np.linspace(0.5, 1.5, nv).astype(np.float32)
    opts = {**BASE, "param-spatial-priors": "MN",
            "PSP_byname1": "c1", "PSP_byname1_type": "I",
            "PSP_byname1_image": "prior_img"}

    def getter(key):
        return img

    def make(extra):
        options = RunOptions({**opts, **extra})
        model = get_model_class("poly")(options)
        return SpatialVBInference(model, options, data, coords,
                                  voxel_data_getter=getter)

    e_ref = make({})
    r_ref = e_ref.run()
    e_blk = make({"spatial-block-voxels": "7"})
    calls = []
    e_blk.progress_cb = lambda done, total: calls.append((done, total))
    r_blk = e_blk.run()
    np.testing.assert_allclose(r_blk.means, r_ref.means,
                               rtol=2e-4, atol=1e-5)
    assert len(calls) >= int(opts["max-iterations"])
    assert calls[-1] == (nv, nv)
