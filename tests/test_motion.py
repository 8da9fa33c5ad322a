"""Motion correction: registration recovery + VB interleave.

The reference capability is MCobj (motioncorr.cc:25-94): per-timepoint
registration of the original data to the model prediction, interleaved
with VB via the mcsteps option. Our equivalent is a jitted Gauss-Newton
rigid/affine registerer (core/motion.py) wired into VBInference.run.
"""

import numpy as np
import pytest

from fabber_core_tpu.core.motion import (make_registerer,
                                         register_timeseries)
from fabber_core_tpu.options import RunOptions
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.inference.vb import VBInference

SHAPE = (16, 16, 8)


def _full_coords(shape):
    nx, ny, nz = shape
    g = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij"), -1)
    return g.reshape(-1, 3).astype(np.float64)


def _blob(coords, centre, sigma=3.0, amp=2.0):
    d2 = ((coords - np.asarray(centre)) ** 2).sum(axis=1)
    return amp * np.exp(-d2 / (2.0 * sigma ** 2))


def test_registerer_recovers_translation():
    coords = _full_coords(SHAPE)
    centre = np.array([7.5, 7.5, 3.5])
    shift = np.array([0.6, -0.8, 0.4])
    target = _blob(coords, centre)            # prediction
    moved = _blob(coords, centre + shift)     # data = target shifted by s
    reg = make_registerer(coords, SHAPE, dof=6, n_iters=12)
    realigned, params = reg(moved, target)
    # warp(x) = x + t samples data at x+t = target(x + t - s): t -> s
    assert np.allclose(np.asarray(params[:3]), shift, atol=0.05)
    assert np.asarray(np.abs(params[3:])).max() < 0.02  # no spurious rotation
    err0 = np.abs(moved - target).max()
    err1 = np.abs(np.asarray(realigned) - target).max()
    # the floor is trilinear resampling error of the discrete grid,
    # not registration error (params above are within 5e-3 voxels)
    assert err1 < 0.35 * err0


def test_registerer_recovers_rotation():
    coords = _full_coords(SHAPE)
    centre = np.array([7.5, 7.5, 3.5])
    # two off-centre blobs so rotation is observable
    def scene(pts):
        return (_blob(pts, centre + [4, 0, 0], sigma=2.0)
                + _blob(pts, centre - [4, 0, 0], sigma=2.5, amp=1.5))
    target = scene(coords)
    ang = 0.06  # ~3.4 degrees about z
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    # data(x) = target(R^-1 (x - c) + c): registering needs warp ~ R
    moved = scene((coords - centre) @ rot + centre)
    reg = make_registerer(coords, SHAPE, dof=6, n_iters=15)
    _, params = reg(moved, target)
    assert abs(float(params[5]) - ang) < 0.01
    assert np.abs(np.asarray(params[:3])).max() < 0.1


def test_vb_motion_correction_improves_fit():
    """poly VB with per-timepoint motion on a minority of volumes:
    mcsteps=2 recovers c0 far better than mcsteps=0, the realigned
    frame is gauge-anchored to the still majority, and the translation
    diagnostics record the true relative shift."""
    rng = np.random.default_rng(7)
    coords = _full_coords(SHAPE)
    nv, nt = coords.shape[0], 16
    centre = np.array([7.5, 7.5, 3.5])
    c0_true = 1.0 + _blob(coords, centre, sigma=4.0)   # smooth spatial map

    shifts = np.zeros((nt, 3))
    shifts[12:, 0] = 1.2   # last 4 volumes displaced along x
    data = np.empty((nv, nt))
    for k in range(nt):
        data[:, k] = 1.0 + _blob(coords, centre + shifts[k], sigma=4.0)
    data += 0.02 * rng.standard_normal(data.shape)

    def run(mcsteps):
        opts = RunOptions({"model": "poly", "degree": "0",
                           "noise": "white", "max-iterations": "6",
                           "mcsteps": str(mcsteps)})
        model = get_model_class("poly")(opts)
        eng = VBInference(model, opts, data, coords)
        return eng, eng.run()

    _, res0 = run(0)
    eng2, res2 = run(2)
    err0 = float(np.abs(res0.means[:, 0] - c0_true).mean())
    err2 = float(np.abs(res2.means[:, 0] - c0_true).mean())
    assert err2 < 0.4 * err0, (err0, err2)
    assert len(eng2.mc_translations) == 2
    # median gauge anchoring: the recorded max translation is the full
    # relative displacement of the moved volumes (~1.2 voxels)
    assert 0.9 < eng2.mc_translations[0] < 1.5
    # 1.2 voxels is comfortably inside the +-2 voxel capture range
    assert not eng2.mc_saturated


def test_vb_motion_saturation_flagged():
    """Estimated displacement near the capture range sets the
    saturation flag (real motion may exceed it; the runner warns)."""
    rng = np.random.default_rng(11)
    coords = _full_coords(SHAPE)
    nv, nt = coords.shape[0], 12
    centre = np.array([7.5, 7.5, 3.5])
    shifts = np.zeros((nt, 3))
    shifts[9:, 0] = 1.8   # near the +-2 voxel capture range
    data = np.empty((nv, nt))
    for k in range(nt):
        data[:, k] = 1.0 + _blob(coords, centre + shifts[k], sigma=4.0)
    data += 0.02 * rng.standard_normal(data.shape)
    opts = RunOptions({"model": "poly", "degree": "0",
                       "noise": "white", "max-iterations": "5",
                       "mcsteps": "1"})
    eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
    eng.run()
    assert eng.mc_translations[0] >= 1.5
    assert eng.mc_saturated


def test_register_timeseries_identity_is_noop():
    coords = _full_coords(SHAPE)
    vol = _blob(coords, [7.5, 7.5, 3.5])
    data = np.stack([vol, vol * 1.5])
    out, params = register_timeseries(data, data, coords, SHAPE, dof=6)
    assert np.abs(params).max() < 1e-3
    assert np.allclose(out, data, atol=1e-3)


@pytest.mark.parametrize("dof", [6, 12])
def test_registerer_dof_modes(dof):
    coords = _full_coords(SHAPE)
    centre = np.array([7.5, 7.5, 3.5])
    shift = np.array([0.5, 0.3, -0.2])
    target = _blob(coords, centre)
    moved = _blob(coords, centre + shift)
    reg = make_registerer(coords, SHAPE, dof=dof, n_iters=12)
    realigned, _ = reg(moved, target)
    err0 = np.abs(moved - target).max()
    err1 = np.abs(np.asarray(realigned) - target).max()
    assert err1 < 0.35 * err0  # trilinear resampling floor


def test_mc_rejected_under_sharding():
    """MC operates on whole volumes; sharded engines must fail loudly
    rather than silently re-feed host-built data (review finding)."""
    from fabber_core_tpu.parallel.mesh import shard_engine
    from fabber_core_tpu.exceptions import InvalidOptionValue
    coords = _full_coords((8, 8, 4))
    data = np.ones((coords.shape[0], 8)) + 0.01 * np.random.default_rng(
        0).standard_normal((coords.shape[0], 8))
    opts = RunOptions({"model": "poly", "degree": "0", "noise": "white",
                       "max-iterations": "3", "mcsteps": "1"})
    eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
    shard_engine(eng)
    with pytest.raises(InvalidOptionValue):
        eng.run()


def test_mc_rejected_for_spatial():
    from fabber_core_tpu.inference.spatial import SpatialVBInference
    from fabber_core_tpu.exceptions import InvalidOptionValue
    coords = _full_coords((8, 8, 4))
    data = np.ones((coords.shape[0], 8))
    opts = RunOptions({"model": "poly", "degree": "0", "noise": "white",
                       "method": "spatialvb", "param-spatial-priors": "M",
                       "mcsteps": "1"})
    with pytest.raises(InvalidOptionValue):
        SpatialVBInference(get_model_class("poly")(opts), opts, data,
                           coords)


def test_mc_repeat_run_does_not_compound():
    """A second run() must register from the TRUE original data
    (transforms must not compound; review finding)."""
    rng = np.random.default_rng(11)
    coords = _full_coords(SHAPE)
    nv, nt = coords.shape[0], 12
    centre = np.array([7.5, 7.5, 3.5])
    shifts = np.zeros((nt, 3)); shifts[9:, 0] = 1.0
    data = np.empty((nv, nt))
    for k in range(nt):
        data[:, k] = 1.0 + _blob(coords, centre + shifts[k], sigma=4.0)
    data += 0.02 * rng.standard_normal(data.shape)
    opts = RunOptions({"model": "poly", "degree": "0", "noise": "white",
                       "max-iterations": "5", "mcsteps": "1"})
    eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
    r1 = eng.run()
    t1 = list(eng.mc_translations)
    r2 = eng.run()
    t2 = list(eng.mc_translations)
    # same registration problem both times (orig data, converged fit):
    # estimated shifts agree and results stay put instead of drifting
    assert abs(t1[0] - t2[0]) < 0.2, (t1, t2)
    assert np.abs(r1.means - r2.means).max() < 0.05


def test_pyramid_recovers_large_translation():
    """The multi-resolution pyramid extends the capture range past the
    single-level +-2 voxels: a 4-voxel translation is recovered on a
    volume large enough to support the 4x pool level (VERDICT r3
    remedy for the saturation warning)."""
    shape = (32, 32, 16)
    coords = _full_coords(shape)
    centre = np.array([15.5, 15.5, 7.5])
    shift = np.array([4.0, -3.5, 2.5])
    target = _blob(coords, centre, sigma=5.0)
    moved = _blob(coords, centre + shift, sigma=5.0)
    reg = make_registerer(coords, shape, dof=6, n_iters=12)
    assert reg.levels[0] == 4 and reg.capture_range == 8.0
    realigned, params = reg(moved, target)
    assert np.allclose(np.asarray(params[:3]), shift, atol=0.1), \
        np.asarray(params[:3])
    # the realigned volume matches the target
    err = np.abs(np.asarray(realigned) - target)
    assert err.mean() < 0.02


def test_pyramid_degrades_gracefully_on_small_volumes():
    """Volumes too small for the coarse level drop it (a 2-cell pooled
    axis makes the demeaned cost degenerate) and keep the
    single-resolution capture range."""
    coords = _full_coords(SHAPE)  # z extent 8: 8//4 = 2 < 4
    reg = make_registerer(coords, SHAPE, dof=6)
    assert reg.levels == (1,)
    assert reg.capture_range == 2.0
