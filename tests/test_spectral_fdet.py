"""The spectral fast tier under F-based detectors (VERDICT r2 item 4):
pointzeroone / freduce / trialmode run their lane state machines inside
the eigenbasis loop (ops/spectral.py make_spectral_detector_loop) and
must reproduce the XLA route's detector decisions and results."""

import numpy as np
import pytest

from fabber_core_tpu.options import RunOptions
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.inference.vb import VBInference


def _data(nv=400, nt=40, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1)
    data = (0.5 + 0.02 * t[None, :] - 0.0003 * t[None, :] ** 2
            + 0.1 * rng.standard_normal((nv, nt))).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    return data, coords


def _build(kernel, det, data, coords, extra=None):
    o = RunOptions({"model": "poly", "degree": "2", "noise": "white",
                    "convergence": det, "max-iterations": "15",
                    "dtype": "single", "engine-kernel": kernel,
                    "print-free-energy": True, **(extra or {})})
    return VBInference(get_model_class("poly")(o), o, data, coords)


@pytest.mark.parametrize("det", ["pointzeroone", "freduce", "trialmode"])
def test_spectral_fdet_matches_xla(det):
    data, coords = _data()
    ex = _build("xla", det, data, coords)
    assert not getattr(ex, "use_spectral_fdet", False)
    rx = ex.run()

    es = _build("spectral", det, data, coords)
    assert es.use_spectral_fdet, "route must engage for " + det
    rs = es.run()

    # identical per-lane detector decisions (iteration counts)...
    np.testing.assert_array_equal(rx.iterations, rs.iterations)
    # ...that actually exercise early stopping (not a blind max count)
    assert rx.iterations.max() < 15
    # results to roundoff of the two evaluation orders
    sd = np.sqrt(np.diagonal(rx.cov, axis1=1, axis2=2))
    assert np.max(np.abs(rx.means - rs.means) / sd) < 1e-3
    np.testing.assert_allclose(rs.noise_means, rx.noise_means, rtol=1e-4)
    np.testing.assert_allclose(
        rs.free_energy, rx.free_energy,
        rtol=1e-4, atol=1e-3 * np.abs(rx.free_energy).max())


def test_spectral_fdet_freduce_reverts_to_initial():
    """Lanes whose F drops revert to the engine-initial posterior (the
    sane reading of the reference's freduce, whose never-set save flag
    makes it revert to a default-constructed MVN); both routes must
    agree bit-comparably on those lanes too."""
    rng = np.random.default_rng(3)
    nv, nt = 300, 24
    # heavy noise provokes F reductions in early iterations
    data = (rng.standard_normal((nv, nt)) * 5.0).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    rx = _build("xla", "freduce", data, coords).run()
    rs = _build("spectral", "freduce", data, coords).run()
    np.testing.assert_array_equal(rx.iterations, rs.iterations)
    # non-reverted lanes carry f32 roundoff of the two evaluation
    # orders; sd-normalized like the main parity test
    sd = np.sqrt(np.diagonal(rx.cov, axis1=1, axis2=2))
    assert np.max(np.abs(rx.means - rs.means) / sd) < 1e-3
    np.testing.assert_allclose(rs.free_energy, rx.free_energy,
                               rtol=1e-4, atol=1e-2)


def test_spectral_fdet_image_prior_means():
    """Voxelwise prior means (image prior) flow through vt in the
    eigenbasis loop."""
    data, coords = _data(nv=128)
    img = np.linspace(0.2, 0.8, 128).astype(np.float32)
    extra = {"PSP_byname1": "c0", "PSP_byname1_type": "I",
             "PSP_byname1_image": "prior_img"}

    def getter(key):
        return img

    base = {"model": "poly", "degree": "2", "noise": "white",
            "convergence": "pointzeroone", "max-iterations": "15",
            "dtype": "single", "print-free-energy": True, **extra}
    o1 = RunOptions({**base, "engine-kernel": "xla"})
    e1 = VBInference(get_model_class("poly")(o1), o1, data, coords,
                     voxel_data_getter=getter)
    r1 = e1.run()

    o2 = RunOptions({**base, "engine-kernel": "spectral"})
    e2 = VBInference(get_model_class("poly")(o2), o2, data, coords,
                     voxel_data_getter=getter)
    assert e2.use_spectral_fdet
    r2 = e2.run()
    np.testing.assert_array_equal(r1.iterations, r2.iterations)
    sd = np.sqrt(np.diagonal(r1.cov, axis1=1, axis2=2))
    assert np.max(np.abs(r1.means - r2.means) / sd) < 1e-3


def test_spectral_fdet_sharded():
    """The detector loop composes with voxel sharding (ConvState
    planes shard over the mesh through _shard_kernel)."""
    from fabber_core_tpu.parallel.mesh import shard_engine
    data, coords = _data(nv=256)
    e1 = _build("spectral", "pointzeroone", data, coords)
    r1 = e1.run()
    e2 = _build("spectral", "pointzeroone", data, coords)
    shard_engine(e2)
    assert e2.use_spectral_fdet
    r2 = e2.run()
    np.testing.assert_array_equal(r1.iterations, r2.iterations)
    np.testing.assert_allclose(r2.means, r1.means, rtol=1e-5, atol=1e-7)
