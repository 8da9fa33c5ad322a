"""Spectral route (ops/spectral.py): engine-level equivalence with the
XLA stats route + eligibility gates.

The spectral route evaluates the SAME fixed point (Eq 19-22 on the
fixed-design sufficient statistics) as a scalar rational iteration in
the whitened design eigenbasis, so results agree to roundoff at the
problem's conditioning (tolerance-based, not bit-exact — the
floating-point order differs)."""

import numpy as np
import pytest

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def make_engine(nv, mode, extra=None, seed=0, nt=30, degree=2):
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1)
    c0 = rng.uniform(-1, 1, (nv, 1))
    c1 = rng.uniform(-0.05, 0.05, (nv, 1))
    data = (c0 + c1 * t[None, :]
            + 0.1 * rng.standard_normal((nv, nt))).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    opts = {"model": "poly", "degree": str(degree), "noise": "white",
            "max-iterations": "10", "dtype": "single",
            "engine-kernel": mode, "print-free-energy": True}
    opts.update(extra or {})
    options = RunOptions(opts)
    return VBInference(get_model_class("poly")(options), options, data,
                       coords)


def assert_match(rx, rp):
    sd = np.sqrt(np.diagonal(rx.cov, axis1=1, axis2=2))
    assert np.max(np.abs(rx.means - rp.means) / sd) < 5e-3
    # cov in the original basis reconstructs through the eigenbasis:
    # relative agreement at the conditioning of the whitened Gram
    np.testing.assert_allclose(rx.cov, rp.cov, rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(rx.noise_means, rp.noise_means, rtol=1e-3)
    if rx.free_energy is not None:
        np.testing.assert_allclose(rx.free_energy, rp.free_energy,
                                   rtol=1e-3, atol=5e-3)
    np.testing.assert_array_equal(rx.iterations, rp.iterations)
    np.testing.assert_array_equal(rx.bad_voxels, rp.bad_voxels)


@pytest.mark.parametrize("nv", [256, 100])
def test_spectral_matches_xla_stats(nv):
    rx = make_engine(nv, "xla").run()
    eng = make_engine(nv, "spectral")
    assert eng.use_spectral
    assert_match(rx, eng.run())


@pytest.mark.parametrize("extra", [
    {"max-iterations": "1"},
    {"max-iterations": "3"},
    {"mt1": "3", "mt2": "17"},
    {"prior-noise-stddev": "0.2"},
], ids=["one-iter", "short", "masked", "phiprior"])
def test_spectral_cases(extra):
    rx = make_engine(128, "xla", extra).run()
    eng = make_engine(128, "spectral", extra)
    assert eng.use_spectral
    assert_match(rx, eng.run())


def test_spectral_image_prior():
    """Voxelwise prior means thread through bind.prior_base_means."""
    nv = 128
    img = np.linspace(-0.5, 0.5, nv).astype(np.float32)

    def build(mode):
        opts = {"model": "poly", "degree": "2", "noise": "white",
                "max-iterations": "10", "dtype": "single",
                "engine-kernel": mode, "print-free-energy": True,
                "PSP_byname1": "c0", "PSP_byname1_type": "I",
                "PSP_byname1_image": "prior_img",
                "PSP_byname1_prec": "10"}
        rng = np.random.default_rng(0)
        t = np.arange(1, 31)
        data = (img[:, None] + 0.02 * t[None, :]
                + 0.05 * rng.standard_normal((nv, 30))).astype(np.float32)
        coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
        options = RunOptions(opts)
        return VBInference(get_model_class("poly")(options), options,
                           data, coords, voxel_data_getter=lambda key: img)

    rx = build("xla").run()
    eng = build("spectral")
    assert eng.use_spectral
    assert_match(rx, eng.run())


@pytest.mark.parametrize("extra", [
    {"noise-pattern": "12"},
    {"locked-noise-stdev": "0.1"},
    {"convergence": "trialmode"},
], ids=["multi-group", "locked", "detector"])
def test_spectral_ineligible_falls_back(extra):
    eng = make_engine(64, "spectral", extra)
    assert not eng.use_spectral
    res = eng.run()
    assert res.bad_voxels.sum() == 0


def test_spectral_sharded_matches():
    """Spectral route under voxel sharding (shard_map dispatch)."""
    from fabber_core_tpu.parallel.mesh import shard_engine
    rx = make_engine(256, "xla").run()
    eng = make_engine(256, "spectral")
    shard_engine(eng)
    assert eng.use_spectral
    assert_match(rx, eng.run())
