"""Whole-loop Pallas kernel (ops/fused_loop.py): interpret-mode
equivalence with the XLA stats route, padding path, extended noise
options, and eligibility gating.

The kernel runs the ENTIRE maxits fixed point on VMEM-resident state;
every case here is pinned against the XLA sufficient-statistics route
(same arithmetic, so tolerances are float32 roundoff)."""

import numpy as np
import pytest

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def make_engine(nv, mode, extra=None, seed=0, nt=30, degree=2,
                voxel_data_getter=None):
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
    eng = VBInference(get_model_class("poly")(options), options, data,
                      coords, voxel_data_getter=voxel_data_getter)
    return eng


def assert_match(rx, rp):
    sd = np.sqrt(np.diagonal(rx.cov, axis1=1, axis2=2))
    # absolute agreement scaled by the posterior sd (raw rtol is
    # meaningless for ~0-valued high-order coefficients)
    assert np.max(np.abs(rx.means - rp.means) / sd) < 5e-3
    np.testing.assert_allclose(rx.cov, rp.cov, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(rx.noise_means, rp.noise_means, rtol=3e-4)
    if rx.free_energy is not None:
        np.testing.assert_allclose(rx.free_energy, rp.free_energy,
                                   rtol=1e-4, atol=2e-3)
    np.testing.assert_array_equal(rx.iterations, rp.iterations)
    np.testing.assert_array_equal(rx.bad_voxels, rp.bad_voxels)


@pytest.mark.parametrize("nv", [256, 200])  # 200 exercises edge padding
def test_loop_kernel_matches_xla_stats(nv):
    rx = make_engine(nv, "xla").run()
    eng = make_engine(nv, "pallas-loop")
    assert eng.use_loop_kernel and eng.loop_interpret
    assert_match(rx, eng.run())


@pytest.mark.parametrize("extra", [
    {"noise-pattern": "12"},
    {"mt1": "3", "mt2": "17"},
    {"locked-noise-stdev": "0.1"},
    {"prior-noise-stddev": "0.2"},
    {"max-iterations": "3"},
], ids=["pattern", "masked", "locked-sd", "phiprior", "short"])
def test_loop_kernel_extended_cases(extra):
    rx = make_engine(128, "xla", extra).run()
    eng = make_engine(128, "pallas-loop", extra)
    assert eng.use_loop_kernel
    assert_match(rx, eng.run())


def test_loop_kernel_image_prior():
    """Voxelwise prior means thread through bind.prior_base_means."""
    nv = 128
    img = np.linspace(-0.5, 0.5, nv).astype(np.float32)

    def build(mode):
        return make_engine(nv, mode, {"PSP_byname1": "c0",
                                      "PSP_byname1_type": "I",
                                      "PSP_byname1_image": "prior_img"},
                           voxel_data_getter=lambda key: img)

    rx = build("xla").run()
    eng = build("pallas-loop")
    assert eng.use_loop_kernel
    assert_match(rx, eng.run())


def test_loop_kernel_gating():
    """Ineligible configurations must fall back to the XLA routes."""
    # ARD prior -> iteration-dependent prior precision
    eng = make_engine(64, "pallas-loop", {"PSP_byname1": "c0",
                                          "PSP_byname1_type": "A"})
    assert not eng.use_loop_kernel
    # non-maxits detector -> save/revert protocol
    eng = make_engine(64, "pallas-loop", {"convergence": "trialmode"})
    assert not eng.use_loop_kernel
    # F history needs per-iteration values
    eng = make_engine(64, "pallas-loop",
                      {"save-free-energy-history": True})
    assert not eng.use_loop_kernel
    # double precision (Mosaic is f32)
    eng = make_engine(64, "pallas-loop", {"dtype": "double"})
    assert not eng.use_loop_kernel
    # nonlinear model (no fixed design) -> no stats route
    opts = RunOptions({"model": "exp", "dt": "0.05", "noise": "white",
                       "max-iterations": "10", "dtype": "single",
                       "engine-kernel": "pallas-loop"})
    rng = np.random.default_rng(0)
    data = np.exp(-np.arange(30) * 0.05)[None, :] \
        + rng.normal(0, 0.05, (64, 30))
    coords = np.stack([np.arange(64), np.zeros(64), np.zeros(64)], 1)
    eng = VBInference(get_model_class("exp")(opts), opts,
                      data.astype(np.float32), coords)
    assert not eng.use_loop_kernel


def test_loop_kernel_maxits_zero_gated():
    """max-iterations=0: a zero-trip kernel would emit an all-zero
    posterior (ADVICE r1). Two lines of defence: option validation
    rejects 0 outright, and the kernel eligibility gate requires >=1
    iterations even if a detector were constructed with 0."""
    from fabber_core_tpu.exceptions import InvalidOptionValue
    with pytest.raises(InvalidOptionValue):
        make_engine(64, "pallas-loop", {"max-iterations": "0"})
    eng = make_engine(64, "pallas-loop")
    eng.detector.max_iterations  # gate reads this attribute
    assert eng.use_loop_kernel  # eligible at maxits=10


def test_loop_kernel_programmatic_continue_forces_xla():
    """run(continue_means=...) must not be silently ignored by the
    kernel (which always starts from model defaults) (ADVICE r1)."""
    nv = 64
    base = make_engine(nv, "xla").run()
    cm = base.means + 0.5
    rx = make_engine(nv, "xla", {"max-iterations": "1"}).run(
        continue_means=cm, continue_cov=base.cov)
    eng = make_engine(nv, "pallas-loop", {"max-iterations": "1"})
    assert eng.use_loop_kernel
    rp = eng.run(continue_means=cm, continue_cov=base.cov)
    # the continuation itself took the XLA route, but the fast route is
    # restored for later fresh runs on the same engine
    assert eng.use_loop_kernel
    np.testing.assert_allclose(rx.means, rp.means, rtol=1e-6, atol=1e-7)


def test_loop_kernel_singular_voxel_jitter():
    """A degenerate voxel (constant-zero data, zero prior precision on
    the duplicate-column design) must degrade via the jitter retry the
    same way on both routes rather than NaN-ing in the kernel."""
    nv = 128
    rngdata = np.random.default_rng(3)
    nt = 30
    t = np.arange(1, nt + 1)
    data = (0.5 + 0.01 * t[None, :]
            + 0.05 * rngdata.standard_normal((nv, nt))).astype(np.float32)
    # voxel 0: all-zero data with a huge-variance prior -> the theta
    # precision can become near-singular at f32
    data[0] = 0.0
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)

    def build(mode):
        options = RunOptions({
            "model": "poly", "degree": "4", "noise": "white",
            "max-iterations": "10", "dtype": "single",
            "engine-kernel": mode})
        return VBInference(get_model_class("poly")(options), options,
                           data, coords)

    rx = build("xla").run()
    eng = build("pallas-loop")
    assert eng.use_loop_kernel
    rp = eng.run()
    np.testing.assert_array_equal(rx.bad_voxels, rp.bad_voxels)
    good = ~rx.bad_voxels
    sd = np.sqrt(np.diagonal(rx.cov, axis1=1, axis2=2))
    assert np.max(np.abs(rx.means - rp.means)[good] / sd[good]) < 5e-3
