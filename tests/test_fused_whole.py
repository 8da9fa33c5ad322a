"""Whole-PROGRAM Pallas kernel (ops/fused_whole.py): interpret-mode
equivalence with the XLA stats route. In-kernel sufficient statistics
differ from noise/white.py make_design_stats only in summation order
and the OLS reference point's host-f64 inverse (m0 is a reference
point — any finite value is correct), so tolerances are f32 roundoff
at the problem's conditioning, same scale as tests/test_fused_loop.py.
"""

import numpy as np
import pytest

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions

from test_fused_loop import make_engine, assert_match


@pytest.mark.parametrize("nv", [256, 200])  # 200 exercises edge padding
def test_whole_kernel_matches_xla_stats(nv):
    rx = make_engine(nv, "xla").run()
    eng = make_engine(nv, "pallas-whole")
    assert eng.use_whole_kernel and eng.whole_interpret
    assert "whole-program" in eng.route_description()
    assert_match(rx, eng.run())


@pytest.mark.parametrize("extra", [
    # multi-group noise pattern: the whole-program kernel serves it
    # in-kernel (the spectral route is single-group only)
    {"noise-pattern": "12"},
    {"noise-pattern": "121"},
    {"mt1": "3", "mt2": "17"},
    {"locked-noise-stdev": "0.1"},
    {"max-iterations": "3"},
    {"degree": "0"},  # P=1
], ids=["pattern2", "pattern3", "masked", "locked-sd", "short", "p1"])
def test_whole_kernel_extended_cases(extra):
    degree = int(extra.pop("degree", 2))
    rx = make_engine(128, "xla", dict(extra), degree=degree).run()
    eng = make_engine(128, "pallas-whole", dict(extra), degree=degree)
    assert eng.use_whole_kernel
    assert_match(rx, eng.run())


def test_whole_kernel_image_prior():
    """Voxelwise prior means thread through bind.prior_base_means."""
    nv = 128
    img = np.linspace(-0.5, 0.5, nv).astype(np.float32)

    def build(mode):
        return make_engine(nv, mode, {"PSP_byname1": "c0",
                                      "PSP_byname1_type": "I",
                                      "PSP_byname1_image": "prior_img"},
                           voxel_data_getter=lambda key: img)

    rx = build("xla").run()
    eng = build("pallas-whole")
    assert eng.use_whole_kernel
    assert_match(rx, eng.run())


def test_whole_kernel_nonpadded_time():
    """nt not a multiple of the slab height: edge-padded data rows ride
    zero weights."""
    rx = make_engine(128, "xla", nt=29).run()
    eng = make_engine(128, "pallas-whole", nt=29)
    assert eng.use_whole_kernel
    assert_match(rx, eng.run())


def test_whole_kernel_streamed_windows():
    """Composes with in-program chunk streaming bit-identically."""
    extra = {"voxel-chunk-size": "64"}
    eng_s = make_engine(200, "pallas-whole", dict(extra))
    assert eng_s.use_whole_kernel
    rs = eng_s.run()
    rh = make_engine(200, "pallas-whole",
                     {**extra, "chunk-streaming": "off"}).run()
    np.testing.assert_array_equal(rs.means, rh.means)
    np.testing.assert_array_equal(rs.cov, rh.cov)
    np.testing.assert_array_equal(rs.noise_means, rh.noise_means)


def test_whole_kernel_gating():
    """Ineligible configurations must fall back."""
    # nonlinear model (no fixed design)
    opts = RunOptions({"model": "exp", "dt": "0.05", "noise": "white",
                       "max-iterations": "10", "dtype": "single",
                       "engine-kernel": "pallas-whole"})
    rng = np.random.default_rng(0)
    data = np.exp(-np.arange(30) * 0.05)[None, :] \
        + rng.normal(0, 0.05, (64, 30))
    coords = np.stack([np.arange(64), np.zeros(64), np.zeros(64)], 1)
    eng = VBInference(get_model_class("exp")(opts), opts,
                      data.astype(np.float32), coords)
    assert not getattr(eng, "use_whole_kernel", False)
    # double precision
    eng = make_engine(64, "pallas-whole", {"dtype": "double"})
    assert not eng.use_whole_kernel
    # ARD prior -> iteration-dependent prior precision
    eng = make_engine(64, "pallas-whole", {"PSP_byname1": "c0",
                                           "PSP_byname1_type": "A"})
    assert not eng.use_whole_kernel


@pytest.mark.parametrize("det", ["pointzeroone", "trialmode", "lm"])
def test_whole_kernel_in_kernel_detectors(det):
    """pointzeroone / trialmode / lm run their batched state machines
    IN-KERNEL (the very .test the XLA engine runs, on kernel planes)
    with the save/revert protocol on VMEM-resident best copies — lm's
    first fast tier anywhere. Near-threshold |dF| may flip a lane's
    stopping decision between the two independent F assemblies."""
    extra = {"convergence": det, "max-iterations": "15"}
    rx = make_engine(256, "xla", dict(extra), seed=2).run()
    eng = make_engine(256, "pallas-whole", dict(extra), seed=2)
    assert eng.use_whole_kernel and eng.whole_fdet == det
    assert det in eng.route_description()
    rp = eng.run()

    flip = rx.iterations != rp.iterations
    assert flip.sum() <= 3, (det, flip.sum())
    ok = ~flip
    sd = np.sqrt(np.diagonal(rx.cov[ok], axis1=1, axis2=2))
    assert np.max(np.abs(rx.means[ok] - rp.means[ok])
                  / np.maximum(sd, 1e-6)) < 5e-3
    np.testing.assert_allclose(rx.noise_means[ok], rp.noise_means[ok],
                               rtol=2e-3)
    np.testing.assert_allclose(rx.free_energy[ok], rp.free_energy[ok],
                               rtol=1e-4, atol=2e-3)
    # early stopping actually exercised (the fixed-design fit
    # converges near-uniformly, so counts may legitimately agree
    # across lanes)
    assert rx.iterations.max() < eng.max_iter_cap
    assert rx.iterations.max() < 15


def test_whole_kernel_lm_multigroup():
    """LM + a 2-group noise pattern: no other fast tier serves this."""
    extra = {"convergence": "lm", "max-iterations": "15",
             "noise-pattern": "12"}
    rx = make_engine(128, "xla", dict(extra), seed=1).run()
    eng = make_engine(128, "pallas-whole", dict(extra), seed=1)
    assert eng.use_whole_kernel and eng.whole_fdet == "lm"
    rp = eng.run()
    flip = rx.iterations != rp.iterations
    assert flip.sum() <= 2
    ok = ~flip
    sd = np.sqrt(np.diagonal(rx.cov[ok], axis1=1, axis2=2))
    assert np.max(np.abs(rx.means[ok] - rp.means[ok])
                  / np.maximum(sd, 1e-6)) < 5e-3


def test_whole_kernel_freduce_not_served():
    """freduce's revert target is the engine-side initial posterior:
    gated off the whole-program kernel (falls back to the spectral /
    XLA routes)."""
    eng = make_engine(64, "pallas-whole", {"convergence": "freduce"})
    assert not eng.use_whole_kernel
