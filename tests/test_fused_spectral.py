"""Whole-program spectral Pallas kernel (ops/fused_spectral.py):
interpret-mode equivalence with the XLA routes. The fixed point is the
identical algebra of ops/spectral.py; the in-kernel sufficient
statistics differ from noise/white.py make_design_stats only in
summation order and the OLS reference point's in-kernel solve (m0 is a
reference point — any finite value is correct), so tolerances are f32
roundoff at the problem's conditioning, same scale as
tests/test_fused_whole.py.
"""

import numpy as np
import pytest

from test_fused_loop import make_engine as _make_engine, assert_match
import os
import pytest


@pytest.fixture(params=["xstats", "split", "fused"])
def impl(request, monkeypatch):
    """Both kernel forms (MXU-stats split and one-kernel fused) run
    every equivalence case."""
    monkeypatch.setenv("FABBER_SPECTRAL_IMPL", request.param)
    return request.param


def make_engine(*a, **k):
    return _make_engine(*a, **k)


@pytest.mark.parametrize("nv", [256, 200])  # 200 exercises edge padding
def test_spectral_whole_matches_xla_stats(nv, impl):
    rx = make_engine(nv, "xla").run()
    eng = make_engine(nv, "spectral-whole")
    assert eng.use_spectral_whole and eng.sw_interpret
    assert "whole-program spectral" in eng.route_description()
    assert_match(rx, eng.run())


def test_spectral_whole_matches_xla_spectral(impl):
    """Bit-comparable fixed point vs the XLA eigenbasis route (same
    algebra; only the statistics' summation order differs)."""
    rs = make_engine(256, "spectral").run()
    eng = make_engine(256, "spectral-whole")
    assert eng.use_spectral_whole
    assert_match(rs, eng.run())


@pytest.mark.parametrize("extra", [
    {"max-iterations": "3"},
    {"max-iterations": "1"},
    {"degree": "0"},  # P=1
    {"mt1": "3", "mt2": "17"},  # masked timepoints
], ids=["short", "single-iter", "p1", "masked"])
def test_spectral_whole_extended_cases(extra, impl):
    degree = int(extra.pop("degree", 2))
    rx = make_engine(128, "xla", dict(extra), degree=degree).run()
    eng = make_engine(128, "spectral-whole", dict(extra), degree=degree)
    assert eng.use_spectral_whole
    assert_match(rx, eng.run())


def test_spectral_whole_image_prior(impl):
    """Voxelwise prior means thread through bind.prior_base_means."""
    nv = 128
    img = np.linspace(-0.5, 0.5, nv).astype(np.float32)

    def build(mode):
        return make_engine(nv, mode, {"PSP_byname1": "c0",
                                      "PSP_byname1_type": "I",
                                      "PSP_byname1_image": "prior_img"},
                           voxel_data_getter=lambda key: img)

    rx = build("xla").run()
    eng = build("spectral-whole")
    assert eng.use_spectral_whole
    assert_match(rx, eng.run())


def test_spectral_whole_nonpadded_time(impl):
    """No time padding anywhere: any T works (the fold is a free
    contiguous reshape)."""
    rx = make_engine(128, "xla", nt=29).run()
    eng = make_engine(128, "spectral-whole", nt=29)
    assert eng.use_spectral_whole
    assert_match(rx, eng.run())


@pytest.mark.parametrize("det", ["pointzeroone", "trialmode", "freduce"])
def test_spectral_whole_fdet(det, impl):
    """In-kernel detector state machines: iteration counts match the
    XLA route's batched machines exactly; the posterior matches at
    stats tolerance."""
    extra = {"convergence": det, "max-iterations": "20"}
    rx = make_engine(200, "xla", dict(extra)).run()
    eng = make_engine(200, "spectral-whole", dict(extra))
    assert eng.use_spectral_whole
    assert eng.spectral_whole_fdet == det
    rp = eng.run()
    np.testing.assert_array_equal(rx.iterations, rp.iterations)
    assert_match(rx, rp)


@pytest.mark.parametrize("det", ["pointzeroone", "trialmode", "freduce"])
def test_spectral_whole_fdet_vs_spectral_fdet(det, impl):
    """Same save/revert protocol as the XLA spectral-fdet route."""
    extra = {"convergence": det, "max-iterations": "20"}
    rs = make_engine(200, "spectral", dict(extra)).run()
    eng = make_engine(200, "spectral-whole", dict(extra))
    assert eng.use_spectral_whole
    rp = eng.run()
    np.testing.assert_array_equal(rs.iterations, rp.iterations)
    assert_match(rs, rp)


def test_spectral_whole_streamed_windows(impl):
    """Composes with in-program chunk streaming. The kernel-statistics
    forms (split/fused) are BIT-identical across streaming modes
    (Mosaic codegen is context-independent per block); xstats computes
    its statistics with XLA matmuls whose tiling can differ between
    the scanned and standalone programs, so agreement there is
    f32-roundoff-level (posterior-sd scale)."""
    extra = {"voxel-chunk-size": "64"}
    eng_s = make_engine(200, "spectral-whole", dict(extra))
    assert eng_s.use_spectral_whole
    rs = eng_s.run()
    rh = make_engine(200, "spectral-whole",
                     {**extra, "chunk-streaming": "off"}).run()
    if impl == "xstats":
        sd = np.sqrt(np.diagonal(rh.cov, axis1=1, axis2=2))
        assert np.max(np.abs(rs.means - rh.means) / sd) < 1e-3
    else:
        np.testing.assert_array_equal(rs.means, rh.means)


def test_spectral_whole_windowed_stats(monkeypatch):
    """The in-program stats scan (vb._SPECTRAL_STATS_WINDOW bounds the
    [T,window] temporaries): agreement with the single-pass form is
    f32-roundoff-level (XLA picks its matmul K-blocking per window
    SHAPE, so same-shaped windows round identically — which is what
    the slid-overlap rewrite relies on — while window-vs-full may
    differ in the last bits)."""
    import fabber_core_tpu.inference.vb as vbmod
    eng1 = make_engine(200, "spectral-whole")
    r1 = eng1.run()
    monkeypatch.setattr(vbmod, "_SPECTRAL_STATS_WINDOW", 64)
    eng2 = make_engine(200, "spectral-whole")
    assert eng2.use_spectral_whole
    r2 = eng2.run()
    sd = np.sqrt(np.diagonal(r1.cov, axis1=1, axis2=2))
    assert np.max(np.abs(r1.means - r2.means) / sd) < 1e-3
    np.testing.assert_allclose(r1.noise_means, r2.noise_means,
                               rtol=1e-4)
