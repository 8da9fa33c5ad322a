"""Sufficient-statistics fixed-design route vs the direct route.

With a constant Jacobian the linearization offset cancels exactly in
every VB update, so the whole fixed point is a function of one-time
data reductions (noise/white.py DesignStats). These tests pin the two
routes to each other across noise patterns, masked timepoints, LM
damping and free-energy outputs — they must stay numerically
interchangeable.
"""

import numpy as np
import pytest

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def make_engine(route, extra=None, nv=97, nt=40, seed=3, dtype="double"):
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1, dtype=float)
    c0 = rng.uniform(-1, 1, nv)
    c1 = rng.uniform(-0.05, 0.05, nv)
    data = (c0[:, None] + c1[:, None] * t[None, :]
            + rng.normal(0, 0.2, (nv, nt)))
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    opts = {"model": "poly", "degree": "1", "noise": "white",
            "convergence": "trialmode", "max-iterations": "12",
            "dtype": dtype, "save-free-energy": True,
            "fixed-design-route": route}
    opts.update(extra or {})
    options = RunOptions(opts)
    eng = VBInference(get_model_class("poly")(options), options, data,
                      coords)
    return eng


CASES = [
    ("plain", {}),
    ("two-group-pattern", {"noise-pattern": "12"}),
    ("masked-tpoints", {"mt1": "3", "mt2": "17"}),
    ("lm-detector", {"convergence": "lm"}),
    ("maxits-no-f", {"convergence": "maxits", "save-free-energy": False}),
]


@pytest.mark.parametrize("name,extra", CASES, ids=[c[0] for c in CASES])
def test_stats_matches_direct(name, extra):
    ed = make_engine("direct", extra)
    es = make_engine("stats", extra)
    assert ed.design is not None and not ed.use_stats
    assert es.use_stats
    rd = ed.run()
    rs = es.run()
    np.testing.assert_allclose(rd.means, rs.means, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(rd.cov, rs.cov, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(rd.noise_means, rs.noise_means, rtol=1e-9)
    if rd.free_energy is not None:
        np.testing.assert_allclose(rd.free_energy, rs.free_energy,
                                   rtol=1e-9, atol=1e-8)
    np.testing.assert_array_equal(rd.iterations, rs.iterations)


def test_stats_float32_tight_fit():
    """The m0-centred statistics must survive float32 even when the
    fit is tight (raw y'Qy expansion would cancel catastrophically:
    here y'y ~ 1e4 while k'k ~ 1e-2 per voxel)."""
    extra = {"convergence": "trialmode"}
    ed = make_engine("direct", extra, nt=106, seed=7, dtype="single")
    es = make_engine("stats", extra, nt=106, seed=7, dtype="single")
    # tiny residuals: rebuild data with small noise around a steep line
    rng = np.random.default_rng(11)
    nv, nt = 97, 106
    t = np.arange(1, nt + 1, dtype=float)
    data = (5.0 + 0.9 * t[None, :]
            + rng.normal(0, 0.01, (nv, nt))).astype(np.float32)
    for e in (ed, es):
        import jax.numpy as jnp
        e.data = jnp.asarray(data, e.dtype).T
    rd, rs = ed.run(), es.run()
    np.testing.assert_allclose(rd.means, rs.means, rtol=5e-4, atol=1e-5)
    # noise std recovered to a few percent on both routes
    sd_d = 1.0 / np.sqrt(rd.noise_means[:, 0])
    sd_s = 1.0 / np.sqrt(rs.noise_means[:, 0])
    np.testing.assert_allclose(sd_s, 0.01, rtol=0.3)
    np.testing.assert_allclose(sd_d, sd_s, rtol=0.02)


def test_gating():
    # option off -> direct route
    assert not make_engine("direct").use_stats
    # AR noise: stats route engages; forcing direct must fall back to
    # the generic Jacobian path (AR has no direct design route)
    ar = {"noise": "ar", "num-echoes": "1", "convergence": "maxits",
          "save-free-energy": False}
    eng = make_engine("stats", ar)
    assert eng.use_stats and eng.design is not None
    eng = make_engine("direct", ar)
    assert not eng.use_stats and eng.design is None


@pytest.mark.parametrize("extra", [
    {"noise": "ar", "num-echoes": "1"},
    {"noise": "ar", "num-echoes": "2"},
    {"noise": "ar", "num-echoes": "2", "ar1-cross-terms": "dual"},
], ids=["1echo", "2echo", "2echo-dual"])
def test_ar1_stats_matches_generic(extra):
    """AR(1) sufficient-statistics route vs the generic banded route."""
    base = {"convergence": "maxits", "save-free-energy": True}
    rd = make_engine("direct", {**base, **extra}).run()  # generic jac
    es = make_engine("stats", {**base, **extra})
    assert es.use_stats
    rs = es.run()
    np.testing.assert_allclose(rd.means, rs.means, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(rd.cov, rs.cov, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(rd.noise_means, rs.noise_means,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(rd.free_energy, rs.free_energy,
                               rtol=1e-9, atol=1e-8)
