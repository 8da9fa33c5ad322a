"""AR(1) whole-loop Pallas kernel (ops/fused_loop_ar.py):
interpret-mode equivalence with the XLA stats route + eligibility.

Every case is pinned against the XLA sufficient-statistics route
(noise/ar1.py update_theta_stats/update_noise_stats — the same
arithmetic, so tolerances are float32 roundoff), which itself is
oracle-pinned in tests/test_ar1.py."""

import numpy as np
import pytest

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def make_engine(nv, mode, extra=None, seed=0, nt=30, degree=1):
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1)
    c0 = rng.uniform(-1, 1, (nv, 1))
    c1 = rng.uniform(-0.05, 0.05, (nv, 1))
    # AR(1)-correlated noise so the alpha posterior is informative
    e = rng.standard_normal((nv, nt))
    for k in range(1, nt):
        e[:, k] += 0.4 * e[:, k - 1]
    data = (c0 + c1 * t[None, :] + 0.1 * e).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    opts = {"model": "poly", "degree": str(degree), "noise": "ar",
            "num-echoes": "1", "max-iterations": "10", "dtype": "single",
            "engine-kernel": mode, "print-free-energy": True}
    opts.update(extra or {})
    options = RunOptions(opts)
    return VBInference(get_model_class("poly")(options), options, data,
                       coords)


def assert_match(rx, rp):
    sd = np.sqrt(np.diagonal(rx.cov, axis1=1, axis2=2))
    assert np.max(np.abs(rx.means - rp.means) / sd) < 5e-3
    # f32 order-of-operations roundoff; the degree-2 design (t^2 up to
    # 900) pushes relative cov differences to ~4e-4
    np.testing.assert_allclose(rx.cov, rp.cov, rtol=8e-4, atol=1e-7)
    # noise MVN covers alphas + phi: alpha variances are O(1e4) at the
    # uninformative end, so compare on a relative scale with atol
    # atol 5e-6: near-zero alpha means inherit ~1e-5-scale absolute
    # f32 roundoff from the O(1e2) banded quadratics they come from
    np.testing.assert_allclose(rx.noise_means, rp.noise_means,
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(rx.noise_cov, rp.noise_cov,
                               rtol=5e-4, atol=5e-6)
    if rx.free_energy is not None:
        np.testing.assert_allclose(rx.free_energy, rp.free_energy,
                                   rtol=1e-4, atol=2e-3)
    np.testing.assert_array_equal(rx.iterations, rp.iterations)
    np.testing.assert_array_equal(rx.bad_voxels, rp.bad_voxels)


@pytest.mark.parametrize("nv", [256, 200])  # 200 exercises edge padding
def test_ar_loop_kernel_matches_xla_stats(nv):
    rx = make_engine(nv, "xla").run()
    eng = make_engine(nv, "pallas-loop")
    assert eng.use_loop_kernel and eng.loop_interpret
    assert_match(rx, eng.run())


@pytest.mark.parametrize("extra", [
    {"max-iterations": "3"},
    {"degree": "2"},
], ids=["short", "p3"])
def test_ar_loop_kernel_cases(extra):
    deg = extra.pop("degree", None)
    kw = {"degree": int(deg)} if deg else {}
    rx = make_engine(128, "xla", extra, **kw).run()
    eng = make_engine(128, "pallas-loop", extra, **kw)
    assert eng.use_loop_kernel
    assert_match(rx, eng.run())


def test_ar_loop_kernel_alpha_recovery():
    """The kernel's alpha posterior tracks the injected AR coefficient
    (sanity beyond route equivalence)."""
    eng = make_engine(512, "pallas-loop", {"max-iterations": "15"})
    assert eng.use_loop_kernel
    res = eng.run()
    # noise MVN layout: alphas first — mean alpha_1 near 0.4
    a1 = float(res.noise_means[:, 0].mean())
    assert 0.25 < a1 < 0.55, a1


@pytest.mark.parametrize("extra", [
    {"num-echoes": "2", "ar1-cross-terms": "dual"},
    {"num-echoes": "2", "ar1-cross-terms": "same"},
], ids=["cross-dual", "cross-same"])
def test_ar_loop_kernel_ineligible_falls_back(extra):
    """Cross-term configs (coupled alpha MVN) take the XLA stats
    route; plain multi-echo is kernel-eligible since r5."""
    eng = make_engine(128, "pallas-loop", extra, nt=30)
    assert not eng.use_loop_kernel
    res = eng.run()
    assert res.bad_voxels.sum() == 0


@pytest.mark.parametrize("det", ["pointzeroone", "freduce"])
def test_ar_loop_kernel_fdet(det):
    """In-kernel detector state machines on the AR(1) loop kernel:
    iteration counts match the XLA route's batched machines except on
    lanes whose |dF| sits exactly at the 0.01 threshold (the kernel's
    in-loop ELBO and the XLA F differ at f32 roundoff — a
    near-threshold lane may flip one decision); posterior/F match at
    stats tolerance (F is recomputed at the final state in both
    routes)."""
    extra = {"convergence": det, "max-iterations": "20"}
    rx = make_engine(200, "xla", dict(extra)).run()
    eng = make_engine(200, "pallas-loop", dict(extra))
    assert eng.use_loop_kernel and eng.ar_loop_fdet == det
    rp = eng.run()
    diff = np.abs(rx.iterations - rp.iterations)
    assert diff.max() <= 1 and (diff != 0).mean() < 0.02, diff
    # flipped lanes stopped at a different iteration's state (both
    # valid under the detector's semantics): compare the rest tightly
    same = rx.iterations == rp.iterations

    def cut(r):
        return r._replace(
            means=r.means[same], cov=r.cov[same],
            noise_means=r.noise_means[same], noise_cov=r.noise_cov[same],
            free_energy=None if r.free_energy is None
            else r.free_energy[same],
            iterations=r.iterations[same], bad_voxels=r.bad_voxels[same])

    assert_match(cut(rx), cut(rp))


def test_ar_loop_kernel_fdet_short_cap():
    """Cap smaller than natural convergence: lanes freeze at the cap
    with identical counts."""
    extra = {"convergence": "pointzeroone", "max-iterations": "3"}
    rx = make_engine(128, "xla", dict(extra)).run()
    eng = make_engine(128, "pallas-loop", dict(extra))
    assert eng.ar_loop_fdet == "pointzeroone"
    rp = eng.run()
    np.testing.assert_array_equal(rx.iterations, rp.iterations)
    assert_match(rx, rp)


def test_ar2_loop_kernel_matches_xla():
    """2-echo interleaved AR(1), no cross terms: two independent AR
    chains — the kernel's nq=2 generalization vs the XLA stats
    route."""
    extra = {"num-echoes": "2"}
    rx = make_engine(200, "xla", dict(extra)).run()
    eng = make_engine(200, "pallas-loop", dict(extra))
    assert eng.use_loop_kernel and eng.loop_interpret
    assert_match(rx, eng.run())


def test_ar2_loop_kernel_p2():
    """P=3 tri indexing under nq=2. The raw degree-2 design (t^2 to
    900) is ill-conditioned in f32: BOTH routes sit ~0.02 absolute
    from the f64 reference on the near-zero alpha means (measured;
    the kernel marginally closer on average), so route-vs-route noise
    agreement here is bounded by 2x that, not by the well-conditioned
    cases' 5e-6."""
    extra = {"num-echoes": "2", "degree": "2"}
    rx = make_engine(128, "xla", dict(extra)).run()
    eng = make_engine(128, "pallas-loop", dict(extra))
    assert eng.use_loop_kernel
    rp = eng.run()
    sd = np.sqrt(np.diagonal(rx.cov, axis1=1, axis2=2))
    assert np.max(np.abs(rx.means - rp.means) / sd) < 5e-3
    np.testing.assert_allclose(rx.noise_means, rp.noise_means,
                               rtol=5e-2, atol=5e-4)


@pytest.mark.parametrize("det", ["pointzeroone", "freduce"])
def test_ar2_loop_kernel_fdet(det):
    extra = {"num-echoes": "2", "convergence": det,
             "max-iterations": "20"}
    rx = make_engine(200, "xla", dict(extra)).run()
    eng = make_engine(200, "pallas-loop", dict(extra))
    assert eng.use_loop_kernel and eng.ar_loop_fdet == det
    rp = eng.run()
    diff = np.abs(rx.iterations - rp.iterations)
    assert diff.max() <= 1 and (diff != 0).mean() < 0.02, diff
    same = rx.iterations == rp.iterations

    def cut(r):
        return r._replace(
            means=r.means[same], cov=r.cov[same],
            noise_means=r.noise_means[same], noise_cov=r.noise_cov[same],
            free_energy=None if r.free_energy is None
            else r.free_energy[same],
            iterations=r.iterations[same], bad_voxels=r.bad_voxels[same])

    assert_match(cut(rx), cut(rp))
