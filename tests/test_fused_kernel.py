"""Fused Pallas VB iteration: interpret-mode equivalence with the XLA
engine, padding path, and gating.

The v2 kernel processes TB=8 timepoints per step and supports noise
patterns (multiple phi groups), masked timepoints and LM damping via a
static [Tp,Q] group-indicator matrix; each case is pinned against the
XLA route here.
"""

import numpy as np
import pytest

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def make_engine(nv, mode, extra=None, seed=0, nt=24):
    rng = np.random.default_rng(seed)
    dt = 0.05
    t = np.arange(nt) * dt
    amp = rng.uniform(0.5, 2.0, nv)
    data = (amp[:, None] * np.exp(-t)[None, :]
            + rng.normal(0, 0.05, (nv, nt))).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    opts = {"model": "exp", "dt": str(dt), "noise": "white",
            "convergence": "trialmode", "max-iterations": "15",
            "dtype": "single", "engine-kernel": mode,
            "save-free-energy": True}
    opts.update(extra or {})
    options = RunOptions(opts)
    eng = VBInference(get_model_class("exp")(options), options, data, coords)
    return eng


def assert_match(rx, rp, mean_rtol=2e-4):
    np.testing.assert_allclose(rx.means, rp.means, rtol=mean_rtol, atol=1e-5)
    if rx.free_energy is not None:
        np.testing.assert_allclose(rx.free_energy, rp.free_energy,
                                   rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(rx.noise_means, rp.noise_means, rtol=2e-3)
    np.testing.assert_array_equal(rx.iterations, rp.iterations)


@pytest.mark.parametrize("nv", [256, 200])  # 200 exercises edge padding
def test_pallas_matches_xla_end_to_end(nv):
    rx = make_engine(nv, "xla").run()
    eng = make_engine(nv, "pallas")
    assert eng.use_fused
    rp = eng.run()
    assert_match(rx, rp)


# nt=25 also exercises the time-padding path (Tp=32)
@pytest.mark.parametrize("name,extra,nt", [
    ("two-group-pattern", {"noise-pattern": "12"}, 24),
    ("masked-tpoints", {"mt1": "3", "mt2": "17"}, 25),
    ("lm-detector", {"convergence": "lm"}, 25),
], ids=["pattern", "masked", "lm"])
def test_pallas_extended_cases(name, extra, nt):
    rx = make_engine(192, "xla", extra, nt=nt).run()
    eng = make_engine(192, "pallas", extra, nt=nt)
    assert eng.use_fused, name
    rp = eng.run()
    assert_match(rx, rp, mean_rtol=5e-4)


def test_gating():
    # f64 compute is not kernel-eligible (Mosaic has no f64)
    eng = make_engine(64, "pallas", {"dtype": "double"})
    assert not eng.use_fused
    # xla mode forces the generic route
    eng = make_engine(64, "xla")
    assert not eng.use_fused
    # on CPU, auto mode stays on the XLA route
    eng = make_engine(64, "auto")
    assert not eng.use_fused


def test_time_signal_jac_matches_autodiff():
    """Models' analytic time_signal_jac == jax.jacfwd of time_signal
    (the fused kernel trusts the analytic rows when present)."""
    import jax
    import jax.numpy as jnp
    from fabber_core_tpu.models import get_model_class
    from fabber_core_tpu.options import RunOptions

    cases = [
        ("biexp", {"model": "biexp", "dt": "0.03"}, [1.2, 0.9, 0.5, 4.0]),
        ("exp", {"model": "exp", "dt": "0.05"}, [1.0, 1.5]),
        ("poly", {"model": "poly", "degree": "2"}, [0.3, -0.1, 0.02]),
    ]
    t = jnp.arange(8, dtype=jnp.float64).reshape(8, 1)
    for name, opts, vals in cases:
        model = get_model_class(name)(RunOptions(opts))
        rows = [jnp.full((1, 5), v) for v in vals]

        sig_a, jac_a = model.time_signal_jac(rows, t)
        sig_ref = model.time_signal(rows, t)
        np.testing.assert_allclose(np.asarray(sig_a),
                                   np.asarray(sig_ref), rtol=1e-12)

        for i in range(len(vals)):
            def f(x, i=i):
                r = rows[:i] + [x] + rows[i + 1:]
                return model.time_signal(r, t)
            _, jrow = jax.jvp(f, (rows[i],), (jnp.ones_like(rows[i]),))
            np.testing.assert_allclose(
                np.broadcast_to(np.asarray(jac_a[i]), jrow.shape),
                np.asarray(jrow), rtol=1e-10, atol=1e-12,
                err_msg=f"{name} param {i}")
