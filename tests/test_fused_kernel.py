"""Fused Pallas VB iteration: interpret-mode equivalence with the XLA
engine, padding path, and gating."""

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


@pytest.mark.parametrize("nv", [256, 200])  # 200 exercises edge padding
def test_pallas_matches_xla_end_to_end(nv):
    rx = make_engine(nv, "xla").run()
    eng = make_engine(nv, "pallas")
    assert eng.use_fused
    rp = eng.run()
    np.testing.assert_allclose(rx.means, rp.means, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(rx.free_energy, rp.free_energy,
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(rx.noise_means, rp.noise_means, rtol=1e-3)
    np.testing.assert_array_equal(rx.iterations, rp.iterations)


def test_gating():
    # LM detector is not kernel-eligible
    eng = make_engine(64, "pallas", {"convergence": "lm"})
    assert not eng.use_fused
    # masked timepoints are not kernel-eligible
    eng = make_engine(64, "pallas", {"convergence": "trialmode", "mt1": "2"})
    assert not eng.use_fused
    # multi-group noise patterns are not kernel-eligible
    eng = make_engine(64, "pallas", {"noise-pattern": "12"})
    assert not eng.use_fused
    # on CPU, auto mode stays on the XLA route
    eng = make_engine(64, "auto")
    assert not eng.use_fused
