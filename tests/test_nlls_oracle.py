"""NLLS engine pinned against the independent NumPy oracle
(tests/oracle_nlls.py): per-voxel final parameters, iteration counts,
and the posterior precision/covariance (J'J/mse with the 1e-6 floor,
inference_nlls.cc:175-192)."""

import numpy as np
import pytest

from fabber_core_tpu.inference.nlls import NLLSInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions

from oracle_nlls import nlls_voxel


@pytest.mark.parametrize("marquardt", [False, True],
                         ids=["levenberg", "marquardt"])
def test_nlls_matches_oracle(marquardt):
    rng = np.random.default_rng(3)
    nv, nt, dt = 12, 40, 0.05
    t = np.arange(nt) * dt
    amp = rng.uniform(0.6, 1.4, nv)
    r = rng.uniform(0.7, 1.3, nv)
    data = (amp[:, None] * np.exp(-r[:, None] * t[None, :])
            + rng.normal(0, 0.05, (nv, nt)))
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)

    opts = {"model": "exp", "dt": str(dt), "method": "nlls"}
    if marquardt:
        opts["lm"] = ""
    options = RunOptions(opts)
    eng = NLLSInference(get_model_class("exp")(options), options, data,
                        coords)
    res = eng.run()

    # engine starts every lane from the model's data-driven init
    latent0 = np.asarray(eng.initial_means()).T  # [V,P]
    for v in range(nv):
        o = nlls_voxel(data[v], t, latent0[v], marquardt=marquardt)
        np.testing.assert_allclose(res.means[v], o["params"],
                                   rtol=1e-7, atol=1e-8,
                                   err_msg=f"voxel {v} params")
        # near convergence, accept/reject flips on ~roundoff cost
        # differences between the engine's Cholesky solve and the
        # oracle's LU solve, so counts agree only approximately
        assert abs(int(res.iterations[v]) - o["iterations"]) <= 8, \
            f"voxel {v} its {res.iterations[v]} vs {o['iterations']}"
        np.testing.assert_allclose(res.cov[v], o["cov"],
                                   rtol=1e-6, atol=1e-12,
                                   err_msg=f"voxel {v} cov")
    assert not res.bad_voxels.any()
    # lanes genuinely differ in optimizer effort
    assert len(set(res.iterations.tolist())) > 1
