"""AR(1) noise model tests: engine vs dense-matrix oracle, AR noise
recovery, option validation."""

import numpy as np
import pytest

from fabber_core_tpu.exceptions import InvalidOptionValue
from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.noise.ar1 import Ar1NoiseModel
from fabber_core_tpu.options import RunOptions

import oracle_ar


def run_engine(data, opts_dict):
    nv = data.shape[0]
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    options = RunOptions(opts_dict)
    model = get_model_class(options.get_string("model"))(options)
    eng = VBInference(model, options, data, coords)
    return eng, eng.run()


def ar_data(nv, nt, alpha, noise_sd, seed, nphis=1):
    """Linear-trend signal + AR(1) noise (per echo when interleaved)."""
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1)
    c0 = rng.uniform(0.5, 1.5, nv)
    c1 = rng.uniform(-0.1, 0.1, nv)
    clean = c0[:, None] + c1[:, None] * t[None, :]
    noise = np.zeros((nv, nt))
    for v in range(nv):
        if nphis == 1:
            e = rng.normal(0, noise_sd, nt)
            for i in range(1, nt):
                e[i] += alpha * e[i - 1]
            noise[v] = e
        else:
            per = nt // nphis
            for q in range(nphis):
                e = rng.normal(0, noise_sd, per)
                for i in range(1, per):
                    e[i] += alpha * e[i - 1]
                noise[v, q::nphis] = e
    return clean + noise, c0, c1


class TestAr1Oracle:
    @pytest.mark.parametrize("nphis,ar1_type,nalphas", [
        (1, "none", 2), (2, "none", 2), (2, "same", 3), (2, "dual", 4)])
    def test_matches_dense_oracle(self, nphis, ar1_type, nalphas):
        nt = 20 * nphis
        data, _, _ = ar_data(5, nt, alpha=0.4, noise_sd=0.3, seed=0,
                             nphis=nphis)
        eng, res = run_engine(data, {
            "model": "poly", "degree": "1", "noise": "ar",
            "num-echoes": str(nphis), "ar1-cross-terms": ar1_type,
            "max-iterations": "5", "save-free-energy": True})

        t = np.arange(1, nt + 1, dtype=float)
        design = t[:, None] ** np.arange(2)[None, :]
        a = nalphas
        for v in range(data.shape[0]):
            ref = oracle_ar.ar_vb_voxel(
                data[v], design,
                prior_mean=np.zeros(2), prior_prec=np.full(2, 1e-12),
                niter=5, nphis=nphis, nalphas=nalphas, compute_f=True)
            np.testing.assert_allclose(res.means[v], ref["means"],
                                       rtol=1e-8, atol=1e-10)
            np.testing.assert_allclose(res.cov[v], ref["cov"],
                                       rtol=1e-7, atol=1e-12)
            # noise block: alphas then phis
            np.testing.assert_allclose(res.noise_means[v, :a],
                                       ref["alpha_means"], rtol=1e-7,
                                       atol=1e-10)
            np.testing.assert_allclose(
                res.noise_means[v, a:], ref["phi_b"] * ref["phi_c"],
                rtol=1e-7)
            np.testing.assert_allclose(res.free_energy[v], ref["F"],
                                       rtol=1e-8)


class TestAr1Behavior:
    def test_recovers_ar_coefficient(self):
        data, c0, c1 = ar_data(40, 120, alpha=0.5, noise_sd=0.2, seed=1)
        _, res = run_engine(data, {
            "model": "poly", "degree": "1", "noise": "ar",
            "num-echoes": "1", "max-iterations": "15"})
        # alpha_1 is the first noise parameter
        alpha_est = res.noise_means[:, 0]
        assert abs(alpha_est.mean() - 0.5) < 0.12
        np.testing.assert_allclose(res.means[:, 1], c1, atol=0.05)
        assert not res.bad_voxels.any()

    def test_option_validation(self):
        data = np.zeros((2, 12))
        with pytest.raises(InvalidOptionValue):
            run_engine(data, {"model": "poly", "degree": "1", "noise": "ar",
                              "num-echoes": "1", "ar1-cross-terms": "dual"})
        with pytest.raises(InvalidOptionValue):
            run_engine(data, {"model": "poly", "degree": "1", "noise": "ar",
                              "num-echoes": "3"})
        with pytest.raises(InvalidOptionValue):
            run_engine(data, {"model": "poly", "degree": "1", "noise": "ar",
                              "num-echoes": "2", "ar1-cross-terms": "bogus"})
        # masked timepoints unsupported
        with pytest.raises(InvalidOptionValue):
            run_engine(data, {"model": "poly", "degree": "1", "noise": "ar",
                              "num-echoes": "1", "mt1": "3"})

    def test_mvn_roundtrip(self):
        opts = RunOptions({"num-echoes": "2", "ar1-cross-terms": "dual"})
        nm = Ar1NoiseModel(opts, nt=16)
        _, post = nm.initial_state(6, np.float64)
        means, cov = nm.state_to_mvn(post)
        assert means.shape == (6, 6)  # 4 alphas + 2 phis
        back = nm.state_from_mvn(means, cov)
        np.testing.assert_allclose(np.asarray(back.b), np.asarray(post.b),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(back.alpha_means),
                                   np.asarray(post.alpha_means), atol=1e-12)
