"""Engine-vs-oracle and recovery tests for the batched VB engine."""

import numpy as np
import pytest

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions

import oracle


def make_poly_data(nv=12, nt=20, noise_std=0.5, seed=0, degree=2):
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1)
    coeffs = rng.uniform(-2, 2, size=(nv, degree + 1))
    clean = sum(coeffs[:, [i]] * t[None, :] ** i for i in range(degree + 1))
    data = clean + rng.normal(0, noise_std, size=(nv, nt))
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], axis=1)
    return data, coords, coeffs


def run_engine(data, coords, opts_dict):
    options = RunOptions(opts_dict)
    model = get_model_class(options.get_string("model"))(options)
    eng = VBInference(model, options, data, coords)
    return eng, eng.run()


class TestAgainstOracle:
    def test_poly_maxits_matches_oracle(self):
        nt, degree = 16, 2
        data, coords, _ = make_poly_data(nv=7, nt=nt, degree=degree, seed=1)
        eng, res = run_engine(data, coords, {
            "model": "poly", "degree": str(degree),
            "noise": "white", "max-iterations": "6",
            "save-free-energy": True,
        })

        t = np.arange(1, nt + 1, dtype=float)
        design = t[:, None] ** np.arange(degree + 1)[None, :]

        for v in range(data.shape[0]):
            ref = oracle.vb_voxel(
                eval_fn=lambda p: design @ p,
                jac_fn=lambda p: design,
                y=data[v],
                prior_mean=np.zeros(degree + 1),
                prior_prec=np.full(degree + 1, 1e-12),
                post_mean0=np.zeros(degree + 1),
                post_var0=np.full(degree + 1, 1e12),
                niter=6)
            np.testing.assert_allclose(res.means[v], ref["means"],
                                       rtol=1e-9, atol=1e-9)
            np.testing.assert_allclose(res.cov[v], ref["cov"],
                                       rtol=1e-8, atol=1e-12)
            np.testing.assert_allclose(res.noise_means[v],
                                       ref["phi_b"] * ref["phi_c"], rtol=1e-9)
            np.testing.assert_allclose(res.free_energy[v], ref["F"],
                                       rtol=1e-9)

    def test_fd_linearization_matches_auto_for_linear_model(self):
        data, coords, _ = make_poly_data(nv=5, nt=12, degree=1, seed=2)
        _, res_auto = run_engine(data, coords, {
            "model": "poly", "degree": "1", "noise": "white",
            "max-iterations": "4"})
        _, res_fd = run_engine(data, coords, {
            "model": "poly", "degree": "1", "noise": "white",
            "max-iterations": "4", "linearization": "fd"})
        np.testing.assert_allclose(res_auto.means, res_fd.means,
                                   rtol=1e-6, atol=1e-6)

    def test_masked_timepoints(self):
        nt, degree = 14, 1
        data, coords, _ = make_poly_data(nv=4, nt=nt, degree=degree, seed=3)
        eng, res = run_engine(data, coords, {
            "model": "poly", "degree": str(degree), "noise": "white",
            "max-iterations": "5", "mt1": "3", "mt2": "7",
            "save-free-energy": True})

        t = np.arange(1, nt + 1, dtype=float)
        design = t[:, None] ** np.arange(degree + 1)[None, :]
        qmask = np.ones((1, nt))
        qmask[0, 2] = 0  # mt=3, 1-indexed
        qmask[0, 6] = 0
        for v in range(data.shape[0]):
            ref = oracle.vb_voxel(
                eval_fn=lambda p: design @ p, jac_fn=lambda p: design,
                y=data[v], prior_mean=np.zeros(2),
                prior_prec=np.full(2, 1e-12),
                post_mean0=np.zeros(2), post_var0=np.full(2, 1e12),
                niter=5, qmasks=qmask)
            np.testing.assert_allclose(res.means[v], ref["means"], rtol=1e-9)
            np.testing.assert_allclose(res.free_energy[v], ref["F"], rtol=1e-9)

    def test_noise_pattern_two_groups(self):
        nt, degree = 12, 1
        data, coords, _ = make_poly_data(nv=3, nt=nt, degree=degree, seed=4)
        eng, res = run_engine(data, coords, {
            "model": "poly", "degree": str(degree), "noise": "white",
            "noise-pattern": "12", "max-iterations": "4",
            "save-free-energy": True})
        t = np.arange(1, nt + 1, dtype=float)
        design = t[:, None] ** np.arange(degree + 1)[None, :]
        qmasks = np.zeros((2, nt))
        qmasks[0, 0::2] = 1
        qmasks[1, 1::2] = 1
        for v in range(data.shape[0]):
            ref = oracle.vb_voxel(
                eval_fn=lambda p: design @ p, jac_fn=lambda p: design,
                y=data[v], prior_mean=np.zeros(2),
                prior_prec=np.full(2, 1e-12),
                post_mean0=np.zeros(2), post_var0=np.full(2, 1e12),
                niter=4, qmasks=qmasks)
            np.testing.assert_allclose(res.means[v], ref["means"], rtol=1e-9)
            np.testing.assert_allclose(
                res.noise_means[v], ref["phi_b"] * ref["phi_c"], rtol=1e-9)
            np.testing.assert_allclose(res.free_energy[v], ref["F"], rtol=1e-9)


class TestRecovery:
    def test_poly_parameter_recovery(self):
        data, coords, coeffs = make_poly_data(nv=30, nt=50, noise_std=0.1,
                                              seed=5)
        _, res = run_engine(data, coords, {
            "model": "poly", "degree": "2", "noise": "white",
            "max-iterations": "10"})
        # Estimation error scales with each coefficient's leverage:
        # the intercept c0 is the least constrained
        np.testing.assert_allclose(res.means[:, 0], coeffs[:, 0], atol=0.2)
        np.testing.assert_allclose(res.means[:, 1], coeffs[:, 1], atol=0.05)
        np.testing.assert_allclose(res.means[:, 2], coeffs[:, 2], atol=0.005)
        assert not res.bad_voxels.any()

    def test_exp_model_recovery(self):
        rng = np.random.default_rng(6)
        nt, nv, dt = 100, 20, 0.02
        t = np.arange(nt) * dt
        amp, rate = 1.0, 1.0
        clean = amp * np.exp(-rate * t)
        data = clean[None, :] + rng.normal(0, 0.1, size=(nv, nt))
        coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], axis=1)
        _, res = run_engine(data, coords, {
            "model": "exp", "dt": str(dt), "noise": "white",
            "convergence": "trialmode", "max-iterations": "50"})
        # latent space is log-transformed; recover model-space values
        amps = np.exp(res.means[:, 0])
        rates = np.exp(res.means[:, 1])
        assert abs(np.mean(amps) - amp) < 0.05
        assert abs(np.mean(rates) - rate) < 0.15

    def test_fchange_converges_before_maxits(self):
        data, coords, _ = make_poly_data(nv=10, nt=30, noise_std=0.01, seed=7)
        _, res = run_engine(data, coords, {
            "model": "poly", "degree": "2", "noise": "white",
            "convergence": "pointzeroone", "max-iterations": "30"})
        assert res.iterations.max() < 30
        assert not res.bad_voxels.any()
