"""Prior-family tests (the reference's test_priors.cc + test_vb.cc
territory): image priors, ARD, PSP_byname overrides, precision clamps."""

import numpy as np
import pytest

from fabber_core_tpu.api import FabberTpu
from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions

import oracle


def const_data(nv=12, nt=10, value=5.0, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    data = value + rng.normal(0, noise, (nv, nt))
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    return data, coords


class TestImagePrior:
    def test_image_prior_pulls_posterior(self):
        """VB with a per-voxel image prior: strong precision keeps the
        posterior at the image value (test_vb.cc image prior tests)."""
        nv = 10
        data, coords = const_data(nv=nv, value=5.0, noise=0.5)
        img = np.linspace(2.0, 8.0, nv)

        opts = RunOptions({
            "model": "poly", "degree": "0", "noise": "white",
            "max-iterations": "10",
            "PSP_byname1": "c0", "PSP_byname1_type": "I",
            "PSP_byname1_prec": "1e6"})
        eng = VBInference(get_model_class("poly")(opts), opts, data, coords,
                          voxel_data_getter=lambda key: img)
        res = eng.run()
        # prior precision 1e6 >> data information: posterior ~ image
        np.testing.assert_allclose(res.means[:, 0], img, atol=0.05)

    def test_image_prior_initializes_posterior(self):
        nv = 6
        data, coords = const_data(nv=nv)
        img = np.arange(nv, dtype=float) + 1.0
        opts = RunOptions({
            "model": "poly", "degree": "0", "noise": "white",
            "max-iterations": "10",
            "PSP_byname1": "c0", "PSP_byname1_type": "I",
            "PSP_byname1_prec": "1e-6"})
        eng = VBInference(get_model_class("poly")(opts), opts, data, coords,
                          voxel_data_getter=lambda key: img)
        means, _, _ = eng.initial_posterior()
        # posterior init means come from the image (fwdmodel.cc:292-299)
        np.testing.assert_allclose(np.asarray(means)[0], img)

    def test_precision_too_high_clamped(self):
        """Precision > 1e12 is clamped (fwdmodel.cc:268-271), keeping
        the run numerically healthy (test_vb.cc:118 scenario)."""
        data, coords = const_data()
        opts = RunOptions({
            "model": "poly", "degree": "0", "noise": "white",
            "max-iterations": "5",
            "PSP_byname1": "c0", "PSP_byname1_mean": "5.0",
            "PSP_byname1_prec": "1e20"})
        eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
        assert eng.params[0].prior.prec == pytest.approx(1e12)
        res = eng.run()
        assert not res.bad_voxels.any()
        np.testing.assert_allclose(res.means[:, 0], 5.0, atol=1e-3)


class TestPspByName:
    def test_mean_prec_override(self):
        data, coords = const_data()
        opts = RunOptions({
            "model": "poly", "degree": "1", "noise": "white",
            "max-iterations": "5",
            "PSP_byname1": "c1", "PSP_byname1_mean": "0.5",
            "PSP_byname1_prec": "100.0"})
        eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
        # override matched by name: c1 is index 1
        assert eng.params[1].prior.mean == 0.5
        assert eng.params[1].prior.prec == pytest.approx(100.0)
        # c0 untouched
        assert eng.params[0].prior.prec == pytest.approx(1e-12)

    def test_transform_override(self):
        """Override the exp model's amp transform from log to softplus;
        the model-space recovery must be unchanged."""
        rng = np.random.default_rng(7)
        nv, nt, dt = 12, 60, 0.05
        t = np.arange(nt) * dt
        data = 2.0 * np.exp(-1.0 * t)[None, :] \
            + rng.normal(0, 0.05, (nv, nt))
        coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
        opts = RunOptions({
            "model": "exp", "dt": str(dt), "noise": "white",
            "convergence": "trialmode", "max-iterations": "30",
            "PSP_byname1": "amp1", "PSP_byname1_transform": "S"})
        eng = VBInference(get_model_class("exp")(opts), opts, data, coords)
        from fabber_core_tpu.core.transforms import (TRANSFORM_SOFTPLUS,
                                                     TRANSFORM_LOG)
        assert eng.params[0].transform is TRANSFORM_SOFTPLUS
        assert eng.params[1].transform is TRANSFORM_LOG
        res = eng.run()
        amp = np.log1p(np.exp(res.means[:, 0]))  # softplus to model space
        np.testing.assert_allclose(amp, 2.0, atol=0.1)


class TestArdPrior:
    def test_ard_suppresses_unsupported_parameter(self):
        """ARD prior on a parameter with no data support shrinks it
        toward zero (Chappell 2009 App D behavior)."""
        rng = np.random.default_rng(3)
        nv, nt = 20, 40
        t = np.arange(1, nt + 1)
        # pure constant signal: c1 (slope) has no real support
        data = 3.0 + rng.normal(0, 0.3, (nv, nt))
        coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)

        def run(prior_types):
            opts = RunOptions({
                "model": "poly", "degree": "1", "noise": "white",
                "max-iterations": "20",
                "param-spatial-priors": prior_types})
            eng = VBInference(get_model_class("poly")(opts), opts, data,
                              coords)
            return eng.run()

        res_ard = run("NA")   # ARD on c1
        res_norm = run("NN")
        # ARD shrinks the spurious slope harder than the normal prior
        assert np.abs(res_ard.means[:, 1]).mean() \
            <= np.abs(res_norm.means[:, 1]).mean() + 1e-12
        assert np.abs(res_ard.means[:, 1]).max() < 0.02
        assert not res_ard.bad_voxels.any()

    def test_ard_oracle_first_iterations(self):
        """ARD prior variance = m^2 + sigma^2 from iteration 1 on
        (priors.cc:150-181): verify against a hand-stepped oracle."""
        rng = np.random.default_rng(4)
        nv, nt = 3, 8
        t = np.arange(1, nt + 1)
        data = 2.0 + 0.5 * t[None, :] + rng.normal(0, 0.2, (nv, nt))
        coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
        opts = RunOptions({
            "model": "poly", "degree": "1", "noise": "white",
            "max-iterations": "4", "param-spatial-priors": "NA",
            "save-free-energy": True})
        eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
        res = eng.run()

        design = t[:, None] ** np.arange(2)[None, :]
        for v in range(nv):
            # oracle with manual ARD prior update per iteration
            m = np.zeros(2)
            cov = np.eye(2) * 1e12
            phi_b, phi_c = 1e-8, 50.0
            centre = m.copy()
            offset = design @ centre
            for it in range(4):
                prior_prec = np.array([1e-12, 0.0])
                if it == 0:
                    prior_prec[1] = 1e-12  # model default on iter 0
                else:
                    prior_prec[1] = 1.0 / (m[1] ** 2 + cov[1, 1])
                x = phi_b * phi_c
                prec = np.diag(prior_prec) + x * design.T @ design
                cov = np.linalg.inv(prec)
                m = cov @ (x * design.T @ (data[v] - offset + design @ centre)
                           + prior_prec * np.zeros(2))
                k = data[v] - offset + design @ (centre - m)
                tmp = k @ k + np.trace(cov @ design.T @ design)
                phi_b = 1.0 / (tmp * 0.5 + 1e-6)
                phi_c = (nt - 1) * 0.5 + 1e-6
                centre = m.copy()
                offset = design @ centre
            np.testing.assert_allclose(res.means[v], m, rtol=1e-8)
