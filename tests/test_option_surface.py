"""Tests for the less-common option surface: noise-initial dists,
locked linearization, NLLS file init, plus output-only golden parity
for the remaining reference output dirs."""

import os

import numpy as np
import pytest

from fabber_core_tpu.api import FabberTpu
from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.io import mvn as mvn_io
from fabber_core_tpu.io import nifti
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions

REF = "/root/reference/test"


def small_run_data(nv=6, nt=10, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1)
    data = 1.0 + 0.2 * t[None, :] + rng.normal(0, 0.1, (nv, nt))
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    return data, coords


class TestNoiseInitialDists:
    def test_noise_initial_posterior_from_file(self, tmp_path):
        data, coords = small_run_data()
        path = str(tmp_path / "noisepost.mat")
        # phi mean 4.0, var 2.0
        mvn_io.save_matrix([4.0], [[2.0]], path)
        opts = RunOptions({"model": "poly", "degree": "1", "noise": "white",
                           "max-iterations": "3",
                           "noise-initial-posterior": path})
        eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
        s0 = eng.initial_state()
        phi_mean = np.asarray(s0.post.noise.b * s0.post.noise.c)
        np.testing.assert_allclose(phi_mean, 4.0)

    def test_noise_initial_prior_from_file(self, tmp_path):
        data, coords = small_run_data()
        path = str(tmp_path / "noiseprior.mat")
        mvn_io.save_matrix([10.0], [[5.0]], path)
        opts = RunOptions({"model": "poly", "degree": "1", "noise": "white",
                           "max-iterations": "3",
                           "noise-initial-prior": path})
        eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
        eng.initial_state()
        prior_mean = np.asarray(eng.noise_prior.b * eng.noise_prior.c)
        np.testing.assert_allclose(prior_mean, 10.0)


class TestLockedLinear:
    def test_locked_centres_fix_linearization(self):
        rng = np.random.default_rng(1)
        nv, nt, dt = 8, 40, 0.05
        t = np.arange(nt) * dt
        data = np.exp(-t)[None, :] + rng.normal(0, 0.05, (nv, nt))
        coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)

        # centres locked at latent log(1.2), log(0.8)
        lmeans = np.tile(np.log([1.2, 0.8]), (nv, 1))
        lcov = np.tile(np.eye(2), (nv, 1, 1))
        mvn_data = mvn_io.pack(lmeans, lcov).T  # [V, rows]

        opts = RunOptions({"model": "exp", "dt": str(dt), "noise": "white",
                           "max-iterations": "4",
                           "locked-linear-from-mvn": "dummy"})
        eng = VBInference(get_model_class("exp")(opts), opts, data, coords,
                          voxel_data_getter=lambda key: mvn_data)
        assert eng.locked_linear
        np.testing.assert_allclose(np.asarray(eng._locked_centres).T, lmeans)
        res = eng.run()
        assert not res.bad_voxels.any()

        # unlocked run moves its linearization; results must differ
        opts2 = RunOptions({"model": "exp", "dt": str(dt), "noise": "white",
                            "max-iterations": "4"})
        eng2 = VBInference(get_model_class("exp")(opts2), opts2, data, coords)
        res2 = eng2.run()
        assert not np.allclose(res.means, res2.means)


class TestNllsFileInit:
    def test_fwd_initial_posterior(self, tmp_path):
        data, coords = small_run_data()
        path = str(tmp_path / "init.mat")
        mvn_io.save_matrix([5.0, 1.0], np.eye(2), path)
        opts = RunOptions({"model": "poly", "degree": "1", "noise": "white",
                           "method": "nlls", "fwd-initial-posterior": path})
        from fabber_core_tpu.inference.nlls import NLLSInference
        eng = NLLSInference(get_model_class("poly")(opts), opts, data, coords)
        p0 = np.asarray(eng.initial_means())
        np.testing.assert_allclose(p0[0], 5.0)
        np.testing.assert_allclose(p0[1], 1.0)


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")
class TestMoreGoldenOutputOnly:
    @pytest.mark.parametrize("dirname,method", [
        ("outdata_linear_nlls", "nlls"),
        ("outdata_linear_spatialvb", "spatialvb"),
    ])
    def test_golden_regeneration(self, dirname, method):
        """mean/zstat images regenerated from each golden finalMVN match
        the C++-written images (validates the output pipeline for all
        inference methods' checkpoints). Zero VB iterations run: the
        golden input volume is not shipped (docs/PARITY.md
        "Golden-data validation")."""
        mvn_img = nifti.load(f"{REF}/{dirname}/finalMVN.nii.gz")
        mask = nifti.load(f"{REF}/test_mask_small.nii.gz").data
        dummy = np.zeros(mask.shape + (106,), np.float32)

        fab = FabberTpu()
        run = fab.run_with_data({
            "model": "linear", "basis": f"{REF}/test_linear_design.mat",
            "method": "vb", "noise": "white",
            "output-only": True, "save-mean": True, "save-zstat": True,
        }, {"data": dummy, "continue-from-mvn": mvn_img.data}, mask=mask)

        m = mask > 1e-16
        for i in range(1, 5):
            gold = nifti.load(
                f"{REF}/{dirname}/mean_Parameter_{i}.nii.gz").data
            np.testing.assert_allclose(run.data[f"mean_Parameter_{i}"][m],
                                       gold[m], rtol=3e-5, atol=2e-4)
            gold_z = nifti.load(
                f"{REF}/{dirname}/zstat_Parameter_{i}.nii.gz").data
            np.testing.assert_allclose(run.data[f"zstat_Parameter_{i}"][m],
                                       gold_z[m], rtol=1e-4, atol=2e-3)
