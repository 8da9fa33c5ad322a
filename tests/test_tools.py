"""Tests for mvntool / niftidiff / fabber_var / self-test harness."""

import os

import numpy as np
import pytest

from fabber_core_tpu.api import FabberTpu
from fabber_core_tpu.io import mvn as mvn_io
from fabber_core_tpu.io import nifti
from fabber_core_tpu.selftest import self_test
from fabber_core_tpu.tools import fabber_var, mvntool, niftidiff


@pytest.fixture
def mvn_file(tmp_path):
    """A small MVN NIFTI: 3 params over a 3x2x1 grid (one voxel
    unmasked)."""
    rng = np.random.default_rng(0)
    shape = (3, 2, 1)
    nv_all = 6
    p = 3
    means = rng.normal(size=(nv_all, p))
    a = rng.normal(size=(nv_all, p, p))
    cov = a @ a.transpose(0, 2, 1) + 3 * np.eye(p)
    packed = mvn_io.pack(means, cov).T  # [V, rows]
    packed[5] = 0.0  # voxel outside the "mask": no trailing 1
    vol = packed.reshape(shape + (packed.shape[1],), order="F")
    path = str(tmp_path / "mvn.nii.gz")
    nifti.save(nifti.NiftiImage(vol.astype(np.float32)), path,
               dtype=np.float64)
    return path, means[:5], cov[:5], shape


class TestMvntool:
    def test_extract_value(self, mvn_file, tmp_path):
        path, means, cov, shape = mvn_file
        out = str(tmp_path / "val.nii.gz")
        rc = mvntool.main([f"--input={path}", "--param=2", f"--output={out}",
                           "--val"])
        assert rc == 0
        img = nifti.load(out).data.flatten(order="F")
        np.testing.assert_allclose(img[:5], means[:, 1], rtol=1e-5)

    def test_extract_variance_and_covar(self, mvn_file, tmp_path):
        path, means, cov, shape = mvn_file
        out = str(tmp_path / "var.nii.gz")
        assert mvntool.main([f"--input={path}", "--param=1",
                             f"--output={out}", "--var"]) == 0
        img = nifti.load(out).data.flatten(order="F")
        np.testing.assert_allclose(img[:5], cov[:, 0, 0], rtol=1e-5)

        out2 = str(tmp_path / "cvar.nii.gz")
        assert mvntool.main([f"--input={path}", "--param=1", "--cvar=3",
                             f"--output={out2}"]) == 0
        img2 = nifti.load(out2).data.flatten(order="F")
        np.testing.assert_allclose(img2[:5], cov[:, 0, 2], rtol=1e-5)

    def test_write_parameter(self, mvn_file, tmp_path):
        path, means, cov, shape = mvn_file
        out = str(tmp_path / "written.nii.gz")
        rc = mvntool.main([f"--input={path}", "--param=2", "--write",
                           "--val=42.0", "--var=2.5", f"--output={out}"])
        assert rc == 0
        img = nifti.load(out)
        vols = img.data.reshape(-1, img.nt, order="F")
        m2, c2 = mvn_io.unpack(vols[vols[:, -1] == 1].T.astype(np.float64))
        np.testing.assert_allclose(m2[:, 1], 42.0)
        np.testing.assert_allclose(c2[:, 1, 1], 2.5)
        # other params untouched
        np.testing.assert_allclose(m2[:, 0], means[:, 0], rtol=1e-5)

    def test_insert_parameter(self, mvn_file, tmp_path):
        path, means, cov, shape = mvn_file
        out = str(tmp_path / "inserted.nii.gz")
        rc = mvntool.main([f"--input={path}", "--param=2", "--new",
                           "--val=7.0", "--var=1.0", f"--output={out}"])
        assert rc == 0
        img = nifti.load(out)
        vols = img.data.reshape(-1, img.nt, order="F")
        m2, c2 = mvn_io.unpack(vols[vols[:, -1] == 1].T.astype(np.float64))
        assert m2.shape[1] == 4
        np.testing.assert_allclose(m2[:, 1], 7.0)
        np.testing.assert_allclose(m2[:, 0], means[:, 0], rtol=1e-5)
        np.testing.assert_allclose(m2[:, 2], means[:, 1], rtol=1e-5)
        # covariance block shifted correctly
        np.testing.assert_allclose(c2[:, 2, 3], cov[:, 1, 2], rtol=1e-4)

    def test_param_by_name(self, mvn_file, tmp_path):
        path, means, cov, shape = mvn_file
        plist = tmp_path / "params.txt"
        plist.write_text("alpha\nbeta\ngamma\n")
        out = str(tmp_path / "byname.nii.gz")
        rc = mvntool.main([f"--input={path}", "--param=gamma",
                           f"--param-list={plist}", f"--output={out}",
                           "--val"])
        assert rc == 0
        img = nifti.load(out).data.flatten(order="F")
        np.testing.assert_allclose(img[:5], means[:, 2], rtol=1e-5)

    def test_conflicting_modes_rejected(self, mvn_file, tmp_path):
        path, _, _, _ = mvn_file
        assert mvntool.main([f"--input={path}", "--param=1", "--new",
                             "--write", "--val=1"]) == 1
        # extract without output must fail (would overwrite input)
        assert mvntool.main([f"--input={path}", "--param=1", "--val"]) == 1


class TestNiftidiff:
    def test_file_diff(self, tmp_path):
        a = np.ones((4, 4, 2), np.float32)
        b = a.copy()
        b[0, 0, 0] += 0.005
        fa, fb = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
        nifti.save(nifti.NiftiImage(a), fa)
        nifti.save(nifti.NiftiImage(b), fb)
        assert niftidiff.main([fa, fb]) == 0          # eps 0.01
        assert niftidiff.main([fa, fb, "--eps=0.001"]) == 1

    def test_dir_diff(self, tmp_path):
        d1, d2 = tmp_path / "d1", tmp_path / "d2"
        d1.mkdir()
        d2.mkdir()
        a = np.random.default_rng(1).normal(size=(3, 3, 1)).astype(np.float32)
        for d in (d1, d2):
            nifti.save(nifti.NiftiImage(a), str(d / "x.nii.gz"))
        assert niftidiff.main([str(d1), str(d2)]) == 0
        nifti.save(nifti.NiftiImage(a + 1), str(d2 / "x.nii.gz"))
        assert niftidiff.main([str(d1), str(d2)]) == 1


class TestFabberVar:
    def test_extract_variances(self, tmp_path):
        # run a tiny fit to produce finalMVN + paramnames
        rng = np.random.default_rng(2)
        vol = (1.0 + rng.normal(0, 0.1, (3, 3, 1, 10))).astype(np.float32)
        fab = FabberTpu()
        run = fab.run_with_data({
            "model": "poly", "degree": "0", "method": "vb", "noise": "white",
            "save-mvn": True, "save-var": True, "max-iterations": "5"},
            {"data": vol})
        rundir = tmp_path / "run"
        rundir.mkdir()
        mvn_vol = run.data["finalMVN"]
        nifti.save(nifti.NiftiImage(mvn_vol,
                                    intent=nifti.NIFTI_INTENT_SYMMATRIX),
                   str(rundir / "finalMVN.nii.gz"), dtype=np.float64)
        (rundir / "paramnames.txt").write_text("c0\n")

        written = fabber_var.extract_variances(str(rundir))
        assert os.path.exists(written[0])
        var = nifti.load(written[0]).data
        np.testing.assert_allclose(var, run.data["var_c0"], rtol=1e-4)


class TestSelfTest:
    def test_exp_model_self_test(self):
        """The documented exp-model self-test scenario
        (doc/models.rst:399-409): amp/r of 1.0 recovered to ~1%."""
        res, log = self_test(
            "exp", {"dt": "0.1", "max-iterations": "20",
                    "convergence": "trialmode"},
            {"amp1": [1.0, 0.5], "r1": 1.0},
            nt=100, patchsize=4, noise=0.1, seed=3)
        for true_val, recovered in res["amp1"].items():
            assert abs(recovered - true_val) < 0.05
        noise_in, noise_out = next(iter(res["noise"].items()))
        assert abs(noise_out - 0.1) < 0.02
