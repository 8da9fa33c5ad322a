"""NIFTI / matrix-file / MVN format tests, including round-trips against
the reference's shipped golden files."""

import os

import numpy as np
import pytest

from fabber_core_tpu.io import matfile, mvn, nifti

REF = "/root/reference/test"


class TestNifti:
    def test_roundtrip_4d(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(5, 4, 3, 7)).astype(np.float32)
        img = nifti.NiftiImage(data, pixdims=[2.0, 2.0, 3.0, 1.5])
        path = str(tmp_path / "test.nii.gz")
        nifti.save(img, path)
        back = nifti.load(path)
        np.testing.assert_array_equal(back.data, data)
        np.testing.assert_allclose(back.pixdims[:4], [2.0, 2.0, 3.0, 1.5],
                                   rtol=1e-6)

    def test_roundtrip_uncompressed(self, tmp_path):
        data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        path = str(tmp_path / "plain.nii")
        nifti.save(nifti.NiftiImage(data), path)
        np.testing.assert_array_equal(nifti.load(path).data, data)

    @pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")
    def test_load_reference_test_data(self):
        img = nifti.load(f"{REF}/test_data_small.nii.gz")
        assert img.shape == (3, 3, 2, 106)
        mask = nifti.load(f"{REF}/test_mask_small.nii.gz")
        assert mask.shape == (64, 64, 42)
        # golden logfile says 147 voxels in this mask
        assert int((mask.data > 1e-16).sum()) == 147

    @pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")
    def test_load_golden_mvn(self):
        img = nifti.load(f"{REF}/outdata_poly/finalMVN.nii.gz")
        # poly deg 2 -> 3 params + 1 noise = 4; 4*5/2 + 4 + 1 = 15 rows
        assert img.nt == 15
        assert img.intent == nifti.NIFTI_INTENT_SYMMATRIX


class TestMatfile:
    @pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")
    def test_vest_and_ascii_agree(self):
        v = matfile.read_matrix_file(f"{REF}/test_linear_design.mat")
        a = matfile.read_matrix_file(f"{REF}/test_linear_design_ascii.mat")
        assert v.shape == (106, 4)
        np.testing.assert_allclose(v, a)

    def test_vest_roundtrip(self, tmp_path):
        mat = np.random.default_rng(1).normal(size=(11, 3))
        path = str(tmp_path / "design.mat")
        matfile.write_vest(mat, path)
        np.testing.assert_allclose(matfile.read_vest(path), mat, rtol=1e-8)


class TestMvnFormat:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(2)
        nv, p = 9, 4
        means = rng.normal(size=(nv, p))
        a = rng.normal(size=(nv, p, p))
        cov = a @ a.transpose(0, 2, 1)
        packed = mvn.pack(means, cov)
        assert packed.shape == (p * (p + 1) // 2 + p + 1, nv)
        m2, c2 = mvn.unpack(packed)
        np.testing.assert_allclose(m2, means)
        np.testing.assert_allclose(c2, cov)

    @pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")
    def test_unpack_golden_finalmvn(self):
        """Parse the C++-written checkpoint and verify internal
        consistency with the separately-written mean/std images."""
        img = nifti.load(f"{REF}/outdata_poly/finalMVN.nii.gz")
        mask = nifti.load(f"{REF}/test_mask_small.nii.gz").data > 1e-16
        voxel_data = img.data[mask].T  # [rows, V] masked, x-fastest order
        means, cov = mvn.unpack(voxel_data.astype(np.float64))
        assert means.shape[1] == 4  # c0,c1,c2 + noise phi

        for i, pname in enumerate(["c0", "c1", "c2"]):
            gold = nifti.load(f"{REF}/outdata_poly/mean_{pname}.nii.gz")
            gold_means = gold.data[mask]
            np.testing.assert_allclose(means[:, i], gold_means, rtol=2e-5,
                                       atol=1e-5)
            gold_std = nifti.load(f"{REF}/outdata_poly/std_{pname}.nii.gz")
            np.testing.assert_allclose(np.sqrt(cov[:, i, i]),
                                       gold_std.data[mask], rtol=2e-5)

    def test_matrix_format_roundtrip(self, tmp_path):
        means = np.array([1.0, -2.0, 3.0])
        cov = np.diag([0.1, 0.2, 0.3])
        path = str(tmp_path / "mvn.mat")
        mvn.save_matrix(means, cov, path)
        m2, c2 = mvn.load_matrix(path)
        np.testing.assert_allclose(m2, means, rtol=1e-8)
        np.testing.assert_allclose(c2, cov, rtol=1e-8, atol=1e-12)
