"""Bad-voxel containment: numerically-failed voxels must not poison
others, must degrade to zero-mean/identity (with allow-bad-voxels), and
must raise with their indices otherwise (inference.cc:88-109,
inference_vb.cc:266-297,556-570)."""

import numpy as np
import pytest

from fabber_core_tpu.api import FabberTpu
from fabber_core_tpu.exceptions import BadVoxelError
from fabber_core_tpu.inference.spatial import SpatialVBInference
from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def poisoned_data(nv=16, nt=12, bad=(3, 7), seed=0):
    rng = np.random.default_rng(seed)
    data = 4.0 + rng.normal(0, 0.3, (nv, nt))
    for v in bad:
        data[v, :] = np.nan
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    return data, coords


class TestVoxelwise:
    def test_bad_voxels_raise_with_indices(self):
        data, coords = poisoned_data()
        vol = data.reshape(4, 4, 1, data.shape[1], order="F")
        with pytest.raises(BadVoxelError) as exc:
            FabberTpu().run_with_data({
                "model": "poly", "degree": "0", "method": "vb",
                "noise": "white", "save-mean": True,
                "max-iterations": "5"}, {"data": vol})
        assert set(exc.value.voxel_indices) == {3, 7}

    def test_allow_bad_voxels_degrades_and_continues(self):
        data, coords = poisoned_data()
        opts = RunOptions({"model": "poly", "degree": "0", "noise": "white",
                           "max-iterations": "5",
                           "allow-bad-voxels": True})
        eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
        res = eng.run()
        assert set(np.flatnonzero(res.bad_voxels)) == {3, 7}
        # degraded to zero-mean identity-covariance
        np.testing.assert_array_equal(res.means[3], 0.0)
        np.testing.assert_array_equal(res.cov[3], np.eye(1))
        # healthy voxels unaffected
        good = ~res.bad_voxels
        np.testing.assert_allclose(res.means[good, 0], 4.0, atol=0.5)


class TestSpatialExcision:
    def test_bad_voxel_excised_from_graph(self):
        """A NaN voxel in spatial mode is removed from the MRF graph:
        neighbours keep converging to the truth instead of being
        dragged (the IgnoreVoxel semantics)."""
        rng = np.random.default_rng(1)
        nx, ny = 6, 4
        nv, nt = nx * ny, 15
        data = 3.0 + rng.normal(0, 0.4, (nv, nt))
        bad_voxel = 9
        data[bad_voxel] = np.nan
        coords = np.array([[x, y, 0] for y in range(ny) for x in range(nx)],
                          float)
        opts = RunOptions({"model": "poly", "degree": "0", "noise": "white",
                           "method": "spatialvb",
                           "param-spatial-priors": "M", "spatial-dims": "2",
                           "max-iterations": "8",
                           "allow-bad-voxels": True})
        eng = SpatialVBInference(get_model_class("poly")(opts), opts, data,
                                 coords)
        res = eng.run()
        assert res.bad_voxels[bad_voxel]
        good = ~res.bad_voxels
        assert np.isfinite(res.means[good]).all()
        np.testing.assert_allclose(res.means[good, 0], 3.0, atol=0.5)
        # the bad voxel's neighbours specifically stay healthy
        for nb in (8, 10, 3, 15):
            assert not res.bad_voxels[nb]
            assert abs(res.means[nb, 0] - 3.0) < 0.5
