"""Data-registry semantics tests (the reference's test_rundata.cc
territory): multi-file combine, key indirection, circular refs, and
CLI-level VEST/ASCII design equivalence (test_commandline.cc)."""

import numpy as np
import pytest

from fabber_core_tpu import cli
from fabber_core_tpu.core.volume import VolumeGeometry, VoxelDataStore
from fabber_core_tpu.exceptions import DataNotFound, FabberError
from fabber_core_tpu.io import nifti
from fabber_core_tpu.options import RunOptions


@pytest.fixture
def store():
    geom = VolumeGeometry((2, 2, 1))
    return VoxelDataStore(geom)


class TestVoxelDataStore:
    def test_interleave(self, store):
        a = np.arange(8).reshape(4, 2)        # [V=4, T=2]
        b = np.arange(8).reshape(4, 2) + 100
        store.set("data1", a)
        store.set("data2", b)
        out = store.get_main_data(RunOptions({"data-order": "interleave"}))
        # first record from each file, then second, etc.
        np.testing.assert_array_equal(out[0], [0, 100, 1, 101])

    def test_concatenate(self, store):
        a = np.arange(8).reshape(4, 2)
        b = np.arange(8).reshape(4, 2) + 100
        store.set("data1", a)
        store.set("data2", b)
        out = store.get_main_data(RunOptions({"data-order": "concatenate"}))
        np.testing.assert_array_equal(out[0], [0, 1, 100, 101])

    def test_interleave_length_mismatch(self, store):
        store.set("data1", np.zeros((4, 2)))
        store.set("data2", np.zeros((4, 3)))
        with pytest.raises(FabberError):
            store.get_main_data(RunOptions({"data-order": "interleave"}))

    def test_bad_order(self, store):
        store.set("data1", np.zeros((4, 2)))
        with pytest.raises(FabberError):
            store.get_main_data(RunOptions({"data-order": "sideways"}))

    def test_key_indirection(self, store):
        store.set("real", np.ones((4, 3)))
        store.set_alias("alias", "real")
        np.testing.assert_array_equal(store.get("alias"), store.get("real"))

    def test_circular_reference(self, store):
        store.set_alias("a", "b")
        store.set_alias("b", "a")
        with pytest.raises(DataNotFound):
            store.get("a")

    def test_missing_data(self, store):
        with pytest.raises(DataNotFound):
            store.get("nothere")
        with pytest.raises(DataNotFound):
            store.get_main_data(RunOptions())

    def test_wrong_voxel_count(self, store):
        with pytest.raises(FabberError):
            store.set("data", np.zeros((7, 3)))


class TestCliDesignEquivalence:
    """VEST and ASCII design matrices must give identical results
    through the full CLI (test_commandline.cc:098-434 territory)."""

    def test_vest_vs_ascii(self, tmp_path):
        rng = np.random.default_rng(0)
        nt, nv = 12, 8
        design = rng.normal(size=(nt, 2))
        coeffs = rng.normal(size=(nv, 2))
        vol = (coeffs @ design.T + rng.normal(0, 0.05, (nv, nt))) \
            .reshape(2, 2, 2, nt).astype(np.float32)
        data_f = str(tmp_path / "d.nii.gz")
        nifti.save(nifti.NiftiImage(vol), data_f)

        from fabber_core_tpu.io import matfile
        vest_f = str(tmp_path / "design.mat")
        matfile.write_vest(design, vest_f)
        ascii_f = str(tmp_path / "design_ascii.mat")
        with open(ascii_f, "w") as f:
            f.write("# comment line\n")
            for row in design:
                f.write(" ".join(f"{x:.10e}" for x in row) + "\n")

        outs = []
        for i, basis in enumerate([vest_f, ascii_f]):
            outdir = str(tmp_path / f"out{i}")
            rc = cli.execute([
                f"--data={data_f}", f"--output={outdir}", "--model=linear",
                f"--basis={basis}", "--method=vb", "--noise=white",
                "--max-iterations=5"])
            assert rc == 0
            outs.append(nifti.load(f"{outdir}/mean_Parameter_1.nii.gz").data)
        np.testing.assert_array_equal(outs[0], outs[1])
