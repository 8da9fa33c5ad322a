"""CLI black-box tests (the reference's test_commandline.cc role)."""

import os

import numpy as np
import pytest

from fabber_core_tpu import cli
from fabber_core_tpu.io import nifti


@pytest.fixture
def phantom_files(tmp_path):
    rng = np.random.default_rng(0)
    shape, nt = (4, 3, 2), 15
    t = np.arange(1, nt + 1)
    nv = int(np.prod(shape))
    c0 = rng.uniform(-1, 1, nv)
    c1 = rng.uniform(-0.5, 0.5, nv)
    data = (c0[:, None] + c1[:, None] * t[None, :]
            + rng.normal(0, 0.1, (nv, nt)))
    vol = data.reshape(shape + (nt,), order="F").astype(np.float32)
    mask = np.ones(shape, np.float32)
    mask[0, 0, 0] = 0

    data_f = str(tmp_path / "data.nii.gz")
    mask_f = str(tmp_path / "mask.nii.gz")
    nifti.save(nifti.NiftiImage(vol), data_f)
    nifti.save(nifti.NiftiImage(mask), mask_f)
    return data_f, mask_f, tmp_path


def test_listmodels(capsys):
    assert cli.execute(["--listmodels"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "poly" in out and "linear" in out and "exp" in out


def test_listmethods(capsys):
    assert cli.execute(["--listmethods"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert set(out) >= {"vb", "spatialvb", "nlls"}


def test_listparams(capsys):
    assert cli.execute(["--listparams", "--model=poly", "--degree=2"]) == 0
    assert capsys.readouterr().out.splitlines() == ["c0", "c1", "c2"]


def test_help(capsys):
    assert cli.execute(["--help"]) == 0
    assert "--output" in capsys.readouterr().out


def test_help_model(capsys):
    assert cli.execute(["--help", "--model=poly"]) == 0
    assert "degree" in capsys.readouterr().out


def test_evaluate(capsys, tmp_path):
    pfile = tmp_path / "params.txt"
    pfile.write_text("1.0\n2.0\n")
    assert cli.execute(["--model=poly", "--degree=1",
                        f"--evaluate-params={pfile}", "--evaluate-nt=3",
                        "--evaluate="]) == 0
    vals = [float(x) for x in capsys.readouterr().out.split()]
    np.testing.assert_allclose(vals, [3.0, 5.0, 7.0])


def test_evaluate_data_injection(capsys, tmp_path):
    """--evaluate-data feeds the model's data vector (fabber_core.cc:246):
    a data-dependent plugin model must see the injected timeseries."""
    import textwrap
    plugin = tmp_path / "datamodel.py"
    plugin.write_text(textwrap.dedent('''
        import jax.numpy as jnp
        from fabber_core_tpu.models.base import (DistParams, Model,
                                                 ParamSpec, register_model)

        @register_model
        class DataOffsetModel(Model):
            name = "testdataoffset"

            def __init__(self, options):
                pass

            def param_defaults(self):
                return [ParamSpec(0, "gain", DistParams(1, 1e6),
                                  DistParams(1, 1e6))]

            def evaluate(self, params, ctx, key=""):
                # prediction = gain * mean(input data): data-dependent
                return params[0] * jnp.mean(ctx.data) \\
                    * jnp.ones(ctx.nt, params.dtype)
    '''))
    pfile = tmp_path / "params.txt"
    pfile.write_text("2.0\n")
    dfile = tmp_path / "data.txt"
    dfile.write_text("1.0\n3.0\n5.0\n")

    # without data: ctx.data is zeros -> prediction 0
    assert cli.execute([f"--loadmodels={plugin}", "--model=testdataoffset",
                        f"--evaluate-params={pfile}", "--evaluate-nt=3",
                        "--evaluate="]) == 0
    vals = [float(x) for x in capsys.readouterr().out.split()]
    np.testing.assert_allclose(vals, [0.0, 0.0, 0.0])

    # with data: prediction = 2 * mean([1,3,5]) = 6
    assert cli.execute([f"--loadmodels={plugin}", "--model=testdataoffset",
                        f"--evaluate-params={pfile}", "--evaluate-nt=3",
                        f"--evaluate-data={dfile}", "--evaluate="]) == 0
    vals = [float(x) for x in capsys.readouterr().out.split()]
    np.testing.assert_allclose(vals, [6.0, 6.0, 6.0])


def test_full_run(phantom_files, capsys):
    data_f, mask_f, tmp = phantom_files
    outdir = str(tmp / "out")
    rc = cli.execute([
        f"--data={data_f}", f"--mask={mask_f}", f"--output={outdir}",
        "--model=poly", "--degree=1", "--method=vb", "--noise=white",
        "--max-iterations=8", "--save-model-fit"])
    assert rc == 0
    for fname in ["mean_c0.nii.gz", "mean_c1.nii.gz", "std_c0.nii.gz",
                  "zstat_c1.nii.gz", "noise_means.nii.gz", "finalMVN.nii.gz",
                  "modelfit.nii.gz", "logfile", "paramnames.txt"]:
        assert os.path.exists(os.path.join(outdir, fname)), fname
    # masked-out voxel is zero in outputs
    mean1 = nifti.load(os.path.join(outdir, "mean_c1.nii.gz")).data
    assert mean1[0, 0, 0] == 0.0
    assert (mean1 != 0).sum() == 23  # 24 voxels - 1 masked
    names = open(os.path.join(outdir, "paramnames.txt")).read().split()
    assert names == ["c0", "c1"]
    log = open(os.path.join(outdir, "logfile")).read()
    assert "Duration" in log


def test_output_dir_plus_suffix(phantom_files):
    data_f, mask_f, tmp = phantom_files
    outdir = str(tmp / "out2")
    args = [f"--data={data_f}", f"--mask={mask_f}", f"--output={outdir}",
            "--model=poly", "--degree=1", "--method=vb", "--noise=white",
            "--max-iterations=2"]
    assert cli.execute(args) == 0
    assert cli.execute(args) == 0  # second run must not overwrite
    assert os.path.isdir(outdir) and os.path.isdir(outdir + "+")
    # with --overwrite, reuse the directory
    assert cli.execute(args + ["--overwrite"]) == 0
    assert not os.path.isdir(outdir + "++")


def test_option_file(phantom_files, tmp_path):
    data_f, mask_f, tmp = phantom_files
    outdir = str(tmp / "out3")
    optfile = tmp_path / "run.fab"
    optfile.write_text(
        f"# poly fit\ndata={data_f}\nmask={mask_f}\noutput={outdir}\n"
        "model=poly\ndegree=1\nmethod=vb\nnoise=white\nmax-iterations=3\n")
    assert cli.execute(["-f", str(optfile)]) == 0
    assert os.path.exists(os.path.join(outdir, "mean_c1.nii.gz"))


def test_bad_option_reported(capsys):
    assert cli.execute(["badoption"]) == 1
    assert "doesn't begin with --" in capsys.readouterr().err


def test_unknown_model_reported(phantom_files, capsys):
    data_f, mask_f, tmp = phantom_files
    rc = cli.execute([f"--data={data_f}", f"--output={tmp}/o",
                      "--model=doesnotexist", "--method=vb", "--noise=white"])
    assert rc == 1
    assert "doesnotexist" in capsys.readouterr().err

def test_option_file_old_style(phantom_files, tmp_path):
    """Legacy -@/--optfile format (rundata.cc:348-387; the reference's
    OptFileOldStyle / OptFileOldStyleOldName CLI cases)."""
    data_f, mask_f, tmp = phantom_files
    outdir = str(tmp / "out_old")
    optfile = tmp_path / "optfile.tmp"
    optfile.write_text(
        f"--model=poly --degree=1\n"
        f"--method=vb --noise=white  # trailing comment discarded\n"
        f"--max-iterations=3\n"
        f"--output={outdir} --overwrite\n")
    # --optfile= form
    assert cli.execute([f"--optfile={optfile}", f"--data={data_f}",
                        f"--mask={mask_f}"]) == 0
    assert os.path.exists(os.path.join(outdir, "mean_c1.nii.gz"))
    # deprecated '-@ file' form
    assert cli.execute(["-@", str(optfile), f"--data={data_f}",
                        f"--mask={mask_f}"]) == 0


def test_option_file_old_style_errors(tmp_path, capsys):
    from fabber_core_tpu.options import RunOptions
    from fabber_core_tpu.exceptions import FabberError
    bad = tmp_path / "bad.tmp"
    bad.write_text("--model=poly\nplainword\n")
    with pytest.raises(FabberError, match="Invalid data 'plainword'"):
        RunOptions().parse_old_style_option_file(str(bad))
    nested = tmp_path / "nested.tmp"
    nested.write_text("-@ other.tmp\n")
    with pytest.raises(FabberError, match="command line"):
        RunOptions().parse_old_style_option_file(str(nested))
    with pytest.raises(FabberError, match="Couldn't read"):
        RunOptions().parse_old_style_option_file(str(tmp_path / "nope"))
    # comments discard the rest of the line only
    ok = tmp_path / "ok.tmp"
    ok.write_text("--model=poly # --degree=9 ignored\n--degree=2\n")
    o = RunOptions().parse_old_style_option_file(str(ok))
    assert o.get_string("model") == "poly"
    assert o.get_int("degree") == 2


def test_progress_callback_per_chunk(phantom_files):
    """>2 progress invocations when the run chunks (ProgressCheck
    parity, rundata.h:102-169)."""
    import fabber_core_tpu.runner as runner_mod
    from fabber_core_tpu.options import RunOptions
    from fabber_core_tpu.cli import NiftiVoxelDataStore
    from fabber_core_tpu.core.volume import VolumeGeometry
    from fabber_core_tpu.easylog import EasyLog
    data_f, mask_f, tmp = phantom_files
    mask_img = nifti.load(mask_f)
    geom = VolumeGeometry(mask_img.shape[:3], mask_img.data)
    opts = RunOptions({"data": data_f, "model": "poly", "degree": "1",
                       "method": "vb", "noise": "white",
                       "max-iterations": "3", "voxel-chunk-size": "8",
                       "save-mean": ""})
    log = EasyLog()
    store = NiftiVoxelDataStore(geom, opts, log)
    calls = []
    runner_mod.run(opts, store, log=log,
                   progress_cb=lambda v, t: calls.append((v, t)))
    # 23 voxels / chunk 8 -> 3 chunks, plus the 0% and 100% bookends
    assert len(calls) >= 4, calls
    assert calls[0] == (0, 23) and calls[-1] == (23, 23)
    done = [v for v, _ in calls]
    assert done == sorted(done)
    assert any(0 < v < 23 for v in done)


def test_progress_callback_per_sweep(phantom_files):
    """Spatial mode reports per-sweep progress from inside the jitted
    loop (jax.debug.callback)."""
    import fabber_core_tpu.runner as runner_mod
    from fabber_core_tpu.options import RunOptions
    from fabber_core_tpu.cli import NiftiVoxelDataStore
    from fabber_core_tpu.core.volume import VolumeGeometry
    from fabber_core_tpu.easylog import EasyLog
    data_f, mask_f, tmp = phantom_files
    mask_img = nifti.load(mask_f)
    geom = VolumeGeometry(mask_img.shape[:3], mask_img.data)
    opts = RunOptions({"data": data_f, "model": "poly", "degree": "1",
                       "method": "spatialvb", "param-spatial-priors": "MM",
                       "noise": "white", "max-iterations": "4",
                       "save-mean": ""})
    log = EasyLog()
    store = NiftiVoxelDataStore(geom, opts, log)
    calls = []
    runner_mod.run(opts, store, log=log,
                   progress_cb=lambda v, t: calls.append((v, t)))
    assert len(calls) >= 4, calls   # 0% + >=2 sweeps observed + 100%
