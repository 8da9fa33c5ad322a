"""Dynamic model loading (the dlopen equivalent) + alternate model
outputs, exercised through the CLI and API surfaces."""

import os
import textwrap

import numpy as np
import pytest

from fabber_core_tpu import cli
from fabber_core_tpu.api import FabberTpu
from fabber_core_tpu.io import nifti

PLUGIN_SRC = textwrap.dedent('''
    """Example user model plugin: a linear ramp with an alternate
    'interim' output — the plugin-ABI demonstration equivalent of
    examples/fwdmodel_exp.cc."""
    import jax.numpy as jnp
    from fabber_core_tpu.models.base import (DistParams, Model, ParamSpec,
                                             register_model)
    from fabber_core_tpu.options import OptionSpec, OPT_FLOAT


    @register_model
    class RampModel(Model):
        name = "testramp"

        def __init__(self, options):
            self.scale = options.get_float("ramp-scale", 1.0)

        @classmethod
        def get_options(cls):
            return [OptionSpec("ramp-scale", OPT_FLOAT, "Slope scaling",
                               default="1.0")]

        @classmethod
        def describe(cls):
            return "Test ramp model from a plugin"

        def param_defaults(self):
            return [ParamSpec(0, "offset", DistParams(0, 1e6),
                              DistParams(0, 1e6)),
                    ParamSpec(1, "slope", DistParams(0, 1e6),
                              DistParams(0, 1e6))]

        def evaluate(self, params, ctx, key=""):
            t = jnp.arange(ctx.nt, dtype=params.dtype)
            if key == "interim":
                return params[1] * t * self.scale
            return params[0] + params[1] * t * self.scale

        def outputs(self):
            return ["interim"]
''')


@pytest.fixture
def plugin_file(tmp_path):
    path = tmp_path / "my_models.py"
    path.write_text(PLUGIN_SRC)
    return str(path)


def test_plugin_via_api(plugin_file):
    rng = np.random.default_rng(0)
    nt = 12
    t = np.arange(nt)
    vol = (2.0 + 0.3 * t[None, :]
           + rng.normal(0, 0.05, (8, nt))).reshape(2, 2, 2, nt)
    fab = FabberTpu(model_files=[plugin_file])
    assert "testramp" in fab.get_models()
    run = fab.run_with_data({
        "model": "testramp", "method": "vb", "noise": "white",
        "save-mean": True, "save-model-extras": True,
        "max-iterations": "8"}, {"data": vol})
    np.testing.assert_allclose(run.data["mean_slope"].ravel(), 0.3, atol=0.02)
    # alternate output saved and equals slope * t
    assert run.data["interim"].shape == vol.shape
    np.testing.assert_allclose(
        run.data["interim"][0, 0, 0],
        run.data["mean_slope"][0, 0, 0] * t, atol=1e-4)


def test_plugin_via_cli(plugin_file, tmp_path, capsys):
    assert cli.execute([f"--loadmodels={plugin_file}", "--listmodels"]) == 0
    assert "testramp" in capsys.readouterr().out

    assert cli.execute([f"--loadmodels={plugin_file}", "--listoutputs",
                        "--model=testramp"]) == 0
    assert "interim" in capsys.readouterr().out

    assert cli.execute([f"--loadmodels={plugin_file}", "--listparams",
                        "--model=testramp"]) == 0
    assert capsys.readouterr().out.split() == ["offset", "slope"]

    # full run through the CLI
    rng = np.random.default_rng(1)
    nt = 10
    vol = (1.0 + 0.5 * np.arange(nt)[None, :]
           + rng.normal(0, 0.05, (4, nt))).reshape(2, 2, 1, nt)
    data_f = str(tmp_path / "d.nii.gz")
    nifti.save(nifti.NiftiImage(vol.astype(np.float32)), data_f)
    outdir = str(tmp_path / "out")
    rc = cli.execute([f"--loadmodels={plugin_file}", f"--data={data_f}",
                      f"--output={outdir}", "--model=testramp",
                      "--method=vb", "--noise=white", "--max-iterations=5"])
    assert rc == 0
    slope = nifti.load(os.path.join(outdir, "mean_slope.nii.gz")).data
    np.testing.assert_allclose(slope, 0.5, atol=0.05)
