"""Exhaustive option-introspection surface test.

Every model x method x noise x detector must expose a well-formed
get_options() table, render through --help, and serialize to the
C-API TSV (fabber_capi.h:155-170 contract). Round-1 shipped with
NLLSInference.get_options() raising NameError because nothing
exercised it; this test makes that class of regression impossible.
"""

import pytest

from fabber_core_tpu import cli
from fabber_core_tpu.api import FabberTpu
from fabber_core_tpu.capi_backend import CApiContext
from fabber_core_tpu.inference.convergence import (_DETECTORS,
                                                   known_detectors)
from fabber_core_tpu.models import known_models, get_model_class
from fabber_core_tpu.noise.base import (_NOISE, get_noise_class,
                                           known_noise_models)
from fabber_core_tpu.options import (OPT_BOOL, OPT_FILE, OPT_FLOAT,
                                     OPT_IMAGE, OPT_INT, OPT_MATRIX,
                                     OPT_MVN, OPT_STR, OPT_TIMESERIES)

KNOWN_TYPES = {OPT_BOOL, OPT_STR, OPT_INT, OPT_FLOAT, OPT_FILE,
               OPT_IMAGE, OPT_TIMESERIES, OPT_MVN, OPT_MATRIX}
METHODS = ["vb", "spatialvb", "nlls"]


def _check_specs(specs):
    assert len(specs) > 0
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), f"duplicate options: {names}"
    for s in specs:
        assert isinstance(s.name, str) and s.name
        assert isinstance(s.description, str) and s.description
        assert s.type in KNOWN_TYPES, f"{s.name}: bad type {s.type}"
        assert isinstance(s.default, str)
        tsv = s.as_tsv()
        assert tsv.count("\t") >= 3


@pytest.mark.parametrize("method", METHODS)
def test_method_options(method):
    if method in ("vb", "spatialvb"):
        from fabber_core_tpu.inference.vb import VBInference
        from fabber_core_tpu.inference.spatial import SpatialVBInference
        cls = VBInference if method == "vb" else SpatialVBInference
    else:
        from fabber_core_tpu.inference.nlls import NLLSInference
        cls = NLLSInference
    _check_specs(cls.get_options())


@pytest.mark.parametrize("model", sorted(known_models()))
def test_model_options(model):
    _check_specs(get_model_class(model).get_options())


@pytest.mark.parametrize("noise", known_noise_models())
def test_noise_options(noise):
    _check_specs(get_noise_class(noise).get_options())


@pytest.mark.parametrize("detector", known_detectors())
def test_detector_options(detector):
    _check_specs(_DETECTORS[detector].get_options())


@pytest.mark.parametrize("method", METHODS)
def test_api_and_help_and_tsv_method(method, capsys):
    fab = FabberTpu()
    opts, desc = fab.get_options(method=method)
    assert desc and opts
    assert cli.execute(["--help", f"--method={method}"]) == 0
    out = capsys.readouterr().out
    for o in opts:
        assert f"--{o['name']}" in out
    tsv = CApiContext().get_options("method", method)
    lines = tsv.splitlines()
    assert lines[0] == desc
    assert len(lines) == 1 + len(opts)
    for line in lines[1:]:
        fields = line.split("\t")
        assert len(fields) == 5
        assert fields[2] in KNOWN_TYPES
        assert fields[3] in ("0", "1")


@pytest.mark.parametrize("model", sorted(known_models()))
def test_api_and_help_and_tsv_model(model, capsys):
    fab = FabberTpu()
    opts, desc = fab.get_options(model=model)
    assert desc
    assert cli.execute(["--help", f"--model={model}"]) == 0
    out = capsys.readouterr().out
    for o in opts:
        assert f"--{o['name']}" in out
    tsv = CApiContext().get_options("model", model)
    assert tsv.splitlines()[0] == desc
