"""Linear design-matrix forward model: signal = J @ params.

Capability parity with LinearFwdModel (fwdmodel_linear.cc:53-96):
design matrix loaded from a VEST or ASCII file, optional all-ones
regressor, default priors N(0, 1e12). The reference's centre/offset
form R = J(P-C)+O reduces to J@P with zero centre/offset, which is what
its Initialize sets up.
"""

import jax.numpy as jnp
import numpy as np

from ..io import matfile
from ..options import OptionSpec, OPT_MATRIX, OPT_BOOL
from .base import DistParams, Model, ParamSpec, register_model


@register_model
class LinearModel(Model):
    name = "linear"

    def __init__(self, options):
        design_file = options.get_string("basis")
        design = matfile.read_matrix_file(design_file)
        if options.get_bool("add-ones-regressor"):
            design = np.concatenate(
                [design, np.ones((design.shape[0], 1))], axis=1)
        self.design = jnp.asarray(design)
        self.nparams = design.shape[1]

    @classmethod
    def get_options(cls):
        return [
            OptionSpec("basis", OPT_MATRIX, "Design matrix", True),
            OptionSpec("add-ones-regressor", OPT_BOOL,
                       "Add an extra constant regressor"),
        ]

    @classmethod
    def describe(cls):
        return "Model in which output is a linear combination of input parameters"

    def param_defaults(self):
        return [
            ParamSpec(i, f"Parameter_{i + 1}",
                      DistParams(0, 1e12), DistParams(0, 1e12))
            for i in range(self.nparams)
        ]

    def evaluate(self, params, ctx, key=""):
        return self.design.astype(params.dtype) @ params

    def fixed_design(self, nt):
        return self.design
