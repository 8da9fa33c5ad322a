"""Polynomial forward model: c0 + c1*t + ... + cd*t^d over t = 1..T.

Capability parity with fwdmodel_poly.cc:47-80 (parameter names c0..cd,
priors/posteriors N(0, 1e12), evaluation over the sample index starting
at 1).
"""

import jax.numpy as jnp

from ..options import OptionSpec, OPT_INT
from .base import DistParams, Model, ParamSpec, register_model


@register_model
class PolynomialModel(Model):
    name = "poly"

    def __init__(self, options):
        self.degree = options.get_int("degree")

    @classmethod
    def get_options(cls):
        return [OptionSpec("degree", OPT_INT,
                           "Maximum power in the polynomial function", True)]

    @classmethod
    def describe(cls):
        return ("Model which fits data to a simple polynomial function: "
                "c0 + c1x + c2x^2 ... etc")

    def param_defaults(self):
        return [
            ParamSpec(i, f"c{i}", DistParams(0, 1e12), DistParams(0, 1e12))
            for i in range(self.degree + 1)
        ]

    def evaluate(self, params, ctx, key=""):
        # t = 1..T (the reference indexes samples from 1)
        t = jnp.arange(1, ctx.nt + 1, dtype=params.dtype)
        powers = t[:, None] ** jnp.arange(self.degree + 1, dtype=params.dtype)[None, :]
        return powers @ params

    def fixed_design(self, nt):
        t = jnp.arange(1, nt + 1, dtype=jnp.float64)
        return t[:, None] ** jnp.arange(self.degree + 1, dtype=jnp.float64)[None, :]

    def time_signal(self, params, t):
        """Time-local form (fused kernel): t is the 0-based index."""
        tv = t + 1.0  # reference samples run 1..T
        sig = params[0]
        power = tv
        for i in range(1, self.degree + 1):
            sig = sig + params[i] * power
            power = power * tv
        return sig

    def time_signal_jac(self, params, t):
        """Analytic Jacobian: ds/dc_k = t^k (shared with the primal).
        Rows are materialized [TB,B] (the kernel stages them in VMEM)."""
        tv = t + 1.0
        sig = params[0]
        jac = [jnp.ones_like(tv) * jnp.ones_like(params[0])]
        power = tv
        for i in range(1, self.degree + 1):
            sig = sig + params[i] * power
            jac.append(power * jnp.ones_like(params[i]))
            power = power * tv
        return sig, jac
