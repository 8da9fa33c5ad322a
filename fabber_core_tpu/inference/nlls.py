"""Batched nonlinear least squares (Levenberg / Levenberg-Marquardt).

Capability parity with the reference NLLS method
(inference_nlls.cc:90-293), which drives the MISCMATHS ``nonlin``
optimizer per voxel. Here all voxels run a damped Gauss-Newton loop
simultaneously with per-lane damping factors and accept/reject masks:

    cost     = ||y - f(p)||^2 (masked timepoints excluded)
    step     solve (J'J + lambda * D) delta = J'r
    L mode   D = I        (reference default, LM_L)
    LM mode  D = diag(J'J) (--lm flag)

Posterior: precision = J'J / mse with a 1e-6 diagonal floor
(inference_nlls.cc:175-192); failed lanes get precision 1e-12*I.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dists import sym_inv
from ..models.base import resolve_parameters, PRIOR_IMAGE
from ..options import OptionSpec, OPT_BOOL, OPT_INT
from .linearize import Linearizer
from .vb import VBResult

LAMBDA_INIT = 1e-3
LAMBDA_GROW = 10.0
LAMBDA_SHRINK = 0.1
LAMBDA_MAX = 1e10
PREC_DIAG_FLOOR = 1e-6
FAIL_PRECISION = 1e-12


class NLLSState(NamedTuple):
    params: jnp.ndarray  # [V,P]
    cost: jnp.ndarray    # [V]
    lam: jnp.ndarray     # [V]
    done: jnp.ndarray    # [V] bool
    it: jnp.ndarray      # scalar


class NLLSInference:
    """method=nlls. Shares the model/linearization stack with VB."""

    @classmethod
    def get_options(cls):
        return [
            OptionSpec("vb-init", OPT_BOOL,
                       "Whether NLLS is being run as a pre-step for VB"),
            OptionSpec("lm", OPT_BOOL,
                       "Use Levenberg-Marquardt damping (default Levenberg)"),
            OptionSpec("nlls-max-iterations", OPT_INT,
                       "Maximum optimizer iterations", default="100"),
        ]

    def __init__(self, model, options, data, coords, suppdata=None,
                 voxel_data_getter=None, dtype=None):
        self.model = model
        self.options = options
        self.dtype = dtype or (jnp.float64 if options.get_string(
            "dtype", "double") == "double" else jnp.float32)
        self.data = jnp.asarray(data, self.dtype)
        self.coords = jnp.asarray(coords, self.dtype)
        self.suppdata = None if suppdata is None or suppdata.shape[1] == 0 \
            else jnp.asarray(suppdata, self.dtype)
        self.nvoxels, self.nt = self.data.shape

        self.masked_tpoints = options.get_int_list("mt", 1)
        tmask = np.ones(self.nt)
        for t in self.masked_tpoints:
            tmask[t - 1] = 0.0
        self.tmask = jnp.asarray(tmask, self.dtype)
        self.n_unmasked = int(tmask.sum())

        self.params = resolve_parameters(model, options)
        self.nparams = len(self.params)
        self._voxel_data = voxel_data_getter or (lambda key: (_ for _ in ()).throw(
            KeyError(key)))

        self.marquardt = options.get_bool("lm")
        self.vb_init = options.get_bool("vb-init")
        self.max_its = options.get_int("nlls-max-iterations", 100, minval=1)

        lin_mode = options.get_string("linearization", "auto")
        self.linearizer = Linearizer(model, self.params, self.data,
                                     self.coords, self.suppdata, mode=lin_mode)

    def initial_means(self):
        """Initial estimate from the model's posterior defaults
        (optionally overridden by fwd-initial-posterior file)."""
        v, p = self.nvoxels, self.nparams
        means = np.zeros((v, p))
        for i, spec in enumerate(self.params):
            if spec.prior_type == PRIOR_IMAGE:
                img = np.asarray(self._voxel_data(spec.options["image"]))
                means[:, i] = img.reshape(v, -1)[:, 0]
            else:
                means[:, i] = spec.post.mean
        means = np.array(self.model.init_posterior(
            np.asarray(self.data), jnp.asarray(means)))
        for i, spec in enumerate(self.params):
            means[:, i] = np.asarray(spec.transform.to_latent(
                jnp.asarray(means[:, i])))
        return jnp.asarray(means, self.dtype)

    def _cost(self, params):
        pred = self.linearizer.evaluate(params)
        r = (self.data - pred) * self.tmask
        return jnp.sum(r * r, axis=1)

    def _step(self, s):
        offset, jac = self.linearizer(s.params)
        jac = jac * self.tmask[None, :, None]
        r = (self.data - offset) * self.tmask
        jtj = jnp.einsum("vtp,vtq->vpq", jac, jac)
        jtr = jnp.einsum("vtp,vt->vp", jac, r)

        if self.marquardt:
            damp = jnp.diagonal(jtj, axis1=-2, axis2=-1)
        else:
            damp = jnp.ones_like(s.params)
        idx = jnp.arange(self.nparams)
        damped = jtj.at[:, idx, idx].add(s.lam[:, None] * damp)

        delta = _chol_solve(damped, jtr)
        trial = s.params + delta
        trial_cost = self._cost(trial)
        better = (trial_cost < s.cost) & jnp.isfinite(trial_cost)

        params = jnp.where(better[:, None], trial, s.params)
        cost = jnp.where(better, trial_cost, s.cost)
        lam = jnp.where(better, s.lam * LAMBDA_SHRINK, s.lam * LAMBDA_GROW)
        done = s.done | (lam > LAMBDA_MAX)
        new = NLLSState(params, cost, lam, done, s.it + 1)

        # freeze finished lanes
        keep = s.done
        return NLLSState(
            jnp.where(keep[:, None], s.params, new.params),
            jnp.where(keep, s.cost, new.cost),
            jnp.where(keep, s.lam, new.lam),
            new.done, new.it)

    def run(self):
        p0 = self.initial_means()
        s0 = NLLSState(
            params=p0, cost=self._cost(p0),
            lam=jnp.full(self.nvoxels, LAMBDA_INIT, self.dtype),
            done=jnp.zeros(self.nvoxels, bool),
            it=jnp.array(0, jnp.int32))

        @jax.jit
        def solve(s):
            s = jax.lax.while_loop(
                lambda s: (~jnp.all(s.done)) & (s.it < self.max_its),
                self._step, s)
            # posterior precision = J'J/mse, diagonal floor 1e-6
            _, jac = self.linearizer(s.params)
            jac = jac * self.tmask[None, :, None]
            jtj = jnp.einsum("vtp,vtq->vpq", jac, jac)
            mse = s.cost / (self.n_unmasked - self.nparams)
            prec = jtj / mse[:, None, None]
            idx = jnp.arange(self.nparams)
            d = jnp.diagonal(prec, axis1=-2, axis2=-1)
            prec = prec.at[:, idx, idx].set(jnp.maximum(d, PREC_DIAG_FLOOR))
            cov = sym_inv(prec)
            return s, prec, cov

        s, prec, cov = solve(s0)

        means = np.asarray(s.params)
        cov = np.asarray(cov)
        bad = ~(np.isfinite(means).all(axis=1)
                & np.isfinite(cov).reshape(cov.shape[0], -1).all(axis=1))
        if bad.any():
            # failed lanes: keep params, set precision 1e-12*I
            # (inference_nlls.cc:195-214)
            cov[bad] = np.eye(self.nparams) / FAIL_PRECISION
            means[bad] = np.nan_to_num(means[bad])

        return VBResult(
            means=means, cov=cov,
            noise_means=np.zeros((self.nvoxels, 0)),
            noise_cov=np.zeros((self.nvoxels, 0, 0)),
            free_energy=None, fhistory=None,
            iterations=np.full(self.nvoxels, int(np.asarray(s.it))),
            bad_voxels=bad)


def _chol_solve(mats, rhs):
    chol = jnp.linalg.cholesky(mats)
    y = jax.scipy.linalg.solve_triangular(chol, rhs[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False)
    return x[..., 0]
