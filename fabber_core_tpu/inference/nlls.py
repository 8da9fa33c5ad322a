"""Batched nonlinear least squares (Levenberg / Levenberg-Marquardt).

Capability parity with the reference NLLS method
(inference_nlls.cc:90-293), which drives the MISCMATHS ``nonlin``
optimizer per voxel. Here all voxels run a damped Gauss-Newton loop
simultaneously in SoA layout (voxels on lanes) with per-lane damping
factors and accept/reject masks:

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

from ..models.base import resolve_parameters, PRIOR_IMAGE
from ..ops import smallmat as sm
from ..options import OptionSpec, OPT_BOOL, OPT_INT, OPT_STR
from .linearize import Linearizer
from .vb import VBResult

LAMBDA_INIT = 1e-3
LAMBDA_GROW = 10.0
LAMBDA_SHRINK = 0.1
LAMBDA_MAX = 1e10
PREC_DIAG_FLOOR = 1e-6
FAIL_PRECISION = 1e-12


class NLLSState(NamedTuple):
    params: jnp.ndarray  # [P,V]
    cost: jnp.ndarray    # [V]
    lam: jnp.ndarray     # [V]
    done: jnp.ndarray    # [V] bool
    it: jnp.ndarray      # scalar
    its: jnp.ndarray     # [V] per-voxel optimizer iterations
                         # (inference_nlls.cc:110-153 runs the optimizer
                         # per voxel; lanes stop counting once done)


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
            OptionSpec("fwd-initial-posterior", OPT_STR,
                       "MVN matrix file with initial parameter estimates"),
        ]

    def __init__(self, model, options, data, coords, suppdata=None,
                 voxel_data_getter=None, dtype=None, data_plane=None,
                 supp_plane=None):
        self.model = model
        self.options = options
        self.dtype = dtype or (jnp.float64 if options.get_string(
            "dtype", "double") == "double" else jnp.float32)
        self.data = data_plane if data_plane is not None \
            else jnp.asarray(data, self.dtype).T         # [T,V]
        self.coords = jnp.asarray(coords, self.dtype).T  # [3,V]
        if supp_plane is not None:
            self.suppdata = supp_plane
        else:
            self.suppdata = None if suppdata is None \
                or suppdata.shape[1] == 0 \
                else jnp.asarray(suppdata, self.dtype).T
        self.nt, self.nvoxels = self.data.shape
        self._fetch = np.asarray
        self._pre_excised = None

        self.masked_tpoints = options.get_int_list("mt", 1)
        tmask = np.ones((self.nt, 1))
        for t in self.masked_tpoints:
            tmask[t - 1, 0] = 0.0
        self.tmask = jnp.asarray(tmask, self.dtype)  # [T,1]
        self.n_unmasked = int(tmask.sum())

        self.params = resolve_parameters(model, options)
        self.nparams = len(self.params)
        self._voxel_data = voxel_data_getter or (lambda key: (_ for _ in ()).throw(
            KeyError(key)))

        self.marquardt = options.get_bool("lm")
        self.vb_init = options.get_bool("vb-init")
        self.max_its = options.get_int("nlls-max-iterations", 100, minval=1)

        lin_mode = options.get_string("linearization", "auto")
        self.linearizer = Linearizer(model, self.params, self.nt,
                                     mode=lin_mode)

    def initial_means(self):
        """Initial estimate from the model's posterior defaults;
        returns [P,V] planes."""
        v, p = self.nvoxels, self.nparams
        means = np.zeros((v, p))
        for i, spec in enumerate(self.params):
            if spec.prior_type == PRIOR_IMAGE:
                img = np.asarray(self._voxel_data(spec.options["image"]))
                means[:, i] = img.reshape(v, -1)[:, 0]
            else:
                means[:, i] = spec.post.mean
        means = np.array(self.model.init_posterior(
            self.data.T, jnp.asarray(means)))

        # Optional file-based initial estimates (inference_nlls.cc:75-81)
        init_file = self.options.get_string("fwd-initial-posterior",
                                            "modeldefault")
        if init_file != "modeldefault":
            from ..io import mvn as mvn_io
            fmeans, _ = mvn_io.load_matrix(init_file)
            means = np.broadcast_to(fmeans[None, :], means.shape).copy()

        for i, spec in enumerate(self.params):
            means[:, i] = np.asarray(spec.transform.to_latent(
                jnp.asarray(means[:, i])))
        return jnp.asarray(means.T, self.dtype)

    def _bind(self):
        from .vb import RunBindings
        supp = self.suppdata if self.suppdata is not None \
            else jnp.zeros((0, self.nvoxels), self.dtype)
        return RunBindings(data=self.data, coords=self.coords, supp=supp,
                           prior_base_means=())

    def evaluate_model(self, means_planes, key=""):
        """Model prediction [T,V] at latent means [P,V] (for outputs)."""
        v = np.shape(means_planes)[-1]
        if v != self.nvoxels:  # padded sharded engine (see vb.py)
            means_planes = np.concatenate(
                [np.asarray(means_planes)] +
                [np.asarray(means_planes)[..., -1:]] * (self.nvoxels - v),
                axis=-1)
            return self._fetch(self.evaluate_model(means_planes,
                                                   key))[..., :v]
        bind = self._bind()
        lin = self.linearizer if not key else Linearizer(
            self.model, self.params, self.nt, key=key)
        return lin.evaluate(jnp.asarray(means_planes, self.dtype),
                            bind.data, bind.coords, bind.supp)

    def _cost(self, params, bind):
        pred = self.linearizer.evaluate(params, bind.data, bind.coords,
                                        bind.supp)
        r = (bind.data - pred) * self.tmask
        return jnp.sum(r * r, axis=0)

    def _jtj_jtr(self, params, bind):
        offset, jac = self.linearizer(params, bind.data, bind.coords,
                                      bind.supp)
        jac = jac * self.tmask[None]
        r = (bind.data - offset) * self.tmask
        p = self.nparams
        jtj = jnp.stack([
            jnp.stack([jnp.sum(jac[i] * jac[j], axis=0) for j in range(p)])
            for i in range(p)])
        jtr = jnp.stack([jnp.sum(jac[i] * r, axis=0) for i in range(p)])
        return jtj, jtr

    def _step(self, s, bind):
        jtj, jtr = self._jtj_jtr(s.params, bind)
        if self.marquardt:
            damp = sm.diag_of(jtj)
        else:
            damp = jnp.ones_like(s.params)
        damped = sm.add_diag(jtj, s.lam[None] * damp)
        chol, _ok = sm.cholesky_jittered(damped)
        delta = sm.solve_chol_vec(chol, jtr)

        trial = s.params + delta
        trial_cost = self._cost(trial, bind)
        better = (trial_cost < s.cost) & jnp.isfinite(trial_cost)

        params = jnp.where(better[None], trial, s.params)
        cost = jnp.where(better, trial_cost, s.cost)
        lam = jnp.where(better, s.lam * LAMBDA_SHRINK, s.lam * LAMBDA_GROW)
        done = s.done | (lam > LAMBDA_MAX)

        keep = s.done
        return NLLSState(
            jnp.where(keep[None], s.params, params),
            jnp.where(keep, s.cost, cost),
            jnp.where(keep, s.lam, lam),
            done, s.it + 1,
            s.its + (~keep).astype(s.its.dtype))

    def run(self):
        bind = self._bind()
        p0 = self.initial_means()
        s0 = NLLSState(
            params=p0, cost=self._cost(p0, bind),
            lam=jnp.full(self.nvoxels, LAMBDA_INIT, self.dtype),
            done=jnp.zeros(self.nvoxels, bool),
            it=jnp.array(0, jnp.int32),
            its=jnp.zeros(self.nvoxels, jnp.int32))

        @jax.jit
        def solve(s, bind):
            s = jax.lax.while_loop(
                lambda s: (~jnp.all(s.done)) & (s.it < self.max_its),
                lambda st: self._step(st, bind), s)
            # posterior precision = J'J/mse, diagonal floor 1e-6
            jtj, _ = self._jtj_jtr(s.params, bind)
            mse = s.cost / (self.n_unmasked - self.nparams)
            prec = jtj / mse[None, None]
            d = sm.diag_of(prec)
            for i in range(self.nparams):
                prec = prec.at[i, i].set(jnp.maximum(d[i], PREC_DIAG_FLOOR))
            chol, _ = sm.cholesky_jittered(prec)
            cov = sm.inverse_from_chol(chol)
            return s, prec, cov

        s, prec, cov = solve(s0, bind)

        means = self._fetch(s.params).T.copy()              # [V,P]
        cov = np.moveaxis(self._fetch(cov), -1, 0).copy()   # [V,P,P]
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
            iterations=self._fetch(s.its).copy(),
            bad_voxels=bad)
