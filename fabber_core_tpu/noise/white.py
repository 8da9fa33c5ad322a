"""White-noise VB update equations, batched over voxels.

Implements the analytic VB fixed-point updates of Chappell et al. 2009
(Eqs 19-22) with the same numerical conventions as the reference
(noisemodel_white.cc:228-454), re-expressed as batched array
contractions so XLA can tile them onto the MXU:

  * noise precisions phi_i ~ Gamma(b_i, c_i), one per group of
    timepoints defined by the ``noise-pattern`` string (e.g. "12" gives
    odd/even samples independent variances);
  * theta update:  Lambda = Lambda0 + J^T X J,
                   m = Lambda^-1 (J^T X (y - g(m) + J m_c) + Lambda0 m0)
    with X = diag of E[phi] per timepoint (masked timepoints excluded);
  * phi update:    1/b = (k^T Q k + tr(Sigma J^T Q J))/2 + 1/b0,
                   c = (n-1)/2 + c0;
  * free energy:   full ELBO with digamma/gammaln terms.

State layout: phi_b, phi_c arrays of shape [V, Q] (Q = #phi groups).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import digamma, gammaln

from ..core.dists import chol_inv_logdet, gamma_mean, gamma_var, gamma_from_mean_var
from ..exceptions import InvalidOptionValue
from ..options import OptionSpec, OPT_STR, OPT_FLOAT
from .base import NoiseModel, register_noise


class WhiteNoiseState(NamedTuple):
    b: jnp.ndarray  # [V, Q]
    c: jnp.ndarray  # [V, Q]


def parse_noise_pattern(pattern, nt):
    """Expand a pattern string to a group index per timepoint.

    Characters 1-9 then A-Z/a-z index phi groups from 1
    (noisemodel_white.cc:166-201). Returns int array [nt] of 0-based
    group ids and the number of groups.
    """
    if len(pattern) == 0:
        raise InvalidOptionValue("noise-pattern", pattern, "Empty pattern")
    if len(pattern) > nt:
        raise InvalidOptionValue("noise-pattern", pattern,
                                 "Pattern length exceeds data length")
    ids = []
    for ch in pattern:
        if "1" <= ch <= "9":
            n = ord(ch) - ord("0")
        elif "A" <= ch <= "Z":
            n = ord(ch) - ord("A") + 10
        elif "a" <= ch <= "z":
            n = ord(ch) - ord("a") + 10
        else:
            raise InvalidOptionValue("noise-pattern", ch, "Invalid character")
        ids.append(n - 1)
    nq = max(ids) + 1
    full = [ids[i % len(ids)] for i in range(nt)]
    return np.array(full, dtype=np.int32), nq


@register_noise
class WhiteNoiseModel(NoiseModel):
    name = "white"

    def __init__(self, options, nt, masked_tpoints=()):
        super().__init__(options, nt, masked_tpoints)
        pattern = options.get_string("noise-pattern", "1")
        group_ids, self.nphis = parse_noise_pattern(pattern, nt)

        # Indicator masks Q_i [Q, T]; masked timepoints belong to no group
        unmasked = np.ones(nt, dtype=bool)
        for t in self.masked_tpoints:  # 1-indexed
            unmasked[t - 1] = False
        self.qmasks = np.zeros((self.nphis, nt))
        for t in range(nt):
            if unmasked[t]:
                self.qmasks[group_ids[t], t] = 1.0
        self.ntimes_per_group = self.qmasks.sum(axis=1)  # Qi.Trace()
        self.n_unmasked = int(unmasked.sum())

        self.locked_noise_stdev = options.get_float("locked-noise-stdev", -1.0)
        self.phiprior = options.get_float("prior-noise-stddev", -1.0)
        if self.phiprior < 0 and self.phiprior != -1:
            raise InvalidOptionValue("prior-noise-stddev", self.phiprior, "Must be > 0")

    @classmethod
    def get_options(cls):
        return [
            OptionSpec("noise-pattern", OPT_STR,
                       "Repeating pattern of noise variances for each point "
                       "(e.g. 12 gives odd/even different variances)", default="1"),
            OptionSpec("locked-noise-stdev", OPT_FLOAT,
                       "Fix noise std dev to this value", default="-1"),
            OptionSpec("prior-noise-stddev", OPT_FLOAT,
                       "Prior noise std dev", default="-1"),
        ]

    @property
    def num_params(self):
        return self.nphis

    # -- state ------------------------------------------------------------
    def initial_state(self, nvoxels, dtype):
        """Hardcoded initial dists (noisemodel_white.cc:127-164)."""
        if self.phiprior == -1:
            prior_b, prior_c = 1e6, 1e-6
            # tiny initial noise precision helps (reference's observation)
            post_b, post_c = 1e-8, 50.0
        else:
            prior_c = post_c = 0.5
            prior_b = post_b = 1.0 / (self.phiprior ** 2 * prior_c)
        shape = (nvoxels, self.nphis)
        prior = WhiteNoiseState(jnp.full(shape, prior_b, dtype),
                                jnp.full(shape, prior_c, dtype))
        post = WhiteNoiseState(jnp.full(shape, post_b, dtype),
                               jnp.full(shape, post_c, dtype))
        return prior, post

    def state_to_mvn(self, state):
        means = gamma_mean(state.b, state.c)
        var = gamma_var(state.b, state.c)
        v, q = means.shape
        cov = jnp.zeros((v, q, q), means.dtype)
        cov = cov.at[:, jnp.arange(q), jnp.arange(q)].set(var)
        return means, cov

    def state_from_mvn(self, means, cov):
        var = jnp.diagonal(cov, axis1=-2, axis2=-1)
        b, c = gamma_from_mean_var(means, var)
        return WhiteNoiseState(b, c)

    # -- VB updates (pure, batched) ---------------------------------------
    def phi_timepoint_weights(self, state):
        """X diagonal [V,T]: E[phi] at each unmasked timepoint."""
        phimeans = gamma_mean(state.b, state.c)  # [V,Q]
        q = jnp.asarray(self.qmasks, state.b.dtype)  # [Q,T]
        return phimeans @ q  # [V,T]

    def update_theta(self, noise_post, means, prior_means, prior_prec_diag,
                     centre, offset, J, data, lm_alpha=None):
        """Eq 19/20: returns (new_means, prec, cov, ok).

        All array args are batched: means/prior_means/centre [V,P],
        prior_prec_diag [V,P], offset/data [V,T], J [V,T,P].
        lm_alpha [V] enables the Levenberg-damped variant
        (noisemodel_white.cc:330-354) on lanes where alpha > 0.
        """
        x = self.phi_timepoint_weights(noise_post)  # [V,T]
        xj = J * x[:, :, None]                      # [V,T,P]
        ltmp = jnp.einsum("vtp,vtq->vpq", xj, J)
        prec = ltmp + _batch_diag(prior_prec_diag)
        cov, _, ok = chol_inv_logdet(prec)

        m_tmp = jnp.einsum("vtp,vt->vp", xj,
                           data - offset + jnp.einsum("vtp,vp->vt", J, centre))
        rhs = m_tmp + prior_prec_diag * prior_means
        new_means = jnp.einsum("vpq,vq->vp", cov, rhs)

        if lm_alpha is not None:
            # Levenberg-Marquardt damped update (Appendix C form)
            delta = (jnp.einsum("vtp,vt->vp", xj, data - offset)
                     + prior_prec_diag * prior_means
                     - prior_prec_diag * centre)
            precdiag = jnp.diagonal(prec, axis1=-2, axis2=-1)
            damped = prec + _batch_diag(lm_alpha[:, None] * precdiag)
            dcov, _, dok = chol_inv_logdet(damped)
            lm_means = centre + jnp.einsum("vpq,vq->vp", dcov, delta)
            use_lm = lm_alpha > 0.0
            new_means = jnp.where(use_lm[:, None], lm_means, new_means)
            ok = jnp.where(use_lm, dok, ok)

        return new_means, prec, cov, ok

    def update_noise(self, noise_post, noise_prior, means, cov,
                     centre, offset, J, data):
        """Eq 21/22 per phi group; returns new WhiteNoiseState."""
        k = data - offset + jnp.einsum("vtp,vp->vt", J, centre - means)  # [V,T]
        dtype = k.dtype
        new_b, new_c = [], []
        for i in range(self.nphis):
            qi = jnp.asarray(self.qmasks[i], dtype)  # [T]
            kqk = jnp.einsum("vt,t,vt->v", k, qi, k)
            # tr(Sigma J^T Q J)
            jqj_tr = jnp.einsum("vpq,vtq,t,vtp->v", cov, J, qi, J)
            tmp = kqk + jqj_tr
            b = 1.0 / (tmp * 0.5 + 1.0 / noise_prior.b[:, i])
            c = jnp.full_like(b, (self.ntimes_per_group[i] - 1) * 0.5) \
                + noise_prior.c[:, i]
            if self.locked_noise_stdev > 0:
                b = 1.0 / c / self.locked_noise_stdev ** 2
            new_b.append(b)
            new_c.append(c)
        return WhiteNoiseState(jnp.stack(new_b, axis=1), jnp.stack(new_c, axis=1))

    def free_energy(self, noise_post, noise_prior, means, prec, cov,
                    prior_means, prior_prec_diag, centre, offset, J, data):
        """Full ELBO (noisemodel_white.cc:365-454). Returns F [V]."""
        dtype = means.dtype
        k = data - offset + jnp.einsum("vtp,vp->vt", J, centre - means)
        n_theta = means.shape[1]
        n_times = self.n_unmasked
        log2pi = jnp.log(2 * jnp.pi).astype(dtype)

        _, logdet_prec, _ = chol_inv_logdet(prec)
        exp_log_theta_dist = 0.5 * logdet_prec - 0.5 * n_theta * (log2pi + 1.0)

        exp_log_phi_dist = jnp.zeros(means.shape[0], dtype)
        part0 = jnp.zeros_like(exp_log_phi_dist)
        part2 = jnp.zeros_like(exp_log_phi_dist)
        part9 = jnp.zeros_like(exp_log_phi_dist)
        for i in range(self.nphis):
            si, ci = noise_post.b[:, i], noise_post.c[:, i]
            si0, ci0 = noise_prior.b[:, i], noise_prior.c[:, i]
            dg_ls = digamma(ci) + jnp.log(si)
            exp_log_phi_dist += (-gammaln(ci) - ci * jnp.log(si) - ci
                                 + (ci - 1.0) * dg_ls)
            part0 += dg_ls * (self.ntimes_per_group[i] * 0.5 + ci0 - 1.0)
            part9 += -gammaln(ci0) - ci0 * jnp.log(si0) - si * ci / si0
            qi = jnp.asarray(self.qmasks[i], dtype)
            kqk = jnp.einsum("vt,t,vt->v", k, qi, k)
            # NB: the trace term carries no phi weighting, mirroring the
            # reference expression exactly (noisemodel_white.cc:413-417)
            jqj_tr = jnp.einsum("vtq,t,vtp,vpq->v", J, qi, J, cov)
            part2 += -0.5 * si * ci * kqk - 0.5 * jqj_tr

        part3 = (0.5 * jnp.sum(jnp.log(prior_prec_diag), axis=1)
                 - 0.5 * n_times * log2pi - 0.5 * n_theta * log2pi)
        dm = means - prior_means
        part4 = -0.5 * jnp.sum(dm * prior_prec_diag * dm, axis=1)
        part5 = -0.5 * jnp.sum(
            jnp.diagonal(cov, axis1=-2, axis2=-1) * prior_prec_diag, axis=1)

        return (-exp_log_theta_dist - exp_log_phi_dist
                + part0 + part2 + part3 + part4 + part5 + part9)


def _batch_diag(d):
    """[V,P] -> [V,P,P] diagonal matrices."""
    return jnp.zeros(d.shape + (d.shape[-1],), d.dtype) \
        .at[..., jnp.arange(d.shape[-1]), jnp.arange(d.shape[-1])].set(d)
