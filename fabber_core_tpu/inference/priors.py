"""Prior application, vectorized over voxels (SoA layout).

The reference applies one Prior object per parameter per voxel per
iteration (priors.cc:108-181). Here the non-spatial prior family
(default/normal, image, ARD) becomes a single vectorized update of the
prior plane arrays; spatial priors (types M/m/P/p) live in
inference/spatial.py because they couple voxels through the MRF graph.

Prior precision is always diagonal in this engine: the reference's
per-voxel prior MVN starts as the identity and only ever has its
diagonal written (priors.cc:112-117), so we carry [P,V] planes instead
of [P,P,V] matrices.
"""

import math

import jax.numpy as jnp
import numpy as np

from ..exceptions import DataNotFound
from ..models.base import PRIOR_ARD, PRIOR_IMAGE, SPATIAL_PRIOR_TYPES

# digamma(0.5) = -euler_gamma - 2 ln 2 and gammaln(0.5), for the ARD
# free energy term (Chappell 2009 App. D)
_DIGAMMA_HALF = -0.5772156649015328606 - 2.0 * math.log(2.0)
_GAMMALN_HALF = math.lgamma(0.5)


class PriorSetup:
    """Precomputed per-parameter prior configuration for one run."""

    def __init__(self, params, voxel_data, nvoxels, dtype):
        """params: list[ParamSpec] with latent-space priors.
        voxel_data: callable key -> [V] or [V,T] array (image priors).
        """
        self.params = params
        self.nparams = len(params)
        self.nvoxels = nvoxels
        self.dtype = dtype

        base_means = np.array([[p.prior.mean] for p in params], dtype)  # [P,1]
        base_precs = np.array([[p.prior.prec] for p in params], dtype)

        # Per-voxel prior mean table; image priors get voxelwise means.
        # Without image priors this stays a [P,1] broadcast (free).
        self.image_params = [i for i, p in enumerate(params)
                             if p.prior_type == PRIOR_IMAGE]
        if self.image_params:
            means_vox = np.broadcast_to(
                base_means, (self.nparams, nvoxels)).copy()
            for i in self.image_params:
                key = params[i].options["image"]
                img = np.asarray(voxel_data(key), dtype).reshape(nvoxels, -1)
                means_vox[i] = img[:, 0]
            self.base_means = jnp.asarray(means_vox)   # [P,V]
        else:
            self.base_means = jnp.asarray(base_means)  # [P,1] broadcastable
        self.base_precs = jnp.asarray(base_precs)      # [P,1]
        self.base_vars = jnp.asarray(
            np.array([[p.prior.var] for p in params], dtype))  # [P,1]
        self.ard_mask = np.array(
            [p.prior_type == PRIOR_ARD for p in params])
        self.has_ard = bool(self.ard_mask.any())
        self.spatial_params = [i for i, p in enumerate(params)
                               if p.prior_type in SPATIAL_PRIOR_TYPES]

    def apply(self, prior_means, prior_prec, post_means, post_cov_diag, it,
              base_means=None):
        """One sweep of non-spatial prior updates.

        All planes are [P,V]. Returns (prior_means, prior_prec,
        f_contribs) where f_contribs[k] is prior k's free-energy
        contribution (non-zero only for ARD). base_means may be passed
        explicitly (threaded through jit as an argument rather than
        captured, since image-prior tables scale with V).
        """
        nv = post_means.shape[1]
        shape = (self.nparams, nv)
        if base_means is None:
            base_means = self.base_means
        means = jnp.broadcast_to(base_means, shape)
        precs = jnp.broadcast_to(self.base_precs, shape)
        f_contribs = jnp.zeros(shape, self.dtype)

        if self.has_ard:
            ard = jnp.asarray(self.ard_mask)[:, None]
            # ARD prior variance = posterior_mean^2 + posterior_var from
            # iteration 1 onwards; model default on iteration 0
            # (priors.cc:150-181). Prior mean stays at the model default.
            new_var = post_means ** 2 + post_cov_diag
            ard_var = jnp.where(it == 0,
                                jnp.broadcast_to(self.base_vars, shape),
                                new_var)
            precs = jnp.where(ard, 1.0 / ard_var, precs)
            # free energy contribution (computed from new_var regardless
            # of iteration, as in the reference)
            b = 2.0 / new_var
            fard = (-1.5 * (jnp.log(b) + _DIGAMMA_HALF) - 0.5 - _GAMMALN_HALF
                    - 0.5 * jnp.log(b))
            f_contribs = jnp.where(ard, fard, f_contribs)

        # Spatial parameters are handled by the spatial engine; keep
        # their existing prior state untouched here.
        if self.spatial_params:
            spatial = np.zeros(self.nparams, bool)
            spatial[self.spatial_params] = True
            sp = jnp.asarray(spatial)[:, None]
            means = jnp.where(sp, prior_means, means)
            precs = jnp.where(sp, prior_prec, precs)

        return means, precs, f_contribs


def make_voxel_data_getter(data_store, nvoxels):
    """Adapter giving PriorSetup access to named voxel data arrays."""
    def get(key):
        try:
            target = data_store[key]
        except KeyError:
            raise DataNotFound(key)
        # data-key indirection: the stored value may itself be a key
        if isinstance(target, str):
            return get(target)
        return target
    return get
