"""--spatial-prior-output-correction / thetaWithoutPrior: the
likelihood-only posterior (precision J'XJ with NO prior term,
noisemodel.h:132, noisemodel_white.cc:357-362). The reference snapshot
declares the surface but never invokes it; here it is a working option
evaluated at the final state."""

import numpy as np
import pytest

from fabber_core_tpu.inference.spatial import SpatialVBInference
from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def _grid(nx, ny):
    coords = []
    for y in range(ny):
        for x in range(nx):
            coords.append([x, y, 0])
    return np.array(coords, float)


def _poly_data(nv, nt, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(1, nt + 1, dtype=float)
    design = np.stack([np.ones(nt), t, t * t], 1)
    beta = np.stack([1.0 + 0.01 * np.arange(nv),
                     np.full(nv, 0.05), np.full(nv, -0.001)], 1)
    data = beta @ design.T + 0.1 * rng.standard_normal((nv, nt))
    return data.astype(np.float32), design


def test_noprior_is_ols_for_fixed_design():
    """With a fixed design and white noise, resid = data exactly, so
    the noprior means are the plain OLS solution (the phi weighting
    cancels in the means) and the cov is (phi D'D)^-1."""
    nv, nt = 200, 30
    data, design = _poly_data(nv, nt)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    opts = RunOptions({"model": "poly", "degree": "2", "noise": "white",
                       "max-iterations": "10", "dtype": "single",
                       "spatial-prior-output-correction": True})
    eng = VBInference(get_model_class("poly")(opts), opts, data, coords)
    res = eng.run()
    assert res.noprior_means is not None

    ols = np.linalg.lstsq(design, data.T, rcond=None)[0].T   # [V,P]
    np.testing.assert_allclose(res.noprior_means, ols,
                               rtol=2e-4, atol=2e-4)
    # covariance: inverse of phi * D'D per voxel
    phi = res.noise_means[:, 0]
    dtd_inv = np.linalg.inv(design.T @ design)
    expect_cov = dtd_inv[None] / phi[:, None, None]
    np.testing.assert_allclose(res.noprior_cov, expect_cov,
                               rtol=2e-3, atol=1e-6)
    # posterior means carry the prior; noprior must NOT equal them
    assert not np.allclose(res.noprior_means, res.means, atol=1e-6)


def test_noprior_unshrinks_spatial_estimates():
    """Under a strong spatial prior the posterior is shrunk toward
    neighbours; the noprior maps recover the per-voxel OLS fit."""
    coords = _grid(8, 6)
    nv, nt = len(coords), 20
    data, design = _poly_data(nv, nt, seed=3)
    opts = RunOptions({"model": "poly", "degree": "2", "noise": "white",
                       "method": "spatialvb", "max-iterations": "8",
                       "dtype": "single", "param-spatial-priors": "MMM",
                       "spatial-prior-output-correction": True})
    eng = SpatialVBInference(get_model_class("poly")(opts), opts, data,
                             coords)
    res = eng.run()
    ols = np.linalg.lstsq(design, data.T, rcond=None)[0].T
    np.testing.assert_allclose(res.noprior_means, ols,
                               rtol=2e-4, atol=2e-4)
    # the spatially-shrunk posterior differs from OLS more than the
    # corrected output does
    err_post = np.abs(res.means - ols).mean()
    err_np = np.abs(res.noprior_means - ols).mean()
    assert err_np < 0.1 * err_post


@pytest.mark.parametrize("noise,extra", [
    ("white", {}),
    ("ar", {}),
])
def test_noprior_generic_route(noise, extra):
    """Nonlinear (exp) model: the generic-Jacobian noprior evaluation
    produces finite, looser-than-posterior estimates for both noise
    models (noisemodel_ar.cc:612-632 declares the AR variant too)."""
    rng = np.random.default_rng(5)
    nv, nt = 60, 40
    tt = np.arange(nt) * 0.05
    data = (np.exp(-1.0 * tt)[None, :]
            + 0.05 * rng.standard_normal((nv, nt))).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    opts = RunOptions({"model": "exp", "dt": "0.05", "noise": noise,
                       "max-iterations": "15", "dtype": "single",
                       "spatial-prior-output-correction": True, **extra})
    eng = VBInference(get_model_class("exp")(opts), opts, data, coords)
    res = eng.run()
    assert np.isfinite(res.noprior_means).all()
    assert np.isfinite(res.noprior_cov).all()
    # removing the prior precision can only widen the posterior
    d_post = np.diagonal(res.cov, axis1=1, axis2=2)
    d_np = np.diagonal(res.noprior_cov, axis1=1, axis2=2)
    assert (d_np >= d_post * 0.99).all()
    # weak priors: the two posteriors agree to a few percent of sd
    sd = np.sqrt(d_post)
    assert np.max(np.abs(res.means - res.noprior_means) / sd) < 0.5
