"""Gauss-Seidel spatial sweep parity.

The reference's spatial loop updates fwd_post IN PLACE while sweeping
voxels in index order, so voxel v's spatial prior reads already-updated
posteriors of voxels < v (inference_vb.cc:614-672). The engine's
default Jacobi sweep is the parallel-correct reformulation;
spatial-sweep-mode=gauss-seidel reproduces the reference ordering
exactly. This file pins it against an independent sequential numpy
oracle (type-M MRF prior, white noise, poly degree 0).
"""

import numpy as np
import pytest

from fabber_core_tpu.inference.spatial import (SpatialVBInference, AK_INIT,
                                               AK_FLOOR, MRF_JITTER)
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions

NX, NY, NT, ITS = 5, 4, 10, 4
Q1, Q2 = 10.0, 1.0


def grid_neighbours(nx, ny):
    """First neighbours on a 2-D grid, x-fastest voxel order."""
    neigh = []
    for y in range(ny):
        for x in range(nx):
            ns = []
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                xx, yy = x + dx, y + dy
                if 0 <= xx < nx and 0 <= yy < ny:
                    ns.append(yy * nx + xx)
            neigh.append(ns)
    return neigh


def gs_oracle(data, m0, var0, base_mean, base_prec, its):
    """Sequential reference-ordering sweeps for poly degree 0 (design =
    ones), type-M spatial prior, white noise. data [V,T]."""
    nv, nt = data.shape
    neigh = grid_neighbours(NX, NY)
    m = np.array(m0, float)
    cov = np.array(var0, float)
    b = np.full(nv, 1e-8)
    c = np.full(nv, 50.0)
    b0, c0 = 1e6, 1e-6
    ak = AK_INIT
    dtd = float(nt)  # design = ones [T,1]
    dty = data.sum(axis=1)  # [V]

    for sweep in range(its):
        if sweep > 0:
            # Penny Fig-4 aK from pre-sweep state (type M)
            nn = np.array([len(n) for n in neigh], float)
            trace_term = np.sum(cov * (nn + MRF_JITTER))
            nsum = np.array([m[n].sum() for n in neigh])
            swk = nn * m - nsum
            term2 = np.sum(swk * m)
            gk = 1.0 / (0.5 * trace_term + 0.5 * term2 + 1.0 / Q1)
            ak = max(gk * (nv * 0.5 + Q2), AK_FLOOR)

        # phase A: sequential prior+theta (voxel v reads CURRENT m)
        for v in range(nv):
            nn_v = float(len(neigh[v]))
            contrib = m[neigh[v]].sum()
            spatial_prec = ak * (nn_v + MRF_JITTER)
            new_prec = base_prec + spatial_prec
            spatial_mean = contrib / nn_v
            new_mean = (1.0 / new_prec) * spatial_prec * spatial_mean

            phi = b[v] * c[v]
            prec_v = new_prec + phi * dtd
            cov_v = 1.0 / prec_v
            m[v] = cov_v * (phi * dty[v] + new_prec * new_mean)
            cov[v] = cov_v

        # phase B: noise update from the new means
        for v in range(nv):
            k = data[v] - m[v]
            tmp = k @ k + cov[v] * dtd
            b[v] = 1.0 / (tmp * 0.5 + 1.0 / b0)
            c[v] = (nt - 1) * 0.5 + c0
    return m, cov, b * c


def build_engine(data, coords, mode, route="stats"):
    opts = RunOptions({
        "model": "poly", "degree": "0", "noise": "white",
        "method": "spatialvb", "param-spatial-priors": "M",
        "spatial-dims": "2", "max-iterations": str(ITS),
        "spatial-sweep-mode": mode, "fixed-design-route": route})
    return SpatialVBInference(get_model_class("poly")(opts), opts,
                              data, coords)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(17)
    nv = NX * NY
    data = 4.0 + rng.normal(0, 0.5, (nv, NT))
    coords = np.array([[x, y, 0] for y in range(NY) for x in range(NX)],
                      float)
    return data, coords


@pytest.mark.parametrize("route", ["stats", "direct"])
def test_gs_matches_sequential_oracle(problem, route):
    data, coords = problem
    eng = build_engine(data, coords, "gauss-seidel", route)
    res = eng.run()

    spec = eng.params[0]
    m0 = np.full(len(data), spec.post.mean)
    var0 = np.full(len(data), spec.post.var)
    om, ocov, ophi = gs_oracle(data, m0, var0, spec.prior.mean,
                               spec.prior.prec, ITS)
    np.testing.assert_allclose(res.means[:, 0], om, rtol=1e-9)
    np.testing.assert_allclose(res.cov[:, 0, 0], ocov, rtol=1e-8)
    np.testing.assert_allclose(res.noise_means[:, 0], ophi, rtol=1e-9)


def test_gs_differs_from_jacobi_then_converges(problem):
    data, coords = problem
    r_gs = build_engine(data, coords, "gauss-seidel").run()
    r_j = build_engine(data, coords, "jacobi").run()
    # different orderings genuinely differ at few sweeps...
    assert not np.allclose(r_gs.means, r_j.means, rtol=1e-12, atol=0)
    # ...but agree closely (same fixed point being approached)
    np.testing.assert_allclose(r_gs.means, r_j.means, rtol=2e-2)


def test_bad_mode_rejected(problem):
    data, coords = problem
    from fabber_core_tpu.exceptions import InvalidOptionValue
    with pytest.raises(InvalidOptionValue):
        build_engine(data, coords, "red-black")
