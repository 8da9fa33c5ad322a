"""Spectral (eigenbasis) route for fixed-design white-noise VB.

For a fixed design D, white noise with a SINGLE phi group, and
voxel-uniform prior precisions, one VB iteration is

    prec   = phi * A + diag(pp),      A = D'QD   (constant)
    means  = prec^-1 (phi * u_y + pp*pm)
    kqk    = r'Qr - 2 d'u_0 + d'A d,  d = means - m0
    tr     = tr(prec^-1 A)
    phi'   = c_post / (0.5*(kqk + tr) + 1/b0)

(noisemodel_white.cc Eq 19-22 via the sufficient-statistics form).
Whitening by W = diag(pp)^-1/2 and diagonalizing the CONSTANT matrix
W A W = E diag(lam) E' turns every iteration into P independent scalar
rationals per voxel:

    denom_i = phi*lam_i + 1
    mt_i    = (phi*ut_i + vt_i) / denom_i          (means, eigenbasis)
    tr      = sum_i lam_i / denom_i
    quad    = sum_i lam_i * (mt_i - m0t_i)^2
    cross   = sum_i (mt_i - m0t_i) * u0t_i

~20 flops per voxel-iteration instead of a P x P Cholesky/inverse —
the whole 10-iteration fixed point costs less than reading the
sufficient statistics. The P x P posterior (means/prec/cov in the
original basis) is reconstructed ONCE from the final phi. Everything
is plain XLA (the loop body fuses; no Pallas needed).

The fixed point is algebraically identical to the stats route; only
the floating-point evaluation order differs, so results match to
roundoff at the problem's conditioning (tests/test_spectral.py pins
engine-level agreement). The eigendecomposition of the P x P constant
runs in float64 numpy at trace time.

Eligibility (gated by the engine): fixed design + white noise with
one phi group + maxits + iteration-invariant priors (the same gates
as the whole-loop kernel) + no locked noise stdev.
"""

import numpy as np
import jax
import jax.numpy as jnp


def spectral_basis(design_host, qmask_host, pp_host):
    """Host-side f64 eigendecomposition of the whitened design Gram.

    design [T,P], qmask [T] 0/1 (single phi group), pp [P] prior
    precisions. Returns (A [P,P], lam [P], ew [P,P], winv [P]) where
    ew = W @ E (the means reconstruction operator), winv = 1/sqrt(pp)
    = W's diagonal, and columns of E are eigenvectors of W A W.
    """
    d = np.asarray(design_host, np.float64)
    q = np.asarray(qmask_host, np.float64)
    pp = np.asarray(pp_host, np.float64).reshape(-1)
    a = d.T @ (q[:, None] * d)
    w = 1.0 / np.sqrt(pp)
    lam, e = np.linalg.eigh(w[:, None] * a * w[None, :])
    lam = np.maximum(lam, 0.0)  # Gram matrix: clip f64 roundoff
    return a, lam, w[:, None] * e, w


def make_spectral_loop(design_host, qmask_host, pp_host, n_iters,
                       init_b, init_c, inv_b0, c_post, dtype):
    """Build fn(m0 [P,V], rtqr [1,V] or [V], dtqr [P,V], pm [P,V])
    -> (means [P,V], prec [P,P,V], cov [P,P,V], b [1,V], c [1,V]).

    All inputs are the single-group white DesignStats planes; pm is
    the (possibly voxelwise, e.g. image-prior) prior means.
    """
    a_h, lam_h, ew_h, winv_h = spectral_basis(design_host, qmask_host,
                                              pp_host)
    p = a_h.shape[0]
    pp_h = np.asarray(pp_host, np.float64).reshape(-1)

    def run(m0, rtqr, dtqr, pm):
        dt = m0.dtype
        lam = jnp.asarray(lam_h, dt)[:, None]          # [P,1]
        ew = jnp.asarray(ew_h, dt)                     # [P,P]  W E
        # etw applies E'W ( = (WE)' since W is diagonal), etwi applies
        # E'W^-1 ( = (W^-1 E)'); both built from the host f64 factors
        e_h = ew_h / winv_h[:, None]                   # E (host)
        etw = jnp.asarray(ew_h.T, dt)                         # E' W
        etwi = jnp.asarray((e_h / winv_h[:, None]).T, dt)     # E' W^-1
        a = jnp.asarray(a_h, dt)
        pp = jnp.asarray(pp_h, dt)[:, None]            # [P,1]

        rtqr = rtqr.reshape(-1)[None, :] if rtqr.ndim == 1 else rtqr
        dtqy = dtqr + a @ m0                           # D'Qy  [P,V]
        ut = etw @ dtqy                                # E'W u_y
        u0t = etw @ dtqr                               # E'W u_0
        vt = etw @ (pp * pm)                           # E'W (pp*pm)
        m0t = etwi @ m0                                # E'W^-1 m0

        s0 = jnp.full_like(rtqr[0], float(init_b) * float(init_c))
        ib0 = dt.type(float(inv_b0))
        cpost = dt.type(float(c_post))

        def body(_, carry):
            s, _b = carry
            denom = s[None, :] * lam + 1.0             # [P,V]
            mt = (s[None, :] * ut + vt) / denom
            d_ = mt - m0t
            cross = jnp.sum(d_ * u0t, axis=0)
            quad = jnp.sum(lam * d_ * d_, axis=0)
            tr = jnp.sum(lam / denom, axis=0)
            kqk = jnp.maximum(rtqr[0] - 2.0 * cross + quad, 0.0)
            b = 1.0 / ((kqk + tr) * 0.5 + ib0)
            return b * cpost, b

        s_fin, b_fin = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_iters - 1), body, (s0, s0))
        # the last iteration's posterior is reconstructed from the
        # phi that produced it (s entering iteration n)
        denom = s_fin[None, :] * lam + 1.0
        mt = (s_fin[None, :] * ut + vt) / denom
        means = ew @ mt
        # cov_ij = sum_k (WE)_ik (WE)_jk / denom_k ; prec = s A + diag(pp)
        cov = jnp.einsum("ik,jk,kv->ijv", ew, ew, 1.0 / denom)
        # run the final noise update so b/c reflect the final means
        d_ = mt - m0t
        cross = jnp.sum(d_ * u0t, axis=0)
        quad = jnp.sum(lam * d_ * d_, axis=0)
        tr = jnp.sum(lam / denom, axis=0)
        kqk = jnp.maximum(rtqr[0] - 2.0 * cross + quad, 0.0)
        b = (1.0 / ((kqk + tr) * 0.5 + ib0))[None, :]
        c = jnp.full_like(b, cpost)
        prec = (s_fin[None, None, :] * a[:, :, None]
                + jnp.eye(p, dtype=dt)[:, :, None] * pp[:, None])
        return means, prec, cov, b, c

    return run
