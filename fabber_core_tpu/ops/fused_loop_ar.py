"""Whole-VB-loop Pallas kernel for AR(1) noise (fixed-design stats).

Same construction as ops/fused_loop.py (white noise): the AR(1)
sufficient-statistics route (noise/ar1.py Ar1DesignStats) reduces every
VB iteration to [P,V]-plane arithmetic, so the ENTIRE maxits fixed
point runs in one Pallas invocation on VMEM-resident state. Per voxel
tile the statistics are read from HBM once and only the final
posterior + AR noise state are written back.

Scope: single-echo, no cross terms (num-echoes=1, ar1-cross-terms=none
— the common configuration and the BASELINE.json ar1 config). Then
A=2 alphas with a DIAGONAL prior precision, one phi group, and the
basis-spec list is exactly [(0,0), (1,0), (2,0)] (noisemodel_ar.cc
alpha-power indices), so the alpha MVN update degenerates to scalar
planes: only alpha_1 is ever updated (alpha_2 keeps its prior) and the
2x2 alpha precision stays diagonal. The per-iteration arithmetic is
identical to Ar1NoiseModel.update_theta_stats / update_noise_stats
(Eq 19/20 + UpdateAlpha/UpdatePhi, noisemodel_ar.cc:433-557), pinned
by tests/test_fused_loop_ar.py against the XLA stats route.

Eligibility is gated by the engine (inference/vb.py): fixed-design
model, maxits detector, iteration-invariant priors, f32, default
noise initial prior/posterior.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_loop import (ROWS, DEFAULT_BLOCK, make_plane_algebra,
                         make_voxel_layout)

NSPECS = 3  # (0,0), (1,0), (2,0) — single-echo, no cross terms


def make_fused_ar_loop(nparams, n_iters, nvoxels, dtype,
                       block=DEFAULT_BLOCK, interpret=False):
    """Build the whole-loop callable.

    Returns fn(m0 [P,V], rmr [S,V], dmr [S,P,V], consts [K*ROWS,1],
               prior_means [P,V], prior_prec [P,V])
        -> (means [P,V], prec [P,P,V], cov [P,P,V],
            amu0 [1,V], acov00 [1,V], aprec00 [1,V], b [1,V], c [1,V])

    consts packs, in order (see pack_ar_consts): dmd flattened
    [S*P*P], ap00, ap11 (alpha prior precision diagonal), inv_b0,
    c_post, init_b, init_c, init_acov00, init_aprec00.
    """
    p = nparams
    s_n = NSPECS
    tri, ti, chol_tri_jittered, inv_from_chol = make_plane_algebra(p, dtype)
    ntri = len(tri)

    if block % ROWS != 0 or nvoxels % block != 0:
        raise ValueError(
            f"block={block} must be a multiple of ROWS={ROWS} and divide "
            f"nvoxels={nvoxels} (caller pads)")

    def plane(ref, i):
        return ref[i * ROWS:(i + 1) * ROWS]

    def kernel(m0_ref, rmr_ref, dmr_ref, consts_ref, pm_ref, pp_ref,
               means_out, prec_out, cov_out, amu_out, acov_out,
               aprec_out, b_out, c_out):
        b = m0_ref.shape[-1]

        def cst(row):
            # sublane-replicated consts: [ROWS,1] slab, lane broadcast
            # happens in the consuming arithmetic
            return consts_ref[row * ROWS:(row + 1) * ROWS, 0:1]

        def dmd(s, i, j):
            return cst(s * p * p + i * p + j)

        base = s_n * p * p
        ap00, ap11 = cst(base), cst(base + 1)
        inv_b0, c_post = cst(base + 2), cst(base + 3)
        init_b, init_c = cst(base + 4), cst(base + 5)
        init_acov00, init_aprec00 = cst(base + 6), cst(base + 7)

        m0 = [plane(m0_ref, i) for i in range(p)]
        pm = [plane(pm_ref, i) for i in range(p)]
        pp = [plane(pp_ref, i) for i in range(p)]
        rmr = [plane(rmr_ref, s) for s in range(s_n)]
        dmr = [[plane(dmr_ref, s * p + a) for a in range(p)]
               for s in range(s_n)]
        # D'M_s y = D'M_s r0 + (D'M_s D) m0 — iteration-invariant
        dmy = [[dmr[s][a] + sum(dmd(s, a, j) * m0[j] for j in range(p))
                for a in range(p)] for s in range(s_n)]

        ones = jnp.ones((ROWS, b), dtype)

        def body(_, carry):
            # carry rows: b, c, amu0, acov00, aprec00, means[P],
            # prec tri, cov tri (each a ROWS-tall plane)
            st, _means, _prec, _cov = carry
            bq, cq = plane(st, 0), plane(st, 1)
            amu0, acov00 = plane(st, 2), plane(st, 3)

            sici = bq * cq  # E[phi]
            # marginal coefficients of Q = sum_s coeff_s M_s
            # (noisemodel_ar.cc:197-222): [1, mu, cov+mu^2]
            coeff = [None, amu0, acov00 + amu0 * amu0]

            # ---- theta update (update_theta_stats arithmetic) --------
            w = [sici, sici * coeff[1], sici * coeff[2]]
            prec = []
            for i, j in tri:
                v = 0.0
                for s in range(s_n):
                    v = v + w[s] * dmd(s, i, j)
                if i == j:
                    v = v + pp[i]
                prec.append(v)
            ch = chol_tri_jittered(
                lambda i, j: prec[ti[(max(i, j), min(i, j))]])
            cov = inv_from_chol(ch)
            rhs = []
            for a in range(p):
                v = 0.0
                for s in range(s_n):
                    v = v + w[s] * dmy[s][a]
                rhs.append(v + pp[a] * pm[a])
            means = [sum(cov[(i, j)] * rhs[j] for j in range(p))
                     for i in range(p)]

            # ---- noise quadratics: op_s = k'M_s k + tr(cov D'M_s D) --
            delta = [means[a] - m0[a] for a in range(p)]
            op = []
            for s in range(s_n):
                cross = sum(delta[a] * dmr[s][a] for a in range(p))
                acc = rmr[s] - 2.0 * cross
                for a in range(p):
                    for j in range(p):
                        acc = acc + dmd(s, a, j) * (delta[a] * delta[j]
                                                    + cov[(a, j)])
                op.append(acc)

            # ---- alpha update (noisemodel_ar.cc:466-513, diagonal) ---
            new_aprec00 = ap00 + sici * op[2]
            new_acov00 = 1.0 / new_aprec00
            # prior contribution to the rhs is zero (zero prior mean)
            new_amu0 = (-0.5) * sici * op[1] * new_acov00

            # ---- phi update with the NEW alpha marginals -------------
            # (noisemodel_ar.cc:530-556)
            c_new2 = new_acov00 + new_amu0 * new_amu0
            tmp1 = op[0] + new_amu0 * op[1] + c_new2 * op[2]
            new_b = 1.0 / (tmp1 * 0.5 + inv_b0)
            new_c = c_post * ones

            st_new = jnp.concatenate(
                [new_b, new_c, new_amu0, new_acov00, new_aprec00], 0)
            return (st_new,
                    jnp.concatenate(means, 0),
                    jnp.concatenate(prec, 0),
                    jnp.concatenate([cov[ij] for ij in tri], 0))

        st0 = jnp.concatenate([
            init_b * ones, init_c * ones,
            jnp.zeros((ROWS, b), dtype),       # amu0
            init_acov00 * ones, init_aprec00 * ones], 0)
        init = (st0, jnp.zeros((p * ROWS, b), dtype),
                jnp.zeros((ntri * ROWS, b), dtype),
                jnp.zeros((ntri * ROWS, b), dtype))
        st, means, prec_t, cov_t = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_iters), body, init)

        means_out[:] = means
        for i in range(p):
            for j in range(p):
                k = ti[(max(i, j), min(i, j))]
                prec_out[(i * p + j) * ROWS:(i * p + j + 1) * ROWS] = \
                    plane(prec_t, k)
                cov_out[(i * p + j) * ROWS:(i * p + j + 1) * ROWS] = \
                    plane(cov_t, k)
        b_out[:] = plane(st, 0)
        c_out[:] = plane(st, 1)
        amu_out[:] = plane(st, 2)
        acov_out[:] = plane(st, 3)
        aprec_out[:] = plane(st, 4)

    grid = (nvoxels // block,)
    fold, unfold, vox_spec, fixed_spec, _, vcols = \
        make_voxel_layout(nvoxels, block)
    nconsts = (s_n * p * p + 8) * ROWS
    out_plane = jax.ShapeDtypeStruct((ROWS, vcols), dtype)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vox_spec(p), vox_spec(s_n), vox_spec(s_n * p),
                  fixed_spec(nconsts, 1), vox_spec(p), vox_spec(p)],
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(1), vox_spec(1), vox_spec(1), vox_spec(1),
                   vox_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            out_plane, out_plane, out_plane, out_plane, out_plane,
        ),
        interpret=interpret,
    )

    def run(m0, rmr, dmr, consts, prior_means, prior_prec):
        means, prec_f, cov_f, amu0, acov00, aprec00, b, c = call(
            fold(m0), fold(rmr), fold(dmr.reshape(s_n * p, -1)), consts,
            fold(prior_means), fold(prior_prec))
        return (unfold(means), unfold(prec_f).reshape(p, p, nvoxels),
                unfold(cov_f).reshape(p, p, nvoxels), unfold(amu0),
                unfold(acov00), unfold(aprec00), unfold(b), unfold(c))

    return run


def pack_ar_consts(dmd, alpha_prior_prec, noise_prior_b, noise_prior_c,
                   ntimes, init_b, init_c, init_acov00, init_aprec00,
                   dtype):
    """[K*ROWS,1] kernel constant vector (see make_fused_ar_loop).

    dmd [S,P,P] (traced ok); alpha_prior_prec [A,A,1] (must be
    diagonal — the engine gates on the default prior); noise_prior_b/c
    [1,1] arrays or scalars; ntimes samples per echo; init_* python
    floats from the model-default initial state.
    """
    b0 = jnp.asarray(noise_prior_b, dtype).reshape(())
    c0 = jnp.asarray(noise_prior_c, dtype).reshape(())
    app = jnp.asarray(alpha_prior_prec, dtype).reshape(2, 2)
    flat = jnp.concatenate([
        dmd.reshape(-1).astype(dtype),
        jnp.stack([app[0, 0], app[1, 1],
                   1.0 / b0,
                   (jnp.asarray(float(ntimes), dtype) - 1.0) * 0.5 + c0,
                   jnp.asarray(float(init_b), dtype),
                   jnp.asarray(float(init_c), dtype),
                   jnp.asarray(float(init_acov00), dtype),
                   jnp.asarray(float(init_aprec00), dtype)]),
    ])
    return jnp.repeat(flat, ROWS)[:, None]
