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
model, iteration-invariant priors, f32, default noise initial
prior/posterior; maxits runs the static fixed point, and pointzeroone
/ freduce run their lane state machines IN-KERNEL (detector=): the
degenerate AR(1) ELBO assembles on the kernel's own planes — the
phi-weighted quadratic part2 is exactly the phi update's tmp1, the
Gamma-function terms fold into one host constant (c is the constant
c_post after the first update), and the alpha-prior ap11 log terms of
exp_alpha and part6 cancel, leaving 0.5*log(ap00) (noise/ar1.py
_free_energy_tail, noisemodel_ar.cc ELBO). freduce's revert target is
the engine-initial posterior (the reference's freduce never sets its
save flag), flagged by a sign tag on the b output for the engine to
restore — the spectral-whole kernel's protocol
(ops/fused_spectral.py).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_loop import (ROWS, DEFAULT_BLOCK, make_plane_algebra,
                         make_voxel_layout)
from .fused_whole import _mask_detector_step

NSPECS = 3  # (0,0), (1,0), (2,0) — single-echo, no cross terms


def make_fused_ar_loop(nparams, n_iters, nvoxels, dtype,
                       block=DEFAULT_BLOCK, interpret=False,
                       detector=None, det_consts=None):
    """Build the whole-loop callable.

    Returns fn(m0 [P,V], rmr [S,V], dmr [S,P,V], consts [K*ROWS,1],
               prior_means [P,V], prior_prec [P,V])
        -> (means [P,V], prec [P,P,V], cov [P,P,V],
            amu0 [1,V], acov00 [1,V], aprec00 [1,V], b [1,V], c [1,V]
            [, f [1,V], its [1,V]  — detector mode])

    consts packs, in order (see pack_ar_consts): dmd flattened
    [S*P*P], ap00, ap11 (alpha prior precision diagonal), inv_b0,
    c_post, init_b, init_c, init_acov00, init_aprec00.

    detector (optional): a pointzeroone / freduce instance; its
    batched state machine runs in-kernel each iteration on the
    degenerate AR(1) ELBO (module docstring), with an early-exit
    while. n_iters must then be the engine's max_iter_cap.
    det_consts: {"f_const": host-folded Gamma/constant block,
    "lb_coeff": the log(b) coefficient (ntimes-1)/2 + c0,
    "sentinel", "init_save"}. The b output is negated on lanes whose
    selected (freduce-reverted) state is the engine-initial posterior.
    """
    p = nparams
    s_n = NSPECS
    tri, ti, chol_tri_jittered, inv_from_chol = make_plane_algebra(p, dtype)
    ntri = len(tri)
    fdet = detector is not None

    if block % ROWS != 0 or nvoxels % block != 0:
        raise ValueError(
            f"block={block} must be a multiple of ROWS={ROWS} and divide "
            f"nvoxels={nvoxels} (caller pads)")

    def plane(ref, i):
        return ref[i * ROWS:(i + 1) * ROWS]

    def kernel(m0_ref, rmr_ref, dmr_ref, consts_ref, pm_ref, pp_ref,
               means_out, prec_out, cov_out, amu_out, acov_out,
               aprec_out, b_out, c_out, *det_outs):
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
        if fdet:
            # loop-invariant ELBO pieces: part3 (prior-precision logs)
            # plus the surviving alpha-prior log (module docstring)
            f_base = 0.5 * jnp.log(ap00) * ones
            for i in range(p):
                f_base = f_base + 0.5 * jnp.log(pp[i])

        def step(st):
            # st rows: b, c, amu0, acov00, aprec00 (each a ROWS-tall
            # plane); returns (st_new, means, prec tri, cov tri, f)
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

            f = ()
            if fdet:
                # degenerate AR(1) ELBO at the NEW state (module
                # docstring): part2 IS the phi update's tmp1
                logdet = 0.0
                for i in range(p):
                    logdet = logdet + 2.0 * jnp.log(ch[ti[(i, i)]])
                dmsum = 0.0
                for i in range(p):
                    dm = means[i] - pm[i]
                    dmsum = dmsum + (dm * dm + cov[(i, i)]) * pp[i]
                new_sici = new_b * c_post
                f = (dtype(float(det_consts["f_const"])) + f_base
                     - 0.5 * jnp.log(new_aprec00)
                     - 0.5 * logdet
                     + dtype(float(det_consts["lb_coeff"]))
                     * jnp.log(new_b)
                     - 0.5 * new_sici * tmp1
                     - new_b * c_post * inv_b0
                     - 0.5 * dmsum
                     - 0.5 * ap00 * (new_amu0 * new_amu0 + new_acov00))

            st_new = jnp.concatenate(
                [new_b, new_c, new_amu0, new_acov00, new_aprec00], 0)
            return (st_new,
                    jnp.concatenate(means, 0),
                    jnp.concatenate(prec, 0),
                    jnp.concatenate([cov[ij] for ij in tri], 0), f)

        st0 = jnp.concatenate([
            init_b * ones, init_c * ones,
            jnp.zeros((ROWS, b), dtype),       # amu0
            init_acov00 * ones, init_aprec00 * ones], 0)
        if not fdet:
            def body(_, carry):
                st, _means, _prec, _cov = carry
                st_new, means, prec_t, cov_t, _ = step(st)
                return (st_new, means, prec_t, cov_t)

            init = (st0, jnp.zeros((p * ROWS, b), dtype),
                    jnp.zeros((ntri * ROWS, b), dtype),
                    jnp.zeros((ntri * ROWS, b), dtype))
            st, means, prec_t, cov_t = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(n_iters), body, init)
        else:
            # in-kernel detector (the spectral-whole kernel's protocol,
            # ops/fused_spectral.py): f32-mask state machine + freeze
            # by pre-test done + early-exit while; freduce lanes that
            # revert before committing anything keep is_init = 1 and
            # the engine restores the initial posterior.
            # _mask_detector_step must run INSIDE the kernel trace
            # (its dtype(...) scalars are jax arrays).
            det_step = _mask_detector_step(detector, dtype)
            anchor = 0.0 * rmr[0]
            one = dtype(1.0)
            sent = anchor + dtype(float(det_consts["sentinel"]))
            save0 = anchor + (one if det_consts["init_save"]
                              else dtype(0.0))

            def mkconv():
                z = anchor
                return (z, sent, save0, z, z, z, z, z, z)

            def anch(x):
                k = x.shape[0] // ROWS
                a = anchor if k == 1 else jnp.concatenate([anchor] * k, 0)
                return x + a

            def wcond(c):
                it = c[0]
                done_plane = c[7][4]
                return (it < jnp.int32(n_iters)) \
                    & (jnp.min(done_plane) < 0.5)

            def psel(mask, n, o):
                k = n.shape[0] // ROWS
                mm = mask if k == 1 else jnp.concatenate([mask] * k, 0)
                return mm * n + (1.0 - mm) * o

            def wbody(c):
                (it, st, means_c, prec_c, cov_c, f_lane, isin,
                 b_st, b_me, b_pr, b_cv, b_is, conv) = c
                # 1. best-save where flagged (for freduce the save
                #    flag stays at its init value True, so the best
                #    copy is always the previous iteration's state —
                #    the revert target; pointzeroone never saves)
                sv = conv[2]
                b_st2 = psel(sv, st, b_st)
                b_me2 = psel(sv, means_c, b_me)
                b_pr2 = psel(sv, prec_c, b_pr)
                b_cv2 = psel(sv, cov_c, b_cv)
                b_is2 = psel(sv, isin, b_is)
                # 2-4. update + ELBO + test
                st_new, means, prec_t, cov_t, f = step(st)
                conv_n = det_step(conv, f)
                # 5. freeze by pre-test done
                fro = conv[4]
                act = 1.0 - fro

                def fz(n, o):
                    return psel(act, n, o)

                conv_m = tuple(fz(n, o) for n, o in zip(conv_n, conv))
                return (it + 1, fz(st_new, st), fz(means, means_c),
                        fz(prec_t, prec_c), fz(cov_t, cov_c),
                        fz(f, f_lane), isin * fro,
                        fz(b_st2, b_st), fz(b_me2, b_me),
                        fz(b_pr2, b_pr), fz(b_cv2, b_cv),
                        fz(b_is2, b_is), conv_m)

            zmeans = anch(jnp.zeros((p * ROWS, b), dtype))
            ztri = anch(jnp.zeros((ntri * ROWS, b), dtype))
            init = (jnp.int32(0), anch(st0), zmeans, ztri, ztri,
                    anchor + dtype(float(det_consts["sentinel"])),
                    anchor + one,
                    anch(st0), zmeans, ztri, ztri, anchor + one,
                    mkconv())
            (_, st, means, prec_t, cov_t, f_lane, isin,
             b_st, b_me, b_pr, b_cv, b_is,
             conv) = jax.lax.while_loop(wcond, wbody, init)
            # post-loop save/revert (engine _finalize): reverted lanes
            # take the best copy; lanes whose best is the (never-
            # committed) init state are flagged for the engine
            sv, rv = conv[2], conv[3]
            b_st = psel(sv, st, b_st)
            b_me = psel(sv, means, b_me)
            b_pr = psel(sv, prec_t, b_pr)
            b_cv = psel(sv, cov_t, b_cv)
            b_is = psel(sv, isin, b_is)
            st = psel(rv, b_st, st)
            means = psel(rv, b_me, means)
            prec_t = psel(rv, b_pr, prec_t)
            cov_t = psel(rv, b_cv, cov_t)
            sel_init = rv * b_is

        means_out[:] = means
        for i in range(p):
            for j in range(p):
                k = ti[(max(i, j), min(i, j))]
                prec_out[(i * p + j) * ROWS:(i * p + j + 1) * ROWS] = \
                    plane(prec_t, k)
                cov_out[(i * p + j) * ROWS:(i * p + j + 1) * ROWS] = \
                    plane(cov_t, k)
        if fdet:
            b_out[:] = (1.0 - 2.0 * sel_init) * plane(st, 0)
            det_outs[0][:] = f_lane
            det_outs[1][:] = conv[0]
        else:
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
    n_extra = 2 if fdet else 0
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vox_spec(p), vox_spec(s_n), vox_spec(s_n * p),
                  fixed_spec(nconsts, 1), vox_spec(p), vox_spec(p)],
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(1), vox_spec(1), vox_spec(1), vox_spec(1),
                   vox_spec(1)) + (vox_spec(1),) * n_extra,
        out_shape=(
            jax.ShapeDtypeStruct((p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            out_plane, out_plane, out_plane, out_plane, out_plane,
        ) + (out_plane,) * n_extra,
        interpret=interpret,
    )

    def run(m0, rmr, dmr, consts, prior_means, prior_prec):
        outs = call(
            fold(m0), fold(rmr), fold(dmr.reshape(s_n * p, -1)), consts,
            fold(prior_means), fold(prior_prec))
        means, prec_f, cov_f = outs[0], outs[1], outs[2]
        rest = [unfold(o) for o in outs[3:]]
        return tuple([unfold(means),
                      unfold(prec_f).reshape(p, p, nvoxels),
                      unfold(cov_f).reshape(p, p, nvoxels)] + rest)

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
