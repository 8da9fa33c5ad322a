"""Whole-VB-loop Pallas kernel for AR(1) noise (fixed-design stats).

Same construction as ops/fused_loop.py (white noise): the AR(1)
sufficient-statistics route (noise/ar1.py Ar1DesignStats) reduces every
VB iteration to [P,V]-plane arithmetic, so the ENTIRE maxits fixed
point runs in one Pallas invocation on VMEM-resident state. Per voxel
tile the statistics are read from HBM once and only the final
posterior + AR noise state are written back.

Scope: ar1-cross-terms=none with 1 OR 2 interleaved echoes (the
common configurations; the BASELINE.json ar1 config and the bench ar2
config). Without cross terms the echoes are INDEPENDENT AR chains:
A=2 alphas with a DIAGONAL prior precision, nq = num-echoes phi
groups, and each group's basis-spec list is [(0,0), (1,0), (2,0)]
(noisemodel_ar.cc alpha-power indices), so the alpha MVN update
degenerates to nq scalar planes (alpha_n updated by group n; with
nq=1 alpha_2 keeps its prior) and the 2x2 alpha precision stays
diagonal. The per-iteration arithmetic is
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

NSPECS = 3  # (0,0), (1,0), (2,0) per echo group — no cross terms


def make_fused_ar_loop(nparams, n_iters, nvoxels, dtype,
                       block=DEFAULT_BLOCK, interpret=False,
                       detector=None, det_consts=None, nq=1):
    """Build the whole-loop callable.

    Returns fn(m0 [P,V], rmr [S,V], dmr [S,P,V], consts [K*ROWS,1],
               prior_means [P,V], prior_prec [P,V])
        -> (means [P,V], prec [P,P,V], cov [P,P,V],
            amu [nq,V], acov [nq,V], aprec [nq,V], b [nq,V], c [nq,V]
            [, f [1,V], its [1,V]  — detector mode])
    with S = 3*nq (spec ordering echo-major, noise/ar1.py _spec_list).

    consts packs, in order (see pack_ar_consts): dmd flattened
    [S*P*P], ap00, ap11 (alpha prior precision diagonal), then
    per-group inv_b0 / c_post / init_b / init_c [nq each], then
    per-group init_acov / init_aprec [nq each].

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
    s_n = NSPECS * nq
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
        ap = [cst(base), cst(base + 1)]
        inv_b0 = [cst(base + 2 + n) for n in range(nq)]
        c_post = [cst(base + 2 + nq + n) for n in range(nq)]
        init_b = [cst(base + 2 + 2 * nq + n) for n in range(nq)]
        init_c = [cst(base + 2 + 3 * nq + n) for n in range(nq)]
        init_acov = [cst(base + 2 + 4 * nq + n) for n in range(nq)]
        init_aprec = [cst(base + 2 + 5 * nq + n) for n in range(nq)]

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
            # plus the surviving alpha-prior logs of the UPDATED alphas
            # (non-updated alphas: exp_alpha and part6 cancel exactly)
            f_base = jnp.zeros((ROWS, b), dtype)
            for n in range(nq):
                f_base = f_base + 0.5 * jnp.log(ap[n]) * ones
            for i in range(p):
                f_base = f_base + 0.5 * jnp.log(pp[i])

        def step(st):
            # st rows (group-major): b[nq], c[nq], amu[nq], acov[nq],
            # aprec[nq]; returns (st_new, means, prec tri, cov tri, f)
            bq = [plane(st, n) for n in range(nq)]
            cq = [plane(st, nq + n) for n in range(nq)]
            amu = [plane(st, 2 * nq + n) for n in range(nq)]
            acov = [plane(st, 3 * nq + n) for n in range(nq)]

            sici = [bq[n] * cq[n] for n in range(nq)]  # E[phi_n]
            # marginal coefficients of Q_n = sum_s coeff_s M_s
            # (noisemodel_ar.cc:197-222): [1, mu, cov+mu^2] per group
            # ---- theta update (update_theta_stats arithmetic) --------
            w = []
            for n in range(nq):
                w += [sici[n], sici[n] * amu[n],
                      sici[n] * (acov[n] + amu[n] * amu[n])]
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

            # ---- alpha updates (noisemodel_ar.cc:466-513, diagonal) --
            new_aprec = [ap[n] + sici[n] * op[3 * n + 2]
                         for n in range(nq)]
            new_acov = [1.0 / new_aprec[n] for n in range(nq)]
            # prior contribution to the rhs is zero (zero prior mean)
            new_amu = [(-0.5) * sici[n] * op[3 * n + 1] * new_acov[n]
                       for n in range(nq)]

            # ---- phi updates with the NEW alpha marginals ------------
            # (noisemodel_ar.cc:530-556)
            tmp1 = []
            new_b = []
            new_c = []
            for n in range(nq):
                c2 = new_acov[n] + new_amu[n] * new_amu[n]
                t1 = (op[3 * n] + new_amu[n] * op[3 * n + 1]
                      + c2 * op[3 * n + 2])
                tmp1.append(t1)
                new_b.append(1.0 / (t1 * 0.5 + inv_b0[n]))
                new_c.append(c_post[n] * ones)

            f = ()
            if fdet:
                # degenerate AR(1) ELBO at the NEW state (module
                # docstring): each group's part2 IS its phi tmp1
                logdet = 0.0
                for i in range(p):
                    logdet = logdet + 2.0 * jnp.log(ch[ti[(i, i)]])
                dmsum = 0.0
                for i in range(p):
                    dm = means[i] - pm[i]
                    dmsum = dmsum + (dm * dm + cov[(i, i)]) * pp[i]
                f = (dtype(float(det_consts["f_const"])) + f_base
                     - 0.5 * logdet - 0.5 * dmsum)
                lb = dtype(float(det_consts["lb_coeff"]))
                for n in range(nq):
                    new_sici = new_b[n] * c_post[n]
                    f = (f - 0.5 * jnp.log(new_aprec[n])
                         + lb * jnp.log(new_b[n])
                         - 0.5 * new_sici * tmp1[n]
                         - new_b[n] * c_post[n] * inv_b0[n]
                         - 0.5 * ap[n] * (new_amu[n] * new_amu[n]
                                          + new_acov[n]))

            st_new = jnp.concatenate(
                new_b + new_c + new_amu + new_acov + new_aprec, 0)
            return (st_new,
                    jnp.concatenate(means, 0),
                    jnp.concatenate(prec, 0),
                    jnp.concatenate([cov[ij] for ij in tri], 0), f)

        st0 = jnp.concatenate(
            [init_b[n] * ones for n in range(nq)]
            + [init_c[n] * ones for n in range(nq)]
            + [jnp.zeros((ROWS, b), dtype) for _ in range(nq)]
            + [init_acov[n] * ones for n in range(nq)]
            + [init_aprec[n] * ones for n in range(nq)], 0)
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
        tag = (1.0 - 2.0 * sel_init) if fdet else 1.0
        for n in range(nq):
            b_out[n * ROWS:(n + 1) * ROWS] = tag * plane(st, n)
            c_out[n * ROWS:(n + 1) * ROWS] = plane(st, nq + n)
            amu_out[n * ROWS:(n + 1) * ROWS] = plane(st, 2 * nq + n)
            acov_out[n * ROWS:(n + 1) * ROWS] = plane(st, 3 * nq + n)
            aprec_out[n * ROWS:(n + 1) * ROWS] = plane(st, 4 * nq + n)
        if fdet:
            det_outs[0][:] = f_lane
            det_outs[1][:] = conv[0]

    grid = (nvoxels // block,)
    fold, unfold, vox_spec, fixed_spec, _, vcols = \
        make_voxel_layout(nvoxels, block)
    nconsts = (s_n * p * p + 2 + 6 * nq) * ROWS
    out_plane = jax.ShapeDtypeStruct((ROWS, vcols), dtype)
    gq = jax.ShapeDtypeStruct((nq * ROWS, vcols), dtype)
    n_extra = 2 if fdet else 0
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vox_spec(p), vox_spec(s_n), vox_spec(s_n * p),
                  fixed_spec(nconsts, 1), vox_spec(p), vox_spec(p)],
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(nq), vox_spec(nq), vox_spec(nq),
                   vox_spec(nq), vox_spec(nq))
        + (vox_spec(1),) * n_extra,
        out_shape=(
            jax.ShapeDtypeStruct((p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            gq, gq, gq, gq, gq,
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
                   ntimes, init_b, init_c, init_acov, init_aprec,
                   dtype, nq=1):
    """[K*ROWS,1] kernel constant vector (see make_fused_ar_loop).

    dmd [S,P,P] (traced ok); alpha_prior_prec [A,A,1] (must be
    diagonal — the engine gates on the default prior); noise_prior_b/c
    [nq]-broadcastable arrays or scalars; ntimes samples per echo;
    init_* python floats (or [nq] sequences) from the model-default
    initial state.
    """
    def seq(x):
        a = jnp.asarray(x, dtype).reshape(-1)
        return jnp.broadcast_to(a, (nq,)) if a.shape[0] != nq else a

    b0 = seq(noise_prior_b)
    c0 = seq(noise_prior_c)
    app = jnp.asarray(alpha_prior_prec, dtype).reshape(2, 2)
    cp = (jnp.asarray(float(ntimes), dtype) - 1.0) * 0.5 + c0
    flat = jnp.concatenate([
        dmd.reshape(-1).astype(dtype),
        jnp.stack([app[0, 0], app[1, 1]]),
        1.0 / b0, cp, seq(init_b), seq(init_c),
        seq(init_acov), seq(init_aprec),
    ])
    return jnp.repeat(flat, ROWS)[:, None]
