"""Whole-PROGRAM fixed-design white-noise VB kernel: in-kernel
sufficient statistics + the whole fixed point, one Pallas invocation.

The whole-loop kernel (ops/fused_loop.py) runs every iteration on
VMEM-resident state, but its sufficient statistics (noise/white.py
make_design_stats) are computed in XLA first — an OLS solve and
residual reductions that cost ~5 effective passes over the [T,V] data
plane in HBM (measured: the stats pass alone is ~2.6x the cost of one
full data read, and the XLA spectral fixed point adds reduction
kernels that round-trip [P,V] temporaries every iteration; device-time
probe, round 4).

Here the data tile itself is the kernel input: per voxel tile the
kernel

    pass 1  accumulates dty_p = sum_t w[t] d[t,p] y[t]   (OLS rhs)
    solve   m0 = Ainv dty          (Ainv: host f64 inverse of D'WD)
    pass 2  accumulates, about r0 = y - D m0:
              rtqr_q = sum_t q_q[t] r0^2
              dtqr_{q,p} = sum_t q_q[t] d[t,p] r0
    loop    the ENTIRE n_iters fixed point on VMEM-resident state
            (theta update Eq 19/20 via unrolled Cholesky, phi update
            Eq 21/22 — the same plane algebra as ops/fused_loop.py)
    write   final posterior + noise state + free-energy quadratics.

HBM traffic per voxel: ONE read of the data column plus the posterior
write — the speed-of-light for this workload. All noise-pattern
groups are supported (the per-group time weights ride a constants
column), which also generalizes the fast tier past the spectral
route's single-group restriction.

Layout: voxels are folded V -> (ROWS=8, V/8) exactly as in
ops/fused_loop.py, INCLUDING the data plane: [Tp,V] reshapes
contiguously to [Tp*ROWS, V/8], so row t*8+s holds time t of voxel
subgroup s. A time step then reads one native [8, B/8] slab and every
reduction is an elementwise accumulate — no cross-sublane reductions
anywhere. Per-timepoint design/indicator constants are [8,1] slabs of
a replicated constants column (lane-only broadcast; Mosaic cannot
broadcast sublanes and lanes in one op).

Numerics: the fixed point is the identical plane algebra of
ops/fused_loop.py; the statistics differ from make_design_stats only
in summation order and in m0 using a host-f64 Ainv rather than a
per-voxel f32 Cholesky solve (m0 is a reference point — any finite
value is *correct*, it only sets the cancellation headroom — so this
is tolerance-level, pinned by tests/test_fused_whole.py).

Reference equations: noisemodel_white.cc:228-363 (Eq 19-22).
"""

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_loop import (ROWS, VMEM_BUDGET, make_voxel_layout,
                         make_plane_algebra, _tri)
from .fused_vb import pad_time


def _mask_detector_step(detector, dtype):
    """f32 0/1-mask transcription of the batched lane state machines
    (inference/convergence.py — semantics verbatim) for in-kernel use:
    Mosaic cannot carry or combine i1 vectors across loop iterations
    (trunci / relayout failures on vector<8x128xi1>), so the detector
    state is held as f32 planes and the logic uses mask arithmetic
    (AND = a*b, OR = max, NOT = 1-a, select = c*a + (1-c)*b — the
    convex-select form; incremental blends cancel catastrophically
    against the prev_f sentinel).

    Returns step(cv, f) -> cv where cv = (its, prev_f, save, revert,
    done, trials, trialmode, lm_on, alpha), all [ROWS,B] f32 planes.
    """
    name = type(detector).name
    one = dtype(1.0)
    zero = dtype(0.0)

    def m(cond):
        return jnp.where(cond, one, zero)

    def sel(c, a, b):
        return c * a + (1.0 - c) * b

    if name == "pointzeroone":
        tol = dtype(float(detector.min_fchange))
        mx = dtype(float(detector.max_its))

        def step(cv, f):
            its, prev, save, rev, done, trials, tm, lmon, alpha = cv
            diff = f - prev
            fsmall = m(jnp.abs(diff) < tol)
            its2 = its + (1.0 - fsmall)
            done2 = jnp.maximum(fsmall, m(its2 >= mx))
            return (its2, f, save, rev, done2, trials, tm, lmon, alpha)

        return step

    if name == "freduce":
        # converge (and revert) on any F reduction; save is never
        # touched (init True), so the best copy is always the previous
        # iteration's state — the revert target. Lanes reverting at
        # iteration 1 select the engine-initial posterior, which only
        # the spectral-whole kernel's is_init protocol can restore
        # (ops/fused_spectral.py); the plain whole kernel keeps
        # excluding freduce.
        tol = dtype(float(detector.min_fchange))
        mx = dtype(float(detector.max_its))

        def step(cv, f):
            its, prev, save, rev, done, trials, tm, lmon, alpha = cv
            diff = f - prev
            reduced = m(diff < 0)
            fsmall = m(jnp.abs(diff) < tol)
            red_or_small = jnp.maximum(reduced, fsmall)
            its2 = its + (1.0 - red_or_small)
            done2 = jnp.maximum(red_or_small, m(its2 >= mx))
            rev2 = jnp.maximum(reduced, rev)
            prev2 = sel(reduced, prev, f)
            return (its2, prev2, save, rev2, done2, trials, tm, lmon,
                    alpha)

        return step

    if name == "trialmode":
        tol = dtype(float(detector.min_fchange))
        mx = dtype(float(detector.max_its))
        mtr = dtype(float(detector.max_trials))

        def step(cv, f):
            its, prev, save, rev, done, trials, tm, lmon, alpha = cv
            diff = f - prev
            reduced = m(diff < 0)
            fsmall = m(jnp.abs(diff) < tol)
            improved = m(diff > 0)
            # --- not in trial mode ---
            n_its = sel(reduced, one, sel(fsmall, its, its + 1.0))
            n_trials = sel(reduced, one, trials)
            n_tm = reduced
            n_save = (1.0 - reduced) * (1.0 - fsmall)
            n_rev = reduced
            red_or_small = jnp.maximum(reduced, fsmall)
            n_prev = sel(red_or_small, prev, f)
            n_done = (1.0 - reduced) * jnp.maximum(fsmall,
                                                   m(n_its >= mx))
            # --- in trial mode ---
            t_tr = trials + 1.0
            exhausted = (1.0 - improved) * m(t_tr >= mtr)
            leave = improved * (1.0 - fsmall)
            t_its = its
            t_tm = 1.0 - leave
            t_tr2 = (1.0 - leave) * t_tr
            t_save = leave
            t_rev = exhausted
            t_prev = sel(leave, f, prev)
            t_done = jnp.maximum(improved * fsmall, exhausted)
            return (sel(tm, t_its, n_its), sel(tm, t_prev, n_prev),
                    sel(tm, t_save, n_save), sel(tm, t_rev, n_rev),
                    sel(tm, t_done, n_done), sel(tm, t_tr2, n_trials),
                    sel(tm, t_tm, n_tm), lmon, alpha)

        return step

    if name == "lm":
        mxf = dtype(float(detector.max_fchange))
        mx = dtype(float(detector.max_its))
        a0 = dtype(float(detector.ALPHA_START))
        amax = dtype(float(detector.ALPHA_MAX))

        def step(cv, f):
            its, prev, save, rev, done, trials, tm, lmon, alpha = cv
            diff = f - prev
            absdiff = jnp.abs(diff)
            # --- not in LM mode ---
            dropped = m(diff < 0)
            n_conv = (1.0 - dropped) * m(absdiff < mxf)
            n_maxed = (1.0 - dropped) * (1.0 - n_conv) * m(its >= mx)
            n_cont = (1.0 - dropped) * (1.0 - n_conv) * (1.0 - n_maxed)
            n_lmon = dropped
            n_alpha = sel(dropped, a0 * jnp.ones_like(alpha), alpha)
            n_rev = dropped
            n_prev = sel(n_cont, f, prev)
            n_its = its + n_cont
            n_done = jnp.maximum(n_conv, n_maxed)
            # --- in LM mode ---
            improved = m(diff > 0)
            at_start = m(alpha == a0)
            l_alpha_imp = sel(at_start, alpha, alpha / 10.0)
            l_lm_imp = 1.0 - at_start
            alpha_maxed = (1.0 - improved) * m(alpha >= amax)
            its_maxed = (1.0 - improved) * (1.0 - alpha_maxed) \
                * m(its >= mx)
            grow = (1.0 - improved) * (1.0 - alpha_maxed) \
                * (1.0 - its_maxed)
            l_lmon = sel(improved, l_lm_imp, lmon)
            l_alpha = sel(improved, l_alpha_imp,
                          sel(grow, alpha * 10.0, alpha))
            l_rev = sel(improved, zero * improved,
                        sel(alpha_maxed, jnp.ones_like(improved),
                            sel(its_maxed, zero * improved,
                                jnp.ones_like(improved))))
            l_prev = sel(improved, f, prev)
            l_its = its + improved
            l_done = jnp.maximum(alpha_maxed, its_maxed)
            return (sel(lmon, l_its, n_its), sel(lmon, l_prev, n_prev),
                    save, sel(lmon, l_rev, n_rev),
                    sel(lmon, l_done, n_done), trials, tm,
                    sel(lmon, l_lmon, n_lmon),
                    sel(lmon, l_alpha, n_alpha))

        return step

    raise ValueError(f"no in-kernel state machine for detector {name}")


def n_whole_planes(p, nq, tp, det=False):
    """Live [8, B/8]-plane estimate for pick_whole_block: the data tile
    counts as tp planes; plus stats accumulators, loop carry and
    outputs. det adds the in-kernel detector lanes and the best-state
    copies of the save/revert protocol."""
    ntri = p * (p + 1) // 2
    # the stats passes hold the whole tile + r0 + one product live
    # (reshape-reduce form)
    data = 4 * tp
    ins = 2 * p                      # pm, pp
    stats = p + nq + nq * p + p      # dty, rtqr, dtqr, m0
    carry = 2 * nq + p + 2 * ntri    # b/c, means, prec/cov tri
    outs = p + 2 * p * p + 4 * nq
    derived = nq * p                 # dtqy
    det_planes = (9 + 2 + (2 * nq + p + 2 * ntri + 1) + 4) if det else 0
    return data + ins + stats + carry + outs + derived + det_planes


def pick_whole_block(nvoxels, p, nq, tp, det=False):
    """Voxel tile size for the whole-program kernel (None = does not
    fit VMEM; caller falls back). Same contract as fused_loop's
    pick_block."""
    planes = n_whole_planes(p, nq, tp, det)
    # block/ROWS is the kernel's lane count: must stay a multiple of
    # 128 (Mosaic block-shape constraint), so 1024 is the floor. This
    # kernel's budget runs higher than the shared VMEM_BUDGET: the
    # dominant plane is the data tile itself (counted 4x for the live
    # stats temporaries), and larger tiles mean proportionally larger
    # DMA bursts through the folded layout's strided rows.
    budget = max(VMEM_BUDGET, 12 << 20)
    fitting = [bb for bb in (8192, 4096, 2048, 1024)
               if planes * bb * 4 * 2 <= budget]
    if not fitting:
        return None
    for bb in fitting:
        if nvoxels % bb == 0:
            return bb, 0
    bb = fitting[-1]
    return bb, (-nvoxels) % bb


def pack_time_consts(design, qmasks, nt, tp, dtype):
    """[R*ROWS, 1] per-timepoint constants column, rows replicated
    ROWS-wise so the kernel reads sublane-complete [ROWS,1] slabs.

    Order: dcol (P x Tp unweighted design), dwq (Q x P x Tp
    group-weighted design), qcol (Q x Tp group indicators). Padded
    timepoints carry zero indicators/weights, so their (edge-padded)
    data never contributes.
    """
    d = np.zeros((tp, design.shape[1]), np.float64)
    d[:nt] = np.asarray(design, np.float64)
    q = np.zeros((qmasks.shape[0], tp), np.float64)
    q[:, :nt] = np.asarray(qmasks, np.float64)
    p, nq = design.shape[1], qmasks.shape[0]
    cols = [d[:, a] for a in range(p)]
    cols += [d[:, a] * q[qi] for qi in range(nq) for a in range(p)]
    cols += [q[qi] for qi in range(nq)]
    flat = np.concatenate(cols)
    return jnp.asarray(np.repeat(flat, ROWS)[:, None], dtype)


def pack_scalar_consts(design, qmasks, nt, noise_prior_b, noise_prior_c,
                       ntimes_per_group, init_b, init_c, dtype):
    """[K*ROWS, 1] scalar constants: dtqd (Q*P*P, f32 — the kernel's
    OLS solve must see the same rounding as its stats), then
    inv_b0 / c_post / b_init / c_init per group (as fused_loop's
    pack_consts)."""
    d = np.asarray(design, np.float64)[:nt]
    q = np.asarray(qmasks, np.float64)[:, :nt]
    nq, p = q.shape[0], d.shape[1]
    dtqd = np.stack([(d * q[i][:, None]).T @ d for i in range(nq)])
    b0 = np.asarray(noise_prior_b, np.float64).reshape(nq)
    c0 = np.asarray(noise_prior_c, np.float64).reshape(nq)
    nt_g = np.asarray(ntimes_per_group, np.float64).reshape(nq)
    flat = np.concatenate([
        dtqd.reshape(-1), 1.0 / b0,
        (nt_g - 1.0) * 0.5 + c0,
        np.full(nq, float(init_b)), np.full(nq, float(init_c))])
    return jnp.asarray(np.repeat(flat, ROWS)[:, None], dtype)


def make_fused_whole_loop(nparams, nq, n_iters, nt, nvoxels, dtype,
                          locked_noise_stdev=-1.0, block=4096,
                          interpret=False, detector=None, det_consts=None):
    """Build the whole-program callable.

    Returns fn(dataf [Tp*ROWS, V/ROWS], tconsts, consts,
               prior_means [P,V], prior_prec [P,V])
        -> (means [P,V], prec [P,P,V], cov [P,P,V], b [Q,V], c [Q,V],
            fkqk [Q,V], ftr [Q,V])
    where dataf is the voxel-folded row-padded data plane (see
    fold_data) and fkqk/ftr are the final-iteration quadratics for the
    free-energy assembly (noise/white.py free_energy_from_parts).

    detector (optional): a ConvergenceDetector instance from the
    pointzeroone / trialmode / lm family. Its BATCHED .test — the very
    state machine the XLA engine runs (inference/convergence.py) —
    executes in-kernel on [ROWS,B] planes each iteration, together
    with the engine's save/revert protocol on VMEM-resident best-state
    copies and, for lm, the per-lane damped theta update
    (noise/white.py update_theta_stats' Appendix-C form). n_iters must
    then be the engine's max_iter_cap (the detectors' worst-case
    static trip count). det_consts: {lb_coeff [Q], f_const, init_save,
    sentinel} — the host-folded Gamma-function ELBO constants
    (VBInference._nl_fdet_consts) plus the ConvState init values. The
    last two outputs become f [1,V] and its [1,V]. freduce is NOT
    served (its revert target is the engine-side initial posterior).
    """
    p = nparams
    tp = pad_time(nt)
    tri, ti, chol_tri_jittered, inv_from_chol = make_plane_algebra(p, dtype)
    ntri = len(tri)

    if block % ROWS != 0 or nvoxels % block != 0:
        raise ValueError(
            f"block={block} must be a multiple of ROWS={ROWS} and divide "
            f"nvoxels={nvoxels} (caller pads)")

    def plane(ref, i):
        return ref[i * ROWS:(i + 1) * ROWS]

    # time-consts row offsets (in Tp units)
    off_dcol = 0
    off_dwq = p * tp
    off_qcol = (p + nq * p) * tp

    def kernel(data_ref, tc_ref, consts_ref, pm_ref, pp_ref,
               means_out, prec_out, cov_out, b_out, c_out,
               fkqk_out, ftr_out):
        b = pm_ref.shape[-1]

        def cst(row):
            return consts_ref[row * ROWS:(row + 1) * ROWS, 0:1]

        def dtqd(q, i, j):
            return cst(q * p * p + i * p + j)

        base = nq * p * p
        inv_b0 = [cst(base + q) for q in range(nq)]
        c_post = [cst(base + nq + q) for q in range(nq)]
        b_init = [cst(base + 2 * nq + q) for q in range(nq)]
        c_init = [cst(base + 3 * nq + q) for q in range(nq)]

        def tcol(base_tp, length_tp):
            """[length_tp*ROWS, 1] contiguous per-timepoint constant
            column (static slice)."""
            return tc_ref[base_tp * ROWS:(base_tp + length_tp) * ROWS,
                          0:1]

        def tsum(x):
            """Reduce a [tp*ROWS, B] plane over time -> [8, B]: the
            sublane axis splits natively into (tp, ROWS) tile groups,
            so this lowers to tp elementwise tile adds — no dynamic
            slab loop. A fori + pl.ds slab walk here measured 36
            ns/voxel (the ENTIRE kernel's cost); this form is the fix
            (device-time decomposition, round 4)."""
            return jnp.sum(x.reshape(tp, ROWS, b), axis=0)

        def trep(plane):
            """Broadcast an [8, B] plane across the tp time groups."""
            return jnp.broadcast_to(plane[None], (tp, ROWS, b)) \
                .reshape(tp * ROWS, b)

        y_all = data_ref[...]  # [tp*ROWS, B]

        # ---- pass 1: dty_a = sum_t (sum_q dwq) y ----------------------
        dty = []
        for a in range(p):
            w = tcol(off_dwq + a * tp, tp)
            for q in range(1, nq):
                w = w + tcol(off_dwq + (q * p + a) * tp, tp)
            dty.append(tsum(w * y_all))
        dty = tuple(dty)

        # OLS reference point by in-kernel f32 Cholesky solve of
        # A = sum_q dtqd. m0 MUST be solved in the same f32 arithmetic
        # that produced dty: a host-f64 A^-1 rounds differently, r0 is
        # then not f32-orthogonal to the design, and the (cancelling)
        # dtqr statistic inherits O(|D| |m0 roundoff|) absolute error —
        # measured 2% posterior drift on an ill-conditioned raw
        # polynomial design. Same construction as make_design_stats /
        # ops/smallmat.py solve_chol_vec; the factor planes are
        # lane-uniform consts, so this is O(p^2) cheap ops.
        ch0 = chol_tri_jittered(
            lambda i, j: sum(dtqd(q, i, j) for q in range(nq)))
        fwd = [None] * p
        for i in range(p):
            s = dty[i]
            for k in range(i):
                s = s - ch0[ti[(i, k)]] * fwd[k]
            fwd[i] = s / ch0[ti[(i, i)]]
        m0 = [None] * p
        for i in range(p - 1, -1, -1):
            s = fwd[i]
            for k in range(i + 1, p):
                s = s - ch0[ti[(k, i)]] * m0[k]
            m0[i] = s / ch0[ti[(i, i)]]
        ok = jnp.isfinite(m0[0])
        for i in range(1, p):
            ok = ok & jnp.isfinite(m0[i])
        m0 = [jnp.where(ok, m, dtype(0.0)) for m in m0]

        # ---- pass 2: rtqr / dtqr about r0 = y - D m0 ------------------
        r0_all = y_all
        for a in range(p):
            r0_all = r0_all - tcol(off_dcol + a * tp, tp) * trep(m0[a])
        rtqr = []
        dtqr = []
        for q in range(nq):
            wq = tcol(off_qcol + q * tp, tp)
            rtqr.append(tsum(wq * r0_all * r0_all))
            dtqr.append([
                tsum(tcol(off_dwq + (q * p + a) * tp, tp) * r0_all)
                for a in range(p)])

        pm = [plane(pm_ref, i) for i in range(p)]
        pp = [plane(pp_ref, i) for i in range(p)]
        # D'Q_i y = D'Q_i r0 + (D'Q_i D) m0 — iteration-invariant
        dtqy = [[dtqr[q][a] + sum(dtqd(q, a, j) * m0[j] for j in range(p))
                 for a in range(p)] for q in range(nq)]

        ones = jnp.ones((ROWS, b), dtype)

        if detector is not None:
            lbc = [dtype(det_consts["lb_coeff"][q]) for q in range(nq)]
            part3vox = dtype(det_consts["f_const"]) * ones
            for i in range(p):
                part3vox = part3vox + 0.5 * jnp.log(pp[i])
            with_lm = type(detector).name == "lm"

        # ---- one fixed-point step (identical arithmetic to
        # ops/fused_loop.py; optional LM damping + in-kernel ELBO) ----
        def step(bc, centre, alpha=None):
            """(noise bc planes, previous means, LM alpha) ->
            (new bc, means, prec tri, cov tri, fq, f). centre/alpha
            only feed the damped branch; f is () unless detector."""
            phi = [plane(bc, q) * plane(bc, nq + q) for q in range(nq)]

            prec = []
            for i, j in tri:
                v = 0.0
                for q in range(nq):
                    v = v + phi[q] * dtqd(q, i, j)
                if i == j:
                    v = v + pp[i]
                prec.append(v)
            ch = chol_tri_jittered(
                lambda i, j: prec[ti[(max(i, j), min(i, j))]])
            cov = inv_from_chol(ch)
            rhs = []
            for a in range(p):
                v = 0.0
                for q in range(nq):
                    v = v + phi[q] * dtqy[q][a]
                rhs.append(v + pp[a] * pm[a])
            means = [sum(cov[(i, j)] * rhs[j] for j in range(p))
                     for i in range(p)]

            if alpha is not None:
                # LM-damped update (white.py update_theta_stats):
                # lm_means = centre + (prec + a diag(prec))^-1 [J'X(y -
                # D centre) + pp pm - pp centre]; prec/cov stay undamped
                dc = [centre[a] - m0[a] for a in range(p)]
                delta = []
                for a in range(p):
                    v = 0.0
                    for q in range(nq):
                        g = dtqr[q][a]
                        for j in range(p):
                            g = g - dtqd(q, a, j) * dc[j]
                        v = v + phi[q] * g
                    delta.append(v + pp[a] * pm[a] - pp[a] * centre[a])
                dch = chol_tri_jittered(
                    lambda i, j: prec[ti[(max(i, j), min(i, j))]]
                    + (alpha * prec[ti[(i, i)]] if i == j else 0.0))
                fwd2 = [None] * p
                for i in range(p):
                    s = delta[i]
                    for k in range(i):
                        s = s - dch[ti[(i, k)]] * fwd2[k]
                    fwd2[i] = s / dch[ti[(i, i)]]
                sol = [None] * p
                for i in range(p - 1, -1, -1):
                    s = fwd2[i]
                    for k in range(i + 1, p):
                        s = s - dch[ti[(k, i)]] * sol[k]
                    sol[i] = s / dch[ti[(i, i)]]
                use_lm = alpha > 0.0
                means = [jnp.where(use_lm, centre[a] + sol[a], means[a])
                         for a in range(p)]

            delta = [means[a] - m0[a] for a in range(p)]
            new_b, new_c, fq = [], [], []
            kqks, trs = [], []
            for q in range(nq):
                cross = sum(delta[a] * dtqr[q][a] for a in range(p))
                quad = 0.0
                tr = 0.0
                for a in range(p):
                    for j in range(p):
                        d_aj = dtqd(q, a, j)
                        quad = quad + d_aj * delta[a] * delta[j]
                        tr = tr + d_aj * cov[(a, j)]
                kqk = jnp.maximum(rtqr[q] - 2.0 * cross + quad, 0.0)
                bq = 1.0 / ((kqk + tr) * 0.5 + inv_b0[q])
                cq = c_post[q] * ones
                if locked_noise_stdev > 0:
                    bq = 1.0 / cq / locked_noise_stdev ** 2
                new_b.append(bq)
                new_c.append(cq)
                kqks.append(kqk)
                trs.append(tr)
                fq.extend([kqk, tr])

            f = ()
            if detector is not None:
                # in-kernel ELBO (free_energy_from_parts with constant
                # noise shape; Gamma terms in host consts) at the NEW
                # means/noise — the engine's per-iteration F
                logdet = 0.0
                for i in range(p):
                    logdet = logdet + 2.0 * jnp.log(ch[ti[(i, i)]])
                f = part3vox - 0.5 * logdet
                for q in range(nq):
                    phi_n = new_b[q] * new_c[q]
                    f = (f + lbc[q] * jnp.log(new_b[q])
                         - phi_n * inv_b0[q]
                         - 0.5 * phi_n * kqks[q] - 0.5 * trs[q])
                for i in range(p):
                    dm = means[i] - pm[i]
                    f = f - 0.5 * (dm * dm + cov[(i, i)]) * pp[i]

            return (jnp.concatenate(new_b + new_c, 0),
                    jnp.concatenate(means, 0),
                    jnp.concatenate(prec, 0),
                    jnp.concatenate([cov[ij] for ij in tri], 0),
                    jnp.concatenate(fq, 0), f)

        bc0 = jnp.concatenate([b_init[q] * ones for q in range(nq)]
                              + [c_init[q] * ones for q in range(nq)], 0)
        zmeans = jnp.zeros((p * ROWS, b), dtype)
        ztri = jnp.zeros((ntri * ROWS, b), dtype)
        zfq = jnp.zeros((2 * nq * ROWS, b), dtype)

        if detector is None:
            def body(_, carry):
                bc, _m, _p2, _c2, _f2 = carry
                nb, means, prec_t, cov_t, fq, _ = step(bc, None)
                return (nb, means, prec_t, cov_t, fq)

            bc, means, prec_t, cov_t, fq = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(n_iters), body,
                (bc0, zmeans, ztri, ztri, zfq))
        else:
            # detector mode: the f32-mask transcription of the batched
            # lane state machine (_mask_detector_step — semantics
            # verbatim from inference/convergence.py; Mosaic cannot
            # carry i1 vectors across loop iterations) + the engine's
            # save/revert protocol on VMEM-resident best copies.
            # Engine iteration order (inference/vb.py _iteration):
            # best-save -> update (with the PRE-test alpha) -> F ->
            # test -> freeze by the pre-test done flags.
            det_step = _mask_detector_step(detector, dtype)

            # anchor: a concrete-layout zero plane derived from memory.
            # Pure splat initializers infer a REPLICATED vector layout
            # for the fori carry, and Mosaic cannot relayout the body's
            # concrete outputs back to replicated ("invalid relayout
            # {0,0} -> {*,*}"); adding the anchor pins every carry to a
            # concrete layout from iteration 0.
            anchor = 0.0 * dty[0]

            def mkconv():
                z = anchor
                return (z,                                       # its
                        anchor + dtype(float(det_consts["sentinel"])),
                        anchor + (dtype(1.0)
                                  if det_consts["init_save"]
                                  else dtype(0.0)),              # save
                        z, z, z, z, z, z)  # rev/done/trials/tm/lmon/a

            def psel(mask, n, o):
                """Convex select over a [k*ROWS, B] stacked-plane
                array by a 0/1 f32 mask plane (tiled per plane). The
                incremental form o + m*(n-o) would catastrophically
                cancel against the prev_f sentinel."""
                k = n.shape[0] // ROWS
                mm = mask if k == 1 else jnp.concatenate([mask] * k, 0)
                return mm * n + (1.0 - mm) * o

            def body(_, carry):
                (bc, means_c, prec_c, cov_c, fq_c, f_lane, conv,
                 b_bc, b_me, b_pr, b_cv, b_f) = carry
                # 1. best-save where flagged by the previous test
                sv = conv[2]
                b_bc2 = psel(sv, bc, b_bc)
                b_me2 = psel(sv, means_c, b_me)
                b_pr2 = psel(sv, prec_c, b_pr)
                b_cv2 = psel(sv, cov_c, b_cv)
                b_f2 = psel(sv, f_lane, b_f)

                # 2-5. update + ELBO
                centre = [plane(means_c, i) for i in range(p)]
                nb, means, prec_t, cov_t, fq, f = step(
                    bc, centre, alpha=conv[8] if with_lm else None)
                # 6. detector test (f32-mask state machine)
                conv_n = det_step(conv, f)
                # 7. freeze by PRE-test done
                act = 1.0 - conv[4]

                def fz(n, o):
                    return psel(act, n, o)

                conv_m = tuple(fz(n, o) for n, o in zip(conv_n, conv))
                return (fz(nb, bc), fz(means, means_c),
                        fz(prec_t, prec_c), fz(cov_t, cov_c),
                        fz(fq, fq_c), fz(f, f_lane), conv_m,
                        fz(b_bc2, b_bc), fz(b_me2, b_me),
                        fz(b_pr2, b_pr), fz(b_cv2, b_cv),
                        fz(b_f2, b_f))

            def anch(x):
                """Concrete-layout variant of a stacked splat init."""
                k = x.shape[0] // ROWS
                a = anchor if k == 1 else jnp.concatenate([anchor] * k, 0)
                return x + a

            init = (anch(bc0), anch(zmeans), anch(ztri), anch(ztri),
                    anch(zfq), anchor + dtype(1234.5678), mkconv(),
                    anch(bc0), anch(zmeans), anch(ztri), anch(ztri),
                    anchor)

            # EARLY-EXIT while: stop once every lane in this tile is
            # done (frozen lanes never commit, so this is outcome-
            # identical to running the full static cap — which for lm
            # is the 16x worst-case alpha-ladder bound, ~7x the typical
            # trip count). Mosaic lowers a scalar while with a
            # cross-lane-reduced condition fine (verified on v5e).
            def wcond(c):
                it = c[0]
                done_plane = c[7][4]  # conv tuple: index 4 = done mask
                return (it < jnp.int32(n_iters)) \
                    & (jnp.min(done_plane) < 0.5)

            def wbody(c):
                return (c[0] + 1,) + body(c[0], c[1:])

            out = jax.lax.while_loop(wcond, wbody,
                                     (jnp.int32(0),) + init)
            (bc, means, prec_t, cov_t, fq, f_lane, conv,
             b_bc, b_me, b_pr, b_cv, b_f) = out[1:]

            # post-loop save/revert (engine _finalize)
            sv, rv = conv[2], conv[3]
            b_bc = psel(sv, bc, b_bc)
            b_me = psel(sv, means, b_me)
            b_pr = psel(sv, prec_t, b_pr)
            b_cv = psel(sv, cov_t, b_cv)
            b_f = psel(sv, f_lane, b_f)
            bc = psel(rv, b_bc, bc)
            means = psel(rv, b_me, means)
            prec_t = psel(rv, b_pr, prec_t)
            cov_t = psel(rv, b_cv, cov_t)
            f_lane = psel(rv, b_f, f_lane)

        means_out[:] = means
        for i in range(p):
            for j in range(p):
                k = ti[(max(i, j), min(i, j))]
                prec_out[(i * p + j) * ROWS:(i * p + j + 1) * ROWS] = \
                    plane(prec_t, k)
                cov_out[(i * p + j) * ROWS:(i * p + j + 1) * ROWS] = \
                    plane(cov_t, k)
        b_out[:] = bc[:nq * ROWS]
        c_out[:] = bc[nq * ROWS:]
        if detector is not None:
            fkqk_out[:] = f_lane
            ftr_out[:] = conv[0]  # per-lane iteration counts (f32)
        else:
            for q in range(nq):
                fkqk_out[q * ROWS:(q + 1) * ROWS] = plane(fq, 2 * q)
                ftr_out[q * ROWS:(q + 1) * ROWS] = plane(fq, 2 * q + 1)

    grid = (nvoxels // block,)
    fold, unfold, vox_spec, fixed_spec, _, vcols = \
        make_voxel_layout(nvoxels, block)
    ntc = (p + nq * p + nq) * tp * ROWS
    nsc = (nq * p * p + 4 * nq) * ROWS
    # detector mode: the last two outputs are f/its lanes
    fq = 1 if detector is not None else nq
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vox_spec(tp), fixed_spec(ntc, 1), fixed_spec(nsc, 1),
                  vox_spec(p), vox_spec(p)],
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(nq), vox_spec(nq), vox_spec(fq),
                   vox_spec(fq)),
        out_shape=(
            jax.ShapeDtypeStruct((p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((nq * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((nq * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((fq * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((fq * ROWS, vcols), dtype),
        ),
        interpret=interpret,
    )

    def fold_data(data):
        """Row-pad [T,V] to Tp (edge values; padded rows have zero
        weights) and fold the voxel axis: pure reshape afterwards."""
        if tp != nt:
            data = jnp.concatenate(
                [data] + [data[-1:]] * (tp - nt), axis=0)
        return data.reshape(tp, ROWS, vcols).reshape(tp * ROWS, vcols)

    def run(dataf, tconsts, consts, prior_means, prior_prec):
        means, prec_f, cov_f, b, c, fkqk, ftr = call(
            dataf, tconsts, consts, fold(prior_means), fold(prior_prec))
        return (unfold(means), unfold(prec_f).reshape(p, p, nvoxels),
                unfold(cov_f).reshape(p, p, nvoxels), unfold(b),
                unfold(c), unfold(fkqk), unfold(ftr))

    run.fold_data = fold_data
    return run
