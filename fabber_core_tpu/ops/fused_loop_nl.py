"""Whole-VB-loop Pallas kernel for time-local (nonlinear) models.

The per-iteration fused kernel (ops/fused_vb.py) already keeps the
Jacobian and residual in VMEM, but under the engine's XLA iteration
loop the posterior state (means, precision, covariance, noise Gammas)
still round-trips HBM every iteration, the [Tp,V] data plane is
re-read every iteration, and each iteration pays a kernel dispatch
plus the XLA-side lane-merge traffic over [P,P,V] planes. For a
10-iteration run that is ~10x more HBM bytes than the state itself —
the same pathology the fixed-design tiers solved with whole-loop
kernels (ops/fused_loop.py).

This kernel runs the ENTIRE maxits fixed point in one invocation: per
voxel tile the data is read from HBM once, every iteration executes on
VMEM-resident state —

    per iteration (reference hot loop: inference_vb.cc:415-576):
      single time-blocked pass: evaluate the model + Jacobian at the
          current linearization centre (analytic time_signal_jac when
          the model provides one, in-kernel jax.linearize otherwise),
          accumulating per-group J'Q_iJ, J'Q_i r AND r'Q_i r;
      solve: Lambda = sum_i phi_i J'Q_iJ + diag(prior_prec); unrolled
          jitter-retry Cholesky -> covariance -> new means (identical
          arithmetic to ops/smallmat.py);
      phi update: k = r + J d (d = centre - means) never materializes —
          k'Q_ik expands exactly into the pass's quadratics,
          r'Q_ir + 2 d'(J'Q_ir) + d'(J'Q_iJ)d, so no second time pass
          and no J/r staging in VMEM scratch; Eq 21/22
          (noisemodel_white.cc:228-273) IN-KERNEL;
      the new means become the next iteration's centre —

and only the final posterior leaves the chip (plus, when F is
requested, one extra pass at the final means producing the per-group
free-energy quadratics; the digamma/gammaln ELBO assembly stays
outside, noise/white.py free_energy_from_parts).

GENERIC-MODEL (full-time) MODE: models that define only the plain
``evaluate`` — the common case for user plugins ported from the
reference's FwdModel::Evaluate (fwdmodel.h:104-110) — get the same
whole-loop tier without hand-writing ``time_signal``, provided their
evaluate is data-free and kernel-safe (models/base.py
derive_time_local_eval). The kernel then vmaps evaluate over the
voxel lanes and evaluates the FULL padded time axis in one block per
iteration (make_full_eval), reducing each quadratic immediately
instead of carrying [TB,B] partials; everything else (solve, phi
update, detector) is byte-identical code.

Eligibility (gated by the engine, inference/vb.py): white noise,
time-local model, maxits or pointzeroone detector (static trip count,
no save/revert, no LM damping), iteration-invariant priors (non-ARD,
non-spatial), model-default noise initialization, float32, no
per-iteration F history. Results match the per-iteration fused kernel
and the XLA generic-Jacobian route to float32 roundoff
(tests/test_fused_loop_nl.py pins this).

pointzeroone IN-KERNEL (detector= argument): the fchange lane state
machine (convergence.cc:86-103 semantics, inference/convergence.py
FchangeDetector) runs on VMEM-resident per-lane state. The free
energy needs no extra model pass: iteration k's evaluation at its
linearization centre (== iteration k-1's means) yields exactly the
k'Q_ik and tr(J'Q_iJ Sigma) quadratics of iteration k-1's F, so each
in-loop test assembles F from the CURRENT pass's quadratics plus the
carried posterior (the ELBO assembly of noise/white.py
free_energy_from_parts with the Gamma-function terms folded into
host-side constants — the noise shape c is the constant c_post from
the first update on). Lanes freeze by arithmetic masking: frozen
lanes keep recomputing but never commit. The final iteration's test
runs after the loop on the (already present) F pass at the final
means. Trip count stays static at max-iterations.

freduce IN-KERNEL (detector kind="freduce"): additionally stop — and
REVERT — any lane whose F decreased (convergence.cc:117-131,
FreduceDetector). The reference's freduce never sets its save flag,
so the reverted-to state is the engine's INITIAL posterior
(inference/vb.py best-state init); the kernel therefore only flags
the lane (rev output row) and the engine restores the initial planes
outside. The reported F for a reverted lane is the ELBO of the
initial posterior, captured from iteration 0's model pass (which
evaluates at exactly the initial means) with the Gamma terms of the
INITIAL noise shape c_init folded into a second host constant — the
XLA route's value for such lanes instead reflects its best-state
placeholder prior planes, so F agreement on reverted lanes is not
meaningful on any route pair (see inference/vb.py's spectral-fdet
note); means/cov/noise agree everywhere.
"""

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_vb import TB, _tri, pad_time, make_block_eval, make_full_eval
from .fused_loop import VMEM_BUDGET
from .fused_whole import _mask_detector_step

DEFAULT_BLOCK = 1024


def n_nl_loop_rows(p, tp, nq, fdet=False, full_eval=False,
                   eval_planes=None, nsupp=0, tracks_best=False):
    """Per-voxel live f32 rows for the whole-loop kernel (VMEM gate).

    Counts the double-buffered data input, the double-buffered small
    ins/outs, the iteration-loop carry, the model-eval live rows and
    the [TB,B] partial-sum planes (J'QJ tri + J'Qr + r'Qr per group)
    carried across the time loop. No J/r scratch: the phi update's
    k'Qk expands into these quadratics. fdet adds the detector lanes
    (f, prev_f, done, its, logdet, rev, rev_f — the last two for the
    freduce kind) plus the F-assembly temporaries and the pd0 input.

    full_eval (generic-model mode): every time-shaped intermediate of
    the model trace is a live [tp,B] plane, and Mosaic keeps the
    linearize primal residuals AND the per-basis tangent replays live
    concurrently — measured ~(2p+2)x the primal plane count on v5e;
    eval_planes (models/base.py fn.time_planes) carries the per-model
    plane count and the gate scales it by (2p+3) for margin. The
    quadratic accumulators collapse to [1,B] rows."""
    ntri = p * (p + 1) // 2
    data_in = 2 * tp                            # pipelined in buffers
    small_io = 2 * (3 * p) + 2 * (p + 2 * p * p + 4 * nq)
    carry = p + 2 * nq + 2 * ntri
    if full_eval:
        ep = (2 * p + 3) * (eval_planes if eval_planes is not None
                            else 3 * (p + 1))
        eval_live = (ep + p + 2) * tp + 3 * nsupp  # + suppdata in/live
        time_partials = nq * (ntri + p + 1)
    else:
        eval_live = 3 * TB * (p + 1)            # sig/jac rows + temps
        time_partials = TB * nq * (ntri + p + 1)
    return (data_in + small_io + carry + eval_live + time_partials
            + 2 * p  # pd0 input (double-buffered)
            + (14 if fdet else 0)
            # trialmode/lm: best-state copies of the save/revert
            # protocol (means/noise/prec/cov/logdet/F) + the extra
            # conv lanes (save/trials/trialmode/lm_on/alpha) + the
            # damped-solve Cholesky temporaries
            + ((p + 2 * nq + 3 * (p * (p + 1) // 2) + 7)
               if tracks_best else 0))


def pick_nl_block(nvoxels, p, tp, nq, fdet=False, full_eval=False,
                  eval_planes=None, nsupp=0, tracks_best=False):
    """Largest voxel tile whose estimated footprint fits VMEM_BUDGET;
    (block, pad) or None when even the smallest tile doesn't fit
    (caller falls back to the XLA route).

    ALWAYS the largest fitting tile, padding the voxel axis up to a
    multiple: at 1M voxels a divisibility-first rule would pick a
    128-voxel tile (1M = 2^6 5^6 divides none of the candidates) —
    1-vreg planes, ~8k grid steps, 1/8 lane utilization per op —
    costing ~2x end-to-end, while edge padding is O(block) wasted
    voxels out of millions."""
    rows = n_nl_loop_rows(p, tp, nq, fdet, full_eval, eval_planes, nsupp,
                          tracks_best)
    for bb in (2048, 1024, 512, 256, 128):
        if rows * bb * 4 <= VMEM_BUDGET:
            return bb, (-nvoxels) % bb
    return None


def make_fused_nl_loop(time_signal, transforms, nparams, nt, n_iters,
                       nvoxels, dtype, need_f, qmasks,
                       locked_noise_stdev=-1.0, block=DEFAULT_BLOCK,
                       interpret=False, time_signal_jac=None,
                       detector=None, evaluate_fn=None, nsupp=0):
    """Build the whole-loop callable.

    Returns fn(centre0 [P,V], prior_means [P,V], prior_prec [P,V],
               data [Tp,V], consts [K,1])
        -> (means [P,V], prec [P,P,V], cov [P,P,V], b [Q,V], c [Q,V],
            fkqk [Q,V], ftr [Q,V])

    consts packs, in order: 1/b0 [Q], c_post = (ntimes_i-1)/2 + c0 [Q],
    b_init [Q], c_init [Q] (see pack_nl_consts). fkqk/ftr are the
    free-energy quadratics at the final means (zeros if not need_f).

    detector (optional) engages the in-kernel pointzeroone state
    machine (module docstring): a dict with
      tol       min-fchange threshold,
      max_its   the detector's max-iterations (== n_iters),
      lb_coeff  per-group coefficient of log(b) in the ELBO,
                n_i/2 + c0_i,
      f_const   every voxel-invariant ELBO term (Gamma functions of
                the constant c_post, prior normalizers, 2*pi powers),
    all Python scalars (see VBInference._nl_fdet_consts, which derives
    them from noise/white.py free_energy_from_parts with c = c_post).

    evaluate_fn (generic-model mode, used when time_signal is None):
    fn(params [P][, supp [S]]) -> [nt] from models/base.py
    derive_time_local_eval; the kernel runs in full-time mode (module
    docstring). nsupp>0 adds a per-voxel [S,V] suppdata kernel input
    (run(..., supp=...)), threaded to evaluate_fn per lane.
    The last two outputs then become f [1,V] (per-lane final free
    energy, fprior excluded — zero for the priors this route admits)
    and its [1,V] (per-lane iteration counts, FchangeDetector
    semantics: not incremented on the converging test).
    """
    p = nparams
    tri = _tri(p)
    ntri = len(tri)
    nq = qmasks.shape[0]
    tp = pad_time(nt)
    # full-time (generic-model) mode: the model's plain evaluate is
    # vmapped over voxel lanes in-kernel and evaluated over the whole
    # padded time axis at once — one "block" of TBk = tp rows, with the
    # quadratics reduced immediately instead of carried as [TB,B]
    # partials (see make_full_eval / derive_time_local_eval)
    full_mode = time_signal is None
    if full_mode and evaluate_fn is None:
        raise ValueError("need time_signal or evaluate_fn")
    with_supp = full_mode and nsupp > 0
    TBk = tp if full_mode else TB
    ntb = tp // TBk
    qm_host = np.zeros((tp, nq), dtype=np.float32)
    qm_host[:nt, :] = np.asarray(qmasks, np.float32).T

    if nvoxels % block != 0:
        raise ValueError(f"block={block} must divide nvoxels={nvoxels} "
                         "(caller pads)")

    if full_mode:
        make_signal_and_jac = make_full_eval(evaluate_fn, transforms, p,
                                             nt, tp, dtype, nsupp)
    else:
        make_signal_and_jac = make_block_eval(time_signal, transforms, p,
                                              dtype, time_signal_jac)

    def at_tri(mat_list, i, j):
        i, j = max(i, j), min(i, j)
        return mat_list[tri.index((i, j))]

    def chol_planes_jittered(a_at):
        """Unrolled Cholesky with the jitter-retry degradation path of
        ops/smallmat.cholesky_jittered: lanes whose plain factorization
        produced a non-finite diagonal refactorize with +1e-10."""
        def chol(aij):
            ch = [None] * ntri
            for i in range(p):
                s = aij(i, i)
                for k in range(i):
                    s = s - ch[tri.index((i, k))] ** 2
                ch[tri.index((i, i))] = jnp.sqrt(s)
                inv_d = 1.0 / ch[tri.index((i, i))]
                for j in range(i + 1, p):
                    s = aij(j, i)
                    for k in range(i):
                        s = s - ch[tri.index((j, k))] * ch[tri.index((i, k))]
                    ch[tri.index((j, i))] = s * inv_d
            return ch

        ch0 = chol(a_at)
        bad = ~jnp.isfinite(ch0[tri.index((0, 0))])
        for i in range(1, p):
            bad = bad | ~jnp.isfinite(ch0[tri.index((i, i))])
        jit = jnp.where(bad, dtype(1e-10), dtype(0.0))
        return chol(lambda i, j: a_at(i, j) + (jit if i == j
                                               else dtype(0.0)))

    def inv_from_chol(ch):
        invl = {}
        for i in range(p):
            invl[(i, i)] = 1.0 / ch[tri.index((i, i))]
        for i in range(p):
            for j in range(i - 1, -1, -1):
                s = 0.0
                for k in range(j + 1, i + 1):
                    s = s + ch[tri.index((k, j))] * invl[(i, k)]
                invl[(i, j)] = -s / ch[tri.index((j, j))]
        cv = {}
        for i in range(p):
            for j in range(i + 1):
                s = 0.0
                for k in range(i, p):
                    s = s + invl[(k, i)] * invl[(k, j)]
                cv[(i, j)] = s
                cv[(j, i)] = s
        return cv

    kind = (detector or {}).get("kind", "pointzeroone")
    # trialmode / lm: the engine's save/revert protocol on VMEM-
    # resident best-state copies + (lm) the per-lane damped theta
    # update. Semantics transcription: the XLA engine NEVER restores
    # the best copy mid-loop — the revert flag only selects the output
    # state post-loop (inference/vb.py _finalize, inference_vb.cc:
    # 505-525) — so the deferred-test structure needs no state rewind:
    # pass k runs iteration k-1's test, commits the conv lanes, saves
    # the CURRENT carry (== iteration k-1's state) where flagged, then
    # updates — exactly the XLA iteration order (save by the previous
    # test's flag -> update with the pre-test alpha -> F -> test).
    tracks_best = kind in ("trialmode", "lm")
    with_lm = kind == "lm"

    def kernel(*refs):
        if with_supp:
            (centre0_ref, pm_ref, pp_ref, pd0_ref, data_ref, supp_ref,
             qm_ref, consts_ref, means_out, prec_out, cov_out, b_out,
             c_out, fkqk_out, ftr_out) = refs
        else:
            (centre0_ref, pm_ref, pp_ref, pd0_ref, data_ref, qm_ref,
             consts_ref, means_out, prec_out, cov_out, b_out, c_out,
             fkqk_out, ftr_out) = refs
        b = centre0_ref.shape[-1]

        def eval_at(rows):
            """Model evaluator factory at the given latent rows; the
            suppdata plane rides along in full-time mode."""
            if with_supp:
                return make_signal_and_jac(rows, supp_ref[...])
            return make_signal_and_jac(rows)
        ones = jnp.ones((1, b), dtype)

        def cst(row):
            return consts_ref[row:row + 1, 0:1]

        inv_b0 = [cst(q) for q in range(nq)]
        c_post = [cst(nq + q) for q in range(nq)]
        b_init = [cst(2 * nq + q) for q in range(nq)]
        c_init = [cst(3 * nq + q) for q in range(nq)]

        pm = [pm_ref[i:i + 1] for i in range(p)]
        pp = [pp_ref[i:i + 1] for i in range(p)]

        def qw(qi, t0):
            return qm_ref[pl.ds(t0, TBk), qi:qi + 1]

        def rsum(x):
            return jnp.sum(x, axis=0, keepdims=True)

        zero_1b = jnp.zeros((1, b), dtype)
        # time-pass accumulators: [TB,B] partials in block mode (one
        # cross-sublane reduction after the loop), already-reduced
        # [1,B] rows in full-time mode (red applied per product)
        zero_acc = zero_1b if full_mode else jnp.zeros((TB, b), dtype)
        red = rsum if full_mode else (lambda x: x)

        def time_reduce(body, init):
            """fori over time blocks; single-block (full) mode calls
            the body once with a CONCRETE t0 so data slicing stays
            static."""
            if ntb == 1:
                return body(jnp.int32(0), init)
            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(ntb),
                                     body, init)

        if detector is not None:
            d_tol = dtype(detector["tol"])
            d_max = dtype(float(detector["max_its"]))
            lbc = [dtype(detector["lb_coeff"][q]) for q in range(nq)]
            # voxel-varying but iteration-invariant ELBO piece: the
            # prior log-normalizer, plus every constant term
            part3vox = dtype(detector["f_const"]) * ones
            for i in range(p):
                part3vox = part3vox + 0.5 * jnp.log(pp[i])
            if kind == "freduce":
                # same constant block at the INITIAL noise shape c_init
                # (log b coefficient is c-independent, so lbc is shared)
                part3init = dtype(detector["f_const_init"]) * ones
                for i in range(p):
                    part3init = part3init + 0.5 * jnp.log(pp[i])
            if tracks_best:
                # the f32-mask transcription of the batched lane state
                # machine — the identical step the whole kernel runs
                det_step = _mask_detector_step(detector["det_obj"],
                                               dtype)

            def assemble_f(cen, bqv, cqv, covdiag, logdet, kqk, trace,
                           base=None):
                """free_energy_from_parts with the noise shape c
                constant (noisemodel_white.cc:365-454); Gamma-function
                terms live in the base/lbc host-side constants."""
                v = (part3vox if base is None else base) - 0.5 * logdet
                for q in range(nq):
                    phi_q = bqv[q] * cqv[q]
                    v = (v + lbc[q] * jnp.log(bqv[q])
                         - phi_q * inv_b0[q]
                         - 0.5 * phi_q * kqk[q] - 0.5 * trace[q])
                for i in range(p):
                    dm = cen[i] - pm[i]
                    v = v - 0.5 * (dm * dm + covdiag[i]) * pp[i]
                return v

        def iteration(it_k, carry):
            if detector is not None and tracks_best:
                (centre, bq, cq, prev_prec, prev_cov,
                 f_st, pf, dn, its, logdet, rev,
                 sv, trials, tm, lmon, alpha,
                 b_cen, b_bq, b_cq, b_prec, b_cov,
                 b_logdet, b_f) = carry
            elif detector is not None:
                (centre, bq, cq, prev_prec, prev_cov,
                 f_st, pf, dn, its, logdet, rev, rev_f) = carry
            else:
                centre, bq, cq, _prec, _cov = carry
            phi = [bq[q] * cq[q] for q in range(nq)]

            # ---- single pass: per-group J'Q_iJ / J'Q_i r / r'Q_i r at
            # the centre; [TB,B] partial sums carried across the time
            # loop, one cross-sublane reduction per quadratic after it.
            # The weight is folded into ONE factor of each product
            # (wj_i, wr) so every accumuland is a single mul + add ----
            centre_block_fn = eval_at(list(centre))

            def body_a(tb, acc):
                jtjq, jtrq, rqrq = acc
                t0 = tb * jnp.int32(TBk)
                sig, jrows = centre_block_fn(t0)
                r = data_ref[pl.ds(t0, TBk), :] - sig
                add_jtj, add_jtr, add_rqr = [], [], []
                for qi in range(nq):
                    w = qw(qi, t0)
                    wj = [w * jrows[i] for i in range(p)]
                    wr = w * r
                    for i, j in tri:
                        add_jtj.append(red(wj[i] * jrows[j]))
                    for a in range(p):
                        add_jtr.append(red(jrows[a] * wr))
                    add_rqr.append(red(wr * r))
                return (tuple(x + y for x, y in zip(jtjq, add_jtj)),
                        tuple(x + y for x, y in zip(jtrq, add_jtr)),
                        tuple(x + y for x, y in zip(rqrq, add_rqr)))

            jtjq_t, jtrq_t, rqrq_t = time_reduce(
                body_a,
                (tuple(zero_acc for _ in range(nq * ntri)),
                 tuple(zero_acc for _ in range(nq * p)),
                 tuple(zero_acc for _ in range(nq))))
            jtjq = [rsum(x) for x in jtjq_t]
            jtrq = [rsum(x) for x in jtrq_t]
            rqrq = [rsum(x) for x in rqrq_t]

            def at_q(qi, i, j):
                i, j = max(i, j), min(i, j)
                return jtjq[qi * ntri + tri.index((i, j))]

            if detector is not None:
                # ---- deferred detector test for iteration it_k-1: the
                # pass above evaluated the model AT the previous means
                # (== centre), so rqrq IS its exact k'Q_ik and jtjq its
                # J'Q_iJ; assemble F and run the fchange state machine
                # on lanes not yet frozen (gate skips it_k == 0, whose
                # pass has no completed iteration behind it) -----------
                cov_p = {}
                for k2, (i, j) in enumerate(tri):
                    cov_p[(i, j)] = prev_cov[k2]
                    cov_p[(j, i)] = prev_cov[k2]
                trace_p = []
                for qi in range(nq):
                    tr = 0.0
                    for i in range(p):
                        for j in range(p):
                            tr = tr + cov_p[(i, j)] * at_q(qi, i, j)
                    trace_p.append(tr)
                f_here = assemble_f(centre, bq, cq,
                                    [cov_p[(i, i)] for i in range(p)],
                                    logdet, rqrq, trace_p)
                if kind == "freduce":
                    # iteration 0's pass evaluates at the INITIAL
                    # means: capture the initial-state ELBO as each
                    # lane's revert value (diagonal initial cov)
                    pd0 = [pd0_ref[i:i + 1] for i in range(p)]
                    tr0 = [sum(pd0[i] * at_q(qi, i, i) for i in range(p))
                           for qi in range(nq)]
                    ld0 = 0.0
                    for i in range(p):
                        ld0 = ld0 - jnp.log(pd0[i])
                    f0 = assemble_f(centre, bq, cq, pd0, ld0, rqrq, tr0,
                                    base=part3init)
                    first = jnp.where(it_k == jnp.int32(0), dtype(1.0),
                                      dtype(0.0))
                    rev_f = (1.0 - first) * rev_f + first * f0
                gate = jnp.where(it_k >= jnp.int32(1), dtype(1.0),
                                 dtype(0.0))
                run = gate * (1.0 - dn)
                if tracks_best:
                    # deferred test of iteration it_k-1, frozen by the
                    # pre-test done mask (the XLA engine's lane merge)
                    cv = (its, pf, sv, rev, dn, trials, tm, lmon,
                          alpha)
                    cv_n = det_step(cv, f_here)
                    (its, pf, sv, rev, dn, trials, tm, lmon,
                     alpha) = tuple(run * n + (1.0 - run) * o
                                    for n, o in zip(cv_n, cv))
                    f_st = (1.0 - run) * f_st + run * f_here
                    # best-save of the carry (== iteration it_k-1's
                    # state) where the post-test save flag is set —
                    # the top-of-loop save of vb.py _iteration. The
                    # skipped iteration-0 save of the engine-initial
                    # posterior is unobservable: the first test always
                    # continues (F0 - sentinel is +huge), overwriting
                    # best before any revert can fire.
                    bsv = run * sv

                    def bs(new, old):
                        return bsv * new + (1.0 - bsv) * old

                    b_cen = tuple(bs(centre[i], b_cen[i])
                                  for i in range(p))
                    b_bq = tuple(bs(bq[q], b_bq[q]) for q in range(nq))
                    b_cq = tuple(bs(cq[q], b_cq[q]) for q in range(nq))
                    b_prec = tuple(bs(prev_prec[k2], b_prec[k2])
                                   for k2 in range(ntri))
                    b_cov = tuple(bs(prev_cov[k2], b_cov[k2])
                                  for k2 in range(ntri))
                    b_logdet = bs(logdet, b_logdet)
                    b_f = bs(f_here, b_f)
                    act = 1.0 - dn
                else:
                    fsmall = jnp.where(jnp.abs(f_here - pf) < d_tol,
                                       dtype(1.0), dtype(0.0))
                    if kind == "freduce":
                        # FreduceDetector.test: F decrease stops the
                        # lane (no its increment, prev_f kept) and
                        # reverts it
                        reduced = jnp.where(f_here - pf < 0, dtype(1.0),
                                            dtype(0.0))
                    else:
                        reduced = dtype(0.0) * ones
                    keep = (1.0 - fsmall) * (1.0 - reduced)
                    # FchangeDetector.test: its not incremented on the
                    # converging test; done on fsmall or max-iterations
                    its = its + run * keep
                    over = jnp.where(its >= d_max, dtype(1.0),
                                     dtype(0.0))
                    dn = jnp.maximum(dn, run * jnp.maximum(
                        jnp.maximum(fsmall, over), reduced))
                    rev = jnp.maximum(rev, run * reduced)
                    # convex-select commits: the incremental form
                    # x + c*(y - x) catastrophically cancels against
                    # the -3.4e38 prev_f sentinel (y - x rounds to
                    # -sentinel, so x + c*(y-x) lands on exactly 0.0)
                    committed = ((1.0 - reduced) * f_here
                                 + reduced * rev_f)
                    f_st = (1.0 - run) * f_st + run * committed
                    cpf = run * (1.0 - reduced)
                    pf = (1.0 - cpf) * pf + cpf * f_here
                    act = 1.0 - dn  # newly frozen lanes skip update

            # ---- solve (update_theta arithmetic, Eq 19/20) ------------
            prec = []
            for i, j in tri:
                v = 0.0
                for qi in range(nq):
                    v = v + phi[qi] * at_q(qi, i, j)
                if i == j:
                    v = v + pp[i]
                prec.append(v)
            ch = chol_planes_jittered(lambda i, j: at_tri(prec, i, j))
            cov = inv_from_chol(ch)
            rhs = []
            for a in range(p):
                v = 0.0
                for qi in range(nq):
                    gi = jtrq[qi * p + a]
                    for j in range(p):
                        gi = gi + at_q(qi, a, j) * centre[j]
                    v = v + phi[qi] * gi
                rhs.append(v + pp[a] * pm[a])
            means = [sum(cov[(i, j)] * rhs[j] for j in range(p))
                     for i in range(p)]

            if detector is not None and with_lm:
                # LM-damped update (noise/white.py update_theta's
                # Appendix-C branch, transcription-exact): means =
                # centre + (prec + alpha diag(prec))^-1 [sum_q phi_q
                # J'Q_q(y - f(centre)) + pp pm - pp centre] — the
                # linearizer's offset IS f(centre) (linearize.py), so
                # the gradient term is exactly this pass's jtrq with no
                # J'QJ centre contribution. prec/cov stay undamped;
                # lanes with alpha == 0 keep the plain GN means.
                dch = chol_planes_jittered(
                    lambda i, j: at_tri(prec, i, j)
                    + (alpha * at_tri(prec, i, i) if i == j
                       else dtype(0.0)))
                sol = [None] * p
                fwd_d = [None] * p
                for i in range(p):
                    s_d = pp[i] * (pm[i] - centre[i])
                    for qi in range(nq):
                        s_d = s_d + phi[qi] * jtrq[qi * p + i]
                    for k in range(i):
                        s_d = s_d - dch[tri.index((i, k))] * fwd_d[k]
                    fwd_d[i] = s_d / dch[tri.index((i, i))]
                for i in range(p - 1, -1, -1):
                    s_d = fwd_d[i]
                    for k in range(i + 1, p):
                        s_d = s_d - dch[tri.index((k, i))] * sol[k]
                    sol[i] = s_d / dch[tri.index((i, i))]
                use_lm = jnp.where(alpha > 0.0, dtype(1.0), dtype(0.0))
                means = [use_lm * (centre[a] + sol[a])
                         + (1.0 - use_lm) * means[a] for a in range(p)]

            # ---- k'Q_ik by exact expansion (k = r + J d, d = centre -
            # means): r'Q_ir + 2 d'(J'Q_ir) + d'(J'Q_iJ)d — pure [1,B]
            # algebra on this pass's quadratics, no second time pass --
            d_cm = [centre[i] - means[i] for i in range(p)]
            nkqk = []
            for qi in range(nq):
                v = rqrq[qi]
                for a in range(p):
                    v = v + 2.0 * d_cm[a] * jtrq[qi * p + a]
                for i, j in tri:
                    dd = d_cm[i] * d_cm[j]
                    v = v + (dd if i == j else 2.0 * dd) * at_q(qi, i, j)
                nkqk.append(jnp.maximum(v, 0.0))

            # ---- phi update (Eq 21/22, _noise_from_quadratics) --------
            new_b, new_c = [], []
            for qi in range(nq):
                tr_q = 0.0
                for i in range(p):
                    for j in range(p):
                        tr_q = tr_q + cov[(i, j)] * at_q(qi, i, j)
                bq_new = 1.0 / ((nkqk[qi] + tr_q) * 0.5 + inv_b0[qi])
                cq_new = c_post[qi] * ones
                if locked_noise_stdev > 0:
                    bq_new = 1.0 / cq_new / locked_noise_stdev ** 2
                new_b.append(bq_new)
                new_c.append(cq_new)

            if detector is None:
                return (tuple(means), tuple(new_b), tuple(new_c),
                        tuple(prec), tuple(cov[ij] for ij in tri))

            # frozen lanes keep their state (lane-frozen convergence):
            # blend every carried plane by the post-test active mask
            logdet_new = 0.0
            for i in range(p):
                logdet_new = logdet_new + 2.0 * jnp.log(
                    ch[tri.index((i, i))])

            def bl(new, old):
                return old + act * (new - old)

            if tracks_best:
                # conv lanes and best copies were already committed by
                # the run/bsv masks above; only the posterior state
                # planes blend by the post-test active mask
                return (tuple(bl(means[i], centre[i]) for i in range(p)),
                        tuple(bl(new_b[q], bq[q]) for q in range(nq)),
                        tuple(bl(new_c[q], cq[q]) for q in range(nq)),
                        tuple(bl(prec[k2], prev_prec[k2])
                              for k2 in range(ntri)),
                        tuple(bl(cov[ij], prev_cov[k2])
                              for k2, ij in enumerate(tri)),
                        f_st, pf, dn, its, bl(logdet_new, logdet),
                        rev, sv, trials, tm, lmon, alpha,
                        b_cen, b_bq, b_cq, b_prec, b_cov,
                        b_logdet, b_f)

            return (tuple(bl(means[i], centre[i]) for i in range(p)),
                    tuple(bl(new_b[q], bq[q]) for q in range(nq)),
                    tuple(bl(new_c[q], cq[q]) for q in range(nq)),
                    tuple(bl(prec[k2], prev_prec[k2])
                          for k2 in range(ntri)),
                    tuple(bl(cov[ij], prev_cov[k2])
                          for k2, ij in enumerate(tri)),
                    f_st, pf, dn, its, bl(logdet_new, logdet),
                    rev, rev_f)

        init = (tuple(centre0_ref[i:i + 1] for i in range(p)),
                tuple(b_init[q] * ones for q in range(nq)),
                tuple(c_init[q] * ones for q in range(nq)),
                tuple(zero_1b for _ in range(ntri)),
                tuple(zero_1b for _ in range(ntri)))
        if detector is not None:
            # prev_f starts at the engine's sentinel (convergence.py
            # init_state: finfo.min clamp of the reference's -99e99).
            # anchor: splat initializers would pin the fori carry to a
            # REPLICATED vector layout that the body's concrete outputs
            # cannot relayout to ("invalid relayout {0,0}->{*,*}",
            # same trap as ops/fused_whole.py)
            sent = float(jnp.finfo(jnp.float32).min)
            anchor = 0.0 * centre0_ref[0:1]
            if tracks_best:
                init = init + (
                    anchor, anchor + dtype(sent),          # f_st, pf
                    anchor, anchor, anchor, anchor,  # dn its logdet rev
                    anchor + (dtype(1.0)
                              if detector.get("init_save", True)
                              else dtype(0.0)),            # save
                    anchor, anchor, anchor, anchor,  # trials tm lmon a
                    tuple(anchor for _ in range(p)),       # best means
                    tuple(anchor for _ in range(nq)),      # best b
                    tuple(anchor for _ in range(nq)),      # best c
                    tuple(anchor for _ in range(ntri)),    # best prec
                    tuple(anchor for _ in range(ntri)),    # best cov
                    anchor, anchor)                        # b_logdet b_f
            else:
                init = init + (anchor, anchor + dtype(sent),
                               anchor, anchor, anchor, anchor, anchor)

            # EARLY-EXIT while: a tile stops at its slowest lane once
            # every lane's done mask is set (carry slot 7, the dn
            # plane), instead of running the static max-iterations trip
            # count with frozen lanes recomputing — outcome-identical
            # (frozen lanes never commit), big at the reference's
            # documented max-iterations=50 configs. Mosaic lowers the
            # cross-lane-reduced scalar condition fine (fused_whole).
            def wcond(c):
                return (c[0] < jnp.int32(n_iters)) \
                    & (jnp.min(c[1 + 7]) < 0.5)

            def wbody(c):
                return (c[0] + 1,) + iteration(c[0], c[1:])

            out = jax.lax.while_loop(wcond, wbody,
                                     (jnp.int32(0),) + init)
            if tracks_best:
                (means, bq, cq, prec, cov_t, f_st, pf, dn, its,
                 logdet, rev, sv, trials, tm, lmon, alpha,
                 b_cen, b_bq, b_cq, b_prec, b_cov,
                 b_logdet, b_f) = out[1:]
            else:
                (means, bq, cq, prec, cov_t, f_st, pf, dn, its,
                 logdet, rev, rev_f) = out[1:]
        else:
            means, bq, cq, prec, cov_t = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(n_iters), iteration, init)
        cov = {}
        for k, (i, j) in enumerate(tri):
            cov[(i, j)] = cov_t[k]
            cov[(j, i)] = cov_t[k]

        if not (detector is not None and tracks_best):
            # tracks_best defers the writes: the post-loop save/revert
            # selection below may replace the output state wholesale
            for i in range(p):
                means_out[i:i + 1] = means[i]
            for i in range(p):
                for j in range(p):
                    prec_out[i * p + j:i * p + j + 1] = \
                        at_tri(prec, i, j)
                    cov_out[i * p + j:i * p + j + 1] = cov[(i, j)]
            for q in range(nq):
                b_out[q:q + 1] = bq[q]
                c_out[q:q + 1] = cq[q]

        # ---- free-energy quadratics at the FINAL means ---------------
        if need_f or detector is not None:
            b_cols = means[0].shape[-1]
            means_block_fn = eval_at(list(means))

            def body_c(tb, carry):
                kqk2, jtjq2 = carry
                t0 = tb * jnp.int32(TBk)
                sig, jrows = means_block_fn(t0)
                kblk = data_ref[pl.ds(t0, TBk), :] - sig
                k2 = kblk * kblk
                add_kqk, add_jtj = [], []
                for qi in range(nq):
                    w = qw(qi, t0)
                    add_kqk.append(red(w * k2))
                    for i, j in tri:
                        add_jtj.append(red(w * jrows[i] * jrows[j]))
                return (tuple(x + y for x, y in zip(kqk2, add_kqk)),
                        tuple(x + y for x, y in zip(jtjq2, add_jtj)))

            zero_acc2 = jnp.zeros((1 if full_mode else TB, b_cols), dtype)
            kqk2_t, jtjq2_t = time_reduce(
                body_c,
                (tuple(zero_acc2 for _ in range(nq)),
                 tuple(zero_acc2 for _ in range(nq * ntri))))
            jtjq2 = [rsum(x) for x in jtjq2_t]
            kqk2, trace2 = [], []
            for qi in range(nq):
                kqk2.append(rsum(kqk2_t[qi]))
                tr2 = 0.0
                for i in range(p):
                    for j in range(p):
                        i_, j_ = max(i, j), min(i, j)
                        tr2 = tr2 + cov[(i, j)] * \
                            jtjq2[qi * ntri + tri.index((i_, j_))]
                trace2.append(tr2)
            if detector is not None:
                # the trip-count-th iteration's test never runs in the
                # loop (its F needs this pass at the final means)
                f_last = assemble_f(means, bq, cq,
                                    [cov[(i, i)] for i in range(p)],
                                    logdet, kqk2, trace2)
                run = 1.0 - dn
                if tracks_best:
                    cv = (its, pf, sv, rev, dn, trials, tm, lmon,
                          alpha)
                    cv_n = det_step(cv, f_last)
                    (its, pf, sv, rev, dn, trials, tm, lmon,
                     alpha) = tuple(run * n + (1.0 - run) * o
                                    for n, o in zip(cv_n, cv))
                    f_st = (1.0 - run) * f_st + run * f_last

                    # post-loop save, then revert (vb.py _finalize /
                    # inference_vb.cc:505-525): best <- final state
                    # where the save flag is set, output <- best where
                    # the revert flag is set; the reported F of a
                    # reverted lane is the ELBO captured when its best
                    # state was saved (the engine's f_rev recompute at
                    # the same state)
                    def ps(mflag, new, old):
                        return mflag * new + (1.0 - mflag) * old

                    b_cen = tuple(ps(sv, means[i], b_cen[i])
                                  for i in range(p))
                    b_bq = tuple(ps(sv, bq[q], b_bq[q])
                                 for q in range(nq))
                    b_cq = tuple(ps(sv, cq[q], b_cq[q])
                                 for q in range(nq))
                    b_prec = tuple(ps(sv, prec[k2], b_prec[k2])
                                   for k2 in range(ntri))
                    b_cov = tuple(ps(sv, cov_t[k2], b_cov[k2])
                                  for k2 in range(ntri))
                    b_f = ps(sv, f_st, b_f)
                    means = tuple(ps(rev, b_cen[i], means[i])
                                  for i in range(p))
                    bq = tuple(ps(rev, b_bq[q], bq[q])
                               for q in range(nq))
                    cq = tuple(ps(rev, b_cq[q], cq[q])
                               for q in range(nq))
                    prec = tuple(ps(rev, b_prec[k2], prec[k2])
                                 for k2 in range(ntri))
                    cov_t = tuple(ps(rev, b_cov[k2], cov_t[k2])
                                  for k2 in range(ntri))
                    f_st = ps(rev, b_f, f_st)

                    for i in range(p):
                        means_out[i:i + 1] = means[i]
                    for i in range(p):
                        for j in range(p):
                            k2 = tri.index((max(i, j), min(i, j)))
                            prec_out[i * p + j:i * p + j + 1] = prec[k2]
                            cov_out[i * p + j:i * p + j + 1] = \
                                cov_t[k2]
                    for q in range(nq):
                        b_out[q:q + 1] = bq[q]
                        c_out[q:q + 1] = cq[q]
                    fkqk_out[:] = f_st
                    ftr_out[:] = its
                    return
                fsmall = jnp.where(jnp.abs(f_last - pf) < d_tol,
                                   dtype(1.0), dtype(0.0))
                if kind == "freduce":
                    reduced = jnp.where(f_last - pf < 0, dtype(1.0),
                                        dtype(0.0))
                    rev = jnp.maximum(rev, run * reduced)
                    its = its + run * (1.0 - fsmall) * (1.0 - reduced)
                    committed = ((1.0 - reduced) * f_last
                                 + reduced * rev_f)
                    f_st = (1.0 - run) * f_st + run * committed
                    fkqk_out[0:1] = f_st
                    fkqk_out[1:2] = rev
                    ftr_out[0:1] = its
                    ftr_out[1:2] = jnp.zeros((1, b_cols), dtype)

                else:
                    its = its + run * (1.0 - fsmall)
                    f_st = (1.0 - run) * f_st + run * f_last
                    fkqk_out[:] = f_st
                    ftr_out[:] = its
            else:
                for qi in range(nq):
                    fkqk_out[qi:qi + 1] = kqk2[qi]
                    ftr_out[qi:qi + 1] = trace2[qi]
        else:
            fkqk_out[:] = jnp.zeros((nq, b), dtype)
            ftr_out[:] = jnp.zeros((nq, b), dtype)

    grid = (nvoxels // block,)

    def vox_spec(rows):
        # NB np.int32 constant: under x64 a literal 0 would make the
        # index map return mixed i64/i32, which Mosaic rejects
        return pl.BlockSpec((rows, block), lambda i: (np.int32(0), i),
                            memory_space=pltpu.VMEM)

    def fixed_spec(rows, cols):
        return pl.BlockSpec((rows, cols),
                            lambda i: (np.int32(0), np.int32(0)),
                            memory_space=pltpu.VMEM)

    # detector mode: the last two outputs are f/its lanes (plus the
    # revert flag row under freduce), not [Q,V] free-energy quadratics
    if detector is not None:
        fq = 2 if kind == "freduce" else 1
    else:
        fq = nq
    in_specs = [vox_spec(p), vox_spec(p), vox_spec(p), vox_spec(p),
                vox_spec(tp)]
    if with_supp:
        in_specs.append(vox_spec(nsupp))
    in_specs += [fixed_spec(tp, nq), fixed_spec(4 * nq, 1)]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(nq), vox_spec(nq), vox_spec(fq), vox_spec(fq)),
        out_shape=(
            jax.ShapeDtypeStruct((p, nvoxels), dtype),
            jax.ShapeDtypeStruct((p * p, nvoxels), dtype),
            jax.ShapeDtypeStruct((p * p, nvoxels), dtype),
            jax.ShapeDtypeStruct((nq, nvoxels), dtype),
            jax.ShapeDtypeStruct((nq, nvoxels), dtype),
            jax.ShapeDtypeStruct((fq, nvoxels), dtype),
            jax.ShapeDtypeStruct((fq, nvoxels), dtype),
        ),
        interpret=interpret,
    )

    def run(centre0, prior_means, prior_prec, data_padded, consts,
            supp=None, post_var0=None):
        qm = jnp.asarray(qm_host, dtype)
        if post_var0 is None:
            # only read by the freduce detector's initial-F capture
            post_var0 = jnp.ones_like(prior_prec)
        args = [centre0, prior_means, prior_prec, post_var0, data_padded]
        if with_supp:
            args.append(supp.astype(dtype))
        args += [qm, consts]
        means, prec_f, cov_f, nb, nc, fkqk, ftr = call(*args)
        return (means, prec_f.reshape(p, p, nvoxels),
                cov_f.reshape(p, p, nvoxels), nb, nc, fkqk, ftr)

    return run


def pack_nl_consts(noise_prior_b, noise_prior_c, ntimes_per_group,
                   init_b, init_c, dtype, nq):
    """[4Q,1] kernel constant vector (see make_fused_nl_loop)."""
    b0 = jnp.asarray(noise_prior_b, dtype).reshape(nq)
    c0 = jnp.asarray(noise_prior_c, dtype).reshape(nq)
    nt_g = jnp.asarray(np.asarray(ntimes_per_group, np.float32), dtype)
    c_post = (nt_g - 1.0) * 0.5 + c0
    return jnp.concatenate([
        1.0 / b0,
        c_post,
        jnp.full((nq,), float(init_b), dtype),
        jnp.full((nq,), float(init_c), dtype),
    ])[:, None]
