"""Whole-program SPECTRAL Pallas kernels: in-kernel sufficient
statistics + the scalar eigenbasis fixed point.

This is the flagship fixed-design route. Three interchangeable forms
(the engine's --spectral-impl selects; all pinned equivalent by
tests/test_fused_spectral.py):

  split (default): make_spectral_stats_kernel (MXU statistics in the
    natural [T,B] layout — one strict HBM read of the data) +
    make_spectral_core_kernel (eigenbasis fixed point + posterior
    reconstruction + per-lane F on the voxel-folded layout). Measured
    v5e, poly 16M voxels: 1.88 + 0.45 ns/voxel, device 16.6ms = 62%
    of HBM peak, ONE dispatch.
  xstats: XLA make_design_stats feeds the core kernel. XLA's stats
    are near the read floor standalone (0.68 ns/voxel) but lose their
    fusions inside the engine's windowed-stats scan at volume scale.
  fused (make_fused_spectral_loop): the original one-kernel form —
    folded-layout VPU statistics, measured vector-issue-bound at
    ~12-19 ns/voxel; kept as the reference implementation and escape
    hatch.

The two prior tiers each left most of the hardware idle:

- the XLA spectral route (ops/spectral.py) runs the cheap eigenbasis
  fixed point (~20 flops/voxel-iter) but pays ~5 effective HBM passes
  over the [T,V] data for its sufficient statistics
  (noise/white.py make_design_stats: dty matmul, r0 materialization,
  rtqr/dtqr reductions), plus per-iteration [V]-row traffic and the
  reconstruction/F passes — measured 9% of HBM peak on device at 16M
  voxels (round-4 device-time probe);
- the whole-program Cholesky kernel (ops/fused_whole.py) reads the
  data once but runs the full P-dim Cholesky/inverse fixed point on
  the VPU every iteration.

Here the data tile is the kernel input and the fixed point is the
spectral collapse: per voxel tile the kernel

    pass 1  accumulates dty_a = sum_t w[t] d[t,a] y[t]    (OLS rhs)
    solve   m0 by in-kernel f32 Cholesky of the constant A = D'QD
            (same-arithmetic requirement as ops/fused_whole.py: a
            host-f64 inverse would break r0's f32 orthogonality)
    pass 2  accumulates, about r0 = y - D m0:
              rtqr = sum_t q[t] r0^2,  dtqr_a = sum_t q[t] d[t,a] r0
    eigen   rotates the statistics into the whitened design eigenbasis
            (4P lane rows; host-f64 factors as lane-uniform constants)
    loop    the ENTIRE n_iters fixed point as P scalar rationals per
            voxel on VMEM-resident state (algebra of
            ops/spectral.py make_spectral_loop, verbatim)
    write   the reconstructed P x P posterior + noise state + the
            final ELBO quadratics (kqk, tr).

HBM traffic per voxel: ONE read of the data column plus the posterior
write — with a per-iteration cost of ~25 VPU flops this route is
HBM-bound by construction. No time padding is needed: the voxel fold
[T,V] -> [T*ROWS, V/ROWS] is a contiguous (free) reshape for any T,
and every per-timepoint slab is sublane-aligned.

Block-size rule (measured, r5): ALWAYS the largest fitting tile over
a ceil grid with a masked final block — a 1024-voxel tile runs the
core kernel 4x slower than 16384 (one vreg per plane op). Masked
final blocks are safe because every op is voxel-lane-local; the only
cross-lane reduction (the detector early-exit) gets a NaN-safe
validity mask.

Eligibility (gated by the engine, inference/vb.py): the spectral
gates — fixed design, white noise with ONE phi group, unlocked noise
stdev, voxel-uniform prior precisions, iteration-invariant priors,
f32 compute AND storage. Detector family: maxits runs the static
fixed point; pointzeroone / freduce / trialmode run their batched
lane state machines in-kernel (ops/fused_whole._mask_detector_step —
the f32-mask transcription of inference/convergence.py) with the
save/revert protocol on the scalar (generating phi, noise b) pair —
every spectral posterior is a pure function of its generating phi
(ops/spectral.py make_spectral_detector_loop's protocol, verbatim).

Reference equations: noisemodel_white.cc:228-363 (Eq 19-22),
inference_vb.cc:451-525 (save/revert); the eigenbasis collapse has no
reference counterpart (TPU-native design).
"""

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_loop import ROWS, VMEM_BUDGET, make_voxel_layout, _tri
from .fused_whole import _mask_detector_step
from .spectral import spectral_basis


def n_spectral_planes(p, nt, det=False):
    """Live [8, B/8]-plane estimate for pick_spectral_block: the data
    tile counts 4x for the stats-pass temporaries (tile + r0 + one
    product, reshape-reduce form), plus stats, eigen rows, loop carry
    and outputs. det adds the in-kernel detector lanes plus the
    scalar best-state pair."""
    data = 4 * nt
    ins = p                          # pm
    stats = 3 * p + 1                # dty, m0, dtqr, rtqr
    eigen = 4 * p                    # ut, u0t, vt, m0t
    carry = 2
    outs = p + 2 * p * p + 4
    det_planes = (9 + 4 + 4) if det else 0
    return data + ins + stats + eigen + carry + outs + det_planes


def pick_spectral_block(nvoxels, p, nt, det=False):
    """Voxel tile size (None = does not fit VMEM; caller falls back).
    Same contract and budget rationale as fused_whole.pick_whole_block
    (the dominant plane is the data tile itself)."""
    planes = n_spectral_planes(p, nt, det)
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


def pack_spectral_time_consts(design, qmask, nt, dtype):
    """[R*ROWS, 1] per-timepoint constants column, rows replicated
    ROWS-wise (lane-only broadcast in-kernel; Mosaic cannot broadcast
    sublanes and lanes in one op). Order: dcol (P x T unweighted
    design), dw (P x T mask-weighted design), qcol (T indicators).
    No time padding (see module docstring)."""
    d = np.asarray(design, np.float64)[:nt]
    q = np.asarray(qmask, np.float64).reshape(-1)[:nt]
    p = d.shape[1]
    cols = [d[:, a] for a in range(p)]
    cols += [d[:, a] * q for a in range(p)]
    cols += [q]
    flat = np.concatenate(cols)
    return jnp.asarray(np.repeat(flat, ROWS)[:, None], dtype)


def pack_spectral_consts(design, qmask, nt, pp, inv_b0, c_post,
                         init_b, init_c, dtype, elbo_extra=(0.0, 0.0)):
    """[K*ROWS, 1] scalar constants: A (P*P, f32 — the kernel's OLS
    solve must see the same rounding as its stats), etw / etwi / ew
    (P*P each), lam (P), pp (P), then inv_b0 / c_post / b_init /
    c_init, then the eigenbasis-ELBO constant pair (f_const,
    lb_coeff) — the in-kernel F output."""
    d = np.asarray(design, np.float64)[:nt]
    q = np.asarray(qmask, np.float64).reshape(-1)[:nt]
    a, lam, ew, winv = spectral_basis(d, q, pp)
    e = ew / winv[:, None]
    etw = ew.T                       # applies E' W
    etwi = (e / winv[:, None]).T     # applies E' W^-1
    flat = np.concatenate([
        a.reshape(-1), etw.reshape(-1), etwi.reshape(-1), ew.reshape(-1),
        lam, np.asarray(pp, np.float64).reshape(-1),
        [float(inv_b0), float(c_post), float(init_b), float(init_c)],
        list(elbo_extra)])
    return jnp.asarray(np.repeat(flat, ROWS)[:, None], dtype)


def _spectral_core(p, dtype, n_iters, detector, det_consts,
                   A, ETW, ETWI, EW, lam, pp, inv_b0, c_post,
                   b_init, c_init, f_const, lb_coeff,
                   m0, rtqr, dtqr, pm, anchor, valid=None):
    """The eigenbasis rotation + fixed point + reconstruction on
    VMEM-resident planes — shared by the one-kernel (fused) and the
    split (stats kernel + core kernel) forms. All arguments after
    det_consts are in-kernel accessors / plane lists; returns a dict
    of output planes (means/prec/cov lists, b, kqk/tr or f/its).
    valid: optional 0/1 plane marking real voxels under a ceil grid's
    masked final block — garbage lanes count as done in the detector
    mode's cross-lane early-exit reduction."""
    # ---- eigenbasis rows (ops/spectral.py, verbatim algebra) -------
    fdet = detector is not None
    dtqy = [dtqr[a] + sum(A(a, j) * m0[j] for j in range(p))
            for a in range(p)]
    ut = [sum(ETW(i, a) * dtqy[a] for a in range(p)) for i in range(p)]
    u0t = [sum(ETW(i, a) * dtqr[a] for a in range(p))
           for i in range(p)]
    vt = [sum(ETW(i, a) * (pp[a] * pm[a]) for a in range(p))
          for i in range(p)]
    m0t = [sum(ETWI(i, a) * m0[a] for a in range(p))
           for i in range(p)]

    s0 = anchor + b_init * c_init

    def quadratics(s):
        cross = 0.0
        quad = 0.0
        tr = 0.0
        mt = []
        rden = []
        for i in range(p):
            rd = 1.0 / (s * lam[i] + 1.0)
            mt_i = (s * ut[i] + vt[i]) * rd
            d_ = mt_i - m0t[i]
            cross = cross + d_ * u0t[i]
            quad = quad + lam[i] * d_ * d_
            tr = tr + lam[i] * rd
            mt.append(mt_i)
            rden.append(rd)
        return mt, cross, quad, tr, rden

    def elbo_quadratics(s):
        """quadratics + the eigenbasis ELBO sums (detector mode)."""
        cross = 0.0
        quad = 0.0
        tr = 0.0
        logden = 0.0
        rdensum = 0.0
        mv2 = 0.0
        for i in range(p):
            den = s * lam[i] + 1.0
            rd = 1.0 / den
            mt_i = (s * ut[i] + vt[i]) * rd
            d_ = mt_i - m0t[i]
            cross = cross + d_ * u0t[i]
            quad = quad + lam[i] * d_ * d_
            tr = tr + lam[i] * rd
            logden = logden + jnp.log(den)
            rdensum = rdensum + rd
            mv2 = mv2 + (mt_i - vt[i]) ** 2
        return cross, quad, tr, logden, rdensum, mv2

    sel_init = None
    its_lane = None
    if not fdet:
        def body(_, carry):
            s, _b = carry
            _, cross, quad, tr, _ = quadratics(s)
            kqk = jnp.maximum(rtqr - 2.0 * cross + quad, 0.0)
            bq = 1.0 / ((kqk + tr) * 0.5 + inv_b0)
            return bq * c_post, bq

        s_fin, _ = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_iters - 1), body, (s0, s0))
    else:
        # detector mode: the in-loop state is the scalar pair
        # (cur_s, gen_s) + is_init + best copies + the f32-mask
        # detector lanes (fused_whole's transcription of the
        # batched state machines). Iteration order matches
        # ops/spectral.py make_spectral_detector_loop: best-save ->
        # update from cur_s -> noise -> ELBO -> test -> freeze by
        # pre-test done. The noise b and the lane F need no
        # carries: both are pure functions of the generating phi,
        # recomputed at the selected phi after the loop (identical
        # arithmetic on identical inputs). NB _mask_detector_step
        # must run INSIDE the kernel trace: its dtype(...) scalar
        # constants are jax arrays, which as factory-scope closure
        # captures would be rejected by pallas_call.
        det_step = _mask_detector_step(detector, dtype)
        one = dtype(1.0)
        sent = anchor + dtype(float(det_consts["sentinel"]))
        save0 = anchor + (one if det_consts["init_save"]
                          else dtype(0.0))

        def mkconv():
            z = anchor
            return (z, sent, save0, z, z, z, z, z, z)

        def wcond(c):
            it = c[0]
            done_plane = c[6][4]
            if valid is not None:
                # masked-final-block garbage lanes may be NaN (the
                # interpret mode pads with NaN; hardware is undefined)
                # — a jnp.where, not mask arithmetic, keeps them out
                # of the cross-lane reduction
                done_plane = jnp.where(valid > 0.5, done_plane,
                                       dtype(1.0))
            return (it < jnp.int32(n_iters)) \
                & (jnp.min(done_plane) < 0.5)

        def wbody(c):
            (it, cur_s, gen_s, is_init, bg, bi, conv) = c
            # 1. best-save where flagged
            sv = conv[2]
            bg2 = sv * gen_s + (1.0 - sv) * bg
            bi2 = sv * is_init + (1.0 - sv) * bi
            # 2-3. update generated by cur_s + noise update
            g = cur_s
            cross, quad, tr, logden, rdensum, mv2 = \
                elbo_quadratics(g)
            kqk = jnp.maximum(rtqr - 2.0 * cross + quad, 0.0)
            b_new = 1.0 / ((kqk + tr) * 0.5 + inv_b0)
            s_new = b_new * c_post
            # 4. eigenbasis ELBO at (new means, new noise)
            f = (f_const - 0.5 * logden
                 + lb_coeff * jnp.log(b_new)
                 - b_new * c_post * (inv_b0 + 0.5 * kqk)
                 - 0.5 * tr - 0.5 * mv2 - 0.5 * rdensum)
            conv_n = det_step(conv, f)
            # 5. freeze lanes done BEFORE this iteration
            fro = conv[4]
            act = 1.0 - fro

            def fz(n, o):
                return act * n + fro * o

            conv_m = tuple(fz(n, o) for n, o in zip(conv_n, conv))
            return (it + 1, fz(s_new, cur_s), fz(g, gen_s),
                    is_init * fro, fz(bg2, bg), fz(bi2, bi), conv_m)

        init = (jnp.int32(0), s0, s0, anchor + one,
                s0, anchor + one, mkconv())
        out = jax.lax.while_loop(wcond, wbody, init)
        (_, cur_s, gen_s, is_init, bg, bi, conv) = out
        # post-loop save/revert (engine _finalize)
        sv, rv = conv[2], conv[3]
        bg = sv * gen_s + (1.0 - sv) * bg
        bi = sv * is_init + (1.0 - sv) * bi
        s_fin = rv * bg + (1.0 - rv) * gen_s
        sel_init = rv * bi + (1.0 - rv) * is_init
        its_lane = conv[0]

    # ---- reconstruction from the generating phi --------------------
    mt, cross, quad, tr, rden = quadratics(s_fin)
    kqk = jnp.maximum(rtqr - 2.0 * cross + quad, 0.0)
    b_fin = 1.0 / ((kqk + tr) * 0.5 + inv_b0)
    means = [sum(EW(a, i) * mt[i] for i in range(p))
             for a in range(p)]
    prec = {}
    cov = {}
    for i in range(p):
        for j in range(p):
            cov[(i, j)] = sum(EW(i, k) * EW(j, k) * rden[k]
                              for k in range(p))
            prec[(i, j)] = s_fin * A(i, j) + (pp[i] if i == j else 0.0)
    out = {"means": means, "prec": prec, "cov": cov, "b": b_fin,
           "kqk": kqk, "tr": tr, "c_post": c_post}
    # per-lane F at the final/selected state (the eigenbasis ELBO
    # collapse — same quantity as the engine's free_energy_from_parts
    # at f32 roundoff): computed in-kernel in BOTH modes so the
    # engine's F assembly never re-reads the posterior planes. In
    # detector mode this is the recompute-at-selected-state semantics
    # of the XLA spectral-fdet route; b_fin is bit-identical to the
    # selected state's in-loop noise b (same arithmetic, same inputs).
    _, _, _, logden, rdensum, mv2 = elbo_quadratics(s_fin)
    f_sel = (f_const - 0.5 * logden
             + lb_coeff * jnp.log(b_fin)
             - b_fin * c_post * (inv_b0 + 0.5 * kqk)
             - 0.5 * tr - 0.5 * mv2 - 0.5 * rdensum)
    out["f"] = f_sel
    if fdet:
        out.update({"its": its_lane, "sel_init": sel_init})
    return out


def _write_outputs(core, p, fdet, dtype, plane_shape, means_out,
                   prec_out, cov_out, b_out, c_out, fkqk_out, ftr_out):
    """Write a _spectral_core result dict to the folded output refs.
    The b output is negated on lanes whose selected state is the
    engine-initial posterior (detector mode; caller restores)."""
    rows = plane_shape[0]
    for a in range(p):
        means_out[a * rows:(a + 1) * rows] = core["means"][a]
    for i in range(p):
        for j in range(p):
            prec_out[(i * p + j) * rows:(i * p + j + 1) * rows] = \
                core["prec"][(i, j)]
            cov_out[(i * p + j) * rows:(i * p + j + 1) * rows] = \
                core["cov"][(i, j)]
    ones = jnp.ones(plane_shape, dtype)
    c_out[:] = core["c_post"] * ones
    if not fdet:
        b_out[:] = core["b"]
        fkqk_out[:] = core["f"]
        ftr_out[:] = core["tr"]
    else:
        b_out[:] = (1.0 - 2.0 * core["sel_init"]) * core["b"]
        fkqk_out[:] = core["f"]
        ftr_out[:] = core["its"]


def make_fused_spectral_loop(nparams, n_iters, nt, nvoxels, dtype,
                             block=2048, interpret=False, detector=None,
                             det_consts=None):
    """Build the whole-program spectral callable.

    Returns fn(dataf [T*ROWS, V/ROWS], tconsts, consts,
               prior_means [P,V])
        -> (means [P,V], prec [P,P,V], cov [P,P,V], b [1,V], c [1,V],
            fkqk [1,V], ftr [1,V])
    where dataf is the voxel-folded data plane (fold_data — a free
    reshape) and fkqk/ftr are the final-iteration quadratics for the
    engine's free-energy assembly (noise/white.py
    free_energy_from_parts).

    detector (optional): a pointzeroone / freduce / trialmode
    instance. Its state machine runs in-kernel each iteration on the
    per-lane eigenbasis ELBO (the ops/spectral.py
    make_spectral_detector_loop collapse), with save/revert on the
    scalar (generating phi, noise b, is_init) triple. n_iters must
    then be the engine's max_iter_cap. The outputs become
    fkqk = selected per-lane F, ftr = per-lane iteration counts, and
    b carries a sign tag on lanes whose selected state is the
    engine-initial posterior (b negated; the caller restores those
    lanes from the initial planes — the initial posterior is off the
    spectral manifold). det_consts: {"f_const": the host-folded
    constant block of the eigenbasis ELBO, "lb_coeff": c_post + 1/2,
    "sentinel", "init_save"}.
    """
    p = nparams
    tri = _tri(p)

    if block % ROWS != 0 or nvoxels % block != 0:
        raise ValueError(
            f"block={block} must be a multiple of ROWS={ROWS} and divide "
            f"nvoxels={nvoxels} (caller pads)")

    def plane(ref, i):
        return ref[i * ROWS:(i + 1) * ROWS]

    off_dcol = 0
    off_dw = p * nt
    off_qcol = 2 * p * nt

    fdet = detector is not None

    def kernel(data_ref, tc_ref, consts_ref, pm_ref,
               means_out, prec_out, cov_out, b_out, c_out,
               fkqk_out, ftr_out):
        b = pm_ref.shape[-1]

        def cst(row):
            return consts_ref[row * ROWS:(row + 1) * ROWS, 0:1]

        def A(i, j):
            return cst(i * p + j)

        def ETW(i, a):
            return cst(p * p + i * p + a)

        def ETWI(i, a):
            return cst(2 * p * p + i * p + a)

        def EW(a, i):
            return cst(3 * p * p + a * p + i)

        lam = [cst(4 * p * p + i) for i in range(p)]
        pp = [cst(4 * p * p + p + i) for i in range(p)]
        base = 4 * p * p + 2 * p
        inv_b0 = cst(base)
        c_post = cst(base + 1)
        b_init = cst(base + 2)
        c_init = cst(base + 3)
        f_const = cst(base + 4)
        lb_coeff = cst(base + 5)

        def tcol(base_t, length_t):
            return tc_ref[base_t * ROWS:(base_t + length_t) * ROWS, 0:1]

        def tsum(x):
            """Reduce a [T*ROWS, B] plane over time -> [8, B] (the
            sublane axis splits natively into (T, ROWS) tile groups —
            T elementwise tile adds; see fused_whole)."""
            return jnp.sum(x.reshape(nt, ROWS, b), axis=0)

        def trep(pl_):
            return jnp.broadcast_to(pl_[None], (nt, ROWS, b)) \
                .reshape(nt * ROWS, b)

        y_all = data_ref[...]  # [T*ROWS, B]

        # ---- pass 1: dty_a = sum_t q d_a y -----------------------------
        dty = [tsum(tcol(off_dw + a * nt, nt) * y_all) for a in range(p)]

        # OLS reference point: in-kernel f32 Cholesky solve of the
        # constant A (fused_whole's same-arithmetic requirement; the
        # factor planes are lane-uniform consts)
        ti = {ij: k for k, ij in enumerate(tri)}
        ch = [None] * len(tri)
        for i in range(p):
            s = A(i, i)
            for k in range(i):
                s = s - ch[ti[(i, k)]] ** 2
            ch[ti[(i, i)]] = jnp.sqrt(s)
            inv_d = 1.0 / ch[ti[(i, i)]]
            for j in range(i + 1, p):
                s = A(j, i)
                for k in range(i):
                    s = s - ch[ti[(j, k)]] * ch[ti[(i, k)]]
                ch[ti[(j, i)]] = s * inv_d
        fwd = [None] * p
        for i in range(p):
            s = dty[i]
            for k in range(i):
                s = s - ch[ti[(i, k)]] * fwd[k]
            fwd[i] = s / ch[ti[(i, i)]]
        m0 = [None] * p
        for i in range(p - 1, -1, -1):
            s = fwd[i]
            for k in range(i + 1, p):
                s = s - ch[ti[(k, i)]] * m0[k]
            m0[i] = s / ch[ti[(i, i)]]
        ok = jnp.isfinite(m0[0])
        for i in range(1, p):
            ok = ok & jnp.isfinite(m0[i])
        m0 = [jnp.where(ok, m, dtype(0.0)) for m in m0]

        # ---- pass 2: rtqr / dtqr about r0 = y - D m0 -------------------
        r0_all = y_all
        for a in range(p):
            r0_all = r0_all - tcol(off_dcol + a * nt, nt) * trep(m0[a])
        wq = tcol(off_qcol, nt)
        rtqr = tsum(wq * r0_all * r0_all)
        dtqr = [tsum(tcol(off_dw + a * nt, nt) * r0_all)
                for a in range(p)]

        # ---- shared eigenbasis core + output writes --------------------
        pm = [plane(pm_ref, i) for i in range(p)]
        # anchor: concrete-layout zero (pure-splat fori carries infer a
        # REPLICATED layout the body outputs can't relayout to)
        anchor = 0.0 * dty[0]
        core = _spectral_core(
            p, dtype, n_iters, detector, det_consts,
            A, ETW, ETWI, EW, lam, pp, inv_b0, c_post, b_init, c_init,
            f_const, lb_coeff, m0, rtqr, dtqr, pm, anchor)
        _write_outputs(core, p, fdet, dtype, (ROWS, b), means_out,
                       prec_out, cov_out, b_out, c_out, fkqk_out,
                       ftr_out)

    grid = (nvoxels // block,)
    fold, unfold, vox_spec, fixed_spec, _, vcols = \
        make_voxel_layout(nvoxels, block)
    ntc = 2 * p * nt * ROWS + nt * ROWS
    nsc = (4 * p * p + 2 * p + 6) * ROWS
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vox_spec(nt), fixed_spec(ntc, 1), fixed_spec(nsc, 1),
                  vox_spec(p)],
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(1), vox_spec(1), vox_spec(1), vox_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((ROWS, vcols), dtype),
        ),
        interpret=interpret,
    )

    def fold_data(data):
        """[T,V] -> [T*ROWS, V/ROWS]: a contiguous (free) reshape —
        no time padding (the reshape-reduce tsum is sublane-aligned
        for any T)."""
        return data.reshape(nt, ROWS, vcols).reshape(nt * ROWS, vcols)

    def run(dataf, tconsts, consts, prior_means):
        means, prec_f, cov_f, b, c, fkqk, ftr = call(
            dataf, tconsts, consts, fold(prior_means))
        return (unfold(means), unfold(prec_f).reshape(p, p, nvoxels),
                unfold(cov_f).reshape(p, p, nvoxels), unfold(b),
                unfold(c), unfold(fkqk), unfold(ftr))

    run.fold_data = fold_data
    return run


# ---------------------------------------------------------------------------
# Split form: MXU stats kernel (natural layout) + folded core kernel.
#
# The one-kernel form above computes its statistics as ~14 full-tile
# VPU traversals on the voxel-folded layout — measured vector-issue
# bound at ~12-19 ns/voxel on v5e, i.e. SLOWER than the 5-pass XLA
# stats route it replaces. Splitting fixes both halves' layouts:
#
#   kernel A (stats): data rides NATURAL [T, B]-lane tiles, so every
#     time reduction is an MXU matmul (dty/dtqr/rtqr contract over T;
#     r0 = y - D m0 is a K=P matmul) — VPU work drops to ~3 tile
#     traversals; outputs are the [<=2P+1, V] DesignStats rows.
#   kernel B (core): the eigenbasis fixed point + reconstruction on
#     the voxel-FOLDED stats rows — dense [8, B/8] planes, the layout
#     the loop wants.
#
# The HBM bounce between them is (2P+1+P) rows * 4 bytes ~ 40-80
# bytes/voxel — negligible next to the [T,V] read the split saves.
# ---------------------------------------------------------------------------


def pack_mxu_consts(design, qmask, nt, dtype):
    """Constant operand block for the stats kernel, one [8*KP, ?]
    array would fragment — instead three small dense arrays:
      dw8   [8, Kt]: row a<P = mask-weighted design column a over
                     padded time (else 0) — dty/dtqr contraction.
      dcol  [Kt, 8]: col a<P = raw design column a (else 0) — the
                     r0 = y - D m0 matmul (contraction K=8).
      q8    [8, Kt]: row 0 = mask indicators (else 0) — rtqr.
    Kt = nt padded to a lane multiple (128)."""
    kt = ((nt + 127) // 128) * 128
    d = np.zeros((kt, 8), np.float64)
    d[:nt, :design.shape[1]] = np.asarray(design, np.float64)
    q = np.zeros(kt, np.float64)
    q[:nt] = np.asarray(qmask, np.float64).reshape(-1)[:nt]
    dw8 = (d * q[:, None]).T.copy()
    q8 = np.zeros((8, kt), np.float64)
    q8[0] = q
    return (jnp.asarray(dw8, dtype), jnp.asarray(d, dtype),
            jnp.asarray(q8, dtype), kt)


def pack_solve_consts(design, qmask, nt, dtype):
    """[P*P*ROWS, 1] f32 A = D'QD column for the in-kernel m0 solve
    (same rounding as the stats; fused_whole's requirement)."""
    d = np.asarray(design, np.float64)[:nt]
    q = np.asarray(qmask, np.float64).reshape(-1)[:nt]
    a = (d * q[:, None]).T @ d
    return jnp.asarray(np.repeat(a.reshape(-1), ROWS)[:, None], dtype)


def pick_stats_block(nvoxels, nt):
    """Voxel tile for the stats kernel: ~5 live [nt, B] tiles (data,
    zero-padded copy, r0, r0^2 product, double-buffering). Always the
    LARGEST fitting block — the kernels run a ceil grid with a masked
    final block (every op is voxel-lane-local), so block size never
    depends on divisibility. Measured: the core kernel at block 1024
    (the old prefer-exact-division fallback at 16M voxels) ran 4x
    slower than at 16384."""
    budget = max(VMEM_BUDGET, 12 << 20)
    fitting = [bb for bb in (8192, 4096, 2048, 1024, 512)
               if 5 * nt * bb * 4 * 2 <= budget]
    if not fitting:
        return None
    return fitting[0], 0


def make_spectral_stats_kernel(nparams, nt, nvoxels, dtype, block=2048,
                               interpret=False):
    """One-read DesignStats (single phi group): fn(data [T,V], dw8,
    dcol, q8, aconsts) -> (m0 [P,V], rtqr [1,V], dtqr [P,V]).
    data is the plain [T,V] plane — NO fold, NO time padding (the
    block spans the full time extent; Mosaic masks the partial
    sublane tile, and the matmul constants carry zero weights beyond
    nt)."""
    p = nparams

    def kernel(data_ref, dw8_ref, dcol_ref, q8_ref, ac_ref,
               m0_out, rtqr_out, dtqr_out):
        b = data_ref.shape[-1]
        kt = dw8_ref.shape[-1]
        y = data_ref[...]                      # [nt, B]
        if kt != nt:
            y = jnp.concatenate(
                [y, jnp.zeros((kt - nt, b), dtype)], axis=0)

        def acst(i, j):
            return ac_ref[(i * p + j) * ROWS:(i * p + j) * ROWS + 1,
                          0:1]

        # ---- pass 1: dty rows via ONE MXU matmul ----------------------
        dty8 = jnp.dot(dw8_ref[...], y,
                       preferred_element_type=dtype)   # [8, B]
        dty = [dty8[a:a + 1] for a in range(p)]

        # m0 by in-kernel f32 Cholesky of the constant A (fused_whole's
        # same-arithmetic requirement; [1,1] consts broadcast on lanes)
        ti = {ij: k for k, ij in enumerate(_tri(p))}
        ch = [None] * len(ti)
        for i in range(p):
            s = acst(i, i)
            for k in range(i):
                s = s - ch[ti[(i, k)]] ** 2
            ch[ti[(i, i)]] = jnp.sqrt(s)
            inv_d = 1.0 / ch[ti[(i, i)]]
            for j in range(i + 1, p):
                s = acst(j, i)
                for k in range(i):
                    s = s - ch[ti[(j, k)]] * ch[ti[(i, k)]]
                ch[ti[(j, i)]] = s * inv_d
        fwd = [None] * p
        for i in range(p):
            s = dty[i]
            for k in range(i):
                s = s - ch[ti[(i, k)]] * fwd[k]
            fwd[i] = s / ch[ti[(i, i)]]
        m0 = [None] * p
        for i in range(p - 1, -1, -1):
            s = fwd[i]
            for k in range(i + 1, p):
                s = s - ch[ti[(k, i)]] * m0[k]
            m0[i] = s / ch[ti[(i, i)]]
        ok = jnp.isfinite(m0[0])
        for i in range(1, p):
            ok = ok & jnp.isfinite(m0[i])
        m0 = [jnp.where(ok, m, dtype(0.0)) for m in m0]

        # ---- pass 2: r0 via a K=8 MXU matmul --------------------------
        m0_8 = jnp.concatenate(
            m0 + [jnp.zeros((8 - p, b), dtype)], axis=0)    # [8, B]
        r0 = y - jnp.dot(dcol_ref[...], m0_8,
                         preferred_element_type=dtype)      # [kt, B]
        # rtqr = q . r0^2, dtqr = Dw' r0 — both MXU contractions
        rtqr8 = jnp.dot(q8_ref[...], r0 * r0,
                        preferred_element_type=dtype)
        dtqr8 = jnp.dot(dw8_ref[...], r0,
                        preferred_element_type=dtype)

        for a in range(p):
            m0_out[a:a + 1] = m0[a]
            dtqr_out[a:a + 1] = dtqr8[a:a + 1]
        rtqr_out[:] = rtqr8[0:1]

    grid = (-(-nvoxels // block),)  # ceil: masked final block
    kt = ((nt + 127) // 128) * 128

    def vspec(rows):
        return pl.BlockSpec((rows, block), lambda i: (np.int32(0), i),
                            memory_space=pltpu.VMEM)

    def cspec(r, c):
        return pl.BlockSpec((r, c), lambda i: (np.int32(0), np.int32(0)),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vspec(nt), cspec(8, kt), cspec(kt, 8), cspec(8, kt),
                  cspec(p * p * ROWS, 1)],
        out_specs=(vspec(p), vspec(1), vspec(p)),
        out_shape=(
            jax.ShapeDtypeStruct((p, nvoxels), dtype),
            jax.ShapeDtypeStruct((1, nvoxels), dtype),
            jax.ShapeDtypeStruct((p, nvoxels), dtype),
        ),
        interpret=interpret,
    )
    return call


def pick_core_block(nvoxels, p, det=False):
    """Voxel tile for the core kernel: ~10P + 2P^2 live planes.
    Largest fitting block; ceil grid with a masked final block (see
    pick_stats_block). The returned pad rounds the voxel count to a
    multiple of ROWS*128 = 1024: the engine-side fold
    [r, V] -> [r*ROWS, V/ROWS] is a FREE (layout-compatible) reshape
    only when the folded lane count V/ROWS is a multiple of the 128
    lane tile — otherwise XLA relayouts every folded plane through
    linear-layout while loops (measured 3-4x the whole route's device
    time at 8M voxels, where V/8 = 1M is not 128-aligned). Only the
    tiny stats planes are padded (the caller keeps the data plane
    unpadded)."""
    planes = 10 * p + 2 * p * p + 12 + ((9 + 4) if det else 0)
    # the conservative shared budget, NOT fused_whole's 12MB: at P=4
    # the 16384 tile lands at ~11MB estimated and measured 6x slower
    # than poly per voxel (Mosaic register/temp spills); 8MB keeps
    # P=3 at 16384 and P=4 at 8192
    budget = VMEM_BUDGET
    fitting = [bb for bb in (16384, 8192, 4096, 2048, 1024)
               if planes * bb * 4 * 2 <= budget]
    if not fitting:
        return None
    return fitting[0], (-nvoxels) % (ROWS * 128)


def make_spectral_core_kernel(nparams, n_iters, nvoxels, dtype,
                              block=8192, interpret=False,
                              detector=None, det_consts=None):
    """Folded-layout eigenbasis core: fn(m0f, rtqrf, dtqrf, pmf,
    consts) -> the same 7 outputs as make_fused_spectral_loop, with
    every input/output [r*ROWS, V/ROWS]-folded. consts =
    pack_spectral_consts (the same scalar block as the fused form)."""
    p = nparams
    fdet = detector is not None

    if block % ROWS != 0 or nvoxels % ROWS != 0:
        raise ValueError(
            f"block={block} and nvoxels={nvoxels} must be multiples of "
            f"ROWS={ROWS} (caller pads to the fold; the block grid is "
            "ceil with a masked final block)")

    def plane(ref, i):
        return ref[i * ROWS:(i + 1) * ROWS]

    def kernel(m0_ref, rtqr_ref, dtqr_ref, pm_ref, consts_ref,
               means_out, prec_out, cov_out, b_out, c_out,
               fkqk_out, ftr_out):
        b = pm_ref.shape[-1]

        def cst(row):
            return consts_ref[row * ROWS:(row + 1) * ROWS, 0:1]

        def A(i, j):
            return cst(i * p + j)

        def ETW(i, a):
            return cst(p * p + i * p + a)

        def ETWI(i, a):
            return cst(2 * p * p + i * p + a)

        def EW(a, i):
            return cst(3 * p * p + a * p + i)

        lam = [cst(4 * p * p + i) for i in range(p)]
        pp = [cst(4 * p * p + p + i) for i in range(p)]
        base = 4 * p * p + 2 * p
        inv_b0 = cst(base)
        c_post = cst(base + 1)
        b_init = cst(base + 2)
        c_init = cst(base + 3)
        f_const = cst(base + 4)
        lb_coeff = cst(base + 5)

        m0 = [plane(m0_ref, i) for i in range(p)]
        rtqr = plane(rtqr_ref, 0)
        dtqr = [plane(dtqr_ref, i) for i in range(p)]
        pm = [plane(pm_ref, i) for i in range(p)]
        anchor = 0.0 * rtqr
        # ceil grid: the final block's out-of-bounds lanes read VMEM
        # garbage (writes are masked). All math is lane-local, but the
        # detector mode's early-exit while reduces the done mask
        # ACROSS lanes — feed it a validity mask so garbage lanes
        # count as done (never the other way: valid lanes keep full
        # control of the loop).
        valid = None
        if fdet:
            i = pl.program_id(0)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (ROWS, b), 1) + i * jnp.int32(b)
            valid = jnp.where(cols < jnp.int32(nvoxels // ROWS),
                              dtype(1.0), dtype(0.0))
        core = _spectral_core(
            p, dtype, n_iters, detector, det_consts,
            A, ETW, ETWI, EW, lam, pp, inv_b0, c_post, b_init, c_init,
            f_const, lb_coeff, m0, rtqr, dtqr, pm, anchor,
            valid=valid)
        _write_outputs(core, p, fdet, dtype, (ROWS, b), means_out,
                       prec_out, cov_out, b_out, c_out, fkqk_out,
                       ftr_out)

    fold, unfold, vox_spec, fixed_spec, bcols, vcols = \
        make_voxel_layout(nvoxels, block)
    grid = (-(-vcols // bcols),)  # ceil: masked final block
    nsc = (4 * p * p + 2 * p + 6) * ROWS
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vox_spec(p), vox_spec(1), vox_spec(p), vox_spec(p),
                  fixed_spec(nsc, 1)],
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(1), vox_spec(1), vox_spec(1), vox_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((ROWS, vcols), dtype),
        ),
        interpret=interpret,
    )

    def run(m0, rtqr, dtqr, prior_means, consts):
        means, prec_f, cov_f, b, c, fkqk, ftr = call(
            fold(m0), fold(rtqr), fold(dtqr), fold(prior_means), consts)
        return (unfold(means), unfold(prec_f).reshape(p, p, nvoxels),
                unfold(cov_f).reshape(p, p, nvoxels), unfold(b),
                unfold(c), unfold(fkqk), unfold(ftr))

    return run
