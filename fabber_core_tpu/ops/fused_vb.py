"""Pallas-fused white-noise VB iteration for time-local models.

For nonlinear models whose signal at time t depends only on the
parameters and t (exp/biexp family), the whole VB iteration runs as ONE
Pallas kernel per voxel tile:

    pass A (time-blocked loop): evaluate the model and its Jacobian at
        the current linearization centre via in-kernel jvp, TB=8
        timepoints per step (full 8x128 VPU tiles), accumulating
        per-noise-group J'Q_iJ [P,P] and J'Q_i r [P] while staging
        J and r in VMEM;
    solve: Lambda = sum_i phi_i J'Q_iJ + diag(prior_prec); unrolled
        Cholesky -> covariance -> new means (identical arithmetic to
        ops/smallmat.py); optional LM-damped update when the lm
        convergence detector is active;
    pass B (time-blocked): k = r + J(centre - means) read back from
        VMEM; per-group k'Q_ik; with tr(Sigma J'Q_iJ) -> phi updates
        (Eq 21/22, assembled outside);
    pass C (time-blocked, only when F is needed): evaluate at the NEW
        means, accumulating per-group k'Q_ik and tr(Sigma J'Q_iJ) for
        the free energy (the digamma/gammaln assembly stays outside).

Nothing [T,V]- or [P,T,V]-shaped ever touches HBM except the data
read: the Jacobian lives only in VMEM scratch per voxel tile.

Noise patterns (multiple phi groups) and masked timepoints are carried
by a static [Tp,Q] group-indicator matrix (masked/padded timepoints
belong to no group, so they contribute to nothing). The time axis is
padded to a multiple of TB; padded rows have all-zero indicators.

Remaining restrictions (callers gate on these): white noise,
float32 compute, no locked-linearization centres.
"""

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TB = 8  # timepoints per kernel loop step (f32 sublane count)
DEFAULT_BLOCK = 1024  # voxels per tile


def _tri(p):
    """(i, j<=i) pairs in row-major lower-triangular order."""
    return [(i, j) for i in range(p) for j in range(i + 1)]


def pad_time(nt):
    """Padded time length (multiple of TB)."""
    return ((nt + TB - 1) // TB) * TB


def make_block_eval(time_signal, transforms, nparams, dtype,
                    time_signal_jac=None):
    """In-kernel model evaluator factory shared by the per-iteration
    kernel (below) and the whole-loop kernel (ops/fused_loop_nl.py).

    Returns make_signal_and_jac(latent_rows) -> block_fn(t0) ->
    (sig [TB,B], P x [TB,B] latent-space Jacobian rows), with the
    per-voxel (time-independent) work hoisted out of the time loop.
    """
    p = nparams

    def to_model(latent_rows):
        return [tr.to_model(latent_rows[i])
                for i, tr in enumerate(transforms)]

    def chain_factors(latent_rows):
        """d model_i / d latent_i, one [1,B] plane per parameter —
        time-independent, so hoisted out of the time-block loops."""
        out = []
        for i, tr in enumerate(transforms):
            _, d = jax.jvp(tr.to_model, (latent_rows[i],),
                           (jnp.ones_like(latent_rows[i]),))
            out.append(d)
        return out

    def make_signal_and_jac(latent_rows):
        if time_signal_jac is not None:
            mrows = to_model(latent_rows)
            chain = chain_factors(latent_rows)

            def block_fn(t0):
                tidx = jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0) + t0
                tf = tidx.astype(dtype)
                sig, jm = time_signal_jac(mrows, tf)
                return sig, [jm[i] * chain[i] for i in range(p)]

            return block_fn

        def block_fn(t0):
            tidx = jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0) + t0
            tf = tidx.astype(dtype)

            def f(stack):
                rows = [stack[i:i + 1] for i in range(p)]
                return time_signal(to_model(rows), tf)

            stack = jnp.concatenate(latent_rows, axis=0)  # [P,B]
            b = stack.shape[-1]
            # linearize evaluates the primal once; each Jacobian row is
            # then one application of the linear map (vs P+1 full evals)
            sig, f_jvp = jax.linearize(f, stack)
            jrows = []
            for i in range(p):
                # basis tangent without scatter (Mosaic has no scatter)
                basis = jnp.concatenate(
                    [jnp.ones((1, b), dtype) if j == i
                     else jnp.zeros((1, b), dtype) for j in range(p)],
                    axis=0)
                jrows.append(f_jvp(basis))
            return sig, jrows

        return block_fn

    return make_signal_and_jac


def make_full_eval(evaluate_fn, transforms, nparams, nt, tp, dtype,
                   nsupp=0):
    """In-kernel evaluator for *generic* (data-free) models: the
    full-time counterpart of make_block_eval, used by the whole-loop
    kernel's full-time mode (ops/fused_loop_nl.py).

    ``evaluate_fn(params [P]) -> signal [nt]`` is the model's plain
    ``evaluate`` closed over a data-free EvalContext (models/base.py
    derive_time_local_eval). Unlike time_signal it produces the whole
    series from a parameter *vector*, so it is vmapped over the voxel
    lanes inside the kernel and evaluated over the full time axis once
    per call; the latent-space Jacobian comes from one jax.linearize
    (P linear-map applications, as in make_block_eval's generic path).

    Returns make_signal_and_jac(latent_rows[, supp]) -> block_fn(t0) ->
    (sig [tp,B], P x [tp,B] latent-space Jacobian rows). t0 is ignored
    — the single "block" is the whole (zero-padded) time axis, and the
    caller reduces over it directly instead of looping time blocks.
    supp (when nsupp>0) is the [S,B] per-voxel suppdata plane, a plain
    vmapped input (no Jacobian is taken through it).
    """
    p = nparams

    def make_signal_and_jac(latent_rows, supp=None):
        stack = jnp.concatenate(latent_rows, axis=0)  # [P,B] latent
        b = stack.shape[-1]

        def f(st):
            mrows = [tr.to_model(st[i])
                     for i, tr in enumerate(transforms)]  # [B] each
            if nsupp:
                sig = jax.vmap(evaluate_fn, in_axes=(1, 1), out_axes=1)(
                    jnp.stack(mrows), supp).astype(dtype)  # [nt,B]
            else:
                sig = jax.vmap(evaluate_fn, in_axes=1, out_axes=1)(
                    jnp.stack(mrows)).astype(dtype)        # [nt,B]
            if tp != nt:
                # padded rows belong to no noise group (all-zero
                # indicator), so their value never contributes
                sig = jnp.concatenate(
                    [sig, jnp.zeros((tp - nt, b), dtype)], axis=0)
            return sig

        sig, f_jvp = jax.linearize(f, stack)
        jrows = []
        for i in range(p):
            # basis tangent without scatter (Mosaic has no scatter)
            basis = jnp.concatenate(
                [jnp.ones((1, b), dtype) if j == i
                 else jnp.zeros((1, b), dtype) for j in range(p)],
                axis=0)
            jrows.append(f_jvp(basis))

        def block_fn(t0):
            del t0  # single full-time block
            return sig, jrows

        return block_fn

    return make_signal_and_jac


def make_fused_iteration(time_signal, transforms, nparams, nt, nvoxels,
                         dtype, need_f, qmasks, block=DEFAULT_BLOCK,
                         with_lm=False, interpret=False,
                         time_signal_jac=None):
    """Build the fused iteration callable.

    time_signal(model_params [P] list of [1,B] planes, t [TB,1]) ->
    [TB,B] signal plane (jax-traceable; runs inside the kernel; must
    broadcast over the time axis).
    transforms: per-parameter Transform objects (latent -> model).
    qmasks: numpy [Q,T] 0/1 group indicators (masked timepoints in no
    group).
    time_signal_jac (optional): analytic variant returning
    (signal [TB,B], [P x [TB,B]] model-space Jacobian rows); when
    given, the per-block jax.linearize replay (one full linear-map
    application per parameter) is replaced by one evaluation, with the
    latent->model chain factors hoisted out of the time loop (they do
    not depend on t).

    Returns fn(centre [P,V], prior_means [P,V], prior_prec [P,V],
               phi_mean [Q,V], data [Tp,V], lm_alpha [V] or None)
        -> (means [P,V], prec [P,P,V], cov [P,P,V],
            noise_kqk [Q,V], noise_tr [Q,V], f_kqk [Q,V], f_tr [Q,V])
    where noise_kqk/noise_tr are k'Q_ik and tr(Sigma J'Q_iJ) at the
    centre linearization (for the phi update) and f_kqk/f_tr the same
    quadratics at the new means (zeros when need_f is False).
    """
    p = nparams
    tri = _tri(p)
    ntri = len(tri)
    nq = qmasks.shape[0]
    tp = pad_time(nt)
    ntb = tp // TB
    # static [Tp, Q] indicator (padded rows zero)
    qm_host = np.zeros((tp, nq), dtype=np.float32)
    qm_host[:nt, :] = np.asarray(qmasks, np.float32).T

    make_signal_and_jac = make_block_eval(time_signal, transforms, p,
                                          dtype, time_signal_jac)

    def kernel(*refs):
        if with_lm:
            (centre_ref, pm_ref, pp_ref, phi_ref, data_ref, qm_ref,
             alpha_ref, means_out, prec_out, cov_out, nkqk_out, ntr_out,
             fkqk_out, ftr_out, jsc, rsc) = refs
        else:
            (centre_ref, pm_ref, pp_ref, phi_ref, data_ref, qm_ref,
             means_out, prec_out, cov_out, nkqk_out, ntr_out,
             fkqk_out, ftr_out, jsc, rsc) = refs
        b = centre_ref.shape[-1]
        centre = [centre_ref[i:i + 1] for i in range(p)]

        def qw(qi, t0):
            """Group-i indicator column for the block at t0: [TB,1]."""
            return qm_ref[pl.ds(t0, TB), qi:qi + 1]

        def rsum(x):
            """Reduce a [TB,B] block over time -> [1,B]."""
            return jnp.sum(x, axis=0, keepdims=True)

        # ---- pass A: per-group J'Q_iJ, J'Q_i r at the centre ----------
        # The loop carries [TB,B] PARTIAL-SUM planes (one per quadratic)
        # and reduces across sublanes ONCE after the loop: cross-sublane
        # reductions are multi-cycle, so paying ntb of them per
        # quadratic was the kernel's hot spot.
        centre_block_fn = make_signal_and_jac(centre)

        def body_a(tb, carry):
            jtjq, jtrq = carry  # tuples of [TB,B] partial-sum planes
            t0 = tb * jnp.int32(TB)
            sig, jrows = centre_block_fn(t0)
            r = data_ref[pl.ds(t0, TB), :] - sig
            rsc[pl.ds(t0, TB), :] = r
            for a in range(p):
                jsc[pl.ds(jnp.int32(a * tp) + t0, TB), :] = jrows[a]
            add_jtj, add_jtr = [], []
            for qi in range(nq):
                w = qw(qi, t0)
                for i, j in tri:
                    add_jtj.append(w * jrows[i] * jrows[j])
                for a in range(p):
                    add_jtr.append(w * jrows[a] * r)
            return (tuple(x + y for x, y in zip(jtjq, add_jtj)),
                    tuple(x + y for x, y in zip(jtrq, add_jtr)))

        zero_tb = jnp.zeros((TB, b), dtype)
        jtjq_t, jtrq_t = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(ntb), body_a,
            (tuple(zero_tb for _ in range(nq * ntri)),
             tuple(zero_tb for _ in range(nq * p))))
        jtjq = jnp.concatenate([rsum(x) for x in jtjq_t], 0)
        jtrq = jnp.concatenate([rsum(x) for x in jtrq_t], 0)

        phis = [phi_ref[qi:qi + 1] for qi in range(nq)]

        def at_q(mat, qi, i, j):
            i, j = max(i, j), min(i, j)
            row = qi * ntri + tri.index((i, j))
            return mat[row:row + 1]

        # ---- solve: prec = sum_i phi_i J'Q_iJ + diag(prior_prec) ------
        # unrolled Cholesky on triangular-plane storage (same arithmetic
        # as ops/smallmat.py)
        def at(mat, i, j):
            i, j = max(i, j), min(i, j)
            return mat[tri.index((i, j)):tri.index((i, j)) + 1]

        prec = []
        for i, j in tri:
            v = 0.0
            for qi in range(nq):
                v = v + phis[qi] * at_q(jtjq, qi, i, j)
            if i == j:
                v = v + pp_ref[i:i + 1]
            prec.append(v)
        prec = jnp.concatenate(prec, 0)

        def chol_planes(a_at):
            """Unrolled Cholesky; a_at(i,j) -> [1,B] plane. Returns the
            factor as a tri-indexed list."""
            ch = [None] * ntri
            for i in range(p):
                s = a_at(i, i)
                for k in range(i):
                    s = s - ch[tri.index((i, k))] ** 2
                ch[tri.index((i, i))] = jnp.sqrt(s)
                inv_d = 1.0 / ch[tri.index((i, i))]
                for j in range(i + 1, p):
                    s = a_at(j, i)
                    for k in range(i):
                        s = s - ch[tri.index((j, k))] * ch[tri.index((i, k))]
                    ch[tri.index((j, i))] = s * inv_d
            return ch

        chol = chol_planes(lambda i, j: at(prec, i, j))

        # inverse from the Cholesky factor (lower-tri inverse then
        # A^-1 = L^-T L^-1), plane arithmetic
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

        cov = inv_from_chol(chol)

        # ---- means update (Eq 20) -------------------------------------
        rhs = []
        for a in range(p):
            v = 0.0
            for qi in range(nq):
                gi = jtrq[qi * p + a:qi * p + a + 1]
                for j in range(p):
                    gi = gi + at_q(jtjq, qi, a, j) * centre[j]
                v = v + phis[qi] * gi
            v = v + pp_ref[a:a + 1] * pm_ref[a:a + 1]
            rhs.append(v)
        means = []
        for i in range(p):
            v = 0.0
            for j in range(p):
                v = v + cov[(i, j)] * rhs[j]
            means.append(v)

        if with_lm:
            # LM-damped update (noisemodel_white.cc:330-354): solve
            # (Lambda + alpha diag Lambda) dm = J'X r + L0 m0 - L0 c
            alpha = alpha_ref[0:1]
            delta = []
            for a in range(p):
                v = 0.0
                for qi in range(nq):
                    v = v + phis[qi] * jtrq[qi * p + a:qi * p + a + 1]
                v = v + pp_ref[a:a + 1] * (pm_ref[a:a + 1] - centre[a])
                delta.append(v)
            dchol = chol_planes(
                lambda i, j: at(prec, i, j) + (alpha * at(prec, i, i)
                                               if i == j else 0.0))
            # solve L L^T x = delta by fwd/back substitution
            y = [None] * p
            for i in range(p):
                s = delta[i]
                for k in range(i):
                    s = s - dchol[tri.index((i, k))] * y[k]
                y[i] = s / dchol[tri.index((i, i))]
            x = [None] * p
            for i in reversed(range(p)):
                s = y[i]
                for k in range(i + 1, p):
                    s = s - dchol[tri.index((k, i))] * x[k]
                x[i] = s / dchol[tri.index((i, i))]
            use_lm = alpha > 0.0
            means = [jnp.where(use_lm, centre[i] + x[i], means[i])
                     for i in range(p)]

        # ---- pass B: per-group k'Q_ik, k = r + J(centre - means) ------
        delta_cm = [centre[i] - means[i] for i in range(p)]

        def body_b(tb, kqk):
            t0 = tb * jnp.int32(TB)
            k = rsc[pl.ds(t0, TB), :]
            for i in range(p):
                k = k + jsc[pl.ds(jnp.int32(i * tp) + t0, TB), :] * delta_cm[i]
            k2 = k * k
            return tuple(kqk[qi] + qw(qi, t0) * k2 for qi in range(nq))

        nkqk_t = jax.lax.fori_loop(jnp.int32(0), jnp.int32(ntb), body_b,
                                   tuple(zero_tb for _ in range(nq)))
        nkqk = jnp.concatenate([rsum(x) for x in nkqk_t], 0)
        ntr_rows = []
        for qi in range(nq):
            tr = 0.0
            for i in range(p):
                for j in range(p):
                    tr = tr + cov[(i, j)] * at_q(jtjq, qi, i, j)
            ntr_rows.append(tr)

        # ---- outputs --------------------------------------------------
        for i in range(p):
            means_out[i:i + 1] = means[i]
        for i in range(p):
            for j in range(p):
                prec_out[i * p + j:i * p + j + 1] = at(prec, i, j)
                cov_out[i * p + j:i * p + j + 1] = cov[(i, j)]
        nkqk_out[:] = nkqk
        ntr_out[:] = jnp.concatenate(ntr_rows, 0)

        # ---- pass C: free-energy quadratics at the NEW means ----------
        if need_f:
            means_block_fn = make_signal_and_jac(means)

            def body_c(tb, carry):
                kqk2, jtjq2 = carry  # tuples of [TB,B] partials
                t0 = tb * jnp.int32(TB)
                sig, jrows = means_block_fn(t0)
                kblk = data_ref[pl.ds(t0, TB), :] - sig
                k2 = kblk * kblk
                add_kqk, add_jtj = [], []
                for qi in range(nq):
                    w = qw(qi, t0)
                    add_kqk.append(w * k2)
                    for i, j in tri:
                        add_jtj.append(w * jrows[i] * jrows[j])
                return (tuple(x + y for x, y in zip(kqk2, add_kqk)),
                        tuple(x + y for x, y in zip(jtjq2, add_jtj)))

            kqk2_t, jtjq2_t = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(ntb), body_c,
                (tuple(zero_tb for _ in range(nq)),
                 tuple(zero_tb for _ in range(nq * ntri))))
            kqk2 = jnp.concatenate([rsum(x) for x in kqk2_t], 0)
            jtjq2 = jnp.concatenate([rsum(x) for x in jtjq2_t], 0)
            ftr_rows = []
            for qi in range(nq):
                tr2 = 0.0
                for i in range(p):
                    for j in range(p):
                        tr2 = tr2 + cov[(i, j)] * at_q(jtjq2, qi, i, j)
                ftr_rows.append(tr2)
            fkqk_out[:] = kqk2
            ftr_out[:] = jnp.concatenate(ftr_rows, 0)
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

    in_specs = [vox_spec(p), vox_spec(p), vox_spec(p), vox_spec(nq),
                vox_spec(tp), fixed_spec(tp, nq)]
    if with_lm:
        in_specs.append(vox_spec(1))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(nq), vox_spec(nq), vox_spec(nq), vox_spec(nq)),
        out_shape=(
            jax.ShapeDtypeStruct((p, nvoxels), dtype),
            jax.ShapeDtypeStruct((p * p, nvoxels), dtype),
            jax.ShapeDtypeStruct((p * p, nvoxels), dtype),
            jax.ShapeDtypeStruct((nq, nvoxels), dtype),
            jax.ShapeDtypeStruct((nq, nvoxels), dtype),
            jax.ShapeDtypeStruct((nq, nvoxels), dtype),
            jax.ShapeDtypeStruct((nq, nvoxels), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((p * tp, block), dtype),  # staged Jacobian
            pltpu.VMEM((tp, block), dtype),      # staged residual
        ],
        interpret=interpret,
    )

    def run(centre, prior_means, prior_prec, phi_mean, data_padded,
            lm_alpha=None):
        qm = jnp.asarray(qm_host, dtype)
        args = [centre, prior_means, prior_prec, phi_mean, data_padded, qm]
        if with_lm:
            args.append(lm_alpha[None, :])
        means, prec_f, cov_f, nkqk, ntr, fkqk, ftr = call(*args)
        prec = prec_f.reshape(p, p, nvoxels)
        cov = cov_f.reshape(p, p, nvoxels)
        return means, prec, cov, nkqk, ntr, fkqk, ftr

    return run
