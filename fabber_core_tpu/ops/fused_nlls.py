"""Whole-loop Pallas kernel for nonlinear (time-signal) NLLS.

The generic NLLS route re-linearizes the model per optimizer iteration
in XLA: a [P,T,V] Jacobian plus autodiff temporaries round-trip HBM
every accept/reject step — measured ~0.5M voxels/s for a biexp-shaped
fit (the slowest number in the bench). This kernel runs the ENTIRE
damped Gauss-Newton loop per voxel tile on VMEM-resident state, the
exact structure the VB tier uses (ops/fused_loop_nl.py):

    per iteration (reference: inference_nlls.cc:90-293 driving the
    MISCMATHS nonlin LM loop):
      pass A  time-blocked model + Jacobian evaluation at the current
              params (analytic time_signal_jac when provided),
              accumulating J'J (tri), J'r and r'r;
      solve   (J'J + lam * damp) delta = J'r by unrolled per-lane
              jitter-retry Cholesky (damp = I for Levenberg, diag(J'J)
              for Marquardt — inference/nlls.py semantics verbatim);
      pass B  model evaluation at the trial params -> trial cost;
      accept/reject, lambda ladder, relative cost-gain convergence
              (CFTOL) and the lambda ceiling — f32 mask state machines
              (Mosaic cannot carry i1 vectors);
    early-exit while: a tile stops at its slowest lane.

After the loop one more pass A at the final params builds J'J for the
posterior precision J'J/mse with the 1e-6 diagonal floor
(inference_nlls.cc:175-192). Only params/cost/its and the [P,P,V]
posterior leave the chip.

Masked timepoints ride the same [Tp,1] weight column convention as
the VB kernels (padded rows weight 0). Eligibility (engine-gated):
time_signal model, f32, no suppdata.
"""

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_vb import TB, _tri, pad_time, make_block_eval
from .fused_loop import VMEM_BUDGET

LAMBDA_INIT = 1e-3
LAMBDA_GROW = 10.0
LAMBDA_SHRINK = 0.1
LAMBDA_MAX = 1e10
PREC_DIAG_FLOOR = 1e-6
CFTOL = 1e-5  # f32-scaled (inference/nlls.py's rationale; keep equal)
PLATEAU_LAMBDA = 1.0  # rejected-plateau convergence guard (ditto)


def n_nlls_rows(p, tp):
    """Per-voxel live f32 rows (VMEM gate): pipelined data, params +
    LM lanes, the [TB,B] partial-sum planes and eval temporaries."""
    ntri = p * (p + 1) // 2
    data_in = 2 * tp
    small_io = 2 * p + 2 * (p + 2 * p * p + 2)
    carry = p + 5
    eval_live = 3 * TB * (p + 1)
    time_partials = TB * (ntri + p + 1)
    return data_in + small_io + carry + eval_live + time_partials + 10


def pick_nlls_block(nvoxels, p, tp):
    rows = n_nlls_rows(p, tp)
    for bb in (2048, 1024, 512, 256, 128):
        if rows * bb * 4 <= VMEM_BUDGET:
            return bb, (-nvoxels) % bb
    return None


def make_fused_nlls_loop(time_signal, transforms, nparams, nt, max_its,
                         nvoxels, dtype, tmask, marquardt=False,
                         block=1024, interpret=False,
                         time_signal_jac=None, resume=False,
                         posterior=True):
    """Build the whole-loop NLLS callable.

    Default mode (resume=False, posterior=True):
      fn(params0 [P,V], data [Tp,V])
        -> (params [P,V], cost [V], its [V], prec [P,P,V], cov [P,P,V])

    Two-phase compaction modes (inference/nlls.py): a handful of
    degenerate lanes per tile (flat cost valleys) otherwise pin every
    tile at the iteration cap, so the engine caps phase 1, sorts lanes
    by convergence state, and resumes the stragglers densely packed:
      phase 1 (posterior=False): fn -> (params, state [4,V]) where the
        state rows are (lam, cost, done, its) — the exact LM carry;
      phase 2 (resume=True): fn(params0, data, state_in) continues the
        lambda ladder / cost / iteration count verbatim; `max_its` is
        the REMAINING per-lane budget. Tiles whose lanes are all done
        skip the loop entirely (the early-exit while sees min done=1),
        paying only their HBM reads.

    tmask: numpy [nt] 0/1 timepoint weights (padded rows 0).
    """
    p = nparams
    tri = _tri(p)
    ntri = len(tri)
    tp = pad_time(nt)
    ntb = tp // TB
    w_host = np.zeros((tp, 1), np.float32)
    w_host[:nt, 0] = np.asarray(tmask, np.float32)
    n_unmasked = float(w_host.sum())

    if nvoxels % block != 0:
        raise ValueError(f"block={block} must divide nvoxels={nvoxels}")

    make_signal_and_jac = make_block_eval(time_signal, transforms, p,
                                          dtype, time_signal_jac)

    def at_tri(lst, i, j):
        i, j = max(i, j), min(i, j)
        return lst[tri.index((i, j))]

    def chol_planes_jittered(a_at):
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

    def solve_chol(ch, b):
        fwd = [None] * p
        for i in range(p):
            s = b[i]
            for k in range(i):
                s = s - ch[tri.index((i, k))] * fwd[k]
            fwd[i] = s / ch[tri.index((i, i))]
        out = [None] * p
        for i in range(p - 1, -1, -1):
            s = fwd[i]
            for k in range(i + 1, p):
                s = s - ch[tri.index((k, i))] * out[k]
            out[i] = s / ch[tri.index((i, i))]
        return out

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

    def kernel(*refs):
        if resume:
            p0_ref, data_ref, w_ref, state_ref = refs[:4]
            orefs = refs[4:]
        else:
            p0_ref, data_ref, w_ref = refs[:3]
            state_ref = None
            orefs = refs[3:]
        if posterior:
            params_out, cost_out, its_out, prec_out, cov_out = orefs
        else:
            params_out, state_out = orefs
        b = p0_ref.shape[-1]
        ones = jnp.ones((1, b), dtype)

        def wq(t0):
            return w_ref[pl.ds(t0, TB), 0:1]

        def rsum(x):
            return jnp.sum(x, axis=0, keepdims=True)

        zero_tb = jnp.zeros((TB, b), dtype)

        def pass_a(rows):
            """J'J tri, J'r, r'r at params `rows` (w-folded)."""
            block_fn = make_signal_and_jac(rows)

            def body(tb, acc):
                jtj, jtr, rr = acc
                t0 = tb * jnp.int32(TB)
                sig, jrows = block_fn(t0)
                w = wq(t0)
                r = w * (data_ref[pl.ds(t0, TB), :] - sig)
                add_jtj = [w * jrows[i] * jrows[j] for i, j in tri]
                add_jtr = [jrows[a] * r for a in range(p)]
                # NB r is w-folded once: w in {0,1} so w^2 = w
                add_rr = (r * (data_ref[pl.ds(t0, TB), :] - sig),)
                return (tuple(x + y for x, y in zip(jtj, add_jtj)),
                        tuple(x + y for x, y in zip(jtr, add_jtr)),
                        (rr[0] + add_rr[0],))

            jtj_t, jtr_t, rr_t = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(ntb), body,
                (tuple(zero_tb for _ in range(ntri)),
                 tuple(zero_tb for _ in range(p)), (zero_tb,)))
            return ([rsum(x) for x in jtj_t], [rsum(x) for x in jtr_t],
                    rsum(rr_t[0]))

        def cost_at(rows):
            block_fn = make_signal_and_jac(rows)

            def body(tb, acc):
                t0 = tb * jnp.int32(TB)
                sig, _ = block_fn(t0)
                d = data_ref[pl.ds(t0, TB), :] - sig
                return acc + wq(t0) * d * d

            return rsum(jax.lax.fori_loop(jnp.int32(0), jnp.int32(ntb),
                                          body, zero_tb))

        anchor = 0.0 * p0_ref[0:1]
        params0 = [p0_ref[i:i + 1] for i in range(p)]
        if resume:
            # continue the exact LM carry; no cost re-evaluation
            cost0 = state_ref[1:2]
            lam0 = state_ref[0:1]
            done0 = state_ref[2:3]
            its0 = state_ref[3:4]
        else:
            # fused-iteration mode: ONE pass seeds J'J/J'r AND the
            # initial cost (r'r from pass_a is bit-identical to
            # cost_at: w in {0,1} so (w d) d == w (d d), and both
            # accumulate [TB,B] partials in the same order)
            jtj0, jtr0, rr0 = pass_a(params0)
            cost0 = rr0
            lam0 = anchor + dtype(LAMBDA_INIT)
            done0 = anchor
            its0 = anchor

        def accept_logic(params, cost, lam, done, its, trial, tcost):
            """Shared accept/reject, lambda ladder and convergence
            tests — identical arithmetic in both iteration forms."""
            better = jnp.where((tcost < cost) & jnp.isfinite(tcost),
                               dtype(1.0), dtype(0.0))
            newp = [better * trial[i] + (1.0 - better) * params[i]
                    for i in range(p)]
            newc = better * tcost + (1.0 - better) * cost
            newl = better * lam * dtype(LAMBDA_SHRINK) \
                + (1.0 - better) * lam * dtype(LAMBDA_GROW)
            converged = better * jnp.where(
                cost - tcost <= dtype(CFTOL)
                * jnp.maximum(jnp.abs(tcost), dtype(1e-30)),
                dtype(1.0), dtype(0.0))
            plateau = (1.0 - better) * jnp.where(
                jnp.isfinite(tcost) & (lam >= dtype(PLATEAU_LAMBDA))
                & (tcost - cost <= dtype(CFTOL)
                   * jnp.maximum(jnp.abs(cost), dtype(1e-30))),
                dtype(1.0), dtype(0.0))
            newdone = jnp.maximum(
                done, jnp.maximum(
                    jnp.where(newl > dtype(LAMBDA_MAX), dtype(1.0),
                              dtype(0.0)),
                    jnp.maximum(converged, plateau)))
            return better, newp, newc, newl, newdone

        def solve_step(jtj, jtr, params, lam):
            if marquardt:
                damp = [at_tri(jtj, i, i) for i in range(p)]
            else:
                damp = [ones for _ in range(p)]
            ch = chol_planes_jittered(
                lambda i, j: at_tri(jtj, i, j)
                + (lam * damp[i] if i == j else dtype(0.0)))
            delta = solve_chol(ch, list(jtr))
            return [params[i] + delta[i] for i in range(p)]

        def iteration(c):
            """Two-pass form (resume mode): stats at the current
            params + a cost-only pass at the trial point. Phase 2's
            all-done tiles skip the loop entirely, so re-deriving the
            stats per live iteration is cheaper than carrying them
            through the compacted state tensor."""
            it, params, cost, lam, done, its = c
            jtj, jtr, _rr = pass_a(list(params))
            trial = solve_step(jtj, jtr, params, lam)
            tcost = cost_at(trial)
            better, newp, newc, newl, newdone = accept_logic(
                params, cost, lam, done, its, trial, tcost)
            act = 1.0 - done  # lanes done BEFORE this step keep state

            def sel(n, o):
                return act * n + (1.0 - act) * o

            return (it + 1,
                    tuple(sel(newp[i], params[i]) for i in range(p)),
                    sel(newc, cost), sel(newl, lam),
                    jnp.maximum(done, act * newdone),
                    its + act)

        def iteration_fused(c):
            """One-pass form (fresh-start mode): J'J and J'r ride the
            carry, so each step evaluates the model ONLY at the trial
            point — the trial pass's r'r IS the trial cost, and on
            acceptance its stats seed the next solve. Bit-identical
            trajectory to the two-pass form (same values, reused)."""
            it, params, cost, jtj, jtr, lam, done, its = c
            trial = solve_step(jtj, jtr, params, lam)
            tjtj, tjtr, trr = pass_a(trial)
            better, newp, newc, newl, newdone = accept_logic(
                params, cost, lam, done, its, trial, trr)
            act = 1.0 - done

            def sel(n, o):
                return act * n + (1.0 - act) * o

            selb = act * better

            def selj(n, o):
                return selb * n + (1.0 - selb) * o

            return (it + 1,
                    tuple(sel(newp[i], params[i]) for i in range(p)),
                    sel(newc, cost),
                    tuple(selj(tjtj[k], jtj[k]) for k in range(ntri)),
                    tuple(selj(tjtr[a], jtr[a]) for a in range(p)),
                    sel(newl, lam),
                    jnp.maximum(done, act * newdone),
                    its + act)

        def wcond(c):
            return (c[0] < jnp.int32(max_its)) & (jnp.min(c[-2]) < 0.5)

        if resume:
            init = (jnp.int32(0), tuple(params0), cost0, lam0, done0,
                    its0)
            it, params, cost, lam, done, its = jax.lax.while_loop(
                wcond, iteration, init)
            jtj_fin = None
        else:
            init = (jnp.int32(0), tuple(params0), cost0,
                    tuple(jtj0), tuple(jtr0), lam0, done0, its0)
            (it, params, cost, jtj_fin, _jtr_fin, lam, done,
             its) = jax.lax.while_loop(wcond, iteration_fused, init)

        for i in range(p):
            params_out[i:i + 1] = params[i]

        if not posterior:
            state_out[0:1] = lam
            state_out[1:2] = cost
            state_out[2:3] = done
            state_out[3:4] = its
            return

        # posterior precision J'J/mse with the diagonal floor; the
        # fused carry already holds J'J at the final accepted params
        # (rejected trials never commit), saving the extra pass
        if jtj_fin is not None:
            jtj = list(jtj_fin)
        else:
            jtj, _jtr, _rr = pass_a(list(params))
        mse = cost / dtype(n_unmasked - p)
        prec = {}
        for i, j in tri:
            v = at_tri(jtj, i, j) / mse
            if i == j:
                v = jnp.maximum(v, dtype(PREC_DIAG_FLOOR))
            prec[(i, j)] = v
            prec[(j, i)] = v
        ch = chol_planes_jittered(lambda i, j: prec[(i, j)])
        cov = inv_from_chol(ch)

        cost_out[:] = cost
        its_out[:] = its
        for i in range(p):
            for j in range(p):
                prec_out[i * p + j:i * p + j + 1] = prec[(i, j)]
                cov_out[i * p + j:i * p + j + 1] = cov[(max(i, j),
                                                        min(i, j))]

    grid = (nvoxels // block,)

    def vox_spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (np.int32(0), i),
                            memory_space=pltpu.VMEM)

    def fixed_spec(rows, cols):
        return pl.BlockSpec((rows, cols),
                            lambda i: (np.int32(0), np.int32(0)),
                            memory_space=pltpu.VMEM)

    in_specs = [vox_spec(p), vox_spec(tp), fixed_spec(tp, 1)]
    if resume:
        in_specs.append(vox_spec(4))
    if posterior:
        out_specs = (vox_spec(p), vox_spec(1), vox_spec(1),
                     vox_spec(p * p), vox_spec(p * p))
        out_shape = (
            jax.ShapeDtypeStruct((p, nvoxels), dtype),
            jax.ShapeDtypeStruct((1, nvoxels), dtype),
            jax.ShapeDtypeStruct((1, nvoxels), dtype),
            jax.ShapeDtypeStruct((p * p, nvoxels), dtype),
            jax.ShapeDtypeStruct((p * p, nvoxels), dtype),
        )
    else:
        out_specs = (vox_spec(p), vox_spec(4))
        out_shape = (
            jax.ShapeDtypeStruct((p, nvoxels), dtype),
            jax.ShapeDtypeStruct((4, nvoxels), dtype),
        )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    wcol = jnp.asarray(w_host, dtype)

    def run(params0, data_padded, state_in=None):
        ins = (params0, data_padded, wcol)
        if resume:
            ins = ins + (state_in,)
        if not posterior:
            return call(*ins)
        params, cost, its, prec_f, cov_f = call(*ins)
        return (params, cost[0], its[0],
                prec_f.reshape(p, p, nvoxels),
                cov_f.reshape(p, p, nvoxels))

    return run
