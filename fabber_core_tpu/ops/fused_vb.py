"""Pallas-fused white-noise VB iteration for time-local models.

For nonlinear models whose signal at time t depends only on the
parameters and t (exp/biexp family), the whole VB iteration runs as ONE
Pallas kernel per voxel tile:

    pass A (t-loop): evaluate the model and its Jacobian at the current
        linearization centre via in-kernel jvp, accumulating
        J'J [P,P], J'r [P] per tile while staging J and r in VMEM;
    solve: Lambda = phi*J'J + diag(prior_prec); unrolled Cholesky ->
        covariance -> new means (identical arithmetic to
        ops/smallmat.py);
    pass B (t-loop): k = r + J(centre - means) read back from VMEM;
        k'k and tr(Sigma J'J) -> phi update (Eq 21/22);
    pass C (t-loop, only when F is needed): evaluate at the NEW means,
        accumulating k'k and tr(J'QJ Sigma) for the free energy (the
        digamma/gammaln assembly stays outside).

Nothing [T,V]- or [P,T,V]-shaped ever touches HBM except the data
read: the Jacobian lives only in VMEM scratch per 8x128-voxel tile.

Restrictions (callers gate on these): white noise, single phi group,
no masked timepoints, no LM damping, identity/elementwise transforms.
"""

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_BLOCK = 1024  # voxels per tile


def _tri(p):
    """(i, j<=i) pairs in row-major lower-triangular order."""
    return [(i, j) for i in range(p) for j in range(i + 1)]


def make_fused_iteration(time_signal, transforms, nparams, nt, nvoxels,
                         dtype, need_f, block=DEFAULT_BLOCK,
                         interpret=False):
    """Build the fused iteration callable.

    time_signal(model_params [P] list of [1,B] planes, t scalar) ->
    [1,B] signal plane (jax-traceable; runs inside the kernel).
    transforms: per-parameter Transform objects (latent -> model).

    Returns fn(centre [P,V], prior_means [P,V], prior_prec [P,V],
               phi_mean [V], data [T,V])
        -> (means [P,V], prec [P,P,V], cov [P,P,V],
            noise_tmp [V], kqk_f [V], trace_f [V])
    where noise_tmp = k'Qk + tr(Sigma J'QJ) for the phi update and
    kqk_f/trace_f are the free-energy quadratics at the new means
    (zeros when need_f is False).
    """
    p = nparams
    tri = _tri(p)
    ntri = len(tri)

    def to_model(latent_rows):
        return [tr.to_model(latent_rows[i]) for i, tr in enumerate(transforms)]

    def signal_and_jac(latent_rows, t):
        """Signal [1,B] and its latent-space Jacobian rows (P x [1,B])."""
        # cast the loop index to the compute dtype: under x64, int *
        # python-float promotes to f64, which Mosaic rejects
        tf = t.astype(dtype) if hasattr(t, "astype") else jnp.asarray(
            t, dtype)

        def f(stack):
            rows = [stack[i:i + 1] for i in range(p)]
            return time_signal(to_model(rows), tf)

        stack = jnp.concatenate(latent_rows, axis=0)  # [P,B]
        b = stack.shape[-1]
        # linearize evaluates the primal once; each Jacobian row is then
        # one cheap application of the linear map (vs P+1 full evals)
        sig, f_jvp = jax.linearize(f, stack)
        jrows = []
        for i in range(p):
            # basis tangent built without scatter (Mosaic has no scatter)
            basis = jnp.concatenate(
                [jnp.ones((1, b), dtype) if j == i
                 else jnp.zeros((1, b), dtype) for j in range(p)], axis=0)
            jrows.append(f_jvp(basis))
        return sig, jrows

    def kernel(centre_ref, pm_ref, pp_ref, phi_ref, data_ref,
               means_out, prec_out, cov_out, tmp_out, kqkf_out, trf_out,
               jsc, rsc):
        b = centre_ref.shape[-1]
        centre = [centre_ref[i:i + 1] for i in range(p)]

        # ---- pass A: accumulate J'J and J'r at the centre -------------
        def body_a(t, carry):
            jtj, jtr = carry
            sig, jrows = signal_and_jac(centre, t)
            r = data_ref[pl.ds(t, 1), :] - sig
            rsc[pl.ds(t, 1), :] = r
            for i in range(p):
                jsc[pl.ds(jnp.int32(i * nt) + t, 1), :] = jrows[i]
            jtr = jtr + jnp.concatenate([jrows[i] * r for i in range(p)], 0)
            jtj = jtj + jnp.concatenate(
                [jrows[i] * jrows[j] for i, j in tri], 0)
            return jtj, jtr

        jtj0 = jnp.zeros((ntri, b), dtype)
        jtr0 = jnp.zeros((p, b), dtype)
        jtj, jtr = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nt),
                                     body_a, (jtj0, jtr0))

        phi = phi_ref[0:1]

        # ---- solve: prec = phi*J'J + diag(prior_prec) -----------------
        # unrolled Cholesky on triangular-plane storage (same arithmetic
        # as ops/smallmat.py)
        def at(mat, i, j):
            i, j = max(i, j), min(i, j)
            return mat[tri.index((i, j)):tri.index((i, j)) + 1]

        prec = []
        for i, j in tri:
            v = phi * at(jtj, i, j)
            if i == j:
                v = v + pp_ref[i:i + 1]
            prec.append(v)
        prec = jnp.concatenate(prec, 0)

        chol = [None] * ntri
        for i in range(p):
            s = at(prec, i, i)
            for k in range(i):
                s = s - chol[tri.index((i, k))] ** 2
            chol[tri.index((i, i))] = jnp.sqrt(s)
            inv_d = 1.0 / chol[tri.index((i, i))]
            for j in range(i + 1, p):
                s = at(prec, j, i)
                for k in range(i):
                    s = s - chol[tri.index((j, k))] * chol[tri.index((i, k))]
                chol[tri.index((j, i))] = s * inv_d

        # inverse from the Cholesky factor (lower-tri inverse then
        # A^-1 = L^-T L^-1), plane arithmetic
        invl = {}
        for i in range(p):
            invl[(i, i)] = 1.0 / chol[tri.index((i, i))]
        for i in range(p):
            for j in range(i - 1, -1, -1):
                s = 0.0
                for k in range(j + 1, i + 1):
                    s = s + chol[tri.index((k, j))] * invl[(i, k)]
                invl[(i, j)] = -s / chol[tri.index((j, j))]
        cov = {}
        for i in range(p):
            for j in range(i + 1):
                s = 0.0
                for k in range(i, p):
                    s = s + invl[(k, i)] * invl[(k, j)]
                cov[(i, j)] = s
                cov[(j, i)] = s

        # ---- means update (Eq 20) -------------------------------------
        rhs = []
        for i in range(p):
            v = jtr[i:i + 1]
            for j in range(p):
                v = v + at(jtj, i, j) * centre[j]
            v = phi * v + pp_ref[i:i + 1] * pm_ref[i:i + 1]
            rhs.append(v)
        means = []
        for i in range(p):
            v = 0.0
            for j in range(p):
                v = v + cov[(i, j)] * rhs[j]
            means.append(v)

        # ---- pass B: k'k with k = r + J(centre - means) ---------------
        delta = [centre[i] - means[i] for i in range(p)]

        def body_b(t, kqk):
            k = rsc[pl.ds(t, 1), :]
            for i in range(p):
                k = k + jsc[pl.ds(jnp.int32(i * nt) + t, 1), :] * delta[i]
            return kqk + k * k

        kqk = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nt), body_b,
                                jnp.zeros((1, b), dtype))
        trace = 0.0
        for i in range(p):
            for j in range(p):
                trace = trace + cov[(i, j)] * at(jtj, i, j)
        tmp_out[:] = kqk + trace

        # ---- outputs --------------------------------------------------
        for i in range(p):
            means_out[i:i + 1] = means[i]
        for i in range(p):
            for j in range(p):
                prec_out[i * p + j:i * p + j + 1] = at(prec, i, j)
                cov_out[i * p + j:i * p + j + 1] = cov[(i, j)]

        # ---- pass C: free-energy quadratics at the NEW means ----------
        if need_f:
            def body_c(t, carry):
                kqk2, jtj2 = carry
                sig, jrows = signal_and_jac(means, t)
                k2 = data_ref[pl.ds(t, 1), :] - sig
                kqk2 = kqk2 + k2 * k2
                jtj2 = jtj2 + jnp.concatenate(
                    [jrows[i] * jrows[j] for i, j in tri], 0)
                return kqk2, jtj2

            kqk2, jtj2 = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(nt), body_c,
                (jnp.zeros((1, b), dtype), jnp.zeros((ntri, b), dtype)))
            tr2 = 0.0
            for i in range(p):
                for j in range(p):
                    tr2 = tr2 + cov[(i, j)] * at(jtj2, i, j)
            kqkf_out[:] = kqk2
            trf_out[:] = tr2
        else:
            kqkf_out[:] = jnp.zeros((1, b), dtype)
            trf_out[:] = jnp.zeros((1, b), dtype)

    grid = (nvoxels // block,)

    def vox_spec(rows):
        # NB np.int32 constant: under x64 a literal 0 would make the
        # index map return mixed i64/i32, which Mosaic rejects
        return pl.BlockSpec((rows, block), lambda i: (np.int32(0), i),
                            memory_space=pltpu.VMEM)

    def out_spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (np.int32(0), i),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vox_spec(p), vox_spec(p), vox_spec(p), vox_spec(1),
                  vox_spec(nt)],
        out_specs=(out_spec(p), out_spec(p * p), out_spec(p * p),
                   out_spec(1), out_spec(1), out_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((p, nvoxels), dtype),
            jax.ShapeDtypeStruct((p * p, nvoxels), dtype),
            jax.ShapeDtypeStruct((p * p, nvoxels), dtype),
            jax.ShapeDtypeStruct((1, nvoxels), dtype),
            jax.ShapeDtypeStruct((1, nvoxels), dtype),
            jax.ShapeDtypeStruct((1, nvoxels), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((p * nt, block), dtype),  # staged Jacobian
            pltpu.VMEM((nt, block), dtype),      # staged residual
        ],
        interpret=interpret,
    )

    def run(centre, prior_means, prior_prec, phi_mean, data):
        means, prec_f, cov_f, tmp, kqkf, trf = call(
            centre, prior_means, prior_prec, phi_mean[None, :], data)
        prec = prec_f.reshape(p, p, nvoxels)
        cov = cov_f.reshape(p, p, nvoxels)
        return means, prec, cov, tmp[0], kqkf[0], trf[0]

    return run
