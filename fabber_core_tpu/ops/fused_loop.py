"""Whole-VB-loop Pallas kernel for the fixed-design stats route.

The sufficient-statistics route (noise/white.py DesignStats) already
reduces each VB iteration to pure [P,V]-plane arithmetic: with a
constant design matrix and white noise the fixed point is a function of
the data only through per-voxel reductions computed once. But under
XLA's while/fori loop the posterior state still round-trips HBM every
iteration (plus materialized temporaries), so a 10-iteration run moves
~10x more bytes than the state itself.

This kernel runs the ENTIRE iteration loop in one Pallas invocation:
per voxel tile the sufficient statistics are read from HBM once, all
iterations execute on VMEM-resident state (theta update: unrolled
Cholesky/inverse identical to ops/smallmat.py; phi update: Eq 21/22
from the stats-route quadratics, noisemodel_white.cc:228-273), and only
the final posterior is written back. HBM traffic per voxel drops from
O(iters * state) to O(stats + state).

Eligibility (gated by the engine, inference/vb.py): fixed-design model,
white noise, maxits convergence detector (static trip count, no
save/revert protocol), non-ARD/non-spatial priors (prior planes are
iteration-invariant), float32, no free-energy history (the final F, if
requested, is assembled outside from the same stats).

The arithmetic is identical to WhiteNoiseModel.update_theta_stats /
update_noise_stats, so results match the XLA stats route to float32
roundoff (tests/test_fused_loop.py pins this).
"""

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 16384  # voxels per tile (state is tiny; big tiles win)

# The VPU's native f32 tile is (8 sublanes, 128 lanes). A [1, B] plane
# occupies B/128 vregs at 1/8 sublane utilization; packing each logical
# plane as [ROWS, B/ROWS] with ROWS=8 touches 8x fewer vregs per op.
# The voxel axis is folded as V -> (ROWS, V/ROWS) outside the kernel
# (a contiguous reshape), so plane i of a [P, V] input becomes rows
# [i*ROWS, (i+1)*ROWS) of a [P*ROWS, V/ROWS] array.
ROWS = 8

# conservative per-tile VMEM budget (v5e has ~16MB; leave headroom for
# Mosaic temporaries and the pipelined in/out double buffers, which the
# x2 in pick_block accounts for)
VMEM_BUDGET = 8 << 20


def pick_block(nvoxels, n_planes):
    """Choose the voxel tile size for a whole-loop kernel.

    n_planes: count of live [block]-element f32 planes per tile
    (inputs + outputs + loop carry). Returns (block, pad) — the
    largest candidate whose estimated footprint (x2 for the pipelined
    buffers) fits VMEM_BUDGET, preferring exact division of nvoxels —
    or None if even the smallest tile doesn't fit (caller falls back
    to the XLA route)."""
    fitting = [bb for bb in (16384, 8192, 4096, 2048, 1024)
               if n_planes * bb * 4 * 2 <= VMEM_BUDGET]
    if not fitting:
        return None
    for bb in fitting:
        if nvoxels % bb == 0:
            return bb, 0
    bb = fitting[-1]  # smallest fitting: least edge padding
    return bb, (-nvoxels) % bb


def n_white_loop_planes(p, nq):
    """Live-plane estimate for make_fused_vb_loop (see pick_block)."""
    ntri = p * (p + 1) // 2
    ins = 3 * p + nq + nq * p
    outs = p + 2 * p * p + 2 * nq
    carry = 2 * nq + p + 2 * ntri
    # dtqy (nq*p planes) is derived in-kernel from dtqr and stays live
    # across the whole fori_loop alongside it (advisor finding)
    derived = nq * p
    return ins + outs + carry + derived


def n_ar_loop_planes(p, fdet=False, nq=1):
    """Live-plane estimate for make_fused_ar_loop (see pick_block).
    fdet adds the in-kernel detector lanes plus the best-state copies
    of the save/revert protocol; nq = echo groups (specs and the
    noise-state rows scale with it)."""
    ntri = p * (p + 1) // 2
    s = 3 * nq
    ins = 3 * p + s + s * p
    outs = p + 2 * p * p + 5 * nq
    carry = 5 * nq + p + 2 * ntri
    # dmy (s*p planes) lives across the loop next to dmr (see above)
    derived = s * p
    det = (9 + 4 + (5 * nq + p + 2 * ntri)) if fdet else 0
    return ins + outs + carry + derived + det


def make_voxel_layout(nvoxels, block):
    """Shared kernel layout helpers for the ROWS fold: returns
    (fold, unfold, vox_spec, fixed_spec, bcols, vcols)."""
    bcols = block // ROWS
    vcols = nvoxels // ROWS

    def fold(x):
        """[r, V] -> [r*ROWS, V/ROWS]: voxel axis split contiguously so
        each plane's ROWS sublanes hold consecutive V/ROWS-strided
        voxel groups (pure reshape, same for all planes)."""
        r = x.shape[0]
        return x.reshape(r, ROWS, vcols).reshape(r * ROWS, vcols)

    def unfold(x):
        r = x.shape[0] // ROWS
        return x.reshape(r, ROWS, vcols).reshape(r, nvoxels)

    def vox_spec(rows):
        # NB np.int32 constants: under x64 a literal 0 would make the
        # index map return mixed i64/i32, which Mosaic rejects
        return pl.BlockSpec((rows * ROWS, bcols),
                            lambda i: (np.int32(0), i),
                            memory_space=pltpu.VMEM)

    def fixed_spec(rows, cols):
        return pl.BlockSpec((rows, cols),
                            lambda i: (np.int32(0), np.int32(0)),
                            memory_space=pltpu.VMEM)

    return fold, unfold, vox_spec, fixed_spec, bcols, vcols


def _tri(p):
    """(i, j<=i) pairs in row-major lower-triangular order."""
    return [(i, j) for i in range(p) for j in range(i + 1)]


def make_plane_algebra(p, dtype):
    """Unrolled small-matrix algebra on [ROWS,B] planes for in-kernel
    use (same arithmetic as ops/smallmat.py). Returns
    (tri, ti, chol_tri_jittered, inv_from_chol):

    - chol_tri_jittered(a_at): a_at(i,j) -> plane; jitter-retry
      Cholesky (lanes whose plain factorization produced a non-finite
      diagonal are refactorized with +1e-10 on the diagonal, mirroring
      ops/smallmat.cholesky_jittered's degradation path);
    - inv_from_chol(ch): tri-indexed factor list -> {(i,j): plane}
      full inverse.
    """
    tri = _tri(p)
    ntri = len(tri)
    ti = {ij: k for k, ij in enumerate(tri)}

    def chol_tri(a_at):
        ch = [None] * ntri
        for i in range(p):
            s = a_at(i, i)
            for k in range(i):
                s = s - ch[ti[(i, k)]] ** 2
            ch[ti[(i, i)]] = jnp.sqrt(s)
            inv_d = 1.0 / ch[ti[(i, i)]]
            for j in range(i + 1, p):
                s = a_at(j, i)
                for k in range(i):
                    s = s - ch[ti[(j, k)]] * ch[ti[(i, k)]]
                ch[ti[(j, i)]] = s * inv_d
        return ch

    def chol_tri_jittered(a_at):
        ch0 = chol_tri(a_at)
        bad = ~jnp.isfinite(ch0[ti[(0, 0)]])
        for i in range(1, p):
            bad = bad | ~jnp.isfinite(ch0[ti[(i, i)]])
        jit = jnp.where(bad, dtype(1e-10), dtype(0.0))
        return chol_tri(lambda i, j: a_at(i, j) + (jit if i == j
                                                   else dtype(0.0)))

    def inv_from_chol(ch):
        invl = {}
        for i in range(p):
            invl[(i, i)] = 1.0 / ch[ti[(i, i)]]
        for i in range(p):
            for j in range(i - 1, -1, -1):
                s = 0.0
                for k in range(j + 1, i + 1):
                    s = s + ch[ti[(k, j)]] * invl[(i, k)]
                invl[(i, j)] = -s / ch[ti[(j, j)]]
        cv = {}
        for i in range(p):
            for j in range(i + 1):
                s = 0.0
                for k in range(i, p):
                    s = s + invl[(k, i)] * invl[(k, j)]
                cv[(i, j)] = s
                cv[(j, i)] = s
        return cv

    return tri, ti, chol_tri_jittered, inv_from_chol


def make_fused_vb_loop(nparams, nq, n_iters, nvoxels, dtype,
                       locked_noise_stdev=-1.0, block=DEFAULT_BLOCK,
                       interpret=False):
    """Build the whole-loop callable.

    Returns fn(m0 [P,V], rtqr [Q,V], dtqr [Q,P,V], consts [K,1],
               prior_means [P,V], prior_prec [P,V])
        -> (means [P,V], prec [P,P,V], cov [P,P,V], b [Q,V], c [Q,V])

    consts packs, in order: dtqd flattened [Q*P*P], 1/b0 [Q],
    c_post = (ntimes-1)/2 + c0 [Q], b_init [Q], c_init [Q]
    (see pack_consts).
    """
    p = nparams
    tri, ti, chol_tri_jittered, inv_from_chol = make_plane_algebra(p, dtype)
    ntri = len(tri)

    if block % ROWS != 0 or nvoxels % block != 0:
        raise ValueError(
            f"block={block} must be a multiple of ROWS={ROWS} and divide "
            f"nvoxels={nvoxels} (caller pads)")

    def plane(ref, i):
        return ref[i * ROWS:(i + 1) * ROWS]

    def kernel(m0_ref, rtqr_ref, dtqr_ref, consts_ref, pm_ref, pp_ref,
               means_out, prec_out, cov_out, b_out, c_out):
        b = m0_ref.shape[-1]

        def cst(row):
            # consts are packed sublane-replicated ([K*ROWS,1], see
            # pack_consts): read the [ROWS,1] slab so the consuming
            # arithmetic only ever broadcasts on lanes (Mosaic cannot
            # broadcast on sublanes and lanes in one op)
            return consts_ref[row * ROWS:(row + 1) * ROWS, 0:1]

        def dtqd(q, i, j):
            return cst(q * p * p + i * p + j)

        base = nq * p * p
        inv_b0 = [cst(base + q) for q in range(nq)]
        c_post = [cst(base + nq + q) for q in range(nq)]
        b_init = [cst(base + 2 * nq + q) for q in range(nq)]
        c_init = [cst(base + 3 * nq + q) for q in range(nq)]

        m0 = [plane(m0_ref, i) for i in range(p)]
        pm = [plane(pm_ref, i) for i in range(p)]
        pp = [plane(pp_ref, i) for i in range(p)]
        rtqr = [plane(rtqr_ref, q) for q in range(nq)]
        dtqr = [[plane(dtqr_ref, q * p + a) for a in range(p)]
                for q in range(nq)]
        # D'Q_i y = D'Q_i r0 + (D'Q_i D) m0 — iteration-invariant
        dtqy = [[dtqr[q][a] + sum(dtqd(q, a, j) * m0[j] for j in range(p))
                 for a in range(p)] for q in range(nq)]

        ones = jnp.ones((ROWS, b), dtype)

        def body(_, carry):
            bc, _means, _prec, _cov = carry
            phi = [plane(bc, q) * plane(bc, nq + q) for q in range(nq)]

            # theta update (update_theta_stats arithmetic)
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

            # phi update (update_noise_stats arithmetic)
            delta = [means[a] - m0[a] for a in range(p)]
            new_b, new_c = [], []
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

            return (jnp.concatenate(new_b + new_c, 0),
                    jnp.concatenate(means, 0),
                    jnp.concatenate(prec, 0),
                    jnp.concatenate([cov[ij] for ij in tri], 0))

        bc0 = jnp.concatenate([b_init[q] * ones for q in range(nq)]
                              + [c_init[q] * ones for q in range(nq)], 0)
        init = (bc0, jnp.zeros((p * ROWS, b), dtype),
                jnp.zeros((ntri * ROWS, b), dtype),
                jnp.zeros((ntri * ROWS, b), dtype))
        bc, means, prec_t, cov_t = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_iters), body, init)

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

    grid = (nvoxels // block,)
    fold, unfold, vox_spec, fixed_spec, _, vcols = \
        make_voxel_layout(nvoxels, block)
    nconsts = (nq * p * p + 4 * nq) * ROWS
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vox_spec(p), vox_spec(nq), vox_spec(nq * p),
                  fixed_spec(nconsts, 1), vox_spec(p), vox_spec(p)],
        out_specs=(vox_spec(p), vox_spec(p * p), vox_spec(p * p),
                   vox_spec(nq), vox_spec(nq)),
        out_shape=(
            jax.ShapeDtypeStruct((p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((p * p * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((nq * ROWS, vcols), dtype),
            jax.ShapeDtypeStruct((nq * ROWS, vcols), dtype),
        ),
        interpret=interpret,
    )

    def run(m0, rtqr, dtqr, consts, prior_means, prior_prec):
        means, prec_f, cov_f, b, c = call(
            fold(m0), fold(rtqr), fold(dtqr.reshape(nq * p, -1)), consts,
            fold(prior_means), fold(prior_prec))
        return (unfold(means), unfold(prec_f).reshape(p, p, nvoxels),
                unfold(cov_f).reshape(p, p, nvoxels), unfold(b),
                unfold(c))

    return run


def pack_consts(dtqd, noise_prior_b, noise_prior_c, ntimes_per_group,
                init_b, init_c, dtype):
    """[K*ROWS,1] kernel constant vector (see make_fused_vb_loop).

    Each constant is replicated across ROWS consecutive rows so the
    kernel reads sublane-complete [ROWS,1] slabs (lane-only broadcast).

    dtqd [Q,P,P] (traced ok); noise_prior_b/c [Q,1] arrays or scalars;
    ntimes_per_group [Q] host floats; init_b/init_c python floats.
    """
    nq = dtqd.shape[0]
    b0 = jnp.asarray(noise_prior_b, dtype).reshape(nq)
    c0 = jnp.asarray(noise_prior_c, dtype).reshape(nq)
    nt_g = jnp.asarray(np.asarray(ntimes_per_group, np.float32), dtype)
    c_post = (nt_g - 1.0) * 0.5 + c0
    flat = jnp.concatenate([
        dtqd.reshape(-1).astype(dtype),
        (1.0 / b0),
        c_post,
        jnp.full((nq,), float(init_b), dtype),
        jnp.full((nq,), float(init_c), dtype),
    ])
    return jnp.repeat(flat, ROWS)[:, None]
