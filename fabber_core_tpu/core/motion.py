"""TPU-native motion correction: rigid/affine timepoint registration.

Capability parity with the reference's MCobj (motioncorr.cc:25-94): the
original 4-D data is re-registered, one timepoint at a time, to the
current model prediction, and VB continues on the realigned data. The
reference shells out to FSL mcflirt (affine, dof<=12) or a
diffeomorphic field update (dof>12); here the registration is a jitted
Gauss-Newton loop over a 6-dof rigid (or 12-dof affine) transform with
trilinear resampling — pure JAX, so it runs on the TPU alongside the
inference instead of round-tripping to an external binary.

Semantics mirrored from motioncorr.cc:
- each timepoint gets its OWN transform (per-volume affmat rows,
  motioncorr.cc:88-92);
- the source image is always the ORIGINAL data (`wholeimage`), so
  transforms do not compound across MC steps;
- the target is the model prediction at the current posterior means;
- 10 optimizer iterations per call (num_iter, motioncorr.cc:47).

Limitations (documented, not hidden): single-resolution Gauss-Newton
on the SSD cost, so the capture range is roughly +-2 voxels of
translation / a few degrees of rotation — adequate for the
between-iteration correction loop this implements (motion shrinks as
the fit improves), not a general-purpose replacement for a
multi-resolution registration tool.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def _rotation(rx, ry, rz):
    """Full (not small-angle) rotation matrix Rz @ Ry @ Rx."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    rx_m = jnp.stack([
        jnp.stack([jnp.ones_like(cx), jnp.zeros_like(cx), jnp.zeros_like(cx)]),
        jnp.stack([jnp.zeros_like(cx), cx, -sx]),
        jnp.stack([jnp.zeros_like(cx), sx, cx])])
    ry_m = jnp.stack([
        jnp.stack([cy, jnp.zeros_like(cy), sy]),
        jnp.stack([jnp.zeros_like(cy), jnp.ones_like(cy), jnp.zeros_like(cy)]),
        jnp.stack([-sy, jnp.zeros_like(cy), cy])])
    rz_m = jnp.stack([
        jnp.stack([cz, -sz, jnp.zeros_like(cz)]),
        jnp.stack([sz, cz, jnp.zeros_like(cz)]),
        jnp.stack([jnp.zeros_like(cz), jnp.zeros_like(cz),
                   jnp.ones_like(cz)])])
    return rz_m @ ry_m @ rx_m


def _warp_coords(params, coords, centre, dof):
    """Transformed sample coordinates [3,V].

    params: [dof] — [tx,ty,tz,rx,ry,rz] for dof=6, or translations +
    row-major (A - I) entries for dof=12. Rotation about the volume
    centre.
    """
    t = params[:3][:, None]
    centred = coords - centre[:, None]
    if dof == 6:
        a = _rotation(params[3], params[4], params[5])
    elif dof == 12:
        a = jnp.eye(3, dtype=params.dtype) + params[3:12].reshape(3, 3)
    else:
        raise ValueError(f"dof must be 6 or 12, got {dof}")
    return a @ centred + centre[:, None] + t


def make_registerer(coords, shape, dof=6, n_iters=10, damping=1e-4,
                    dtype=jnp.float32):
    """Build a jitted per-timepoint registerer.

    coords: [V,3] (or [3,V]) integer voxel coordinates of the masked
    voxels; shape: (nx,ny,nz) grid extent.

    Returns fn(data_t [V], pred_t [V]) -> (realigned_t [V], params
    [dof]): estimates the transform minimising masked SSD between the
    resampled data volume and the prediction, and returns the data
    resampled through it.
    """
    coords = jnp.asarray(coords, dtype)
    if coords.shape[0] != 3:
        coords = coords.T  # -> [3,V]
    idx = tuple(np.asarray(coords, np.int64).round().astype(np.int64))
    centre = jnp.asarray((np.asarray(shape, np.float64) - 1) / 2.0, dtype)
    eye = jnp.eye(dof, dtype=dtype)

    def to_grid(vals):
        return jnp.zeros(tuple(shape), dtype).at[idx].set(vals)

    def sample(grid, params):
        pts = _warp_coords(params, coords, centre, dof)
        return map_coordinates(grid, [pts[0], pts[1], pts[2]], order=1,
                               mode="nearest")

    @jax.jit
    def register_one(data_t, pred_t):
        grid = to_grid(data_t.astype(dtype))
        # offset-invariant cost (mcflirt's normalized-correlation family):
        # both volumes are demeaned over the mask, so a global intensity
        # mismatch (e.g. a temporal trend the model carries) cannot leak
        # into spurious translation along the image gradient
        pred_c = pred_t.astype(dtype)
        pred_c = pred_c - jnp.mean(pred_c)

        def sample_c(params):
            s = sample(grid, params)
            return s - jnp.mean(s)

        def gn_step(_, params):
            resid = sample_c(params) - pred_c              # [V]
            jac = jax.jacfwd(sample_c)(params)             # [V,dof]
            g = jac.T @ resid
            h = jac.T @ jac + damping * eye
            return params - jnp.linalg.solve(h, g)

        params = jax.lax.fori_loop(0, n_iters, gn_step,
                                   jnp.zeros((dof,), dtype))
        return sample(grid, params), params

    return register_one


def make_applier(coords, shape, dof=6, dtype=jnp.float32):
    """Jitted fn(data_t [V], params [dof]) -> resampled data_t [V]."""
    coords = jnp.asarray(coords, dtype)
    if coords.shape[0] != 3:
        coords = coords.T
    idx = tuple(np.asarray(coords, np.int64).round().astype(np.int64))
    centre = jnp.asarray((np.asarray(shape, np.float64) - 1) / 2.0, dtype)

    @jax.jit
    def apply_one(data_t, params):
        grid = jnp.zeros(tuple(shape), dtype).at[idx].set(
            data_t.astype(dtype))
        pts = _warp_coords(jnp.asarray(params, dtype), coords, centre, dof)
        return map_coordinates(grid, [pts[0], pts[1], pts[2]], order=1,
                               mode="nearest")

    return apply_one


# transforms smaller than this (voxels / radians) are treated as
# identity: the volume passes through unresampled, so still timepoints
# pay no interpolation-smoothing cost
IDENTITY_TOL = 1e-2


def register_timeseries(data, pred, coords, shape, dof=6, n_iters=10):
    """Realign every timepoint of `data` to the model prediction.

    data, pred: [T,V] planes (voxels on lanes, the engine layout).
    Returns (realigned [T,V] numpy, params [T,dof] numpy). Equivalent
    of MCobj::run_mc (motioncorr.cc:70-94): per-timepoint transforms
    estimated from the ORIGINAL data each call.

    Gauge fixing: registering every volume to the model prediction
    leaves a common-mode transform undetermined (the fit sits at the
    motion-weighted centroid, so ALL volumes would be dragged to it
    and resampled). The per-parameter MEDIAN transform is subtracted
    from all timepoints, anchoring the output frame to the
    majority-still position — the analogue of mcflirt's
    reference-volume anchoring. Near-identity volumes then pass
    through without resampling.
    """
    reg = make_registerer(coords, shape, dof=dof, n_iters=n_iters)
    nt = data.shape[0]
    params = np.empty((nt, dof), np.float64)
    for t in range(nt):
        _, p_t = reg(jnp.asarray(data[t]), jnp.asarray(pred[t]))
        params[t] = np.asarray(p_t, np.float64)
    params -= np.median(params, axis=0, keepdims=True)

    apply_one = make_applier(coords, shape, dof=dof)
    out = np.empty_like(np.asarray(data, np.float64))
    for t in range(nt):
        if np.abs(params[t]).max() < IDENTITY_TOL:
            out[t] = np.asarray(data[t], np.float64)
        else:
            out[t] = np.asarray(apply_one(jnp.asarray(data[t]),
                                          params[t]), np.float64)
    return out, params
