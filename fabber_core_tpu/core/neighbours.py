"""Voxel neighbour graphs for spatial (MRF) priors.

Port of the *semantics* of Vb::CalcNeighbours (inference_vb.cc:769-964)
into precomputed padded index arrays, the form a TPU gather wants:

  neigh_idx  [V, 6]        first-neighbour voxel indices (pad -1)
  neigh2_idx [V, 30]       second neighbours including duplicates for
                           diagonally-connected voxels (pad -1)

Voxels must be sorted by increasing z, then y, then x (the order
VolumeGeometry produces); this is validated like the reference's
coordinate-ordering check.
"""

import numpy as np

from ..exceptions import FabberError

MAX_NEIGHBOURS = 6
MAX_NEIGHBOURS2 = 30  # 6 first neighbours x up to 5 non-self each


def check_coords_ordered(coords):
    """coords [V,3] must be ordered z-major, then y, then x."""
    if len(coords) < 2:
        return
    diff = np.diff(coords.astype(np.int64), axis=0)
    d = (np.sign(diff[:, 0]) + 10 * np.sign(diff[:, 1])
         + 100 * np.sign(diff[:, 2]))
    if np.any(d <= 0):
        v = int(np.argmax(d <= 0))
        raise FabberError(
            f"Coordinate matrix must be in correct order to use "
            f"adjacency-based priors (voxels {v} and {v + 1} mis-ordered)")


def calc_neighbours(coords, spatial_dims=3):
    """Build first/second neighbour index arrays.

    coords: [V,3] integer x,y,z. Returns (neigh_idx [V,6],
    neigh2_idx [V,30]) with -1 padding.
    """
    coords = np.asarray(coords).astype(np.int64)
    nv = len(coords)
    if nv == 0:
        return (np.zeros((0, MAX_NEIGHBOURS), np.int32),
                np.zeros((0, MAX_NEIGHBOURS2), np.int32))
    check_coords_ordered(coords)

    xsize = int(coords[:, 0].max()) + 1
    ysize = int(coords[:, 1].max()) + 1
    offsets = (coords[:, 2] * xsize * ysize + coords[:, 1] * xsize
               + coords[:, 0])
    lookup = {int(o): i for i, o in enumerate(offsets)}

    # neighbour deltas in +x,-x,+y,-y,+z,-z order, restricted to
    # spatial_dims dimensions
    deltas = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
              (0, 0, 1), (0, 0, -1)][:spatial_dims * 2]

    neigh = np.full((nv, MAX_NEIGHBOURS), -1, np.int32)
    counts = np.zeros(nv, np.int32)
    for v in range(nv):
        x, y, z = coords[v]
        n = 0
        for dx, dy, dz in deltas:
            xx, yy, zz = x + dx, y + dy, z + dz
            if xx < 0 or yy < 0 or zz < 0 or xx >= xsize or yy >= ysize:
                continue  # grid wrap-around guard
            off = zz * xsize * ysize + yy * xsize + xx
            j = lookup.get(int(off))
            if j is not None:
                neigh[v, n] = j
                n += 1
        counts[v] = n

    neigh2 = np.full((nv, MAX_NEIGHBOURS2), -1, np.int32)
    for v in range(nv):
        n2 = 0
        for j in neigh[v]:
            if j < 0:
                continue
            back = 0
            for k in neigh[j]:
                if k < 0:
                    continue
                if k == v:
                    back += 1
                else:
                    neigh2[v, n2] = k
                    n2 += 1
            if back != 1:
                raise FabberError(
                    "Each of this voxel's neighbours must have this voxel "
                    "as a neighbour")
    return neigh, neigh2
