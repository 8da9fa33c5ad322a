"""Multi-host execution: jax.distributed + process-local sharded data.

The reference is a single process with no distributed backend
(SURVEY.md section 2.8); this is the green-field TPU-native layer for
running one analysis across multiple hosts (e.g. a v5e-256 pod slice,
where each host drives 4 chips over ICI and hosts are connected over
DCN).

Design:
  * One global 1-D device mesh over the voxel axis (the workload's
    data-parallel axis). Plain VB has no cross-shard traffic at all;
    spatial VB's neighbour gathers become halo exchanges over ICI and
    the aK/Fglobal reductions become psums — all inserted by GSPMD
    from the sharding annotations, exactly as on a single host.
  * Each process feeds ONLY its shard of the voxel axis
    (`jax.make_array_from_process_local_data`): device memory is the
    scarce resource, so a host never materializes another host's
    voxels on its devices. (NIFTI stores the time axis slowest, so a
    voxel subset is strided across the whole file; hosts on a shared
    filesystem read the file once and keep only their slice in host
    RAM, which is cheap next to HBM.)
  * Deterministic reductions: the Jacobi sweep formulation makes
    results independent of shard topology (docs/PARITY.md section 2.8).

Single-process use is a no-op passthrough, so the same driver script
runs unchanged on a laptop CPU, one TPU VM, or a pod slice.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; TPU pod slices
    auto-detect all three). No-op for single-process runs."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def global_voxel_mesh():
    """1-D mesh over ALL devices of ALL processes, voxel axis."""
    return Mesh(np.array(jax.devices()), ("vox",))


def process_voxel_range(nvoxels, mesh=None):
    """The [lo, hi) slice of the global voxel axis this process feeds.

    The voxel axis is padded (by the caller, see pad_voxels) to a
    multiple of the device count, so every device holds an equal
    shard and every process an equal contiguous range.
    """
    nproc = jax.process_count()
    pid = jax.process_index()
    if nvoxels % nproc != 0:
        raise ValueError(
            f"padded voxel count {nvoxels} must divide process count "
            f"{nproc} (use pad_voxels)")
    per = nvoxels // nproc
    return pid * per, (pid + 1) * per


def pad_voxels(nvoxels, mesh=None):
    """Global voxel count padded up to a multiple of the device count."""
    n = len(jax.devices()) if mesh is None else mesh.devices.size
    return ((nvoxels + n - 1) // n) * n


def make_sharded_plane(local, mesh, global_vox, axis=-1):
    """Assemble a global [..., V] device array from this process's
    local [..., V/nproc] slice (zero cross-host transfers: each shard
    lands on the devices of the process that produced it)."""
    axis = axis % (local.ndim if hasattr(local, "ndim") else 1)
    spec = [None] * local.ndim
    spec[axis] = "vox"
    sharding = NamedSharding(mesh, P(*spec))
    global_shape = list(local.shape)
    global_shape[axis] = global_vox
    if jax.process_count() == 1:
        # single host: device_put with the sharding splits locally
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local), tuple(global_shape))


def load_voxel_data_sharded(geometry, volume, mesh=None, dtype=None,
                            pad_mode="edge"):
    """4-D volume (host RAM, e.g. from io.nifti.load) -> global
    sharded [T, V_pad] SoA device plane (the engines' internal
    layout); this process transfers only its voxel range to its own
    devices.

    Returns (array [T, V_pad], v_pad) — callers slice results back to
    geometry.nvoxels.
    """
    mesh = mesh if mesh is not None else global_voxel_mesh()
    vox = geometry.to_voxels(np.asarray(volume))  # [V, T] host
    v_pad = pad_voxels(geometry.nvoxels, mesh)
    if v_pad != geometry.nvoxels:
        reps = np.repeat(vox[-1:], v_pad - geometry.nvoxels, axis=0) \
            if pad_mode == "edge" else np.zeros(
                (v_pad - geometry.nvoxels, vox.shape[1]), vox.dtype)
        vox = np.concatenate([vox, reps], axis=0)
    lo, hi = process_voxel_range(v_pad)
    local = np.ascontiguousarray(vox[lo:hi].T)  # [T, Vlocal]
    if dtype is not None:
        local = local.astype(dtype)
    return make_sharded_plane(local, mesh, v_pad, axis=-1), v_pad


def gather_result_local(arr, lo, hi):
    """Fetch this process's [lo, hi) slice of a sharded [..., V] result
    to host RAM (only locally-resident shards move; cross-host results
    stay remote)."""
    sliced = arr[..., lo:hi]
    return np.asarray(jax.device_get(sliced))
