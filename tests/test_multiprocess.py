"""True multi-process distributed tests.

Two OS processes (simulated "hosts", 2 virtual CPU devices each) are
coordinated by jax.distributed + gloo CPU collectives and run the
production `fabber --distributed` CLI path end to end. This certifies
the multi-HOST layer the reference never had (SURVEY.md section 2.8):
coordinator bring-up, process-local sharded feeding
(make_array_from_process_local_data), cross-process collectives inside
the sweep (spatial halo gathers + aK/Fglobal psums over the process
boundary), result allgather, and process-0-only output writing.

Single-process sharding equivalence lives in test_distributed.py;
these tests run real separate processes via subprocess.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from fabber_core_tpu import cli
from fabber_core_tpu.io import nifti

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _phantom_files(tmp_path):
    """Deterministic 4x4x2 poly(1) phantom with a masked-out corner."""
    rng = np.random.default_rng(42)
    shape, nt = (4, 4, 2), 12
    t = np.arange(1, nt + 1, dtype=float)
    nv = int(np.prod(shape))
    c0 = rng.uniform(0.5, 1.5, nv)
    c1 = rng.uniform(-0.1, 0.1, nv)
    data = c0[:, None] + c1[:, None] * t[None, :] \
        + rng.normal(0, 0.05, (nv, nt))
    vol = data.reshape(shape + (nt,), order="F").astype(np.float32)
    mask = np.ones(shape, np.float32)
    mask[0, 0, 0] = 0
    data_f = str(tmp_path / "data.nii.gz")
    mask_f = str(tmp_path / "mask.nii.gz")
    nifti.save(nifti.NiftiImage(vol), data_f)
    nifti.save(nifti.NiftiImage(mask), mask_f)
    return data_f, mask_f


def _run_multiprocess(args, nproc=2, timeout=600):
    """Launch nproc copies of the CLI worker; return their outputs."""
    port = _free_port()
    env = dict(os.environ)
    # the worker pins its own platform/device-count; don't leak the
    # pytest conftest's 8-device forcing into the subprocesses
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(WORKER))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port)] + args,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(WORKER)))
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, \
            f"worker {procs.index(p)} failed (rc={p.returncode}):\n{out}"
    return outs


@pytest.mark.parametrize("method,extra", [
    ("vb", []),
    ("spatialvb", ["--param-spatial-priors=M+", "--spatial-dims=3"]),
], ids=["vb", "spatial"])
def test_two_process_cli_matches_single_process(tmp_path, method, extra):
    """2-process `fabber --distributed` == single-process run, through
    the real CLI with NIFTI files on a shared filesystem."""
    data_f, mask_f = _phantom_files(tmp_path)
    base = [f"--data={data_f}", f"--mask={mask_f}",
            "--model=poly", "--degree=1", "--noise=white",
            f"--method={method}", "--max-iterations=4",
            "--save-model-fit"] + extra

    out_single = str(tmp_path / f"out_single_{method}")
    assert cli.execute(base + [f"--output={out_single}"]) == 0

    out_mp = str(tmp_path / f"out_mp_{method}")
    _run_multiprocess(base + [f"--output={out_mp}"])

    # process 0 wrote the output dir; the others only computed shards
    assert os.path.isdir(out_mp)
    for key in ("mean_c0", "mean_c1", "std_c0", "freeEnergy",
                "modelfit", "finalMVN"):
        a = nifti.load(os.path.join(out_single, key + ".nii.gz")).data
        b = nifti.load(os.path.join(out_mp, key + ".nii.gz")).data
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7,
                                   err_msg=f"{method}:{key}")
    with open(os.path.join(out_mp, "logfile")) as f:
        log = f.read()
    assert "2 processes" in log
