"""Benchmark: voxels/sec of full VB convergence on TPU.

Mirrors the reference's headline workload (BASELINE.md): white-noise VB
on a poly/linear-sized problem with the shipped test data's dimensions
(T=106 timepoints), run over a large batch of voxels. The reference's
serial C++ loop manages order 1e5 voxels/s; the target is >=1e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_VOXELS_PER_SEC = 1e5  # implied C++ throughput (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fabber_core_tpu.options import RunOptions
    from fabber_core_tpu.models import get_model_class
    from fabber_core_tpu.inference.vb import VBInference

    nv = int(os.environ.get("FABBER_BENCH_VOXELS", 1_000_000))
    nt = 106          # shipped test data length
    degree = 2        # poly deg-2: the outdata_poly configuration
    iters = 10        # default maxits budget

    # Generate the phantom on device to avoid host->device transfer of
    # the volume through the tunnel.
    t = jnp.arange(1, nt + 1, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    c0 = jax.random.uniform(k1, (nv, 1), minval=-1, maxval=1)
    c1 = jax.random.uniform(k2, (nv, 1), minval=-0.1, maxval=0.1)
    data = (c0 + c1 * t[None, :]
            + 0.1 * jax.random.normal(k3, (nv, nt))).astype(jnp.float32)
    data = jax.block_until_ready(data)
    coords = np.stack([np.arange(nv) % 256, (np.arange(nv) // 256) % 256,
                       np.arange(nv) // 65536], 1).astype(np.float32)

    opts = RunOptions({"model": "poly", "degree": str(degree),
                       "noise": "white", "max-iterations": str(iters),
                       "dtype": "single"})
    model = get_model_class("poly")(opts)
    eng = VBInference(model, opts, data, coords)

    loop = eng.compiled_loop()
    bind = eng._bind()
    s0 = jax.block_until_ready(eng.initial_state())

    def run_once():
        final, _ = loop(s0, bind)
        jax.block_until_ready(final.post.means)
        return final

    # warmup (compile)
    t0 = time.perf_counter()
    run_once()
    compile_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = run_once()
    elapsed = time.perf_counter() - t0

    voxels_per_sec = nv / elapsed
    result = {
        "metric": "vb_convergence_voxels_per_sec",
        "value": round(voxels_per_sec, 1),
        "unit": "voxels/s",
        "vs_baseline": round(voxels_per_sec / REFERENCE_VOXELS_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(f"# {nv} voxels x {iters} VB iterations (T={nt}, P={degree + 1}) "
          f"in {elapsed:.3f}s wall (compile {compile_time:.1f}s) on "
          f"{jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
