"""Benchmark: voxels/sec of full VB convergence on TPU.

Mirrors the reference's headline workload (BASELINE.md): white-noise VB
on a poly/linear-sized problem with the shipped test data's dimensions
(T=106 timepoints), run over a large batch of voxels. The reference's
serial C++ loop manages order 1e5 voxels/s; the target is >=1e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs:
  FABBER_BENCH_VOXELS  batch size (default 1_000_000)
  FABBER_BENCH_CONFIG  poly (default) | biexp | ar1 | spatial
                       (the BASELINE.json config family)
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_VOXELS_PER_SEC = 1e5  # implied C++ throughput (BASELINE.md)


def _gen_plane(key, nv, nt, slab_fn):
    """Assemble a [nt,nv] f32 device plane slab-by-slab.

    Bounded temps: a single full-plane normal draw materializes erf_inv
    temporaries (and, under the package's x64 default, f64 intermediates)
    that exceed HBM beyond ~2M voxels; and host-side concatenation of
    slabs briefly doubles the plane. One jitted scan writes each slab
    into a preallocated plane (XLA aliases the carry in place), so peak
    memory is plane + one slab. The final slab is slid back to end at
    nv (overlap rewritten, same distribution). slab_fn(key, m) ->
    [nt,m] f32 generates one voxel slab including its per-voxel random
    parameters."""
    import jax
    import jax.numpy as jnp
    slab = min(1 << 19, nv)
    nslab = (nv + slab - 1) // slab
    keys = jax.random.split(key, nslab)
    starts = np.arange(nslab, dtype=np.int32) * slab
    starts[-1] = nv - slab

    @jax.jit
    def gen(keys, starts):
        def body(plane, ks):
            k, lo = ks
            return jax.lax.dynamic_update_slice(
                plane, slab_fn(k, slab), (jnp.int32(0), lo)), None
        plane, _ = jax.lax.scan(
            body, jnp.zeros((nt, nv), jnp.float32), (keys, starts))
        return plane

    return gen(keys, jnp.asarray(starts))


def build_engine(config, nv):
    import jax
    import jax.numpy as jnp
    from fabber_core_tpu.options import RunOptions
    from fabber_core_tpu.models import get_model_class
    from fabber_core_tpu.inference.vb import VBInference

    key = jax.random.PRNGKey(0)
    iters = 10

    f32 = jnp.float32

    if config in ("poly", "poly-24m", "poly-lm", "poly-p001",
                  "poly-pattern"):
        nt, opts = 106, {"model": "poly", "degree": "2", "noise": "white"}
        if config == "poly-24m":
            # past the 12GB single-dispatch envelope (data+outputs
            # ~13GB at 24M): give the streaming path the chip's real
            # headroom so windows stay large
            os.environ["FABBER_TPU_MEM_GB"] = "14"
        if config == "poly-lm":
            # the LM robustness detector's first fast tier (in-kernel
            # state machine + per-lane damped update on the
            # whole-program kernel). Opt-in config (not in "all").
            opts["convergence"] = "lm"
        elif config == "poly-p001":
            opts["convergence"] = "pointzeroone"
        elif config == "poly-pattern":
            # 2-group noise pattern: the whole-program kernel is the
            # fast tier (the spectral collapse is single-group only —
            # docs/PARITY.md). Opt-in config.
            opts["noise-pattern"] = "12"
        t = jnp.arange(1, nt + 1, dtype=f32)[:, None]

        def slab_fn(k, m):
            k1, k2, k3 = jax.random.split(k, 3)
            c0 = jax.random.uniform(k1, (1, m), f32, -1, 1)
            c1 = jax.random.uniform(k2, (1, m), f32, -0.1, 0.1)
            return c0 + c1 * t + 0.1 * jax.random.normal(k3, (nt, m), f32)
    elif config in ("biexp", "biexp-fdet", "biexp-generic"):
        nt, opts = 100, {"model": "biexp", "dt": "0.02", "noise": "white"}
        if config == "biexp-fdet":
            # in-kernel pointzeroone: per-lane F + freezing on the
            # whole-loop nonlinear kernel (ops/fused_loop_nl.py)
            opts["convergence"] = "pointzeroone"
        t = jnp.arange(nt, dtype=f32)[:, None] * 0.02
        e1, e5 = jnp.exp(-t), jnp.exp(-5 * t)

        def slab_fn(k, m):
            k1, k2 = jax.random.split(k)
            amp = jax.random.uniform(k1, (1, m), f32, 0.5, 1.5)
            return (amp * e1 + 0.5 * amp * e5
                    + 0.05 * jax.random.normal(k2, (nt, m), f32))
    elif config in ("ar1", "ar2"):
        nt, opts = 106, {"model": "poly", "degree": "2", "noise": "ar",
                         "num-echoes": "1"}
        if config == "ar2":
            # 2-echo interleaved AR(1) (noisemodel_ar.cc:83-224): the
            # XLA stats route — no fast tier yet (docs/PARITY.md)
            opts["num-echoes"] = "2"
        t = jnp.arange(1, nt + 1, dtype=f32)[:, None]

        def slab_fn(k, m):
            k1, k2 = jax.random.split(k)
            c0 = jax.random.uniform(k1, (1, m), f32, -1, 1)
            return c0 + 0.01 * t + 0.1 * jax.random.normal(k2, (nt, m), f32)
    elif config in ("linear", "nlls", "nlls-lm", "spatial-p4"):
        # the reference's shipped VEST design (T=106, P=4): the
        # outdata_linear_vb / _nlls / _spatialvb workload shape
        # (BASELINE.md configs 2 and 5)
        from fabber_core_tpu.io import matfile
        dref = "/root/reference/test/test_linear_design.mat"
        dh = np.asarray(matfile.read_matrix_file(dref), np.float32)
        nt = dh.shape[0]
        opts = {"model": "linear", "basis": dref, "noise": "white"}
        if config in ("nlls", "nlls-lm"):
            opts["method"] = "nlls"
            if config == "nlls-lm":
                opts["lm"] = ""
        elif config == "spatial-p4":
            # combined spatial (M) + non-spatial (N) priors on the
            # 4-parameter linear model — BASELINE config 5 as written
            nv = max(1024, (nv // 1024) * 1024)
            opts.update({"method": "spatialvb",
                         "param-spatial-priors": "MMNN",
                         "spatial-dims": "2"})
        dd = jnp.asarray(dh)

        def slab_fn(k, m):
            k1, k2 = jax.random.split(k)
            p = jax.random.uniform(k1, (dh.shape[1], m), f32, -1, 1)
            return dd @ p + 0.1 * jax.random.normal(k2, (nt, m), f32)
    elif config == "biexp-nllsinit":
        # BASELINE config 3 as written: NLLS fit seeds a VB continuation
        # (the reference's documented biexp workflow: nlls + save-mvn,
        # then vb --continue-from-mvn). Run as one fused device program
        # in _run_config.
        nt, opts = 100, {"model": "biexp", "dt": "0.02", "noise": "white"}
        t = jnp.arange(nt, dtype=f32)[:, None] * 0.02
        e1, e5 = jnp.exp(-t), jnp.exp(-5 * t)

        def slab_fn(k, m):
            k1, k2 = jax.random.split(k)
            amp = jax.random.uniform(k1, (1, m), f32, 0.5, 1.5)
            return (amp * e1 + 0.5 * amp * e5
                    + 0.05 * jax.random.normal(k2, (nt, m), f32))
    elif config == "spatial":
        nt = 50
        nv = max(1024, (nv // 1024) * 1024)  # full rows of the 2-D grid
        opts = {"model": "poly", "degree": "0", "noise": "white",
                "method": "spatialvb", "param-spatial-priors": "M",
                "spatial-dims": "2"}

        def slab_fn(k, m):
            k1, k2 = jax.random.split(k)
            base = jax.random.uniform(k1, (1, m), f32, 3.0, 5.0)
            return base + 0.5 * jax.random.normal(k2, (nt, m), f32)
    else:
        raise ValueError(f"Unknown config {config}")

    data_plane = jax.block_until_ready(_gen_plane(key, nv, nt, slab_fn))
    if config in ("spatial", "spatial-p4"):
        # full 2-D grid so the neighbour graph is dense
        nx = 1024
        assert nv % nx == 0
        ny = nv // nx
        coords = np.stack([np.arange(nv) % nx, (np.arange(nv) // nx) % ny,
                           np.zeros(nv)], 1).astype(np.float32)
    else:
        coords = np.stack([np.arange(nv) % 256, (np.arange(nv) // 256) % 256,
                           np.arange(nv) // 65536], 1).astype(np.float32)
    options = RunOptions({**opts, "max-iterations": str(iters),
                          "dtype": os.environ.get("FABBER_BENCH_DTYPE",
                                                  "single"),
                          "engine-kernel": os.environ.get(
                              "FABBER_BENCH_KERNEL", "auto")})
    model_cls = get_model_class(options.get_string("model"))
    if config == "biexp-generic":
        # plugin-model tier: strip the hand-written time_signal hooks so
        # the engine derives the in-kernel evaluator from the plain
        # evaluate() (models/base.py derive_time_local_eval). Opt-in
        # config (not in "all"): FABBER_BENCH_CONFIG=biexp-generic
        class _StrippedModel(model_cls):
            @property
            def time_signal(self):
                raise AttributeError("generic-tier bench: evaluate only")
        model_cls = _StrippedModel
    model = model_cls(options)
    if config in ("spatial", "spatial-p4"):
        from fabber_core_tpu.inference.spatial import SpatialVBInference
        eng = SpatialVBInference(model, options, None, coords,
                                 data_plane=data_plane)
    elif config in ("nlls", "nlls-lm"):
        from fabber_core_tpu.inference.nlls import NLLSInference
        eng = NLLSInference(model, options, None, coords,
                            data_plane=data_plane)
    elif config == "biexp-nllsinit":
        from fabber_core_tpu.inference.nlls import NLLSInference
        nlls_opts = RunOptions({**opts, "method": "nlls",
                                "vb-init": "", "dtype": "single"})
        nlls_eng = NLLSInference(model_cls(nlls_opts), nlls_opts, None,
                                 coords, data_plane=data_plane)
        vb_eng = VBInference(model, options, None, coords,
                             data_plane=data_plane)
        # programmatic continuation takes the per-iteration routes
        # (the whole-loop kernels start from the model-default initial
        # posterior; mirror the engine's own _run_vb continuation guard)
        vb_eng.use_loop_kernel = False
        vb_eng.use_nl_loop = False
        vb_eng.use_spectral = False
        vb_eng.use_spectral_fdet = False
        return (nlls_eng, vb_eng), iters
    else:
        eng = VBInference(model, options, None, coords,
                          data_plane=data_plane)
    return eng, iters


NT_LABELS = {"poly": "T=106, P=3",
             "poly-24m": "T=106, P=3, 24M voxels (streaming scale)",
             "ar2": "T=106, P=3 + 2-echo AR(1)",
             "poly-lm": "T=106, P=3, lm detector",
             "poly-pattern": "T=106, P=3, noise-pattern=12",
             "poly-p001": "T=106, P=3, pointzeroone", "biexp": "T=100, P=4",
             "biexp-fdet": "T=100, P=4, pointzeroone",
             "biexp-generic": "T=100, P=4, evaluate-only plugin tier",
             "biexp-nllsinit": "T=100, P=4, NLLS init -> VB",
             "ar1": "T=106, P=3 + AR(1)", "spatial": "T=50, P=1 + MRF",
             "linear": "T=106, P=4 design-matrix",
             "nlls": "T=106, P=4, damped GN to convergence",
             "nlls-lm": "T=106, P=4, LM-damped GN to convergence",
             "spatial-p4": "T=106, P=4, mixed MMNN priors"}
# Per-config voxel budget as a multiple of FABBER_BENCH_VOXELS. The
# fixed-design fast tiers (poly spectral / spatial stencil) are
# tunnel-RTT-bound at 4M voxels (~2-4ms device time in a ~50ms wall),
# so they run a larger budget to amortize the dispatch round trip.
# poly runs 4x (16M): past the ~11M single-dispatch HBM envelope the
# engine's in-program chunk streaming keeps it to ONE dispatch (the
# r3 ceiling — serialized per-window round trips beyond 8M — is gone).
# The kernel-bound configs (biexp/ar1) run the plain budget. The
# stderr line and the utilization fields state each config's actual
# voxel count; docs quote these same numbers.
CONFIG_SCALE = {"poly": 4.0, "poly-24m": 6.0, "poly-lm": 1.0,
                "poly-p001": 1.0, "poly-pattern": 1.0, "biexp": 1.0,
                "biexp-fdet": 1.0, "biexp-generic": 0.25,
                "ar1": 1.0, "ar2": 1.0, "spatial": 2.0, "linear": 2.0,
                "nlls": 1.0, "nlls-lm": 1.0, "spatial-p4": 1.0,
                # NLLS-init runs the generic-Jacobian optimizer to
                # per-lane convergence (~100x a VB iteration's work):
                # smaller budget keeps the wall in bench range
                "biexp-nllsinit": 0.25}

# v5e single-chip ceilings (public spec): 197 TFLOP/s bf16 MXU,
# ~1/4 of that for f32; 819 GB/s HBM. The utilization fields quantify
# "fast" against the hardware roof rather than the C++ baseline alone.
HBM_BYTES_PER_SEC = 819e9
PEAK_F32_FLOPS = 49e12
# VPU elementwise roofline ESTIMATE: the (8,128) vector unit with ~4
# ALUs per cell at the v5e clock is order 4 TFLOP/s f32 — an
# order-of-magnitude reference for the transcendental-heavy kernels
# (exp/log/div count as one "flop" in the work model but cost multiple
# VPU ops, so true VPU occupancy is higher than this ratio shows).
PEAK_VPU_FLOPS = 4e12


def _work_model(eng, config, nv, nt, iters):
    """Analytic per-voxel work estimate for the route the engine
    actually selected: (flops, hbm_bytes) for the whole run. These are
    operation counts of the update equations (exp/log/div counted as
    one flop — a lower bound on VPU work), and the bytes each route
    moves between HBM and VMEM by construction (data plane reads,
    posterior state writes, per-iteration state traffic where the
    route round-trips it)."""
    p = eng.nparams
    item = 4  # all bench routes store/compute f32
    state_planes = (p * p * 2 + 2 * p + 2)  # prec+cov, means+prior, noise
    out_bytes = state_planes * item
    cholesky = 2 * p ** 3 // 3 + 4 * p * p  # unrolled chol+inverse
    theta = cholesky + 4 * p * p            # + rhs assembly / solve
    if config in ("nlls", "nlls-lm"):
        # stats tier: one [T,V] pass, then ~4 P-dim LM steps per lane
        # (linear fits land in 1 accepted step; the rejected-plateau
        # exit ends the lane ~3 trials later — inference/nlls.py CFTOL
        # block)
        its = 4
        flops = 4 * nt * p + its * (theta + 4 * p * p + 8 * p)
        bytes_ = nt * item + (p + p * p + 2) * item
        return flops, bytes_
    if config == "biexp-nllsinit":
        # generic-Jacobian NLLS (~24 accepted+rejected steps per lane
        # mean, each a model+Jacobian evaluation over T) + 10 fused VB
        # iterations
        nlls_its = 24
        flops = (nlls_its * ((6 * p + 6) * nt + theta)
                 + iters * ((3 * p + 6) * nt + theta + 6 * p))
        bytes_ = (nlls_its + iters) * nt * item + out_bytes * 2
        return flops, bytes_
    if getattr(eng, "use_spectral", False):
        # one [T,V] stats pass, then a scalar rational fixed point in
        # the eigenbasis + one P-dim reconstruction (ops/spectral.py)
        flops = 2 * nt * p + 4 * p * p + 20 * iters
        bytes_ = nt * item + out_bytes
    elif getattr(eng, "use_nl_loop", False):
        # whole-loop nonlinear kernel: per iteration re-evaluates the
        # model + analytic Jacobian over T and accumulates J'XJ/J'r
        # (~(3p+6) flops per timepoint), plus the P-dim update
        per_t = 3 * p + 6
        flops = iters * (per_t * nt + theta + 6 * p) + 2 * nt
        bytes_ = nt * item + out_bytes
    elif getattr(eng, "use_loop_kernel", False):
        # fixed-design whole-loop kernel (white or AR): stats pass then
        # VMEM-resident P-dim fixed point
        stats_q = 3 if getattr(eng.noise, "name", "") == "ar" else 1
        flops = 2 * nt * p * stats_q + iters * (theta + 8 * p)
        bytes_ = nt * item + out_bytes
    elif config == "spatial":
        # stats pass + per-sweep P-dim update + MRF stencil (~30 flops)
        flops = 2 * nt * p + iters * (theta + 30)
        # Jacobi sweeps round-trip the posterior state each iteration
        bytes_ = nt * item + out_bytes * (2 * iters)
    elif getattr(eng, "use_stats", False):
        # XLA stats route: per-iteration state round-trips HBM
        flops = 2 * nt * p + iters * (theta + 8 * p)
        bytes_ = nt * item + out_bytes * (2 * iters)
    else:
        # XLA generic-Jacobian route: per-iteration model+Jacobian
        # evaluation materializes [T,V] and [P,T,V] planes in HBM
        flops = iters * ((6 * p + 6) * nt + theta)
        bytes_ = iters * nt * (p + 3) * item + out_bytes * (2 * iters)
    return flops, bytes_


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # 4M voxels amortizes the remote-TPU tunnel's ~26ms dispatch+sync
    # round trip (pure dev-harness latency, not framework time); a
    # 12GB chunk budget keeps the run to ONE dispatch (chunk dispatches
    # serialize with a full round trip each on the tunnel)
    os.environ.setdefault("FABBER_TPU_MEM_GB", "12")
    nv = int(os.environ.get("FABBER_BENCH_VOXELS", 4_000_000))
    config = os.environ.get("FABBER_BENCH_CONFIG", "all")

    if config == "all":
        # one JSON line: the headline poly number, plus every
        # BASELINE.json config family as extra fields so regressions in
        # biexp/ar1/spatial are visible per round
        per = {}
        for cfg in ("poly", "poly-24m", "linear", "biexp", "biexp-fdet",
                    "biexp-nllsinit", "biexp-generic", "ar1", "ar2",
                    "nlls", "nlls-lm", "spatial", "spatial-p4",
                    "poly-lm", "poly-pattern"):
            try:
                per[cfg] = _run_config(cfg, max(1024, int(
                    nv * CONFIG_SCALE[cfg])), quiet=True)
            except Exception as e:  # a broken config must not hide others
                print(f"# config={cfg} FAILED: {e}", file=sys.stderr)
                per[cfg] = None
        head = per["poly"] or {"voxels_per_sec": 0.0}
        result = {
            "metric": "vb_convergence_voxels_per_sec",
            "value": round(head["voxels_per_sec"], 1),
            "unit": "voxels/s",
            "vs_baseline": round(
                head["voxels_per_sec"] / REFERENCE_VOXELS_PER_SEC, 2),
            "configs": {k: (round(v["voxels_per_sec"], 1) if v else None)
                        for k, v in per.items()},
            "utilization": {k: (v["utilization"] if v else None)
                            for k, v in per.items()},
        }
        print(json.dumps(result))
        return

    _run_config(config, nv)


# configs whose device-time probe runs by default ("all" mode): every
# BASELINE.json family, so each driver artifact carries device_time_s
# and a bound classification (HBM vs VPU vs MXU roof) for the VPU-heavy
# nonlinear tiers too. Each probe costs two extra remote compiles (the
# k=1 and k=3 scan variants); the opt-in tier configs (poly-lm,
# poly-pattern, biexp-generic, nlls-lm, ar2, poly-24m) skip it unless
# FABBER_BENCH_DEVTIME_ALL=1.
DEVTIME_CONFIGS = ("poly", "linear", "biexp", "biexp-fdet", "ar1",
                   "nlls", "spatial", "spatial-p4", "biexp-nllsinit")


def _probe_ok(config):
    if os.environ.get("FABBER_BENCH_DEVTIME", "1") == "0":
        return False
    if os.environ.get("FABBER_BENCH_DEVTIME_ALL") == "1":
        return True
    return config in DEVTIME_CONFIGS


def _run_config(config, nv, quiet=False):
    import jax

    eng, iters = build_engine(config, nv)

    if config in ("nlls", "nlls-lm"):
        # NLLS: per-lane damped-GN loops run to their own convergence
        # (lam > 1e10); the fixed-design stats tier keeps every
        # iteration on P-dim planes. One compiled dispatch.
        import jax.numpy as jnp
        bind = eng._bind()

        def solve_fn(b):
            s, prec, cov = eng._solve_body(
                eng._initial_means_traced(b.data), b)
            return s.params

        solve = jax.jit(solve_fn)

        def run_once():
            jax.block_until_ready(solve(bind))

        # device-time chain: k solves inside one program, the carry
        # perturbing the data plane (the +c elementwise add costs ~2
        # extra data passes per rep, so the slope overstates device
        # time by that fixed amount — small vs the GN loop's cost)
        chains = {}

        def dispatch_k(k):
            if k not in chains:
                # bind rides as an ARGUMENT (closure-captured device
                # arrays become HLO constants -> remote-compile 413s
                # at volume scale)
                def run_k(b):
                    def body(c, _):
                        out = solve_fn(b._replace(data=b.data + c))
                        return c + 0.0 * out[0, 0], None
                    return jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=k)[0]
                chains[k] = jax.jit(run_k)
            return chains[k](bind)

        return _measure(run_once, nv, eng.max_its, config,
                        NT_LABELS[config], quiet, eng=eng,
                        dispatch_k=dispatch_k if _probe_ok(config)
                        else None)

    if config == "biexp-nllsinit":
        # two-stage pipeline in ONE device program: generic-Jacobian
        # NLLS fit -> posterior (J'J/mse) -> VB continuation from it
        import jax.numpy as jnp
        nlls_eng, vb_eng = eng
        bind_n = nlls_eng._bind()
        bind_v = vb_eng._bind()
        vb_eng._ensure_noise_prior()
        vb_loop = vb_eng.compiled_loop()

        def pipeline_fn(bn, bv):
            s, prec, cov = nlls_eng._solve_body(
                nlls_eng._initial_means_traced(bn.data), bn)
            means_vm = s.params.T               # [V,P] voxel-major
            cov_vm = jnp.moveaxis(cov, -1, 0)   # [V,P,P]
            s0 = vb_eng.initial_state(continue_means=means_vm,
                                      continue_cov=cov_vm)
            out, _ = vb_loop(s0, bv)
            return out.post.means

        pipeline = jax.jit(pipeline_fn)

        def run_once():
            jax.block_until_ready(pipeline(bind_n, bind_v))

        chains = {}

        def dispatch_k(k):
            # k pipelines inside one program, carry-perturbed data
            # (binds ride as arguments; see the nlls chain note)
            if k not in chains:
                def run_k(bn, bv):
                    def body(c, _):
                        out = pipeline_fn(
                            bn._replace(data=bn.data + c),
                            bv._replace(data=bv.data + c))
                        return c + 0.0 * out[0, 0], None
                    return jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=k)[0]
                chains[k] = jax.jit(run_k)
            return chains[k](bind_n, bind_v)

        return _measure(run_once, nv, iters, config, NT_LABELS[config],
                        quiet, eng=vb_eng,
                        dispatch_k=dispatch_k if _probe_ok(config)
                        else None)

    if config in ("spatial", "spatial-p4"):
        import jax.numpy as jnp
        from fabber_core_tpu.inference.spatial import SpatialState, AK_INIT
        base_state = eng.initial_state()
        s0 = SpatialState(
            post=base_state.post, centre=base_state.centre, f=base_state.f,
            ak=jnp.full(len(eng.spatial_params), AK_INIT, eng.dtype),
            bad=jnp.zeros(eng.nvoxels, bool))
        bind = eng._bind()

        sp_loop = eng.compiled_sweeps()

        def run_once():
            jax.block_until_ready(sp_loop(s0, bind).post.means)

        # device-time chain: k sweep-loops back to back INSIDE one
        # program, each feeding the previous output state (no host
        # dispatch between them, and the data dependence defeats CSE)
        chains = {}

        import jax.numpy as jnp
        # seed `its` so the chain carry matches the loop output pytree
        s0c = s0._replace(its=jnp.int32(0))

        def dispatch_k(k):
            if k not in chains:
                def chain(s, b):
                    # the sweep loop takes its=() and returns its=int32,
                    # so strip it on entry to keep the carry consistent
                    return jax.lax.fori_loop(
                        0, k,
                        lambda i, st: sp_loop(st._replace(its=()), b), s)
                chains[k] = jax.jit(chain)
            return chains[k](s0c, bind).post.means

        return _measure(run_once, eng.nvoxels, iters, config,
                        NT_LABELS[config], quiet, eng=eng,
                        dispatch_k=dispatch_k if _probe_ok(config)
                        else None)

    import jax.numpy as jnp
    chunk = min(eng._chunk_size(), nv)
    can_stream = (eng._can_trace_init(None)
                  and getattr(eng, "mesh", None) is None)

    def make_dispatch_k(schunk):
        """Device-time probe: the window list tiled k times inside ONE
        compiled program (vb.py compiled_streamed scan — iterations
        carry a data dependence, so XLA cannot CSE the repeats; on the
        remote tunnel separate dispatches serialize with a full RTT
        each, so multi-dispatch backpressure measures RTT, not device
        time)."""
        streamed = eng.compiled_streamed(schunk)
        sbind = eng._bind(build_fused=False)
        nwin = -(-nv // schunk)
        starts = np.arange(nwin, dtype=np.int64) * schunk
        starts[-1] = nv - schunk

        def dispatch_k(k):
            sk = jnp.asarray(np.tile(starts, k), jnp.int32)
            return streamed(sbind, sk)[0]

        return dispatch_k, streamed, sbind, starts, nwin

    if chunk < nv and can_stream:
        schunk = eng._stream_chunk()
        if schunk is not None:
            # in-program chunk streaming: the whole volume is ONE
            # dispatch — the window loop runs on device instead of one
            # serialized tunnel round trip per window. Equal windows
            # take the carry-free map path (vb.py
            # compiled_streamed_map); the device-time probe tiles the
            # SCAN variant (tiling the map variant would stack k
            # volume-scale output copies).
            schunk = min(schunk, nv)
            dispatch_k, streamed_scan, sbind, starts, nwin = \
                make_dispatch_k(schunk)
            if nv % nwin == 0:
                mchunk = nv // nwin
                streamed = eng.compiled_streamed_map(mchunk)
                starts1 = jnp.asarray(
                    np.arange(nwin, dtype=np.int64) * mchunk, jnp.int32)
                label = f"map {nwin} x {mchunk}"
            else:
                streamed = streamed_scan
                starts1 = jnp.asarray(starts, jnp.int32)
                label = f"scan {nwin} x {schunk}"
            print(f"# streamed: {label}-voxel windows in one dispatch",
                  file=sys.stderr)

            def run_once():
                jax.block_until_ready(streamed(sbind, starts1)[0])

            return _measure(run_once, nv, iters, config,
                            NT_LABELS[config], quiet, eng=eng,
                            dispatch_k=dispatch_k if _probe_ok(config)
                            else None)

    # single-dispatch path: initial state + VB loop in one compiled
    # program per window (eager init ops are host round trips on the
    # remote-TPU tunnel)
    full = eng.compiled_full()
    windows = [(lo, min(lo + chunk, nv)) for lo in range(0, nv, chunk)]
    # fixed-size windows (the engine's chunked-run convention)
    windows = [(hi - chunk, hi) if hi - lo < chunk else (lo, hi)
               for lo, hi in windows]
    if len(windows) > 1:
        print(f"# chunked into {len(windows)} x {chunk} voxels",
              file=sys.stderr)

    # bindings hoisted out of the timed path when there is ONE window
    # (_bind's eager slice/pad ops are per-dispatch host round trips
    # on the remote-TPU tunnel); with several windows the hoisted
    # copies would hold every window's data slice live at once —
    # measured OOM at 24M voxels — so they build per dispatch there
    if len(windows) == 1:
        binds = [eng._bind(lo, hi) for lo, hi in windows]

        def run_once():
            final, _ = full(binds[0])
            jax.block_until_ready(final.post.means)
    else:
        def run_once():
            final = None
            for lo, hi in windows:
                final, _ = full(eng._bind(lo, hi))
            jax.block_until_ready(final.post.means)

    dispatch_k = make_dispatch_k(chunk)[0] \
        if can_stream and len(windows) == 1 and _probe_ok(config) \
        else None
    return _measure(run_once, nv, iters, config, NT_LABELS[config], quiet,
                    eng=eng, dispatch_k=dispatch_k)


def _measure(run_once, nv, iters, config, nt_label, quiet=False, eng=None,
             dispatch_k=None):
    import jax
    t0 = time.perf_counter()
    run_once()  # warmup (compile)
    compile_time = time.perf_counter() - t0

    # best of 3: the remote-TPU tunnel adds O(10ms) dispatch jitter,
    # comparable to the measured wall time at 1M voxels
    reps = int(os.environ.get("FABBER_BENCH_REPS", 3))
    elapsed = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        elapsed = min(elapsed, time.perf_counter() - t0)

    # Device time by in-program work scaling: run the whole computation
    # 1x and Kx INSIDE one compiled program each (dispatch_k tiles the
    # window scan / chains sweep loops — a data dependence per repeat,
    # so XLA cannot CSE them) and take the slope. The fixed dispatch
    # overhead (tunnel RTT, ~26ms regardless of work — and on this
    # tunnel SEPARATE dispatches serialize with a full RTT each, so
    # queue-backpressure timing cannot work) cancels in the
    # difference; what remains is true device execution time.
    device_time = None
    if dispatch_k is not None \
            and os.environ.get("FABBER_BENCH_DEVTIME", "1") != "0":
        try:
            k = int(os.environ.get("FABBER_BENCH_DEVTIME_K", 3))
            walls = {}
            for kk in (1, k):
                jax.block_until_ready(dispatch_k(kk))  # warmup/compile
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    jax.block_until_ready(dispatch_k(kk))
                    best = min(best, time.perf_counter() - t0)
                walls[kk] = best
            slope = (walls[k] - walls[1]) / (k - 1)
            # below ~0.5ms the slope is dispatch jitter, not signal
            device_time = slope if slope > 5e-4 else None
        except Exception as e:  # pragma: no cover - diagnostic only
            print(f"# device-time probe failed: {e}", file=sys.stderr)

    voxels_per_sec = nv / elapsed
    result = {
        "metric": "vb_convergence_voxels_per_sec",
        "value": round(voxels_per_sec, 1),
        "unit": "voxels/s",
        "vs_baseline": round(voxels_per_sec / REFERENCE_VOXELS_PER_SEC, 2),
    }
    util = None
    if eng is not None:
        nt = eng.nt
        flops_v, bytes_v = _work_model(eng, config, nv, nt, iters)
        # wall elapsed includes the remote tunnel's ~26ms dispatch+sync
        # round trip, so these are LOWER bounds on device utilization
        util = {
            "flops_per_voxel": flops_v,
            "hbm_bytes_per_voxel": bytes_v,
            "achieved_gflops": round(flops_v * nv / elapsed / 1e9, 1),
            "achieved_gbps": round(bytes_v * nv / elapsed / 1e9, 1),
            "vs_f32_peak": round(flops_v * nv / elapsed / PEAK_F32_FLOPS, 4),
            "vs_hbm_peak": round(
                bytes_v * nv / elapsed / HBM_BYTES_PER_SEC, 4),
        }
        if device_time is not None:
            hbm_frac = bytes_v * nv / device_time / HBM_BYTES_PER_SEC
            vpu_frac = flops_v * nv / device_time / PEAK_VPU_FLOPS
            mxu_frac = flops_v * nv / device_time / PEAK_F32_FLOPS
            util.update({
                "device_time_s": round(device_time, 6),
                "device_gbps": round(bytes_v * nv / device_time / 1e9, 1),
                "device_vs_hbm_peak": round(hbm_frac, 4),
                "device_vs_vpu_est": round(vpu_frac, 4),
                "device_vs_f32_mxu_peak": round(mxu_frac, 4),
                # which roof the route is nearer on DEVICE time: the
                # honest "how far from speed-of-light" classification
                "bound": ("HBM" if hbm_frac >= max(vpu_frac, mxu_frac)
                          else ("MXU" if mxu_frac >= vpu_frac else "VPU")),
            })
    if not quiet:
        print(json.dumps(result))
    print(f"# config={config}: {nv} voxels x {iters} VB iterations "
          f"({nt_label}) in {elapsed:.3f}s wall (compile {compile_time:.1f}s) "
          f"on {jax.devices()[0].platform}"
          + (f"; util {util['vs_hbm_peak']:.1%} HBM / "
             f"{util['vs_f32_peak']:.1%} f32-peak (lower bounds: wall "
             f"includes tunnel RTT)" if util else "")
          + (f"; device {device_time * 1e3:.1f}ms -> "
             f"{util['device_vs_hbm_peak']:.1%} HBM, "
             f"{util['device_vs_vpu_est']:.1%} VPU-est, "
             f"{util['bound']}-bound" if device_time is not None else ""),
          file=sys.stderr)
    return {"voxels_per_sec": voxels_per_sec, "elapsed": elapsed,
            "compile_s": compile_time, "utilization": util}


if __name__ == "__main__":
    main()
