"""Generic-model (full-time) mode of the whole-loop nonlinear kernel:
models that define only the plain ``evaluate`` — the common case for
user plugins ported from the reference's FwdModel::Evaluate
(fwdmodel.h:104-110) — must get the VMEM-resident whole-loop tier
automatically when evaluate is data-free and kernel-safe
(models/base.py derive_time_local_eval), and be rejected (falling back
to the XLA route) when it is not.

Every numeric case is pinned against the XLA generic-Jacobian route,
which shares no kernel code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.models.base import (DistParams, Model, ParamSpec,
                                         derive_time_local_eval)
from fabber_core_tpu.options import RunOptions

from test_fused_loop_nl import assert_match


class GaussianActModel(Model):
    """Plugin-style model written the natural way: ONLY ``evaluate``,
    building its own time axis from ctx.nt (iota + transcendentals +
    strided parameter indexing, the ops a ported reference model
    actually uses)."""
    name = "gaussact-test"
    dt = 0.1

    def __init__(self, options=None):
        pass

    def param_defaults(self):
        return [ParamSpec(i, n, DistParams(m, 10), DistParams(m, 5))
                for i, (n, m) in enumerate(
                    [("off", 0.0), ("amp", 1.0), ("mu", 1.2),
                     ("width", 0.6)])]

    def evaluate(self, params, ctx, key=""):
        t = jnp.arange(ctx.nt, dtype=params.dtype) * self.dt
        z = (t - params[2]) / params[3]
        return params[0] + params[1] * jnp.exp(-0.5 * z * z)


class DataUsingModel(GaussianActModel):
    """Reads ctx.data -> must be rejected by the data-free probe."""
    name = "datause-test"

    def evaluate(self, params, ctx, key=""):
        return super().evaluate(params, ctx) + 0.0 * ctx.data


class UnsafeOpModel(GaussianActModel):
    """Data-free but traces to a primitive outside the Mosaic-safe
    allowlist (sort) -> rejected so auto-engagement can never turn a
    working XLA-route model into a TPU kernel-compile failure."""
    name = "unsafe-test"

    def evaluate(self, params, ctx, key=""):
        sig = super().evaluate(params, ctx)
        return jnp.sort(sig)[::-1][:ctx.nt][::-1] * 0.0 + sig


def _gauss_data(nv, nt, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(nt) * GaussianActModel.dt
    off = rng.uniform(-0.2, 0.2, nv)
    amp = rng.uniform(0.8, 1.5, nv)
    mu = rng.uniform(0.9, 1.5, nv)
    w = rng.uniform(0.4, 0.8, nv)
    z = (t[None, :] - mu[:, None]) / w[:, None]
    data = (off[:, None] + amp[:, None] * np.exp(-0.5 * z * z)
            + rng.normal(0, 0.02, (nv, nt))).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)
    return data, coords


def make_gauss_engine(nv, mode, nt=30, extra=None, seed=0,
                      model_cls=GaussianActModel):
    data, coords = _gauss_data(nv, nt, seed)
    options = RunOptions({"model": model_cls.name, "noise": "white",
                          "max-iterations": "10", "dtype": "single",
                          "engine-kernel": mode,
                          "save-free-energy": True, **(extra or {})})
    return VBInference(model_cls(), options, data, coords)


@pytest.mark.parametrize("nv", [256, 200])  # 200 exercises edge padding
def test_generic_loop_matches_xla(nv):
    rx = make_gauss_engine(nv, "xla").run()
    eng = make_gauss_engine(nv, "pallas-loop")
    assert eng.use_nl_loop and eng._generic_eval_fn is not None
    assert not hasattr(eng.model, "time_signal")
    assert_match(rx, eng.run(), mean_rtol=1e-3)


def test_generic_loop_stripped_exp_matches_timesignal_kernel():
    """The SAME model through both whole-loop modes: the registered exp
    model (hand-written time_signal + analytic jac) vs a stripped copy
    that exposes only ``evaluate`` (so the kernel derives everything
    in-kernel from the generic form). exp.py's evaluate uses strided
    parameter slicing + a reduce — exactly the reference-plugin idiom."""
    ExpModel = get_model_class("exp")

    class StrippedExp(ExpModel):
        name = "exp-stripped-test"

        @property
        def time_signal(self):
            raise AttributeError("stripped: generic evaluate only")

    rng = np.random.default_rng(1)
    nv, nt, dt = 128, 25, 0.05  # nt=25 exercises time padding (Tp=32)
    t = np.arange(nt) * dt
    amp = rng.uniform(0.5, 2.0, nv)
    data = (amp[:, None] * np.exp(-t)[None, :]
            + rng.normal(0, 0.05, (nv, nt))).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)

    def build(cls, mode):
        o = RunOptions({"model": "exp", "dt": str(dt), "noise": "white",
                        "max-iterations": "10", "dtype": "single",
                        "engine-kernel": mode, "save-free-energy": True})
        return VBInference(cls(o), o, data, coords)

    ref = build(ExpModel, "pallas-loop")
    assert ref.use_nl_loop and ref._generic_eval_fn is None
    eng = build(StrippedExp, "pallas-loop")
    assert eng.use_nl_loop and eng._generic_eval_fn is not None
    assert_match(ref.run(), eng.run(), mean_rtol=1e-3)


def test_generic_loop_pointzeroone_matches_xla():
    """In-kernel fchange detector composes with full-time mode."""
    extra = {"convergence": "pointzeroone", "max-iterations": "15"}
    rx = make_gauss_engine(256, "xla", extra=extra, seed=2).run()
    eng = make_gauss_engine(256, "pallas-loop", extra=extra, seed=2)
    assert eng.use_nl_loop and eng.nl_fdet \
        and eng._generic_eval_fn is not None
    rp = eng.run()
    np.testing.assert_array_equal(rx.iterations, rp.iterations)
    assert rx.iterations.max() < 15  # early stopping actually exercised
    assert_match(rx, rp)


def test_generic_loop_noise_pattern():
    """Multi-group noise indicators compose with full-time mode."""
    extra = {"noise-pattern": "12"}
    rx = make_gauss_engine(128, "xla", extra=extra).run()
    eng = make_gauss_engine(128, "pallas-loop", extra=extra)
    assert eng.use_nl_loop and eng._generic_eval_fn is not None
    assert_match(rx, eng.run(), mean_rtol=1e-3)


class SuppScaledModel(GaussianActModel):
    """Uses per-voxel ctx.suppdata (a scale and an offset) — the
    reference passes suppdata to every plugin evaluate
    (fwdmodel.cc:198-208); the generic tier threads it into the kernel
    as an extra [S,V] input."""
    name = "suppscale-test"

    def evaluate(self, params, ctx, key=""):
        return (ctx.suppdata[0] * super().evaluate(params, ctx)
                + ctx.suppdata[1])


def make_supp_engine(nv, mode, nt=30, seed=0, use_supp_model=True):
    data, coords = _gauss_data(nv, nt, seed)
    rng = np.random.default_rng(seed + 100)
    supp = np.stack([rng.uniform(0.8, 1.2, nv),
                     rng.uniform(-0.1, 0.1, nv)], 1).astype(np.float32)
    if use_supp_model:
        data = data * supp[:, 0:1] + supp[:, 1:2]
    cls = SuppScaledModel if use_supp_model else GaussianActModel
    options = RunOptions({"model": cls.name, "noise": "white",
                          "max-iterations": "10", "dtype": "single",
                          "engine-kernel": mode,
                          "save-free-energy": True})
    return VBInference(cls(), options, data, coords, suppdata=supp)


def test_generic_loop_suppdata_matches_xla():
    """A suppdata-using evaluate-only model runs in-kernel: the [S,V]
    plane rides in as an extra kernel input, vmapped per lane."""
    rx = make_supp_engine(200, "xla").run()
    eng = make_supp_engine(200, "pallas-loop")
    assert eng.use_nl_loop and eng._generic_eval_fn is not None
    assert eng._generic_eval_fn.nsupp == 2
    assert_match(rx, eng.run(), mean_rtol=1e-3)


def test_generic_loop_suppdata_present_but_unused():
    """Engine has suppdata, model ignores it — still eligible."""
    rx = make_supp_engine(128, "xla", use_supp_model=False).run()
    eng = make_supp_engine(128, "pallas-loop", use_supp_model=False)
    assert eng.use_nl_loop and eng._generic_eval_fn is not None
    assert_match(rx, eng.run(), mean_rtol=1e-3)


def test_generic_probe_rejects_data_using_model():
    eng = make_gauss_engine(64, "pallas-loop", model_cls=DataUsingModel)
    assert eng._generic_eval_fn is None and not eng.use_nl_loop
    # the fallback XLA route still runs the model correctly
    r = eng.run()
    assert np.isfinite(r.means).all()


def test_generic_probe_rejects_unsafe_primitives():
    eng = make_gauss_engine(64, "pallas-loop", model_cls=UnsafeOpModel)
    assert eng._generic_eval_fn is None and not eng.use_nl_loop


def test_generic_loop_shard_map():
    """Full-time mode stays enabled under voxel sharding and dispatches
    per-shard via shard_map (inference/vb.py _shard_kernel), matching
    the unsharded XLA route — nv=200 forces the padded-shard path."""
    from fabber_core_tpu.parallel.mesh import shard_engine

    rx = make_gauss_engine(200, "xla").run()
    eng = make_gauss_engine(200, "pallas-loop")
    shard_engine(eng)
    assert eng.use_nl_loop and eng._generic_eval_fn is not None
    assert_match(rx, eng.run(), mean_rtol=1e-3)


def test_generic_loop_chunked_run():
    """Voxel-chunked dispatch (bounded memory) composes with the
    generic kernel mode: per-window bindings slice data AND suppdata."""
    rx = make_supp_engine(200, "pallas-loop").run()

    data, coords = _gauss_data(200, 30, 0)
    rng = np.random.default_rng(100)
    supp = np.stack([rng.uniform(0.8, 1.2, 200),
                     rng.uniform(-0.1, 0.1, 200)], 1).astype(np.float32)
    data = data * supp[:, 0:1] + supp[:, 1:2]
    o = RunOptions({"model": SuppScaledModel.name, "noise": "white",
                    "max-iterations": "10", "dtype": "single",
                    "engine-kernel": "pallas-loop",
                    "save-free-energy": True,
                    "voxel-chunk-size": "64"})
    eng = VBInference(SuppScaledModel(), o, data, coords, suppdata=supp)
    assert eng.use_nl_loop and eng._generic_eval_fn is not None
    rc = eng.run()
    np.testing.assert_allclose(rx.means, rc.means, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(rx.free_energy, rc.free_energy,
                               rtol=1e-5, atol=1e-4)


def test_route_description_reflects_selection():
    """The logged route line (runner.py) must track the engine's
    actual selection flags."""
    eng = make_gauss_engine(64, "pallas-loop")
    assert "generic full-time mode" in eng.route_description()
    eng = make_gauss_engine(64, "xla")
    assert eng.route_description() == "generic-Jacobian XLA route"
    eng = make_gauss_engine(
        64, "pallas-loop",
        extra={"convergence": "pointzeroone", "max-iterations": "15"})
    assert "in-kernel pointzeroone detector" in eng.route_description()

    # fixed-design model -> stats route (CPU: loop kernel not auto)
    rng = np.random.default_rng(0)
    data = rng.normal(0, 1, (64, 20)).astype(np.float32)
    coords = np.stack([np.arange(64), np.zeros(64), np.zeros(64)], 1)
    o = RunOptions({"model": "poly", "degree": "1", "noise": "white",
                    "max-iterations": "5", "dtype": "single"})
    eng = VBInference(get_model_class("poly")(o), o, data, coords)
    assert "sufficient-statistics" in eng.route_description() \
        or "spectral" in eng.route_description()


def test_derive_time_local_eval_api():
    """Direct probe contract: accepted fn reproduces evaluate; data
    users and wrong shapes rejected."""
    m = GaussianActModel()
    fn = derive_time_local_eval(m, 30, 4, jnp.float32)
    assert fn is not None
    pvec = jnp.asarray([0.1, 1.0, 1.2, 0.5], jnp.float32)
    from fabber_core_tpu.models.base import EvalContext
    expect = m.evaluate(pvec, EvalContext(nt=30))
    np.testing.assert_allclose(np.asarray(fn(pvec)), np.asarray(expect))
    assert derive_time_local_eval(DataUsingModel(), 30, 4,
                                  jnp.float32) is None
    assert derive_time_local_eval(UnsafeOpModel(), 30, 4,
                                  jnp.float32) is None
