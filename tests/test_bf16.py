"""bf16 storage tier: dtype=bf16 stores the [T,V] data plane in
bfloat16 while all state/accumulation stays float32. Results must
match the float32 run within bf16 input-rounding tolerance (the data
enters with ~3 decimal digits; posterior means/noise shift at the same
order)."""

import numpy as np
import pytest

from fabber_core_tpu.inference.vb import VBInference
from fabber_core_tpu.models import get_model_class
from fabber_core_tpu.options import RunOptions


def _engine(dtype, model_opts, data, coords, extra=None):
    opts = {"noise": "white", "max-iterations": "8", "dtype": dtype,
            "engine-kernel": "xla", "print-free-energy": True}
    opts.update(model_opts)
    opts.update(extra or {})
    o = RunOptions(opts)
    return VBInference(get_model_class(o.get_string("model"))(o), o,
                       data, coords)


@pytest.mark.parametrize("model_opts", [
    {"model": "poly", "degree": "2"},           # stats route
    {"model": "exp", "dt": "0.05"},             # generic jacobian route
], ids=["stats", "generic"])
def test_bf16_matches_f32(model_opts):
    rng = np.random.default_rng(0)
    nv, nt = 256, 40
    t = np.arange(1, nt + 1)
    if model_opts["model"] == "poly":
        data = (0.5 + 0.02 * t[None, :]
                + 0.1 * rng.standard_normal((nv, nt))).astype(np.float32)
    else:
        data = (np.exp(-t * 0.05)[None, :]
                + 0.05 * rng.standard_normal((nv, nt))).astype(np.float32)
    coords = np.stack([np.arange(nv), np.zeros(nv), np.zeros(nv)], 1)

    ef = _engine("single", model_opts, data, coords)
    rf = ef.run()
    eb = _engine("bf16", model_opts, data, coords)
    import jax.numpy as jnp
    assert eb.data.dtype == jnp.bfloat16
    assert eb.dtype == jnp.float32  # compute/state stay f32
    rb = eb.run()

    assert rb.means.dtype == np.float32
    sd = np.sqrt(np.diagonal(rf.cov, axis1=1, axis2=2))
    # posterior shift from rounding the INPUT DATA to bf16: well under
    # a posterior sd, and ~1% on the noise estimate
    assert np.max(np.abs(rf.means - rb.means) / sd) < 0.2
    np.testing.assert_allclose(rf.noise_means, rb.noise_means, rtol=0.03)
    assert not rb.bad_voxels.any()


def test_bf16_rejected_values():
    from fabber_core_tpu.exceptions import InvalidOptionValue
    data = np.ones((8, 6))
    coords = np.stack([np.arange(8), np.zeros(8), np.zeros(8)], 1)
    with pytest.raises(InvalidOptionValue):
        _engine("half", {"model": "poly", "degree": "0"}, data, coords)
