import numpy as np
import pytest

from fabber_core_tpu.core import transforms as tr
from fabber_core_tpu.models.base import expand_prior_types_string
from fabber_core_tpu.exceptions import InvalidOptionValue


class TestTransforms:
    def test_identity(self):
        t = tr.TRANSFORM_IDENTITY
        assert float(t.to_model(3.5)) == 3.5
        assert float(t.to_latent_var(2.0)) == 2.0

    def test_log_roundtrip(self):
        t = tr.TRANSFORM_LOG
        x = np.array([0.1, 1.0, 7.5])
        np.testing.assert_allclose(np.asarray(t.to_model(t.to_latent(x))), x,
                                   rtol=1e-12)
        # variance passes through exp/log (transforms.h:149-156)
        np.testing.assert_allclose(float(t.to_model_var(0.5)), np.exp(0.5))

    def test_softplus(self):
        t = tr.TRANSFORM_SOFTPLUS
        np.testing.assert_allclose(float(t.to_model(0.0)), np.log(2.0))
        # above clamp: identity
        assert float(t.to_model(15.0)) == 15.0
        assert float(t.to_latent(15.0)) == 15.0
        x = np.array([-3.0, 0.5, 4.0])
        np.testing.assert_allclose(np.asarray(t.to_latent(t.to_model(x))), x,
                                   rtol=1e-10)

    def test_fractional(self):
        t = tr.TRANSFORM_FRACTIONAL
        vals = np.asarray(t.to_model(np.array([-5.0, 0.0, 5.0])))
        assert ((vals > 0) & (vals < 1)).all()
        np.testing.assert_allclose(float(t.to_model(0.0)), 0.5)
        assert float(t.to_model_var(0.7)) == 0.7

    def test_abs(self):
        t = tr.TRANSFORM_ABS
        assert float(t.to_model(-3.0)) == 3.0
        assert float(t.to_latent(-3.0)) == -3.0
        # default variance formulas reduce to identity for abs
        np.testing.assert_allclose(float(t.to_model_var(4.0)), 4.0)
        np.testing.assert_allclose(float(t.to_latent_var(4.0)), 4.0)

    def test_default_var_mapping(self):
        # generic formula: to_model_var(v) = (to_model(sqrt(v)) - to_model(0))^2
        t = tr.TRANSFORM_SOFTPLUS
        v = 2.0
        expected = (float(t.to_model(np.sqrt(v))) - float(t.to_model(0.0))) ** 2
        np.testing.assert_allclose(float(t.to_model_var(v)), expected)

    def test_lookup(self):
        assert tr.get_transform("L") is tr.TRANSFORM_LOG
        with pytest.raises(InvalidOptionValue):
            tr.get_transform("X")


class TestPriorTypeString:
    def test_expansion(self):
        # semantics of priors.cc:35-92
        assert expand_prior_types_string("", 3) == "---"
        assert expand_prior_types_string("MNA", 3) == "MNA"
        assert expand_prior_types_string("M+", 4) == "MMMM"
        assert expand_prior_types_string("NM+", 4) == "NMMM"
        assert expand_prior_types_string("N+A", 4) == "NNNA"
        assert expand_prior_types_string("NM", 4) == "NM--"

    def test_errors(self):
        with pytest.raises(InvalidOptionValue):
            expand_prior_types_string("N+M+", 6)
        with pytest.raises(InvalidOptionValue):
            expand_prior_types_string("NMAP", 2)
