"""Parameter transforms between latent (Gaussian) and model space.

Same transform algebra as the reference (transforms.h:59-259): the
engine infers each parameter as a Gaussian in "latent" space; a
transform maps latent values to the model's constrained space.  All
functions accept scalars or arrays (jnp or numpy) so they can be traced
inside jitted update steps and vmapped over voxels.

Variance mapping follows the reference's ad-hoc convention
(transforms.cc:17-25):
    to_model_var(v) = (to_model(sqrt(v)) - to_model(0))^2
    to_latent_var(v) = to_latent(to_model(0) + sqrt(v))^2
with per-transform overrides (log: var passes through exp/log;
fractional/abs: identity).
"""

import jax.numpy as jnp

from ..exceptions import InvalidOptionValue


class Transform:
    code = "?"

    def to_model(self, x):
        raise NotImplementedError

    def to_latent(self, x):
        raise NotImplementedError

    def to_model_var(self, v):
        d = self.to_model(jnp.sqrt(v)) - self.to_model(0.0)
        return d * d

    def to_latent_var(self, v):
        d = self.to_latent(self.to_model(0.0) + jnp.sqrt(v))
        return d * d

    # moment-pair mapping (mean, var)
    def to_model_moments(self, mean, var):
        return self.to_model(mean), self.to_model_var(var)

    def to_latent_moments(self, mean, var):
        return self.to_latent(mean), self.to_latent_var(var)

    @property
    def is_identity(self):
        return self.code == "I"


class IdentityTransform(Transform):
    code = "I"

    def to_model(self, x):
        return x

    def to_latent(self, x):
        return x

    def to_model_var(self, v):
        return v

    def to_latent_var(self, v):
        return v


class LogTransform(Transform):
    """Latent is log of model value (log-normal parameter)."""
    code = "L"

    def to_model(self, x):
        return jnp.exp(x)

    def to_latent(self, x):
        return jnp.log(x)

    def to_model_var(self, v):
        return jnp.exp(v)

    def to_latent_var(self, v):
        return jnp.log(v)


class SoftPlusTransform(Transform):
    """Positive parameters; approaches identity for large values.

    Clamped to identity above 10 as in transforms.h:167-192.
    """
    code = "S"

    def to_model(self, x):
        return jnp.where(x < 10.0, jnp.log1p(jnp.exp(jnp.minimum(x, 10.0))), x)

    def to_latent(self, x):
        safe = jnp.where(x < 10.0, x, 10.0)
        return jnp.where(x < 10.0, jnp.log(jnp.expm1(safe)), x)


class FractionalTransform(Transform):
    """Values in (0, 1); variance untouched (transforms.h:203-222)."""
    code = "F"

    def to_model(self, x):
        return 1.0 / (1.0 + jnp.exp(x))

    def to_latent(self, x):
        return jnp.log(1.0 / x - 1.0)

    def to_model_var(self, v):
        return v

    def to_latent_var(self, v):
        return v


class AbsTransform(Transform):
    """Non-negative via modulus; not invertible (transforms.h:231-242)."""
    code = "A"

    def to_model(self, x):
        return jnp.abs(x)

    def to_latent(self, x):
        return x


TRANSFORM_IDENTITY = IdentityTransform()
TRANSFORM_LOG = LogTransform()
TRANSFORM_SOFTPLUS = SoftPlusTransform()
TRANSFORM_FRACTIONAL = FractionalTransform()
TRANSFORM_ABS = AbsTransform()

_REGISTRY = {t.code: t for t in (
    TRANSFORM_IDENTITY, TRANSFORM_LOG, TRANSFORM_SOFTPLUS,
    TRANSFORM_FRACTIONAL, TRANSFORM_ABS)}


def get_transform(code):
    try:
        return _REGISTRY[code]
    except KeyError:
        raise InvalidOptionValue("transform", code,
                                 f"Supported transforms: {', '.join(_REGISTRY)}")
