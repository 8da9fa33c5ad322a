"""Noise model protocol + registry.

A noise model owns the VB update equations (UpdateTheta / UpdateNoise /
CalcFreeEnergy in the reference, noisemodel.h:94-160) as pure batched
functions over voxel arrays. Its state is a small pytree of arrays.
"""

from ..exceptions import InvalidOptionValue

_NOISE = {}


def register_noise(cls):
    _NOISE[cls.name] = cls
    return cls


def get_noise_class(name):
    try:
        return _NOISE[name]
    except KeyError:
        raise InvalidOptionValue("noise", name, "Unrecognized noise type")


def known_noise_models():
    return sorted(_NOISE)


class NoiseModel:
    """Base protocol; see white.WhiteNoiseModel for the array layout."""

    name = None

    def __init__(self, options, nt, masked_tpoints=()):
        self.nt = nt
        self.masked_tpoints = list(masked_tpoints)

    @property
    def num_params(self):
        """Number of noise parameters serialized into result MVNs."""
        raise NotImplementedError

    def initial_state(self, nvoxels, dtype):
        """Return (prior_state, posterior_state) pytrees."""
        raise NotImplementedError

    def state_to_mvn(self, state):
        """Noise state -> (means [V,Q], cov [V,Q,Q]) for serialization."""
        raise NotImplementedError

    def state_from_mvn(self, means, cov):
        raise NotImplementedError
