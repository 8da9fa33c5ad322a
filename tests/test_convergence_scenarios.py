"""Lane-exact ports of the reference's convergence-detector scenarios
(test/test_convergence.cc:35-307), driven through single-lane batched
state machines."""

import jax.numpy as jnp
import numpy as np
import pytest

from fabber_core_tpu.inference.convergence import get_detector_class
from fabber_core_tpu.options import RunOptions

MAXITERS = 37
FCHANGE = 0.0001
F = 12.1


class Driver:
    """One-voxel harness mimicking the C++ Test()/Reset() protocol."""

    def __init__(self, name, opts):
        self.det = get_detector_class(name)(RunOptions(opts))
        self.reset()

    def reset(self):
        self.state = self.det.init_state(1, jnp.float64)

    def test(self, f):
        self.state = self.det.test(self.state, jnp.array([f]))
        return bool(self.state.done[0])


def test_counting():
    c = Driver("maxits", {"max-iterations": str(MAXITERS)})
    assert not c.det.uses_f
    for _ in range(2):  # includes the post-Reset repeat
        for i in range(MAXITERS - 1):
            assert c.test(F) is False
        assert c.test(F) is True
        c.reset()


def test_fchange_max_iters():
    c = Driver("pointzeroone", {"max-iterations": str(MAXITERS),
                                "min-fchange": str(FCHANGE)})
    assert c.det.uses_f
    for _ in range(2):
        for i in range(MAXITERS - 1):
            assert c.test(F + 2 * i * FCHANGE) is False
        assert c.test(F + 2 * MAXITERS * FCHANGE) is True
        c.reset()


def test_fchange_change():
    c = Driver("pointzeroone", {"max-iterations": str(MAXITERS),
                                "min-fchange": str(FCHANGE)})
    assert c.test(F) is False
    assert c.test(F + 2 * FCHANGE) is False   # increase
    assert c.test(F) is False                 # decrease
    assert c.test(F + 1.01 * FCHANGE) is False
    assert c.test(F + 1.99 * FCHANGE) is True
    assert c.test(F + 1.99 * FCHANGE) is True
    c.reset()
    assert c.test(F + 1.99 * FCHANGE) is False
    assert c.test(F) is False
    assert c.test(F) is True


def test_freduce_max_iters():
    c = Driver("freduce", {"max-iterations": str(MAXITERS),
                           "min-fchange": str(FCHANGE)})
    for _ in range(2):
        for i in range(MAXITERS - 1):
            assert c.test(F + 2 * i * FCHANGE) is False
        assert c.test(F + 2 * MAXITERS * FCHANGE) is True
        c.reset()


def test_freduce_change():
    c = Driver("freduce", {"max-iterations": str(MAXITERS),
                           "min-fchange": str(FCHANGE)})
    assert c.test(F) is False
    assert c.test(F + 2 * FCHANGE) is False
    assert c.test(F + 3.01 * FCHANGE) is False
    assert c.test(F + 3.99 * FCHANGE) is True
    assert c.test(F + 3.99 * FCHANGE) is True
    c.reset()
    assert c.test(F + 3.99 * FCHANGE) is False
    assert c.test(F + 5 * FCHANGE) is False
    assert c.test(F + 5 * FCHANGE) is True


def test_freduce_reduce():
    c = Driver("freduce", {"max-iterations": str(MAXITERS),
                           "min-fchange": str(FCHANGE)})
    assert c.test(F) is False
    assert c.test(F + 2 * FCHANGE) is False
    assert c.test(F - 2 * FCHANGE) is True    # F reduced -> stop+revert
    assert bool(c.state.revert[0])
    c.reset()
    assert c.test(F - 3 * FCHANGE) is False
    assert c.test(F) is False
    assert c.test(F - 5 * FCHANGE) is True
    assert bool(c.state.revert[0])


TRIAL_OPTS = {"max-iterations": str(MAXITERS), "min-fchange": str(FCHANGE),
              "max-trials": "3"}


def test_trialmode_max_iters():
    # the trial-mode detector gives one more iteration than requested
    # (convergence.cc:144-145); kept for backwards compatibility
    c = Driver("trialmode", TRIAL_OPTS)
    for _ in range(2):
        for i in range(MAXITERS):
            assert c.test(F + 2 * i * FCHANGE) is False
        assert c.test(F + 2 * MAXITERS * FCHANGE) is True
        c.reset()


def test_trialmode_change():
    c = Driver("trialmode", TRIAL_OPTS)
    assert c.test(F) is False
    assert c.test(F + 2 * FCHANGE) is False
    assert c.test(F + 3.01 * FCHANGE) is False
    assert c.test(F + 3.99 * FCHANGE) is True
    assert c.test(F + 3.99 * FCHANGE) is True
    c.reset()
    assert c.test(F + 3.99 * FCHANGE) is False
    assert c.test(F + 5 * FCHANGE) is False
    assert c.test(F + 5 * FCHANGE) is True


def test_trialmode_reduce():
    maxtrials = 3
    c = Driver("trialmode", TRIAL_OPTS)
    assert c.test(F) is False
    assert c.test(F + 2 * FCHANGE) is False
    for i in range(maxtrials - 1):
        assert c.test(F - 2 * i * FCHANGE) is False
    assert c.test(F - 2 * maxtrials * FCHANGE) is True
    assert bool(c.state.revert[0])  # revert to the best-so-far

    # NB the shipped C++ scenario replays F + 2*FCHANGE as the
    # "increase again" step, but diff == 0 there, which does not count
    # as a recovery in the reference's own state machine
    # (convergence.cc:204 requires diff > 0) — we use a real increase.
    c.reset()
    assert c.test(F) is False
    assert c.test(F + 2 * FCHANGE) is False
    assert c.test(F) is False                   # decrease: trial mode
    assert c.test(F + 4 * FCHANGE) is False     # recovery resets trials
    assert c.test(F) is False                   # drop: back in trial mode
    assert c.test(F - 2 * FCHANGE) is False     # trial 2
    assert c.test(F - 6 * FCHANGE) is True      # trial 3 = max-trials
    assert bool(c.state.revert[0])
