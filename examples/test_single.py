#!/usr/bin/env python
"""Self-test of the single-exponential model (the reference's
examples/test_single.py scenario, doc/models.rst:372-414).

Generates a phantom over a grid of amp/r values, inverts it with VB and
prints input-vs-recovered values. Expected accuracy ~1%.
"""

from fabber_core_tpu.selftest import self_test

if __name__ == "__main__":
    results, _ = self_test(
        "exp", {"dt": "0.1", "convergence": "trialmode",
                "max-iterations": "50"},
        {"amp1": [1.0, 0.5], "r1": 1.0},
        nt=100, patchsize=10, noise=0.1, disp=True, seed=1)
