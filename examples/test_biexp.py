#!/usr/bin/env python
"""Self-test of the bi-exponential model (the reference's
examples/test_biexp.py scenario, doc/models.rst:470-520)."""

from fabber_core_tpu.selftest import self_test

if __name__ == "__main__":
    results, _ = self_test(
        "biexp", {"dt": "0.02", "convergence": "trialmode",
                  "max-iterations": "50"},
        {"amp1": [10.0, 20.0], "amp2": 10.0, "r1": 1.0, "r2": 10.0},
        nt=200, patchsize=10, noise=0.5, disp=True, seed=1)
