"""Pin the exp-model self-test to the reference's DOCUMENTED recovery
accuracy (doc/models.rst:399-409, from examples/test_single.py:
amp 1.0->0.999701, 0.5->0.500674; r 1.0->1.000728, 0.8->0.801230;
noise 0.1->0.099521).

The configuration is the reference's exactly (exp model, dt=0.02,
nt=100, sigma=0.1, default maxits convergence); the noise realization
differs (different RNG), so what is pinned is the same accuracy class:
ROI-mean recovery within 5x the documented deviations. NB the
reference's run uses the default 10-iteration detector — running
trialmode to full convergence widens the per-voxel latent spread and
adds a visible exp()-Jensen bias to the ROI mean of log-transformed
parameters, so this test deliberately matches the documented config."""

import numpy as np

from fabber_core_tpu.selftest import self_test

# documented |recovered - truth| from doc/models.rst:399-409
DOC_DEV = {("amp1", 1.0): 3e-4, ("amp1", 0.5): 7e-4,
           ("r1", 1.0): 7.3e-4, ("r1", 0.8): 1.3e-3}


def test_exp_selftest_documented_accuracy():
    results, _ = self_test(
        "exp", {"dt": "0.02", "num-exps": "1"},
        {"amp1": [1.0, 0.5], "r1": [1.0, 0.8]},
        nt=100, patchsize=10, noise=0.1, seed=7)

    for (param, truth), doc_dev in DOC_DEV.items():
        recovered = results[param][truth]
        assert abs(recovered - truth) <= 5 * doc_dev, \
            f"{param}: {truth} -> {recovered} (doc dev {doc_dev})"
    (noise_in, noise_out), = results["noise"].items()
    # documented: 0.1 -> 0.099521 (deviation 4.8e-4)
    assert abs(noise_out - 0.1) <= 5 * 4.8e-4, \
        f"noise: {noise_in} -> {noise_out}"
