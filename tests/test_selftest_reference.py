"""Pin the exp/biexp model self-tests to the reference's DOCUMENTED
recovery accuracy (doc/models.rst:399-409 and :555-570).

Single-exp (from examples/test_single.py output in the docs:
amp 1.0->0.999701, 0.5->0.500674; r 1.0->1.000728, 0.8->0.801230;
noise 0.1->0.099521): the configuration is the reference's exactly
(exp model, dt=0.02, nt=100, sigma=0.1, default maxits convergence);
the noise realization differs (different RNG), so what is pinned is
the same accuracy class: ROI-mean recovery within 2x the documented
deviations at a fixed seed. NB the reference's run uses the default
10-iteration detector — running trialmode to full convergence widens
the per-voxel latent spread and adds a visible exp()-Jensen bias to
the ROI mean of log-transformed parameters, so this test deliberately
matches the documented config.

Bi-exp (doc/models.rst:440-570): the reference documents that its own
raw self-test output "can't actually be trusted" because the inference
sometimes swaps the two exponentials per voxel (amp1<->amp2, r1<->r2),
so its headline r1 numbers land near r2=6. What IS documented as the
quality bar: noise 0.1->0.099399 and "sensible fitting in the
overwhelming majority of voxels". Pinned here: noise within 2x the
documented deviation, per-voxel fit quality, and component-canonical
(rate-sorted per voxel) median recovery of the slow component —
invariant to the swap the reference warns about."""

import numpy as np

from fabber_core_tpu.selftest import self_test, generate_test_data
from fabber_core_tpu.api import FabberTpu

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
        assert abs(recovered - truth) <= 2 * doc_dev, \
            f"{param}: {truth} -> {recovered} (doc dev {doc_dev})"
    (noise_in, noise_out), = results["noise"].items()
    # documented: 0.1 -> 0.099521 (deviation 4.8e-4)
    assert abs(noise_out - 0.1) <= 2 * 4.8e-4, \
        f"noise: {noise_in} -> {noise_out}"


def test_biexp_selftest_documented_accuracy():
    opts = {"model": "exp", "num-exps": "2", "dt": "0.02",
            "max-iterations": "50"}
    params = {"amp1": [1.0, 0.5], "amp2": 0.5,
              "r1": [1.0, 0.8], "r2": 6.0}
    data, clean, rois = generate_test_data(
        opts, params, nt=100, patchsize=10, noise=0.1,
        param_rois=True, seed=7)
    run = FabberTpu().run_with_data(
        {**opts, "method": "vb", "noise": "white", "save-mean": True,
         "save-noise-mean": True, "save-model-fit": True,
         "allow-bad-voxels": True}, {"data": data})

    # noise: documented 0.1 -> 0.099399 (deviation 6.01e-4)
    noise_out = 1.0 / np.sqrt(float(np.mean(run.data["noise_means"])))
    assert abs(noise_out - 0.1) <= 2 * 6.01e-4, f"noise -> {noise_out}"

    # per-voxel fit quality: the doc's "overwhelming majority of
    # voxels" fit sensibly; measured 98.9% under 3*sigma at this seed
    fit = run.data["modelfit"]
    vox_rms = np.sqrt(np.mean((fit - clean) ** 2, axis=-1))
    good = float(np.mean(vox_rms < 3 * 0.1))
    assert good >= 0.97, f"good-fit fraction {good}"

    # component-canonical recovery: sort the two exponentials by rate
    # per voxel (slow component = ground-truth amp1/r1) and compare
    # ROI medians — robust to both the swap and the rare diverged voxel
    a1, r1 = run.data["mean_amp1"], run.data["mean_r1"]
    a2, r2 = run.data["mean_amp2"], run.data["mean_r2"]
    slow = r1 <= r2
    amp_slow = np.where(slow, a1, a2)
    r_slow = np.where(slow, r1, r2)
    for idx, truth in enumerate([1.0, 0.5]):
        rec = float(np.median(amp_slow[rois["amp1"] == idx + 1]))
        assert abs(rec - truth) <= 0.05 * truth, \
            f"amp1 {truth} -> {rec}"
    for idx, truth in enumerate([1.0, 0.8]):
        rec = float(np.median(r_slow[rois["r1"] == idx + 1]))
        assert abs(rec - truth) <= 0.05 * truth, f"r1 {truth} -> {rec}"
