"""PSNR/SSIM tests, mirroring ``test/test_evaluation.cpp`` goldens."""

import math

import numpy as np

from super_resolution_tpu.evaluation import (
    PeakSignalToNoiseRatioEvaluator,
    StructuralSimilarityEvaluator,
    psnr,
    ssim,
)

GROUND_TRUTH = np.array(
    [
        [0.0, 0.1, 0.2, 0.3],
        [0.7, 0.6, 0.5, 0.4],
        [0.8, 0.9, 1.0, 0.5],
        [0.4, 0.6, 0.0, 1.0],
    ]
)


def test_psnr_identical_is_infinity():
    ev = PeakSignalToNoiseRatioEvaluator(GROUND_TRUTH)
    assert ev.evaluate(GROUND_TRUTH) == float("inf")


def test_psnr_golden():
    """Hand-computed MSE case (``test_evaluation.cpp:29-50``)."""
    test = GROUND_TRUTH.copy()
    test[1, 2] = 0.25  # index 6: 0.5 -> 0.25
    test[3, 3] = 0.5  # index 15: 1.0 -> 0.5
    ev = PeakSignalToNoiseRatioEvaluator(GROUND_TRUTH)
    assert abs(ev.evaluate(test) - 17.09269960975831) < 1e-12


def test_psnr_multichannel_pooling():
    """MSE pools over channels jointly (``test_evaluation.cpp:71-97``)."""
    rng = np.random.default_rng(5)
    other = rng.random((4, 4))
    test2 = GROUND_TRUTH.copy()
    test2[1, 2] = 0.25
    test2[3, 3] = 0.5
    ssd3 = ((GROUND_TRUTH - other) ** 2).sum()
    gt_multi = np.stack([GROUND_TRUTH] * 3)
    test_multi = np.stack([GROUND_TRUTH, test2, other])
    expected_mse = (0.0 + 0.3125 + ssd3) / 48.0
    expected = 10.0 * math.log10(1.0 / expected_mse)
    assert abs(float(psnr(test_multi, gt_multi)) - expected) < 1e-12


def test_ssim_golden():
    """2x2 worked example = 0.991784423266513 (``test_evaluation.cpp:101-129``)."""
    gt = np.array([[0.5, 0.25], [0.75, 1.0]])
    test = np.array([[0.55, 0.25], [0.7, 1.0]])
    ev = StructuralSimilarityEvaluator(gt)
    assert abs(ev.evaluate(test) - 0.991784423266513) < 1e-12
    # Duplicating channels leaves the pooled SSIM unchanged.
    assert abs(float(ssim(np.stack([test] * 2), np.stack([gt] * 2))) - 0.991784423266513) < 1e-12


def test_ssim_identity_and_symmetry():
    ev = StructuralSimilarityEvaluator(GROUND_TRUTH)
    assert abs(ev.evaluate(GROUND_TRUTH) - 1.0) < 1e-12
    test = np.array(
        [
            [0.5, 0.3, 0.4, 0.5],
            [0.6, 0.6, 0.5, 0.45],
            [0.8, 0.9, 1.0, 0.5],
            [0.3, 0.8, 0.3, 0.8],
        ]
    )
    ev2 = StructuralSimilarityEvaluator(test)
    assert abs(ev.evaluate(test) - ev2.evaluate(GROUND_TRUTH)) < 1e-12


def test_evaluator_resizes_mismatched_input():
    ev = PeakSignalToNoiseRatioEvaluator(GROUND_TRUTH)
    small = GROUND_TRUTH[::2, ::2]
    score = ev.evaluate(small)  # bilinear upscale then compare
    assert np.isfinite(score)
