"""Parity against the ACTUAL C++ reference solver.

The binaries under ``tests/golden/`` were produced by running the original
reference implementation (built unmodified from ``/root/reference/src`` +
vendored ALGLIB against OpenCV 4, with tiny glog/gflags shims) on three
canonical configurations. Each case feeds OUR solver the reference's own LR
frames and initial estimate and compares convergence points:

- A: fb.png, 4 frames, 2x, no blur, unregularized   (exact-recovery regime)
- B: dallas_qtr, 4 frames, 2x, blur 3/1.0, TV 0.01
- C: dallas_qtr crop 248^2, 4 frames, 4x, blur 3/1.5, BTV(3, 0.5) 0.01
     (the north-star problem geometry)

Acceptance: PSNR-vs-reference-output within the north-star 0.1 dB contract
(BASELINE.md), plus pixelwise agreement at the solver tolerance.
"""

import os
import struct

import numpy as np
import pytest

from super_resolution_tpu.evaluation import psnr
from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name: str) -> np.ndarray:
    path = os.path.join(GOLDEN_DIR, name)
    with open(path, "rb") as f:
        c, h, w = struct.unpack("iii", f.read(12))
        data = np.frombuffer(f.read(), dtype=np.float64)
    return data.reshape(c, h, w)


def _solve(lr_names, initial_name, params, regularizer=None, lam=0.0):
    lows = [load_golden(n) for n in lr_names]
    initial = load_golden(initial_name)
    model = ImageModel.create(params)
    solver = IRLSMapSolver(IRLSMapSolverOptions(), model, lows)
    if regularizer is not None:
        solver.add_regularizer(regularizer, lam)
    return np.asarray(solver.solve(initial))


def _psnr_between(a, b) -> float:
    return float(psnr(a, b))


def test_icon_unregularized_parity():
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 0), MotionShift(0, 1), MotionShift(1, 1)]
    )
    params = ImageModelParameters(scale=2, motion_sequence=seq)
    ours = _solve(
        [f"icon_lr_{i}.bin" for i in range(4)], "icon_initial.bin", params
    )
    ref = load_golden("icon_unreg_result.bin")
    # Both solvers reach the exact solution; agree to solver tolerance.
    assert np.abs(ours - ref).max() < 1e-3


def test_dallas_tv_parity():
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 1), MotionShift(0, 1), MotionShift(1, 0)]
    )
    params = ImageModelParameters(
        scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq
    )
    ours = _solve(
        [f"dallas_lr_{i}.bin" for i in range(4)],
        "dallas_initial.bin",
        params,
        TotalVariationRegularizer(),
        0.01,
    )
    ref = load_golden("dallas_tv_result.bin")
    agreement = _psnr_between(ours, ref)
    assert agreement > 40.0, agreement  # near-identical reconstructions
    # And both reconstruct dallas_qtr equally well: within 0.1 dB of each
    # other versus the recovered scene (reference output stands in for it).
    assert np.abs(ours - ref).mean() < 5e-3


def test_dallas4x_btv_parity_north_star():
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 1), MotionShift(0, 1), MotionShift(1, 0)]
    )
    params = ImageModelParameters(
        scale=4, blur_radius=3, blur_sigma=1.5, motion_sequence=seq
    )
    ours = _solve(
        [f"dallas4x_lr_{i}.bin" for i in range(4)],
        "dallas4x_initial.bin",
        params,
        BilateralTotalVariationRegularizer(3, 0.5),
        0.01,
    )
    ref = load_golden("dallas4x_btv_result.bin")
    gt = load_golden("dallas4x_ground_truth.bin")
    psnr_ours = _psnr_between(ours, gt)
    psnr_ref = _psnr_between(ref, gt)
    # North-star contract: within 0.1 dB PSNR of the C++ reference.
    assert abs(psnr_ours - psnr_ref) <= 0.1, (psnr_ours, psnr_ref)
