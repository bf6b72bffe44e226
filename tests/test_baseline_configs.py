"""End-to-end runs of the BASELINE.json measurement configurations on the
virtual 8-device mesh (the driver's multi-chip dry run covers compilation;
these check numerics end to end)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.evaluation import psnr
from super_resolution_tpu.parallel import (
    BAND_AXIS,
    COL_AXIS,
    FRAME_AXIS,
    ROW_AXIS,
    make_mesh,
)
from super_resolution_tpu.spectral import SpectralPCA
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize
from super_resolution_tpu.utils.testing import matrices_equal
from super_resolution_tpu.wavelet import inverse_wavelet_transform, wavelet_transform

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_hyperspectral_pca_band_sharded_solve():
    """BASELINE config 4: hyperspectral MAP with spectral PCA, bands sharded
    across chips."""
    rng = np.random.default_rng(101)
    num_bands = 64
    base = rng.random((16, 16))
    # Correlated spectra: each band is a scaled/offset copy plus noise.
    cube = np.stack(
        [base * (0.3 + 0.7 * b / num_bands) + rng.normal(0, 0.01, base.shape)
         for b in range(num_bands)]
    )
    pca = SpectralPCA([cube], num_pca_bands=8)
    coeffs = np.asarray(pca.project(jnp.asarray(cube)))  # [8, 16, 16]

    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(-1, 0), MotionShift(0, -1), MotionShift(-1, -1)]
    )
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    obs = jnp.stack([model.apply(jnp.asarray(coeffs), k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array())

    # Shard the PCA-band axis across all 8 devices; frames replicated.
    mesh = make_mesh({BAND_AXIS: 8})
    x0 = jax.device_put(
        jnp.zeros_like(jnp.asarray(coeffs)),
        NamedSharding(mesh, PartitionSpec(BAND_AXIS, None, None)),
    )
    obs_s = jax.device_put(
        obs, NamedSharding(mesh, PartitionSpec(None, BAND_AXIS, None, None))
    )

    @jax.jit
    def solve(x0, obs, shifts):
        vg = make_map_value_and_grad(obs, shifts, None, 2, max_shift=3)
        return minimize(lambda x: vg(x, ()), x0, max_iterations=40)

    out = solve(x0, obs_s, shifts)
    recovered_coeffs = np.asarray(out.x)
    assert matrices_equal(recovered_coeffs, coeffs, 0.001)

    # Reconstruct the full cube from the solved PCA bands.
    recon = np.asarray(pca.back_project(jnp.asarray(recovered_coeffs)))
    assert float(psnr(recon, cube)) > 35.0


def test_wavelet_domain_tiled_16_frame_solve():
    """BASELINE config 5 (geometry): 16-frame stack, wavelet-domain solving,
    HR estimate spatially tiled with halo exchange on a (row, col) mesh."""
    from super_resolution_tpu.parallel.halo import make_tiled_map_value_and_grad

    import cv2

    img = cv2.imread(
        "/root/reference/test_data/dallas_qtr.jpg", cv2.IMREAD_GRAYSCALE
    ).astype(np.float64) / 255.0
    hr = jnp.asarray(img[64:96, 64:96])[None]
    # Even shifts commute exactly with the Haar DWT; subband shifts are then
    # the integer halves. (The wavelet-domain mode remains approximate — the
    # decimation does not commute with the DWT — matching the reference's
    # "experimental" labeling, super_resolution.cpp:201-267.)
    shifts_list = [
        MotionShift(dx, dy)
        for dx in (0, -2, 2, 4) for dy in (0, -2, 2, 4)
    ][:16]
    seq = MotionShiftSequence(shifts_list)
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    lr_stack = jnp.stack([model.apply(hr, k) for k in range(16)])
    shifts = jnp.asarray(seq.as_array())

    # Wavelet-transform the LR frames; solve each subband on a tiled mesh.
    coeffs = wavelet_transform(lr_stack)  # each [16, 1, 8, 8]
    # 2x2 tiles of the 16^2 subbands keep the stencil halo within a tile.
    mesh = make_mesh({ROW_AXIS: 2, COL_AXIS: 2}, jax.devices()[:4])

    results = {}
    for name in ("ll", "lh", "hl", "hh"):
        sub = getattr(coeffs, name)
        # Subband shifts scale by 1/2 in the wavelet pyramid.
        sub_shifts = shifts / 2.0
        x0 = jax.device_put(
            jnp.zeros((1, 16, 16)),
            NamedSharding(mesh, PartitionSpec(None, ROW_AXIS, COL_AXIS)),
        )
        sub_s = jax.device_put(
            sub, NamedSharding(mesh, PartitionSpec(None, None, ROW_AXIS, COL_AXIS))
        )
        vg = make_tiled_map_value_and_grad(mesh, None, 2, max_shift=5)

        @jax.jit
        def solve(x0, obs, sh):
            return minimize(lambda x: vg(x, obs, sh), x0, max_iterations=30)

        results[name] = solve(x0, sub_s, sub_shifts).x

    recon = inverse_wavelet_transform(
        type(coeffs)(results["ll"], results["lh"], results["hl"], results["hh"])
    )
    assert recon.shape == (1, 32, 32)
    # Wavelet-domain solving is an approximation (measured ~19 dB here vs
    # ~10 dB for the reference's original-shift formulation); expect a
    # recognizable reconstruction, not exactness.
    assert float(psnr(np.asarray(recon), np.asarray(hr))) > 15.0


def test_wavelet_domain_tiled_irls_solver():
    """BASELINE config 5 through the PRODUCTION solver (VERDICT r2 #4):
    the four subbands stacked as channels of ONE IRLSMapSolver solve on a
    row x col mesh — routed through the fused-kernel tiled objective
    (make_tiled_pallas_vg) rather than hand-built minimize() calls."""
    import cv2

    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions

    img = cv2.imread(
        "/root/reference/test_data/dallas_qtr.jpg", cv2.IMREAD_GRAYSCALE
    ).astype(np.float64) / 255.0
    hr = jnp.asarray(img[64:96, 64:96])[None]
    shifts_list = [
        MotionShift(dx, dy) for dx in (0, -2, 2, 4) for dy in (0, -2, 2, 4)
    ][:16]
    seq = MotionShiftSequence(shifts_list)
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    lr_stack = jnp.stack([model.apply(hr, k) for k in range(16)])

    coeffs = wavelet_transform(lr_stack)  # each [16, 1, 8, 8]
    stacked = jnp.concatenate(
        [coeffs.ll, coeffs.lh, coeffs.hl, coeffs.hh], axis=1
    )  # [16, 4, 8, 8]
    # Subband shifts scale by 1/2 in the wavelet pyramid.
    sub_seq = MotionShiftSequence(
        [MotionShift(s.dx / 2.0, s.dy / 2.0) for s in shifts_list]
    )
    sub_model = ImageModel.create(
        ImageModelParameters(scale=2, motion_sequence=sub_seq)
    )
    mesh = make_mesh({ROW_AXIS: 2, COL_AXIS: 2}, jax.devices()[:4])
    solver = IRLSMapSolver(
        IRLSMapSolverOptions(
            max_num_irls_iterations=2, max_num_solver_iterations=30,
            use_pallas_data_term=True, pallas_tile=8,
        ),
        sub_model, [np.asarray(f) for f in stacked], mesh=mesh,
    )
    solver.add_regularizer(TotalVariationRegularizer(), 1e-4)
    out = np.asarray(solver.solve(np.zeros((4, 16, 16))))
    recon = inverse_wavelet_transform(
        type(coeffs)(*(jnp.asarray(out[i : i + 1]) for i in range(4)))
    )
    assert recon.shape == (1, 32, 32)
    assert float(psnr(np.asarray(recon), np.asarray(hr))) > 15.0
