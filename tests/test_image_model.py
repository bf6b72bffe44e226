"""Image model tests, mirroring ``test/test_image_model.cpp`` goldens plus
adjoint dot-product checks the reference lacks."""

import numpy as np

from super_resolution_tpu.models import (
    BlurOperator,
    DegradationOperator,
    DownsamplingOperator,
    ImageModel,
    ImageModelParameters,
    MotionOperator,
    NoiseOperator,
    degrade,
    degrade_adjoint,
    kernel_to_operator_matrix,
)
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops import translate, translate_static
from super_resolution_tpu.utils.testing import matrices_equal

SMALL_TEST_IMAGE = np.array(
    [
        [1, 2, 3, 4, 5, 6],
        [7, 8, 9, 0, 1, 2],
        [9, 7, 5, 4, 2, 1],
        [2, 4, 6, 8, 0, 1],
    ],
    dtype=np.float64,
)


def test_kernel_to_operator_matrix_golden():
    """Hand-computed 6x6 matrix from ``test_image_model.cpp:49-78``."""
    kernel = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float64)
    mat = kernel_to_operator_matrix(kernel, (2, 3))
    expected = np.array(
        [
            [0, 2, 0, 0, 1, 0],
            [-2, 0, 2, -1, 0, 1],
            [0, -2, 0, 0, -1, 0],
            [0, 1, 0, 0, 2, 0],
            [-1, 0, 1, -2, 0, 2],
            [0, -1, 0, 0, -2, 0],
        ],
        dtype=np.float64,
    )
    assert matrices_equal(mat, expected)
    test_image = np.array([[1, 3, 5], [9, 5, 2]], dtype=np.float64)
    result = mat @ test_image.reshape(-1)
    assert matrices_equal(result, np.array([11, 1, -11, 13, -10, -13]))


def test_downsampling_matrix_golden():
    """Selection matrix + zero-pad transpose (``test_image_model.cpp:171-226``)."""
    op = DownsamplingOperator(2)
    mat = op.operator_matrix((4, 6), 0)
    assert mat.shape == (6, 24)
    down = mat @ SMALL_TEST_IMAGE.reshape(-1)
    assert matrices_equal(down, np.array([1, 3, 5, 9, 5, 2]))

    # Transpose upsampling golden: zero-interleaved image.
    expected_up = np.zeros((8, 12))
    expected_up[::2, ::2] = SMALL_TEST_IMAGE
    up_mat = op.operator_matrix((8, 12), 0).T
    assert up_mat.shape == (96, 24)
    matrix_up = (up_mat @ SMALL_TEST_IMAGE.reshape(-1)).reshape(8, 12)
    assert matrices_equal(matrix_up, expected_up)

    # Algorithmic transpose matches the matrix transpose.
    algo_up = np.asarray(op.apply_transpose(SMALL_TEST_IMAGE, 0))
    assert matrices_equal(algo_up, expected_up)


def test_motion_matrices_golden():
    """Motion operator matrices for (0,0), (1,1), (-1,0)
    (``test_image_model.cpp:229-348``)."""
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 1), MotionShift(-1, 0)]
    )
    op = MotionOperator(seq)

    m1 = op.operator_matrix((3, 3), 0)
    assert matrices_equal(m1, np.eye(9))

    expected_m2 = np.zeros((9, 9))
    expected_m2[4, 0] = expected_m2[5, 1] = expected_m2[7, 3] = expected_m2[8, 4] = 1
    assert matrices_equal(op.operator_matrix((3, 3), 1), expected_m2)

    expected_m3 = np.zeros((9, 9))
    for out_idx, in_idx in [(0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8)]:
        expected_m3[out_idx, in_idx] = 1
    assert matrices_equal(op.operator_matrix((3, 3), 2), expected_m3)


def test_motion_apply_matches_matrix_integer_shifts():
    seq = MotionShiftSequence([MotionShift(0, 0), MotionShift(1, 1), MotionShift(-1, 0)])
    op = MotionOperator(seq)
    img = np.arange(9, dtype=np.float64).reshape(3, 3) / 10.0
    for k in range(3):
        via_matrix = (op.operator_matrix((3, 3), k) @ img.reshape(-1)).reshape(3, 3)
        via_apply = np.asarray(op.apply(img, k))
        assert matrices_equal(via_apply, via_matrix, 1e-12)
        # Transpose: matrix.T vs warp by negative shift (exact for ints).
        via_matrix_t = (op.operator_matrix((3, 3), k).T @ img.reshape(-1)).reshape(3, 3)
        via_apply_t = np.asarray(op.apply_transpose(img, k))
        assert matrices_equal(via_apply_t, via_matrix_t, 1e-12)


def test_translate_static_matches_dynamic():
    rng = np.random.default_rng(0)
    img = rng.random((2, 8, 8))
    for dx, dy in [(0.0, 0.0), (1.0, -2.0), (0.5, 0.25), (-1.75, 3.5)]:
        a = np.asarray(translate(img, dx, dy, max_shift=5))
        b = np.asarray(translate_static(img, dx, dy))
        assert matrices_equal(a, b, 1e-12)


def test_translate_matches_opencv_warp_affine():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.random((16, 16))
    # Shifts aligned to 1/32 px match cv::warpAffine exactly (OpenCV quantizes
    # subpixel offsets to INTER_BITS=5 fixed point); arbitrary fractions match
    # within that quantization error. Our continuous bilinear is the more
    # accurate of the two.
    for dx, dy in [(1.0, 2.0), (0.5, 0.0), (2.25, -1.5), (-0.75, 0.3125)]:
        m = np.array([[1, 0, dx], [0, 1, dy]], dtype=np.float64)
        expected = cv2.warpAffine(img, m, (16, 16))
        out = np.asarray(translate(img, dx, dy, max_shift=5))
        assert matrices_equal(out, expected, 1e-9)
    m = np.array([[1, 0, -0.75], [0, 1, 0.3]], dtype=np.float64)
    expected = cv2.warpAffine(img, m, (16, 16))
    out = np.asarray(translate(img, -0.75, 0.3, max_shift=5))
    assert matrices_equal(out, expected, 0.02)


def test_blur_golden():
    """Standard-kernel blur golden, sigma=0.849321 (``test_image_model.cpp:350-408``)."""
    op = BlurOperator(3, 0.849321)
    expected = np.array(
        [
            [1.875, 3.0, 3.125, 2.625, 2.75, 2.4375],
            [4.5625, 6.25, 5.3125, 3.1875, 2.3125, 1.9375],
            [5.0, 6.5, 5.75, 3.875, 1.9375, 0.9375],
            [2.5625, 3.75, 4.3125, 3.6875, 1.6875, 0.5],
        ]
    )
    out = np.asarray(op.apply(SMALL_TEST_IMAGE, 0))
    assert matrices_equal(out, expected, 0.001)

    mat = op.operator_matrix((4, 6), 0)
    via_matrix = (mat @ SMALL_TEST_IMAGE.reshape(-1)).reshape(4, 6)
    assert matrices_equal(via_matrix, expected, 0.001)

    # Symmetric kernel: transpose blur equals forward blur.
    via_matrix_t = (mat.T @ SMALL_TEST_IMAGE.reshape(-1)).reshape(4, 6)
    assert matrices_equal(via_matrix_t, expected, 0.001)
    out_t = np.asarray(op.apply_transpose(SMALL_TEST_IMAGE, 0))
    assert matrices_equal(out_t, expected, 0.001)


def test_model_matrix_composition_order():
    """op3 @ (op2 @ op1), mirroring the gmock test (``test_image_model.cpp:444-488``)."""

    class FixedOperator(DegradationOperator):
        def __init__(self, mat):
            self.mat = np.asarray(mat, dtype=np.float64)

        def operator_matrix(self, hw, index):
            return self.mat

    op1 = FixedOperator([[0, 0, 0, -3], [4, 3, 2, 1], [3, 1, 4, 9], [1, 0, 0, 1]])
    op2 = FixedOperator([[0, 2, 0, 5], [1, 1, 1, 1], [0, 0, 0, 0], [1, 2, 3, -4]])
    op3 = FixedOperator([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]])
    model = ImageModel(2, [op1, op2, op3])
    expected = np.array([[13, 6, 4, 7], [8, 4, 6, 8], [0, 0, 0, 0]], dtype=np.float64)
    assert matrices_equal(model.model_matrix((2, 2), 0), expected)


def test_create_image_model_factory():
    params = ImageModelParameters(
        scale=2,
        blur_radius=3,
        blur_sigma=1.0,
        motion_sequence=MotionShiftSequence([MotionShift(0, 0), MotionShift(1, 1)]),
        noise_sigma=5.0,
    )
    model = ImageModel.create(params)
    kinds = [type(op) for op in model.operators]
    assert kinds == [MotionOperator, BlurOperator, DownsamplingOperator, NoiseOperator]
    assert model.downsampling_scale == 2


def test_full_model_apply_matches_matrix():
    """A_k x via operators == dense A_k @ x for the composed model."""
    seq = MotionShiftSequence([MotionShift(0, 0), MotionShift(1, 0), MotionShift(0, 1)])
    params = ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq)
    model = ImageModel.create(params)
    rng = np.random.default_rng(2)
    x = rng.random((8, 8))
    for k in range(3):
        a = model.model_matrix((8, 8), k)
        via_matrix = (a @ x.reshape(-1)).reshape(4, 4)
        via_apply = np.asarray(model.apply(x, k))
        assert matrices_equal(via_apply, via_matrix, 1e-10)
        # Adjoint: A^T r via operators == dense A.T @ r.
        r = rng.random((4, 4))
        via_matrix_t = (a.T @ r.reshape(-1)).reshape(8, 8)
        via_apply_t = np.asarray(model.apply_transpose(r, k))
        assert matrices_equal(via_apply_t, via_matrix_t, 1e-10)


def test_degrade_fused_matches_model_chain():
    seq = MotionShiftSequence([MotionShift(1, 0), MotionShift(0.5, -0.25)])
    params = ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.5, motion_sequence=seq)
    model = ImageModel.create(params)
    kernel = model.blur_operator.kernel
    rng = np.random.default_rng(3)
    x = rng.random((3, 8, 8))
    for k in range(2):
        s = seq[k]
        fused = np.asarray(degrade(x, s.dx, s.dy, kernel, 2, max_shift=4))
        chained = np.asarray(model.apply(x, k))
        assert matrices_equal(fused, chained, 1e-12)
        r = rng.random((3, 4, 4))
        fused_t = np.asarray(degrade_adjoint(r, s.dx, s.dy, kernel, 2, max_shift=4))
        chained_t = np.asarray(model.apply_transpose(r, k))
        assert matrices_equal(fused_t, chained_t, 1e-12)


def test_degrade_vmap_over_frames():
    import jax
    import jax.numpy as jnp

    seq = MotionShiftSequence([MotionShift(0, 0), MotionShift(1, 1), MotionShift(-1, 2)])
    shifts = jnp.asarray(seq.as_array())
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 8, 8)))

    stack = jax.vmap(lambda s: degrade(x, s[0], s[1], None, 2, max_shift=4))(shifts)
    assert stack.shape == (3, 2, 4, 4)
    for k, s in enumerate(seq):
        single = degrade(x, s.dx, s.dy, None, 2, max_shift=4)
        assert matrices_equal(np.asarray(stack[k]), np.asarray(single), 1e-12)


def test_noise_operator():
    op = NoiseOperator(10.0, seed=1)
    x = np.full((1, 32, 32), 0.5)
    noisy = np.asarray(op.apply(x, 0))
    assert noisy.shape == x.shape
    std = (noisy - x).std()
    assert 0.5 * (10.0 / 255.0) < std < 1.5 * (10.0 / 255.0)
    # Different frames get different noise.
    noisy2 = np.asarray(op.apply(x, 1))
    assert np.abs(noisy - noisy2).max() > 1e-6
    # Transpose is a no-op.
    assert matrices_equal(op.apply_transpose(x, 0), x)
