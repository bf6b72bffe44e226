"""Subpixel translational registration via upsampled-DFT phase correlation.

TPU-native replacement for the reference's BRISK -> FLANN -> RANSAC ->
estimateRigidTransform pipeline (``src/motion/registration.cpp:41-201``),
which is CPU feature-matching through and through. Phase correlation is pure
FFTs + matmuls (the subpixel refinement is a small matrix-multiply DFT, per
Guizar-Sicairos et al. 2008), so it runs on the MXU and is trivially
vmappable over frames. The accuracy contract is the reference's: recover
known shifts within 0.01 px on dallas_half (``test/test_registration.cpp:20``).

Convention matches MotionModule: a shift (dx, dy) means
``frame(r, c) = reference(r - dy, c - dx)`` (content moves down-right), and
:func:`translational_registration` returns shifts such that
``translate(frames[0], dx_k, dy_k) ~= frames[k]``, with frame 0 = (0, 0).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.motion.motion_shift import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.warp import translate

__all__ = [
    "phase_correlation_shift",
    "robust_phase_correlation_shift",
    "translational_registration",
]

# Probe result: does the default JAX backend implement complex FFTs?
# Real TPUs do (XLA Fft); the tunneled axon PJRT raises UNIMPLEMENTED for
# them, so registration — a once-per-frame host-side preprocessing step —
# transparently falls back to numpy FFTs there (the solve itself uses no
# complex ops). ``None`` = not probed yet.
_COMPLEX_FFT_ON_DEVICE: bool | None = None


def _complex_fft_supported() -> bool:
    global _COMPLEX_FFT_ON_DEVICE
    if _COMPLEX_FFT_ON_DEVICE is None:
        # The axon tunnel is identified by NAME, not probed: it implements
        # fft2 but not complex exp/matmul, and — measured — a single
        # UNIMPLEMENTED op POISONS the client (every later device_put fails),
        # so an on-device op probe is not safe there. Real TPUs/CPU/GPU all
        # support the full complex pipeline.
        try:
            from jax._src import xla_bridge

            version = xla_bridge.get_backend().platform_version
            _COMPLEX_FFT_ON_DEVICE = "axon" not in version.lower()
        except Exception:  # noqa: BLE001 — unknown backend: op-probe it
            try:
                z = jnp.fft.fft2(jnp.ones((4, 4), jnp.float32))
                k = jnp.exp(2j * jnp.pi * jnp.outer(jnp.arange(4.0),
                                                    jnp.fft.fftfreq(4)))
                jax.block_until_ready(
                    jnp.argmax(jnp.abs(jnp.fft.ifft2(k @ (z * jnp.conj(z)))))
                )
                _COMPLEX_FFT_ON_DEVICE = True
            except Exception:  # noqa: BLE001
                _COMPLEX_FFT_ON_DEVICE = False
    return _COMPLEX_FFT_ON_DEVICE


def _translate_np(x: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Numpy bilinear warp with :func:`translate`'s exact semantics
    (``out(r, c) = x(r - dy, c - dx)``, zero border). The numpy-FFT
    fallback path must stay off-device end to end: each on-device
    ``translate`` call through the axon tunnel costs dispatch latency, and
    registration makes dozens of them (measured: 443 s of "registration"
    that is pure tunnel round-trips on a slow window, vs ~1 s host-side)."""
    iy, ix = int(np.floor(dy)), int(np.floor(dx))
    fy, fx = float(dy) - iy, float(dx) - ix
    h, w = x.shape[-2], x.shape[-1]

    def shifted(m: int, n: int) -> np.ndarray:
        res = np.zeros_like(x)
        rs = slice(max(m, 0), h + min(m, 0))
        cs = slice(max(n, 0), w + min(n, 0))
        rsrc = slice(max(-m, 0), h - max(m, 0))
        csrc = slice(max(-n, 0), w - max(n, 0))
        res[..., rs, cs] = x[..., rsrc, csrc]
        return res

    out = np.zeros_like(x)
    for a, wy in ((0, 1.0 - fy), (1, fy)):
        for b, wx in ((0, 1.0 - fx), (1, fx)):
            if wy * wx != 0.0:
                out = out + (wy * wx) * shifted(iy + a, ix + b)
    return out


def _upsampled_dft(data, region, upsample_factor, row_offset, col_offset, xp=jnp):
    """Evaluate the inverse DFT of ``data`` on a ``region x region`` grid with
    spacing ``1/upsample_factor`` starting at (row_offset, col_offset).

    Two small complex matmuls (MXU work), instead of a zero-padded giant FFT.
    ``xp`` is ``jnp`` (accelerator path) or ``np`` (complex-FFT fallback).
    """
    h, w = data.shape
    fy = xp.fft.fftfreq(h)  # u / h
    fx = xp.fft.fftfreq(w)
    steps = xp.arange(region) / upsample_factor
    row_kernel = xp.exp(2j * xp.pi * xp.outer(row_offset + steps, fy))
    col_kernel = xp.exp(2j * xp.pi * xp.outer(fx, col_offset + steps))
    return row_kernel @ data @ col_kernel


def _phase_correlation_once(ref, img, upsample_factor, lowpass_sigma, xp=jnp):
    h, w = ref.shape
    f0 = xp.fft.fft2(ref)
    f1 = xp.fft.fft2(img)
    cross = f1 * xp.conj(f0)
    cross = cross / xp.maximum(xp.abs(cross), 1e-20)
    # Low-frequency emphasis: bilinear resampling's transfer function has a
    # nonlinear phase at high frequencies (exact only for offsets 0/0.5/1),
    # which biases a fully whitened spectrum. A Gaussian radial weight keeps
    # the refinement in the linear-phase regime.
    fy = xp.fft.fftfreq(h)[:, None]
    fx = xp.fft.fftfreq(w)[None, :]
    cross = cross * xp.exp(-(fy * fy + fx * fx) / (2.0 * lowpass_sigma**2))

    # Integer-pixel peak of the correlation surface: frame = translate(ref,
    # dx, dy) makes the peak land at (dy, dx) (mod image size).
    corr = xp.fft.ifft2(cross)
    peak = xp.argmax(xp.abs(corr))
    py = (peak // w).astype(ref.dtype)
    px = (peak % w).astype(ref.dtype)
    py = xp.where(py > h / 2, py - h, py)
    px = xp.where(px > w / 2, px - w, px)

    # Subpixel refinement: evaluate the correlation on a 1.5-px window around
    # the integer peak at 1/upsample_factor spacing via matrix-multiply DFT.
    region = int(np.ceil(upsample_factor * 1.5))
    r0 = py - (region // 2) / upsample_factor
    c0 = px - (region // 2) / upsample_factor
    cc = _upsampled_dft(cross, region, upsample_factor, r0, c0, xp=xp)
    sub_peak = xp.argmax(xp.abs(cc))
    sy = sub_peak // region
    sx = sub_peak % region
    dy = r0 + sy / upsample_factor
    dx = c0 + sx / upsample_factor
    return dx, dy


def phase_correlation_shift(
    reference: jnp.ndarray,
    frame: jnp.ndarray,
    upsample_factor: int = 256,
    num_refinement_iterations: int = 3,
    lowpass_sigma: float = 0.1,
    max_shift: int = 32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate (dx, dy) such that ``frame ~= translate(reference, dx, dy)``.

    Both images are 2D ``[H, W]`` (use channel 0 of multichannel stacks, like
    the reference's keypoint detector, ``registration.cpp:48-54``). After the
    initial phase-correlation estimate, the reference image is re-warped by
    the running estimate (with the *same* bilinear warp as the imaging model)
    and the residual shift re-estimated — the bilinear resampling bias cancels
    and accuracy lands near 1/upsample_factor (~0.002 px measured on
    dallas_half, vs the 0.01 px contract of ``test_registration.cpp:20``).
    """
    xp = jnp if _complex_fft_supported() else np
    ref = xp.asarray(reference)
    img = xp.asarray(frame)
    if ref.ndim == 3:
        ref = ref[0]
    if img.ndim == 3:
        img = img[0]

    dx, dy = _phase_correlation_once(ref, img, upsample_factor, lowpass_sigma,
                                     xp=xp)
    for _ in range(max(0, num_refinement_iterations - 1)):
        # The warp stays in xp's domain: on the numpy fallback an on-device
        # translate would pay a tunnel round trip per refinement step.
        if xp is np:
            warped = _translate_np(np.asarray(ref), float(dx), float(dy))
        else:
            warped = xp.asarray(translate(ref, dx, dy, max_shift=max_shift))
        ddx, ddy = _phase_correlation_once(warped, img, upsample_factor,
                                           lowpass_sigma, xp=xp)
        dx = dx + ddx
        dy = dy + ddy
    return dx, dy


def robust_phase_correlation_shift(
    reference: jnp.ndarray,
    frame: jnp.ndarray,
    block_grid: tuple[int, int] = (3, 3),
    upsample_factor: int = 256,
    num_refinement_iterations: int = 3,
    lowpass_sigma: float = 0.1,
    mad_scale: float = 3.5,
    min_absolute_spread: float = 0.05,
    min_inliers: int = 3,
) -> tuple[float, float, np.ndarray]:
    """Outlier-tolerant shift estimation: per-block phase correlation with
    median/MAD consensus.

    Plays the role of the reference's RANSAC stage
    (``registration.cpp:128-157``): a pure global phase correlation assumes
    the translation model holds everywhere, so a corrupted region or a
    locally violated model (occlusion, local motion) biases the single
    estimate. Here the image pair is split into ``block_grid`` blocks, each
    block votes with its own phase-correlation estimate (vmapped — one
    batched FFT), and votes farther than ``mad_scale`` robust standard
    deviations (1.4826 x MAD) from the per-axis median are rejected; the
    consensus is the per-axis median of the inlier votes.

    The consensus is used for *detection and repair*, not as the final
    answer (individual blocks see stronger boundary effects than the full
    image, costing ~0.02 px): outlier blocks of the frame are replaced by
    the reference content warped by the consensus shift, and the full-image
    estimator (:func:`phase_correlation_shift`) runs on the repaired frame —
    on clean data (no outliers) this degenerates to exactly the global
    estimator, so the 0.01 px contract is inherited bit-for-bit. Falls back
    to the plain global estimate when fewer than ``min_inliers`` blocks
    agree (e.g. aperture-problem blocks on synthetic data).

    Returns ``(dx, dy, inlier_mask)`` with the mask ordered row-major over
    blocks.
    """
    if _complex_fft_supported():
        ref = jnp.asarray(reference)
        img = jnp.asarray(frame)
    else:
        # Host-side end to end on the numpy-FFT fallback (see
        # translational_registration): never bounce frames off the tunnel.
        ref = np.asarray(reference)
        img = np.asarray(frame)
    if ref.ndim == 3:
        ref = ref[0]
    if img.ndim == 3:
        img = img[0]
    h, w = ref.shape
    gy, gx = block_grid
    bh, bw = h // gy, w // gx
    if min(bh, bw) < 16:
        raise ValueError(f"Blocks {bh}x{bw} too small for reliable correlation.")

    def blocks(a):
        a = a[: gy * bh, : gx * bw]
        return a.reshape(gy, bh, gx, bw).transpose(0, 2, 1, 3).reshape(-1, bh, bw)

    if _complex_fft_supported():
        est = jax.vmap(
            lambda r, f: phase_correlation_shift(
                r, f, upsample_factor, num_refinement_iterations, lowpass_sigma
            )
        )(blocks(ref), blocks(img))
        dxs = np.asarray(est[0], np.float64)
        dys = np.asarray(est[1], np.float64)
    else:
        # numpy-FFT fallback (axon: no complex ops on-device) — plain loop.
        pairs = [
            phase_correlation_shift(
                r, f, upsample_factor, num_refinement_iterations, lowpass_sigma
            )
            for r, f in zip(np.asarray(blocks(ref)), np.asarray(blocks(img)))
        ]
        dxs = np.asarray([p[0] for p in pairs], np.float64)
        dys = np.asarray([p[1] for p in pairs], np.float64)

    med = np.array([np.median(dxs), np.median(dys)])
    mad = np.array([np.median(np.abs(dxs - med[0])), np.median(np.abs(dys - med[1]))])
    tol = np.maximum(mad_scale * 1.4826 * mad, min_absolute_spread)
    inliers = (np.abs(dxs - med[0]) <= tol[0]) & (np.abs(dys - med[1]) <= tol[1])

    if bool(inliers.all()) or int(inliers.sum()) < min_inliers:
        # Clean data (or degenerate blocks): the plain global estimator.
        dx, dy = phase_correlation_shift(
            ref, img, upsample_factor, num_refinement_iterations, lowpass_sigma
        )
        return float(dx), float(dy), inliers

    # Repair: overwrite the outlier blocks with reference content warped by
    # the consensus shift, then estimate globally on the repaired frame. The
    # patched-in content carries exactly the consensus shift, so any residual
    # bias is second-order (patched fraction x consensus error).
    cdx = float(dxs[inliers].mean())
    cdy = float(dys[inliers].mean())
    warped = (
        _translate_np(np.asarray(ref), cdx, cdy)
        if not _complex_fft_supported()
        else np.asarray(translate(ref, cdx, cdy, max_shift=32))
    )
    repaired = np.asarray(img).copy()
    for i in range(gy):
        for j in range(gx):
            if not inliers[i * gx + j]:
                sl = (slice(i * bh, (i + 1) * bh), slice(j * bw, (j + 1) * bw))
                repaired[sl] = warped[sl]
    repaired_arr = (
        repaired if not _complex_fft_supported() else jnp.asarray(repaired)
    )
    dx, dy = phase_correlation_shift(
        ref, repaired_arr, upsample_factor,
        num_refinement_iterations, lowpass_sigma,
    )
    return float(dx), float(dy), inliers


def translational_registration(
    images, upsample_factor: int = 256, robust: bool = False,
    block_grid: tuple[int, int] = (3, 3),
) -> MotionShiftSequence:
    """Register each frame against frame 0 (frame 0 gets shift (0, 0)).

    Accepts a list of ImageData / ``[C, H, W]`` / ``[H, W]`` arrays or a
    stacked ``[K, ...]`` array. Mirrors ``TranslationalRegistration``
    (``registration.cpp:161-201``) with phase correlation instead of BRISK.

    ``robust=True`` uses per-block consensus voting
    (:func:`robust_phase_correlation_shift`) — the RANSAC-equivalent for
    data with corrupted regions or locally violated translation models.
    """
    # On the numpy-FFT fallback (axon: no complex ops on-device) frames must
    # stay HOST-side: a jnp.asarray here uploads every frame through the
    # tunnel only for the host FFTs to pull them straight back (~25-50 ms
    # RPC per transfer — measured as the video sliding-window fps bound).
    on_host = not _complex_fft_supported()

    def chan0(img):
        arr = getattr(img, "array", img)
        arr = np.asarray(arr) if on_host else jnp.asarray(arr)
        return arr[0] if arr.ndim == 3 else arr

    frames = [chan0(img) for img in images]
    if not frames:
        return MotionShiftSequence()
    ref = frames[0]
    shifts = [MotionShift(0, 0)]
    if len(frames) > 1 and robust:
        for f in frames[1:]:
            dx, dy, _ = robust_phase_correlation_shift(
                ref, f, block_grid=block_grid, upsample_factor=upsample_factor
            )
            shifts.append(MotionShift(dx, dy))
    elif len(frames) > 1 and _complex_fft_supported():
        stack = jnp.stack(frames[1:])
        est = jax.vmap(lambda f: phase_correlation_shift(ref, f, upsample_factor))(
            stack
        )
        dxs, dys = np.asarray(est[0]), np.asarray(est[1])
        shifts += [MotionShift(float(dx), float(dy)) for dx, dy in zip(dxs, dys)]
    elif len(frames) > 1:
        # numpy-FFT fallback (axon: no complex ops on-device) — per-frame
        # loop; registration runs once per stack, so host FFT cost is noise.
        for f in frames[1:]:
            dx, dy = phase_correlation_shift(ref, f, upsample_factor)
            shifts.append(MotionShift(float(dx), float(dy)))
    return MotionShiftSequence(shifts)
