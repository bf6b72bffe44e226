from super_resolution_tpu.wavelet.haar import (  # noqa: F401
    WaveletCoefficients,
    inverse_wavelet_transform,
    wavelet_transform,
)
