from super_resolution_tpu.spectral.pca import SpectralPCA  # noqa: F401
from super_resolution_tpu.spectral.envi import (  # noqa: F401
    HSIBinaryDataParameters,
    HyperspectralDataLoader,
    read_envi_header,
)
