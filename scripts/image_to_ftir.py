#!/usr/bin/env python
"""Synthesize noisy multi-channel FT-IR-style hyperspectral test data from a
binary image (equivalent of ``scripts/image_to_ftir.py`` in the reference).

The input image is binarized (non-zero -> 1), replicated into NUM_CHANNELS
bands with per-band intensity offsets and additive noise, and written as an
ENVI BSQ cube (+ .hdr/.config) ready for the hyperspectral pipeline.
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_image(
    src_image_path: str,
    dest_path: str,
    num_channels: int = 5,
    noise_intensity: float = 0.2,
    image_size: int = 128,
    seed: int = 0,
) -> None:
    image = cv2.imread(src_image_path, cv2.IMREAD_GRAYSCALE)
    if image is None:
        raise FileNotFoundError(src_image_path)
    image = cv2.resize(image, (image_size, image_size), interpolation=cv2.INTER_NEAREST)
    binary = (255 - image > 127).astype(np.float64)  # inverted, binarized

    rng = np.random.default_rng(seed)
    bands = []
    for i in range(num_channels):
        offset = i * 0.1
        band = np.where(binary > 0, 1.0 - offset, offset)
        band = band + rng.uniform(-noise_intensity, noise_intensity, band.shape)
        bands.append(np.clip(band, 0.0, 1.0))
    cube = np.stack(bands)

    from super_resolution_tpu.spectral import HyperspectralDataLoader

    HyperspectralDataLoader(dest_path).save_image(cube)
    print(f"Wrote {num_channels}-band FT-IR-style cube to {dest_path} (+ .hdr/.config)")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_image", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--num_channels", type=int, default=5)
    parser.add_argument("--noise_intensity", type=float, default=0.2)
    parser.add_argument("--image_size", type=int, default=128)
    args = parser.parse_args()
    convert_image(
        args.input_image, args.output_path, args.num_channels,
        args.noise_intensity, args.image_size,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
