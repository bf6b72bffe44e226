#!/usr/bin/env python
"""Pipeline driver with canonical flag recipes (equivalent of
``scripts/run.py`` in the reference, minus the Tkinter GUI): runs the
generate-data and super-resolve CLIs end to end from one configuration dict.

Usage:
  python scripts/run.py [--step generate|solve|all] [--hr_image PATH] ...
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile

# The default configuration recipe (mirrors scripts/run.py:9-35 of the
# reference, which documents the canonical flag settings).
CONFIGURATION = {
    "scale": 2,
    "blur_radius": 3,
    "blur_sigma": 0.5,
    "noise_sigma": 5.0,
    "hr_image_path": "/root/reference/test_data/dallas_half.jpg",
    "lr_image_dir": None,  # default: a temp dir
    "number_of_frames": 4,
    "motion_sequence_path": "/root/reference/test_data/test_motion_sequence_4.txt",
    "interpolate_color": True,
    "solve_in_wavelet_domain": False,
    "split_channels": False,
    "regularizer": "tv",
    "regularization_parameter": 0.01,
    "btv_scale_range": 3,
    "btv_spatial_decay": 0.5,
    "solver": "cg",
    "solver_iterations": 50,
    "optimization_iterations": 20,
    "verbose_solver": True,
    "evaluators": "psnr,ssim",
    "result_path": "",
}


def run_generate_data(config) -> None:
    cmd = [
        sys.executable, "-m", "super_resolution_tpu.cli.generate_data",
        "--input_image", config["hr_image_path"],
        "--output_image_dir", config["lr_image_dir"],
        "--motion_sequence_path", config["motion_sequence_path"],
        "--blur_radius", str(config["blur_radius"]),
        "--blur_sigma", str(config["blur_sigma"]),
        "--noise_sigma", str(config["noise_sigma"]),
        "--upsampling_scale", str(config["scale"]),
        "--number_of_frames", str(config["number_of_frames"]),
    ]
    print("Running GenerateData command:\n ", " ".join(cmd))
    subprocess.run(cmd, check=True)


def run_super_resolution(config) -> None:
    cmd = [
        sys.executable, "-m", "super_resolution_tpu.cli.super_resolve",
        "--data_path", config["lr_image_dir"],
        "--ground_truth_image", config["hr_image_path"],
        "--motion_sequence_path", config["motion_sequence_path"],
        "--upsampling_scale", str(config["scale"]),
        "--blur_radius", str(config["blur_radius"]),
        "--blur_sigma", str(config["blur_sigma"]),
        "--regularizer", config["regularizer"],
        "--regularization_parameter", str(config["regularization_parameter"]),
        "--btv_scale_range", str(config["btv_scale_range"]),
        "--btv_spatial_decay", str(config["btv_spatial_decay"]),
        "--solver", config["solver"],
        "--solver_iterations", str(config["solver_iterations"]),
        "--optimization_iterations", str(config["optimization_iterations"]),
        "--evaluators", config["evaluators"],
    ]
    for flag in ("interpolate_color", "solve_in_wavelet_domain", "split_channels"):
        if config[flag]:
            cmd.append(f"--{flag}")
    if config["verbose_solver"]:
        cmd.append("--verbose")
    if config["result_path"]:
        cmd += ["--result_path", config["result_path"]]
    print("Running SuperResolution command:\n ", " ".join(cmd))
    subprocess.run(cmd, check=True)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--step", default="all", choices=["generate", "solve", "all"])
    for key, value in CONFIGURATION.items():
        if isinstance(value, bool):
            parser.add_argument(f"--{key}", type=lambda v: v.lower() == "true",
                                default=value)
        else:
            parser.add_argument(f"--{key}", default=value)
    args = parser.parse_args()
    config = {k: getattr(args, k) for k in CONFIGURATION}
    if not config["lr_image_dir"]:
        config["lr_image_dir"] = tempfile.mkdtemp(prefix="sr_lr_")
    if args.step in ("generate", "all"):
        run_generate_data(config)
    if args.step in ("solve", "all"):
        run_super_resolution(config)
    return 0


if __name__ == "__main__":
    sys.exit(main())
