"""End-to-end CLI tests (the reference exercises everything through gtest;
we additionally drive the actual CLI pipelines)."""

import os

import numpy as np
import pytest

from super_resolution_tpu.cli.generate_data import main as generate_data_main
from super_resolution_tpu.cli.shift_add_fusion import main as shift_add_main
from super_resolution_tpu.cli.super_resolve import main as super_resolve_main
from super_resolution_tpu.cli.visualize_image import main as visualize_main


@pytest.fixture()
def small_image(test_data_dir):
    return f"{test_data_dir}/fb.png"


def test_generate_then_fuse(tmp_path, small_image, test_data_dir, capsys):
    out_dir = str(tmp_path / "lr")
    rc = generate_data_main([
        "--input_image", small_image,
        "--output_image_dir", out_dir,
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path", f"{test_data_dir}/test_motion_sequence_4.txt",
    ])
    assert rc == 0
    assert len(os.listdir(out_dir)) == 4

    fused_path = str(tmp_path / "fused.png")
    rc = shift_add_main([
        "--input_image_dir", out_dir,
        "--input_motion_sequence", f"{test_data_dir}/test_motion_sequence_4.txt",
        "--upsampling_scale", "2",
        "--result_path", fused_path,
    ])
    assert rc == 0
    assert os.path.exists(fused_path)


def test_super_resolve_generate_mode(tmp_path, small_image, capsys):
    result_path = str(tmp_path / "result.png")
    rc = super_resolve_main([
        "--data_path", small_image,
        "--generate_lr_images",
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path", "/root/reference/test_data/test_motion_sequence_4.txt",
        "--regularization_parameter", "0",
        "--evaluators", "psnr,ssim",
        "--result_path", result_path,
    ])
    assert rc == 0
    assert os.path.exists(result_path)
    out = capsys.readouterr().out
    assert "PSNR score on result" in out
    assert "SSIM score on result" in out
    # Noiseless inverse-crime recon should beat bilinear upsampling by a lot.
    lines = {l.split(":")[0].strip(): float(l.split(":")[1]) for l in out.splitlines()
             if "score on" in l}
    assert lines["PSNR score on result"] > lines["PSNR score on upsampled"]


def test_super_resolve_directory_mode_with_registration(tmp_path, test_data_dir, capsys):
    # Generate LR frames to a directory, then solve with estimated motion.
    out_dir = str(tmp_path / "lr")
    rc = generate_data_main([
        "--input_image", f"{test_data_dir}/fb.png",
        "--output_image_dir", out_dir,
        "--number_of_frames", "3",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path", f"{test_data_dir}/test_motion_sequence_9.txt",
    ])
    assert rc == 0
    rc = super_resolve_main([
        "--data_path", out_dir,
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--estimate_motion",
        "--regularization_parameter", "0.005",
        "--optimization_iterations", "3",
        "--solver_iterations", "20",
    ])
    assert rc == 0


def test_super_resolve_estimated_motion_with_refinement(tmp_path, test_data_dir,
                                                        capsys):
    """--estimate_motion + --refine_motion: registration, then per-IRLS-seam
    Gauss-Newton refinement against the evolving HR estimate (round 4)."""
    out_dir = str(tmp_path / "lr")
    rc = generate_data_main([
        "--input_image", f"{test_data_dir}/fb.png",
        "--output_image_dir", out_dir,
        "--number_of_frames", "3",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path", f"{test_data_dir}/test_motion_sequence_9.txt",
    ])
    assert rc == 0
    rc = super_resolve_main([
        "--data_path", out_dir,
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--estimate_motion",
        "--refine_motion", "1",
        "--regularization_parameter", "0.005",
        "--optimization_iterations", "3",
        "--solver_iterations", "20",
        "--verbose",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Refined motion against the HR estimate" in out


def test_super_resolve_wavelet_domain(small_image):
    rc = super_resolve_main([
        "--data_path", small_image,
        "--generate_lr_images",
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path", "/root/reference/test_data/test_motion_sequence_4.txt",
        "--solve_in_wavelet_domain",
        "--regularization_parameter", "0",
        "--optimization_iterations", "2",
        "--solver_iterations", "15",
    ])
    assert rc == 0


def test_super_resolve_interpolate_color(small_image):
    rc = super_resolve_main([
        "--data_path", small_image,
        "--generate_lr_images",
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path", "/root/reference/test_data/test_motion_sequence_4.txt",
        "--interpolate_color",
        "--regularization_parameter", "0",
        "--optimization_iterations", "2",
        "--solver_iterations", "15",
    ])
    assert rc == 0


def test_super_resolve_pca_space(tmp_path, test_data_dir):
    # Use the ENVI test cube as a small hyperspectral input.
    rc = super_resolve_main([
        "--data_path", f"{test_data_dir}/test_hs_config.txt",
        "--generate_lr_images",
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path", f"{test_data_dir}/test_motion_sequence_4.txt",
        "--solve_in_pca_space",
        "--num_pca_components", "3",
        "--regularization_parameter", "0",
        "--optimization_iterations", "2",
        "--solver_iterations", "10",
        "--result_path", str(tmp_path / "hsi_result"),
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "hsi_result") + ".hdr")


def test_visualize_image(small_image, capsys, monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    rc = visualize_main(["--image_path", small_image, "--print_report"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Image Statistics" in out


def test_super_resolve_admm_solver(tmp_path, small_image, capsys):
    """--solver admm routes to the AdmmSolver (the reference's stub made
    first-class) through the same binary surface."""
    result_path = str(tmp_path / "admm.png")
    rc = super_resolve_main([
        "--data_path", small_image,
        "--generate_lr_images",
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path",
        "/root/reference/test_data/test_motion_sequence_4.txt",
        "--solver", "admm",
        "--solver_iterations", "20",
        "--admm_cg_iterations", "6",
        "--regularization_parameter", "0.005",
        "--evaluators", "psnr",
        "--result_path", result_path,
    ])
    assert rc == 0
    assert os.path.exists(result_path)
    out = capsys.readouterr().out
    assert "PSNR score on result" in out


def test_super_resolve_checkpoint_resume(tmp_path, small_image, capsys):
    """--checkpoint saves IRLS state at every iteration seam; --resume
    continues from it (the binary-level interrupt/resume story the API
    already had)."""
    ck = str(tmp_path / "state")
    common = [
        "--data_path", small_image,
        "--generate_lr_images",
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path",
        "/root/reference/test_data/test_motion_sequence_4.txt",
        "--regularization_parameter", "0.005",
        "--solver_iterations", "10",
        "--verbose",
    ]
    rc = super_resolve_main(common + [
        "--optimization_iterations", "2", "--checkpoint", ck,
    ])
    assert rc == 0
    assert os.path.exists(ck + ".npz")
    capsys.readouterr()
    rc = super_resolve_main(common + [
        "--optimization_iterations", "4", "--checkpoint", ck, "--resume",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Resumed IRLS" in out


def test_super_resolve_robust_registration(tmp_path, test_data_dir, capsys):
    # dallas_qtr (250^2): the per-block consensus needs blocks >= 16 px, so
    # the LR frames must be big enough for a 3x3 grid.
    out_dir = str(tmp_path / "lr")
    rc = generate_data_main([
        "--input_image", f"{test_data_dir}/dallas_qtr.jpg",
        "--output_image_dir", out_dir,
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path", f"{test_data_dir}/test_motion_sequence_4.txt",
    ])
    assert rc == 0
    rc = super_resolve_main([
        "--data_path", out_dir,
        "--estimate_motion",
        "--robust_registration",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--interpolate_color",
        "--regularization_parameter", "0",
        "--optimization_iterations", "1",
        "--solver_iterations", "6",
        "--verbose",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Estimated motion" in out


@pytest.mark.parametrize("mesh,ndev", [("band", 3), ("rowcol", 4)])
def test_super_resolve_mesh_flag(tmp_path, small_image, capsys, mesh, ndev):
    """--mesh generalizes --num_devices beyond the frame axis (band and
    spatial row x col meshes were API-only before)."""
    result_path = str(tmp_path / f"mesh_{mesh}.png")
    rc = super_resolve_main([
        "--data_path", small_image,
        "--generate_lr_images",
        "--number_of_frames", "4",
        "--upsampling_scale", "2",
        "--blur_radius", "0",
        "--motion_sequence_path",
        "/root/reference/test_data/test_motion_sequence_4.txt",
        "--regularization_parameter", "0.005",
        "--optimization_iterations", "1",
        "--solver_iterations", "8",
        "--num_devices", str(ndev),
        "--mesh", mesh,
        "--verbose",
        "--result_path", result_path,
    ])
    assert rc == 0
    assert os.path.exists(result_path)
    out = capsys.readouterr().out
    assert "Sharding over" in out
