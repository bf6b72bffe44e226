"""Display utilities: headless PNG fallback + the drag-to-zoom interaction
state machine (``visualization.cpp:58-136``), driven without a display via
an injected render callback."""

import os

import cv2
import numpy as np
import pytest

from super_resolution_tpu.utils.visualization import (
    ZoomInteraction,
    display_image,
    display_images_side_by_side,
)


def _image(h=100, w=200):
    rng = np.random.default_rng(0)
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


@pytest.fixture
def shown():
    """Collects every frame the interaction renders."""
    return []


def _interaction(shown, h=100, w=200):
    return ZoomInteraction(_image(h, w), shown.append)


def test_drag_draws_selection_rectangle(shown):
    z = _interaction(shown)
    z.on_mouse(cv2.EVENT_LBUTTONDOWN, 10, 10, cv2.EVENT_FLAG_LBUTTON)
    assert z.dragging
    z.on_mouse(cv2.EVENT_MOUSEMOVE, 40, 30, cv2.EVENT_FLAG_LBUTTON)
    # The overlay is the original image plus a yellow rectangle.
    overlay = shown[-1]
    assert overlay.shape == z.image.shape
    assert not np.array_equal(overlay, z.image)
    assert tuple(overlay[10, 20]) == (0, 255, 255)  # top edge pixel


def test_release_zooms_to_selection(shown):
    z = _interaction(shown)
    z.on_mouse(cv2.EVENT_LBUTTONDOWN, 60, 40, cv2.EVENT_FLAG_LBUTTON)
    z.on_mouse(cv2.EVENT_LBUTTONUP, 10, 20, cv2.EVENT_FLAG_LBUTTON)
    assert z.zoomed and not z.dragging
    crop = shown[-1]
    # Selection is 50x20 (corners given in either order); rescaled to fit
    # the 1250x850 display bounds => scale = min(1250/50, 850/20) = 25.
    assert crop.shape[:2] == (20 * 25, 50 * 25)


def test_right_click_zooms_out(shown):
    z = _interaction(shown)
    z.on_mouse(cv2.EVENT_LBUTTONDOWN, 0, 0, cv2.EVENT_FLAG_LBUTTON)
    z.on_mouse(cv2.EVENT_LBUTTONUP, 50, 50, cv2.EVENT_FLAG_LBUTTON)
    assert z.zoomed
    z.on_mouse(cv2.EVENT_RBUTTONDOWN, 5, 5)
    assert not z.zoomed
    assert np.array_equal(shown[-1], z.image)


def test_interrupted_drag_cancels(shown):
    z = _interaction(shown)
    z.on_mouse(cv2.EVENT_LBUTTONDOWN, 10, 10, cv2.EVENT_FLAG_LBUTTON)
    # Mouse moves with the button no longer held (left the window).
    z.on_mouse(cv2.EVENT_MOUSEMOVE, 50, 50, 0)
    assert not z.dragging and not z.zoomed
    assert np.array_equal(shown[-1], z.image)


def test_zero_area_selection_is_ignored(shown):
    z = _interaction(shown)
    z.on_mouse(cv2.EVENT_LBUTTONDOWN, 10, 10, cv2.EVENT_FLAG_LBUTTON)
    z.on_mouse(cv2.EVENT_LBUTTONUP, 10, 10, cv2.EVENT_FLAG_LBUTTON)
    assert not z.zoomed and not z.dragging


def test_headless_fallback_writes_png(tmp_path, monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)
    path = display_image(_image(), title="Test Image")
    assert path is not None and os.path.exists(path)
    saved = cv2.imread(path)
    assert saved.shape == (100, 200, 3)


def test_side_by_side_headless(tmp_path, monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)
    a = _image(50, 60)
    b = _image(80, 40)
    path = display_images_side_by_side([a, b], title="Pair")
    assert path is not None
    saved = cv2.imread(path)
    assert saved.shape == (80, 100, 3)  # padded to tallest, widths summed
