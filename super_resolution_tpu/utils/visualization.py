"""Image display utilities (equivalent of ``src/util/visualization.{h,cpp}``).

The reference offers an interactive OpenCV window with drag-to-zoom
(``visualization.cpp:58-136``); in headless environments (the norm for TPU
hosts) display falls back to writing PNG files and reporting their paths.
"""

from __future__ import annotations

import os
import tempfile

import cv2
import numpy as np

__all__ = ["display_image", "display_images_side_by_side"]

_MAX_DISPLAY_W = 1250
_MAX_DISPLAY_H = 850


def _fit(image: np.ndarray) -> np.ndarray:
    h, w = image.shape[:2]
    scale = min(_MAX_DISPLAY_W / w, _MAX_DISPLAY_H / h, 1.0)
    if scale < 1.0:
        image = cv2.resize(image, (int(w * scale), int(h * scale)))
    return image


def _vis(image) -> np.ndarray:
    if hasattr(image, "visualization_image"):
        return image.visualization_image()
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return arr


def _has_display() -> bool:
    return bool(os.environ.get("DISPLAY"))


def _show_or_save(image: np.ndarray, title: str) -> str | None:
    if _has_display():
        try:
            cv2.imshow(title, image)
            cv2.waitKey(0)
            return None
        except cv2.error:
            pass
    path = os.path.join(
        tempfile.gettempdir(), f"{title.lower().replace(' ', '_').replace('.', '')}.png"
    )
    cv2.imwrite(path, image)
    print(f"[headless] saved '{title}' to {path}")
    return path


def display_image(image, title: str = "Image") -> str | None:
    return _show_or_save(_fit(_vis(image)), title)


def display_images_side_by_side(images, title: str = "Images") -> str | None:
    """Horizontal stitch (``visualization.cpp:138-169``); smaller images are
    padded to the tallest height."""
    mats = [_vis(img) for img in images]
    max_h = max(m.shape[0] for m in mats)
    padded = []
    for m in mats:
        if m.ndim == 2:
            m = cv2.cvtColor(m, cv2.COLOR_GRAY2BGR)
        pad = max_h - m.shape[0]
        if pad:
            m = cv2.copyMakeBorder(m, 0, pad, 0, 0, cv2.BORDER_CONSTANT, value=0)
        padded.append(m)
    stitched = np.concatenate(padded, axis=1)
    return _show_or_save(_fit(stitched), title)
