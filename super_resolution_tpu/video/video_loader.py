"""Video frame loading (equivalent of ``src/video/video_loader.{h,cpp}``).

Supports frame extraction from video files (cv2.VideoCapture) and from image
directories (the only path the reference actually exercises,
``shift_add_fusion.cpp:37-38``). Frames come back as a ``[K, C, H, W]`` float
stack ready for the fusion/solver pipelines.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

__all__ = ["VideoLoader"]


class VideoLoader:
    def __init__(self):
        self._frames: list[np.ndarray] = []  # HWC float64 in [0, 1]

    def load_frames_from_video(self, video_path: str, max_frames: int = 0) -> None:
        capture = cv2.VideoCapture(video_path)
        if not capture.isOpened():
            raise FileNotFoundError(f"Could not open video {video_path}")
        self._frames = []
        while True:
            ok, frame = capture.read()
            if not ok:
                break
            self._frames.append(frame.astype(np.float64) / 255.0)
            if max_frames and len(self._frames) >= max_frames:
                break
        capture.release()

    def load_frames_from_directory(self, directory: str) -> None:
        from super_resolution_tpu.utils.data_loader import load_images

        images = [np.moveaxis(np.asarray(img.hidden_array), 0, -1)
                  for img in load_images(directory)]
        self._frames = images

    @property
    def num_frames(self) -> int:
        return len(self._frames)

    @property
    def image_size(self) -> tuple[int, int]:
        """(width, height) of the frames."""
        if not self._frames:
            return (0, 0)
        h, w = self._frames[0].shape[:2]
        return (w, h)

    def get_frames(self) -> list[np.ndarray]:
        return list(self._frames)

    def frame_stack(self) -> np.ndarray:
        """``[K, C, H, W]`` float stack."""
        if not self._frames:
            return np.zeros((0, 0, 0, 0))
        return np.stack([np.moveaxis(f, -1, 0) if f.ndim == 3 else f[None]
                         for f in self._frames])
