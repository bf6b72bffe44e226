from super_resolution_tpu.video.video_loader import VideoLoader  # noqa: F401
from super_resolution_tpu.video.super_resolver import VideoSuperResolver  # noqa: F401
