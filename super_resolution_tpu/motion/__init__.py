from super_resolution_tpu.motion.motion_shift import (  # noqa: F401
    MotionShift,
    MotionShiftSequence,
)
