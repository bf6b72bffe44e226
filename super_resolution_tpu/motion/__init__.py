from super_resolution_tpu.motion.motion_shift import (  # noqa: F401
    MotionShift,
    MotionShiftSequence,
)
from super_resolution_tpu.motion.refinement import (  # noqa: F401
    make_shift_refiner,
    refine_shifts,
)
