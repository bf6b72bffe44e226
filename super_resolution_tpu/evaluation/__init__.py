from super_resolution_tpu.evaluation.metrics import (  # noqa: F401
    GroundTruthEvaluator,
    PeakSignalToNoiseRatioEvaluator,
    StructuralSimilarityEvaluator,
    psnr,
    ssim,
)
