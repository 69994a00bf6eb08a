from skin_image_analysis_tpu.ops.pallas.preprocess_kernel import (  # noqa: F401
    fused_preprocess_planar,
)
