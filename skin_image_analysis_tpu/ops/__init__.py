from skin_image_analysis_tpu.ops.losses import nll_loss  # noqa: F401
