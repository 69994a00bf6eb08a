"""Serving: AOT export of the inference program (jax.export/StableHLO)."""

from skin_image_analysis_tpu.serve.export import (  # noqa: F401
    build_infer_fn,
    export_model,
    load_exported,
    predict_exported,
)
