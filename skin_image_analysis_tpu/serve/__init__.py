"""Serving: AOT export of the inference program (jax.export/StableHLO)
+ the online HTTP server with bucketed dynamic batching."""

from skin_image_analysis_tpu.serve.export import (  # noqa: F401
    build_infer_fn,
    build_infer_fn_weights_arg,
    export_model,
    load_exported,
    predict_exported,
)
from skin_image_analysis_tpu.serve.quantize import (  # noqa: F401
    build_infer_fn_quantized,
    quantization_report,
    quantize_model,
    quantized_forward,
)
from skin_image_analysis_tpu.serve.server import (  # noqa: F401
    DynamicBatcher,
    InferenceSession,
    make_http_server,
    serve_http,
)
