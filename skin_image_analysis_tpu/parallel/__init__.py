from skin_image_analysis_tpu.parallel.mesh import create_mesh  # noqa: F401
from skin_image_analysis_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    infer_param_shardings,
    replicated,
)
