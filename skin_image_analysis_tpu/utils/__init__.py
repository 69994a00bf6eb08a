from skin_image_analysis_tpu.utils import jsonl as jsonl  # noqa: F401
from skin_image_analysis_tpu.utils import rng as rng  # noqa: F401
