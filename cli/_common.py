"""Compatibility shim — see :mod:`skin_image_analysis_tpu.cli._common`."""

from skin_image_analysis_tpu.cli._common import *  # noqa: F401,F403
from skin_image_analysis_tpu.cli._common import parse  # noqa: F401
from skin_image_analysis_tpu.cli._common import init_runtime  # noqa: F401
