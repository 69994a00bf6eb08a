#!/usr/bin/env python
"""Launcher shim — the implementation lives in
:mod:`skin_image_analysis_tpu.cli.tone_bias_explain` (installed wheels import it from
there; this file keeps the reference-parity ``python cli/tone_bias_explain.py ...``
invocation working from a repo checkout)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skin_image_analysis_tpu.cli.tone_bias_explain import *  # noqa: E402,F401,F403
from skin_image_analysis_tpu.cli.tone_bias_explain import main  # noqa: E402,F401

if __name__ == "__main__":
    raise SystemExit(main())
