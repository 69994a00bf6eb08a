"""Reference-parity command surface.

The implementations live in :mod:`skin_image_analysis_tpu.cli` (the
installable package — a generic top-level ``cli`` package would collide
with other distributions); the modules here are thin launcher shims so
``python cli/tone_bias_train.py tone 20 balance`` keeps working from a
checkout and ``from cli import tone_bias_train`` keeps resolving.
"""
