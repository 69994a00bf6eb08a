"""skin_image_analysis_tpu — a TPU-native skin-lesion analysis framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
reference repo ``jpope8/skin-image-analysis`` (PyTorch/MPS research code):
benign/malignant lesion classification with skin-tone disparate-impact
auditing, hyper-parameter search, explainability, ITA-based tone estimation
and results analysis — redesigned TPU-first:

- compute path: Flax models + jit/pjit over a ``jax.sharding.Mesh`` with
  bfloat16 MXU matmuls/convs and fused device-side preprocessing
  (Pallas kernels in :mod:`skin_image_analysis_tpu.ops`);
- host runtime: threaded native (C++/libjpeg) image decode feeding
  double-buffered device batches (:mod:`skin_image_analysis_tpu.data`);
- metrics: exact-integer fairness math (reference-parity, see
  :mod:`skin_image_analysis_tpu.metrics`) plus on-device vectorized
  reductions and AUC;
- HPO: an ask/tell study engine with median pruning and vmap-parallel
  trial populations (:mod:`skin_image_analysis_tpu.hpo`) replacing the
  reference's MPI-launched Optuna sweep.

Layer map (bottom → top): data → models → ops → parallel → train →
metrics → analysis / hpo / explain → cli.
"""

__version__ = "0.1.0"

from skin_image_analysis_tpu import config as config  # noqa: F401

CLASS_NAMES = ("benign", "malignant")
"""Diagnosis classes; index 1 ('malignant') is the positive class
(reference: tone_bias_test.py:253-267)."""

TONE_VALUES = ("light", "dark")
SEX_VALUES = ("male", "female")
CONTROL_VALUES = ("poor", "rich")
