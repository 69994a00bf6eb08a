"""Migration from the reference framework (jpope8/skin-image-analysis).

- :mod:`.torch_pickle` — safe, torch-free reader for torch ``.pth``
  zipfile checkpoints (stub unpickler: no imports, no code execution);
- :mod:`.reference` — convert the reference's whole-module
  ``session_model.pth`` pickles (tone_bias_model.py:305-316) and entire
  experiment folders into this framework's artifacts;
- :mod:`.keras_model` — convert the reference TF pipeline's saved
  ``skin_cancer_xception_model.keras`` (jgi_ham_2018_tf.ipynb cell 75)
  into the same artifacts.
"""

from skin_image_analysis_tpu.migrate.keras_model import (
    KerasImportError,
    import_keras_experiment,
    import_keras_model,
)
from skin_image_analysis_tpu.migrate.reference import (
    import_reference_experiment,
    import_reference_model,
)
from skin_image_analysis_tpu.migrate.torch_pickle import (
    TorchPickleError,
    load_pth,
    named_modules,
    named_tensors,
)

__all__ = [
    "KerasImportError",
    "TorchPickleError",
    "import_keras_experiment",
    "import_keras_model",
    "import_reference_experiment",
    "import_reference_model",
    "load_pth",
    "named_modules",
    "named_tensors",
]
