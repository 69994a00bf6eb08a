from skin_image_analysis_tpu.hpo.study import (  # noqa: F401
    MedianPruner,
    RandomSampler,
    Study,
    Trial,
    TrialPruned,
    TrialReplay,
    create_study,
)
from skin_image_analysis_tpu.hpo.tpe import TPESampler  # noqa: F401
from skin_image_analysis_tpu.hpo.space import (  # noqa: F401
    best_hyperparameters,
    create_best_model_config,
    define_isic_model,
)
