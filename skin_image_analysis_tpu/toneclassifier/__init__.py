from skin_image_analysis_tpu.toneclassifier.class_weight import (  # noqa: F401
    balanced_class_weights,
    count_small_images,
)
from skin_image_analysis_tpu.toneclassifier.split import split_metadata_csv  # noqa: F401
from skin_image_analysis_tpu.toneclassifier.classical import (  # noqa: F401
    ModalItaClassifier,
)
