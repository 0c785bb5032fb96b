from xclip_tpu.evals.lso import LSO_CLASS_TO_IDX, evaluate_lso, merge_step_results  # noqa: F401
from xclip_tpu.evals.zero_shot import (  # noqa: F401
    OpenAIZeroShotClassifier,
    ZeroShotClassifier,
    build_zero_shot_classifier,
)
