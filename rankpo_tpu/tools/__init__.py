from rankpo_tpu.tools.random_negatives import find_random_negatives
from rankpo_tpu.tools.hard_negatives import find_hard_negatives, select_negative_ids
from rankpo_tpu.tools.predictions import generate_predictions
from rankpo_tpu.tools.autotune import autotune_index, default_specs

__all__ = [
    "find_random_negatives",
    "find_hard_negatives",
    "select_negative_ids",
    "generate_predictions",
    "autotune_index",
    "default_specs",
]
