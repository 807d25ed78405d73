from rankpo_tpu.losses.contrastive import info_nce_loss, similarity_scores
from rankpo_tpu.losses.rankpo import rankpo_loss, rankpo_batch_loss, sft_loss

__all__ = [
    "info_nce_loss",
    "similarity_scores",
    "rankpo_loss",
    "rankpo_batch_loss",
    "sft_loss",
]
