from rankpo_tpu.eval.metrics import compute_metrics
from rankpo_tpu.eval.evaluator import evaluate_checkpoint, evaluate_path, get_save_path
from rankpo_tpu.eval.in_training import RetrievalEvalHook, maybe_attach_retrieval_eval

__all__ = [
    "compute_metrics",
    "evaluate_checkpoint",
    "evaluate_path",
    "get_save_path",
    "RetrievalEvalHook",
    "maybe_attach_retrieval_eval",
]
