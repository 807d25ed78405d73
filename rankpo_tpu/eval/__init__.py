from rankpo_tpu.eval.metrics import compute_metrics
from rankpo_tpu.eval.evaluator import evaluate_checkpoint, evaluate_path, get_save_path

__all__ = ["compute_metrics", "evaluate_checkpoint", "evaluate_path", "get_save_path"]
