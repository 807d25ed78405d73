"""Optional Weights & Biases integration (gated — wandb may be absent).

Reference behavior: rank-0 manual ``wandb.init`` with project from
``--wandb_project``, empty string disables (contrastive_trainer.py:71-89,
arguments.py:193-201); eval logs metric tables (evaluate.py:269-274)."""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax

logger = logging.getLogger(__name__)


def maybe_init_wandb(project: str, run_name: str = "auto") -> Optional[Callable]:
    """Returns a log_fn(dict) or None. Only on process 0, only when a project
    is set and wandb is importable."""
    if not project or jax.process_index() != 0:
        return None
    try:
        import wandb
    except ImportError:
        logger.warning("wandb_project=%s set but wandb is not installed", project)
        return None
    wandb.init(project=project, name=None if run_name == "auto" else run_name)
    return wandb.log


def log_metric_bar_chart(metrics: dict, title: str) -> None:
    """Per-checkpoint metric bar chart (reference evaluate.py:269-274:
    wandb.Table over (metric, value) pairs + wandb.plot.bar). No-op when
    wandb is absent or no run is active."""
    try:
        import wandb
    except ImportError:  # pragma: no cover
        return
    if wandb.run is None:
        return
    table = wandb.Table(
        data=[[k, float(v)] for k, v in metrics.items()],
        columns=["metric", "value"],
    )
    wandb.log({f"{title}/chart": wandb.plot.bar(table, "metric", "value",
                                                title=title)})


def maybe_finish_wandb() -> None:
    try:
        import wandb
    except ImportError:
        return
    if wandb.run is not None:
        wandb.finish()
