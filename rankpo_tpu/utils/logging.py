"""Process-aware logging (reference: src/run_contrastive.py:31-38,62-74).

Rank-0 logs at the requested level; replica processes default to WARNING —
the same split the reference gets from ``log_level`` / ``log_level_replica``.
"""

from __future__ import annotations

import logging
import sys

import jax

LOG_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "critical": logging.CRITICAL,
}

_FORMAT = "[%(asctime)s] [%(levelname)s]  %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


def setup_logging(log_level: str = "info", log_level_replica: str = "warning") -> None:
    level_name = log_level if jax.process_index() == 0 else log_level_replica
    level = LOG_LEVELS.get(level_name, logging.INFO)
    logging.basicConfig(
        format=_FORMAT,
        datefmt=_DATEFMT,
        handlers=[logging.StreamHandler(sys.stdout)],
        level=level,
        force=True,
    )
