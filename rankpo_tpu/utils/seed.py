"""Seeding helpers (reference: src/utils.py:14-31 set_seed).

JAX is functionally seeded through explicit PRNG keys, so unlike the torch
version there is no global device RNG to set; we seed the host-side ``random``
and ``numpy`` generators (used by collator sampling and mining) and hand out a
root ``jax.random.key`` for everything on-device.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
