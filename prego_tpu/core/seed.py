"""Seeding utilities.

The reference seeds python/numpy/torch and flips cuDNN to deterministic
(step_recognition/utils/util.py:26-34). JAX is functionally seeded — all
device randomness flows from explicit jax.random keys — so only host-side
RNGs (python/numpy, used by the window-offset shuffler) need global seeding.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root jax.random key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
