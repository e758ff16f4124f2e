"""Checkpoint save/load.

The reference saves a bare state_dict to ckpts/best.pth on mAP improvement
and renames it best_{mAP}.pth at the end (main.py:103-115), with no
optimizer state and no resume. Here a checkpoint carries params + optimizer
state + epoch + rng, enabling true mid-training resume (SURVEY.md §5).

Format: a pickle of host-numpy pytrees — portable across CPU/TPU, no device
or sharding baked in. (Orbax is used for the sharded LLaMA weights, which
are large; recognition checkpoints are a few MB.)
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params,
    opt_state=None,
    epoch: int = 0,
    rng=None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "epoch": epoch,
        "rng": np.asarray(rng) if rng is not None else None,
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic — a crash mid-save never corrupts the ckpt


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_params(path: str):
    return load_checkpoint(path)["params"]
