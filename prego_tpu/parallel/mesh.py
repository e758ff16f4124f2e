"""Device-mesh helpers.

The reference's distribution story is torchrun + NCCL + fairscale
model-parallel init (llama/generation.py:84-89). TPU-native replacement:
one jax.sharding.Mesh over ICI; weights get NamedSharding annotations and
XLA inserts the collectives (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    axis_shapes: Sequence[Tuple[str, int]], devices: Optional[Sequence] = None
) -> Mesh:
    """Build a mesh, e.g. make_mesh([("dp", 2), ("tp", 4)]).

    An axis size of -1 absorbs the remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = [n for n, _ in axis_shapes]
    sizes = [s for _, s in axis_shapes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(names))


def tp_mesh(tp: Optional[int] = None) -> Mesh:
    """A pure tensor-parallel mesh over all (or tp) devices."""
    devices = jax.devices()
    tp = tp or len(devices)
    return make_mesh([("tp", tp)], devices)


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))
