"""Mesh construction & frame sharding helpers."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_frame_batch"]


def make_mesh(data: int = 1, spatial: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'spatial') mesh over the available devices.

    data    — frame-batch parallelism (independent frames)
    spatial — row-parallelism within one frame (halo exchange over ICI)
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spatial is None:
        spatial = n // data
    assert data * spatial == n, (data, spatial, n)
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def shard_frame_batch(mesh: Mesh, batch):
    """Place a (B, C, H, W) frame batch with B over 'data' and H over
    'spatial'."""
    sharding = NamedSharding(mesh, P("data", None, "spatial", None))
    return jax.device_put(batch, sharding)
