"""Device mesh construction and canonical shardings (component T16).

Axes:
- ``data``: independent image pairs / frames (DP; BASELINE config 2/5).
- ``bank``: descriptor-bank / map-block shards (TP/SP analog; config 5's
  10k+ keyframe banks ride this axis, rotating via ppermute — the
  ring-attention pattern with a running top-2 instead of softmax state).

On a pod slice the mesh should be built so ``bank`` maps to ICI neighbors;
cross-host DCN traffic only carries the small psum/all_gather reductions
(distributed BA separator blocks, pose-graph sync).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_bank: int | None = None, devices=None) -> Mesh:
    """Build a (data, bank) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_bank is None:
        n_bank = n // n_data
    if n_data * n_bank != n:
        raise ValueError(f"mesh {n_data}x{n_bank} != {n} devices")
    arr = np.array(devices).reshape(n_data, n_bank)
    return Mesh(arr, ("data", "bank"))


def bank_sharding(mesh: Mesh) -> NamedSharding:
    """Descriptor banks / map blocks: rows sharded over ``bank``."""
    return NamedSharding(mesh, P("bank"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over ``data`` (independent pairs)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
