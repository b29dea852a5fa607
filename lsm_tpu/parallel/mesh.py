"""Device mesh and sharding helpers.

The workload's parallelism (SURVEY.md section 2.4): data parallelism over
utterances is the primary axis; model parallelism over reservoir neurons is
available for scaled (10k+) reservoirs. Collectives ride ICI via XLA
(psum/all_gather under shard_map) — the TPU-native equivalent of the NCCL
role in GPU stacks.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def auto_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """The production default mesh: all devices on the data axis.

    Returns None on a single device (the single-chip jit path needs no
    mesh). The pipeline calls this so that `python main.py` on a v5e-8
    shards every stage across the slice without any flags — the reference
    is a serial one-process loop (extract_lsm_features.py:78), this is the
    SURVEY.md section 2.4a data-parallel replacement.
    """
    n = jax.device_count()
    if n < min_devices:
        return None
    return make_mesh(n_data=n, n_model=1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad `axis` up to a multiple (so shards are equal); returns (padded, n_real)."""
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad), n


def shard_batch(x: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a host batch onto the mesh, sharded along the data axis."""
    return jax.device_put(x, batch_sharding(mesh))
