"""Device mesh + sharding utilities.

The reference is single-process single-GPU (`model.cuda()`, util.py:188-190).
Here parallelism is mesh-native from the start (SURVEY.md §2.5):

  * axis "data"  — batch sharding; gradients all-reduce over ICI.
  * axis "model" — reserved for tensor sharding of larger variants; size 1 by
    default so every sharding rule below degenerates gracefully.

Everything is expressed with NamedSharding; XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Sequence[int]] = None, devices=None) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size, 1)
    elif len(shape) == 1:
        shape = (shape[0], 1)
    return Mesh(devices.reshape(shape), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with its leading axis sharded over "data".

    Single-process: a plain device_put against the mesh-wide sharding.
    Multi-process (``jax.process_count() > 1``): each process holds only its
    LOCAL slice of the global batch (the loader shards the videolist per
    host, data/datasets.py), so the global array must be assembled with
    ``jax.make_array_from_process_local_data`` — device_put of local numpy
    against a global NamedSharding would mis-shard (round-2 VERDICT finding).
    The global batch size is ``local_batch * process_count``.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
            batch,
        )
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def allgather_rows(rows: np.ndarray) -> np.ndarray:
    """Concatenate per-process result rows into the identical global array on
    every process (used to merge host-sharded validation sweeps).

    Row counts may differ per process (videolist shards are uneven), so each
    local array is zero-padded to the global max row count before the gather
    and sliced back to the true per-process counts afterwards (count-based,
    NOT sentinel-based: a sentinel filter would silently drop genuine NaN
    metric rows and could crown a bad model_best).  No-op in single-process
    runs.
    """
    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils

    rows = np.asarray(rows, np.float32)
    counts = np.asarray(multihost_utils.process_allgather(np.asarray(rows.shape[0])))
    n_max = int(counts.max())
    padded = np.zeros((n_max,) + rows.shape[1:], np.float32)
    padded[: rows.shape[0]] = rows
    gathered = np.asarray(multihost_utils.process_allgather(padded))  # [P, n_max, ...]
    return np.concatenate([gathered[p, : int(c)] for p, c in enumerate(counts)])


def replicate_state(mesh: Mesh, state):
    """Replicate a (host-identical) state pytree onto every mesh device.

    Multi-process: device_put cannot target non-addressable devices, so the
    global replicated array is assembled from the host-local copy (which IS
    the full value under a fully-replicated sharding).
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
            state,
        )
    return jax.tree.map(lambda a: jax.device_put(a, sharding), state)
