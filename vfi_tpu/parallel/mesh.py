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
    """Device-put a host batch with its leading axis sharded over "data"."""
    return jax.tree.map(lambda a: jax.device_put(a, batch_sharding(mesh)), batch)


def replicate_state(mesh: Mesh, state):
    return jax.tree.map(lambda a: jax.device_put(a, replicated(mesh)), state)
