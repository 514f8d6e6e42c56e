"""Checkpointing with the reference's latest/numbered/best layout.

Reference semantics (environments.py:178-219, train.py:137-169):
  * ``model_latest.ckpt`` + ``model_%08d.ckpt`` every save_latest_freq
  * ``model_best.ckpt`` on best validation SSIM
  * snapshots hold generator + optimizer + discriminator (+ its optimizer)
    + {updates, sum_avg_psnr_err, sum_avg_ssim_err}
  * auto-resume from model_latest.ckpt at environment creation

Orbax writes each snapshot as a directory; the ``.ckpt`` names are kept so the
CLI surface matches the reference.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def _checkpointer() -> ocp.Checkpointer:
    """A PyTree checkpointer whose barriers are scoped to THIS process.

    Snapshots are host-local by design: payloads are device_get numpy, the
    training CLI saves from the main process only and broadcasts the resume
    decision/state explicitly (cli/train.py).  The default orbax Checkpointer
    barriers across ALL processes inside save() — a main-only save would then
    desync the workers (observed: 'Checkpointer:save_start' name mismatch
    against the validation allgather in the 2-process CLI test).
    """
    if jax.process_count() > 1:
        me = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me},
                barrier_sync_key_prefix=f"proc{me}",
            ),
        )
    return ocp.PyTreeCheckpointer()


def save_snapshot(save_dir: str, name: str, state: Any, counters: dict) -> None:
    """Save a training-state pytree + scalar counters under ``save_dir/name``.

    The state is flattened to a plain nested dict (flax state-dict form) so
    restoration does not depend on custom pytree node types being identical.
    """
    import flax.serialization

    os.makedirs(save_dir, exist_ok=True)
    path = _abs(os.path.join(save_dir, name))
    payload = {
        "state": flax.serialization.to_state_dict(jax.device_get(state)),
        "counters": {k: np.asarray(v) for k, v in counters.items()},
    }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)


def load_snapshot(save_dir: str, name: str, state_template: Any) -> tuple[Any, dict]:
    """Restore (state, counters); ``state_template`` supplies the structure."""
    import flax.serialization

    path = _abs(os.path.join(save_dir, name))
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no snapshot at {path}")
    ckptr = _checkpointer()
    payload = ckptr.restore(path)
    state = flax.serialization.from_state_dict(jax.device_get(state_template), payload["state"])
    return state, payload["counters"]


def has_snapshot(save_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(save_dir, name))
