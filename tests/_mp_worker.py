"""Worker process for the 2-process x 4-device CPU `jax.distributed` dryrun.

Launched by tests/test_multiprocess.py (and scripts/dryrun_multiprocess.py):
each process owns 4 virtual CPU devices and a DIFFERENT process-local batch
shard; the global mesh spans all 8 devices across both processes.  Exercises
the true multi-host path (VERDICT r2 item 4):

  * `shard_batch` -> `jax.make_array_from_process_local_data` assembly of the
    global batch from host-local numpy,
  * `replicate_state` of host-identical params onto the global mesh,
  * one full GAN train step jitted over the 2-process mesh (the gradient
    all-reduce crosses the process boundary),
  * `allgather_rows` merging of uneven per-host validation sweeps.

Prints one JSON line `MPRESULT {...}` on success.
"""

import json
import os
import sys


def main():
    coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "static"

    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.parallel.mesh import allgather_rows, make_mesh, replicate_state, shard_batch
    from vfi_tpu.train.environments import create_training_environment
    from vfi_tpu.utils.config import TrainConfig

    K = T = F = 2
    H = W = 32
    local_B = 4  # -> global batch 8 over the 2-process mesh

    model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=8, Ip=1, disc_window_size=3)
    env = create_training_environment(model, cfg)

    mesh = make_mesh()
    assert mesh.devices.size == 8

    if mode == "dynamic":
        return run_dynamic(pid, nproc, mesh)

    # Process-local shard: DIFFERENT data per process (the loader would hand
    # each host its own videolist shard).
    rng = np.random.RandomState(100 + pid)
    local = rng.uniform(-1, 1, (local_B, K + T + F, H, W, 1)).astype(np.float32)

    # init on host-identical data so params start equal on both processes
    init_rng = np.random.RandomState(0)
    init_batch = init_rng.uniform(-1, 1, (local_B, K + T + F, H, W, 1)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), init_batch, K, T, F)
    state = replicate_state(mesh, state)

    targets = shard_batch(mesh, {"targets": local})["targets"]
    assert targets.shape[0] == local_B * nproc, targets.shape
    state, m = env.train_step(state, K, T, F, targets)
    state, m = env.train_step(state, K, T, F, targets)
    g_loss = float(np.asarray(m["G_loss"]))
    assert np.isfinite(g_loss)

    # Params must remain bitwise identical across processes after the
    # cross-process gradient all-reduce.
    leaf = np.asarray(jax.device_get(jax.tree.leaves(state.g_params)[0]))
    from jax.experimental import multihost_utils

    both = np.asarray(multihost_utils.process_allgather(leaf))
    assert np.array_equal(both[0], both[1]), "params diverged across processes"

    # Uneven per-host val sweep: pid 0 contributes 3 rows, pid 1 contributes 2.
    # One genuine NaN metric element (a constant-clip SSIM can produce one)
    # must SURVIVE the merge — the round-3 fix replaced NaN-sentinel padding
    # with count-based slicing precisely so real NaN rows aren't dropped.
    rows = np.full((3 - pid, T), float(pid), np.float32)
    rows[0, -1] = np.nan
    merged = allgather_rows(rows)
    assert merged.shape == (5, T), merged.shape
    assert sorted(merged[:, 0].tolist()) == [0.0, 0.0, 0.0, 1.0, 1.0]
    assert int(np.isnan(merged[:, -1]).sum()) == 2, merged[:, -1]

    print("MPRESULT " + json.dumps({
        "pid": pid, "G_loss": g_loss, "global_batch": int(targets.shape[0]),
        "devices": jax.device_count(), "ok": True,
    }), flush=True)


def run_dynamic(pid: int, nproc: int, mesh):
    """Dynamic-(K,T,F) curriculum under jax.distributed (VERDICT r3, item 4).

    The pod-scale training configuration combines two subsystems previously
    tested only in isolation: `train_step_dynamic` (one compiled program for
    every sampled length, train/dynamic_env.py) and the multi-process mesh.
    Mirrors cli/train.py:252-270: each process draws (K, T, F) from its own
    `np.random.RandomState(seed)` with the SHARED seed — agreement across
    hosts is by identical-seed construction, and this test asserts it holds
    step by step (plus bitwise param agreement after the cross-process
    gradient all-reduce at every sampled length).
    """
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    from vfi_tpu.models.fill_in import TAIFillInModel
    from vfi_tpu.parallel.mesh import replicate_state, shard_batch
    from vfi_tpu.train.dynamic_env import create_dynamic_environment
    from vfi_tpu.utils.config import TrainConfig

    max_K = max_T = max_F = 3
    H = W = 32
    local_B = 4

    model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=4)
    cfg = TrainConfig(K=max_K, T=max_T, F=max_F, df_dim=8, Ip=1, disc_window_size=3)
    env = create_dynamic_environment(model, cfg)
    assert env is not None

    # Host-identical init; host-DIFFERENT max-length batch shards.
    init_rng = np.random.RandomState(0)
    init_batch = init_rng.uniform(
        -1, 1, (local_B, max_K + max_T + max_F, H, W, 1)).astype(np.float32)
    state = env.init_state(jax.random.PRNGKey(0), init_batch, max_K, max_T, max_F)
    state = replicate_state(mesh, state)

    data_rng = np.random.RandomState(100 + pid)
    local = data_rng.uniform(
        -1, 1, (local_B, max_K + max_T + max_F, H, W, 1)).astype(np.float32)
    targets = shard_batch(mesh, {"targets": local})["targets"]

    ktf_rng = np.random.RandomState(7)  # the shared --seed (cli/train.py:252)
    sampled = []
    for _ in range(3):
        K, T, F = env.sample_ktf(ktf_rng, True)
        sampled.append((K, T, F))
        state, terms = env.train_step_dynamic(state, targets, np.asarray([K, T, F]))
    g_loss = float(np.asarray(terms["G_loss"]))
    assert np.isfinite(g_loss)
    # The 3 draws at maxima (2..3, 1..3, 2..3) must include >= 2 distinct
    # length combinations, or the test degenerates to the static case.
    assert len(set(sampled)) >= 2, sampled

    # Sampled lengths must agree across processes at every step...
    all_sampled = np.asarray(multihost_utils.process_allgather(
        np.asarray(sampled, np.int32)))
    assert np.array_equal(all_sampled[0], all_sampled[1]), all_sampled
    # ...and params must remain bitwise identical after each host consumed a
    # DIFFERENT data shard through the shared dynamic program.
    leaf = np.asarray(jax.device_get(jax.tree.leaves(state.g_params)[0]))
    both = np.asarray(multihost_utils.process_allgather(leaf))
    assert np.array_equal(both[0], both[1]), "params diverged across processes"

    print("MPRESULT " + json.dumps({
        "pid": pid, "G_loss": g_loss, "devices": jax.device_count(),
        "sampled": [list(s) for s in sampled], "ok": True,
    }), flush=True)


if __name__ == "__main__":
    main()
