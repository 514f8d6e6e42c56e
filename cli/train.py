#!/usr/bin/env python
"""Training driver — the reference train.py CLI, TPU-native.

Usage matches the reference (train.py:19-212), with @argfile composition:

    python cli/train.py @exp_args/default_args/KTH/train.txt @exp_args/extra_args/KTH/bi-TAI.txt

Differences from the reference, by design:
  * The train step is one jitted program per static (K, T, F) shape, sharded
    over the device mesh ("data" axis); no .cuda() anywhere.
  * Validation metrics (PSNR/SSIM/L2) are computed batched on device instead
    of per-frame skimage loops.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()

from vfi_tpu.data.datasets import ContiguousVideoClipDataset, batch_iterator
from vfi_tpu.models.registry import create_model
from vfi_tpu.parallel.mesh import allgather_rows, make_mesh, replicate_state, shard_batch
from vfi_tpu.train.environments import create_training_environment
from vfi_tpu.utils import checkpoint as ckpt
from vfi_tpu.utils.config import TrainConfig, build_train_parser, listopt, parse_args
from vfi_tpu.utils.visuals import draw_err_plot, visual_grid


def make_writer(log_dir):
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir=log_dir)
    except ImportError:  # pragma: no cover
        return None


def visualize_predictions(env, g_params, ds, K, T, F, batch_size):
    """Prediction grid over the first vis batch, context frames bordered green
    and generated middle frames red (reference visualize_predictions +
    visual_grid, train.py / util.py:117-155).  ``g_params`` must be host-local
    (or fully addressable) — multi-process callers pass a device_get copy."""
    from vfi_tpu.data.datasets import batch_iterator as _bi

    batch = next(_bi(ds, min(batch_size, len(ds)), False, False))
    seq = batch["targets"]
    out = env.forward_test(g_params, T, seq[:, :K], seq[:, K + T :])
    vis = {
        "pred_vis_seq": np.concatenate([seq[:, :K], np.asarray(out["pred"]), seq[:, K + T :]], axis=1),
        "target_vis_seq": seq,
    }
    return visual_grid(vis, K, T)


def compute_errors(env, state, loader, K, T, F, mesh=None):
    """Validation sweep: batched on-device PSNR/SSIM/L2 curves
    (replaces train.py:237-287).

    Single-process: full batches shard over the data mesh.  Multi-process:
    the caller hands each host its own videolist shard, metrics run on the
    host's local devices, and the per-video curves are merged across hosts
    with ``allgather_rows`` so every process sees the identical global sweep.
    """
    multiproc = jax.process_count() > 1
    # Multi-process: each host evaluates its own shard with host-DIFFERENT
    # data (and possibly a different last-batch shape), so the eval program
    # must be host-local.  Passing the mesh-wide replicated g_params into it
    # would globalize the jit and silently assume every host feeds identical
    # targets; device_get is legal (fully replicated) and keeps it local.
    g_params = jax.device_get(state.g_params) if multiproc else state.g_params
    psnrs, ssims, l2s = [], [], []
    for batch in loader:
        targets = batch["targets"]
        if (not multiproc and mesh is not None and mesh.devices.size > 1
                and len(targets) % mesh.devices.size == 0):
            targets = shard_batch(mesh, {"targets": targets})["targets"]
        m = env.eval_metrics(g_params, K, T, F, targets)
        psnrs.append(np.asarray(m["psnr"]))
        ssims.append(np.asarray(m["ssim"]))
        l2s.append(np.asarray(m["l2"]))
    # A host's videolist shard can be empty (fewer val videos than processes):
    # contribute a 0-row curve so the allgather below still runs on every
    # process instead of one host crashing while the rest block in the
    # collective.
    out = tuple(
        np.concatenate(x) if x else np.zeros((0, T), np.float32)
        for x in (psnrs, ssims, l2s)
    )
    if multiproc:
        out = tuple(allgather_rows(a) for a in out)
    return out


def main(argv=None):
    opt = parse_args(build_train_parser(), argv)

    # Multi-host: initialize the process group when launched under a
    # multi-process TPU runtime (SURVEY.md §5.8 — the TPU-native replacement
    # for NCCL/MPI init; XLA collectives ride ICI/DCN from the shardings).
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        # jax honors JAX_COORDINATOR_ADDRESS itself but has no env fallback
        # for the process count/id (only cluster auto-detection, which covers
        # real TPU pods); accept JAX_NUM_PROCESSES / JAX_PROCESS_ID so plain
        # `env ... python cli/train.py` launchers (and the 2-process CPU test)
        # work too.
        _np, _pid = os.environ.get("JAX_NUM_PROCESSES"), os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(_np) if _np else None,
            process_id=int(_pid) if _pid else None,
        )
    is_main = jax.process_index() == 0

    expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
    tb_dir = os.path.join(opt.tensorboard_dir, opt.name)
    writer = None
    if is_main:
        os.makedirs(expr_dir, exist_ok=True)
        os.makedirs(tb_dir, exist_ok=True)
        listopt(opt)
        with open(os.path.join(expr_dir, "train_opt.txt"), "w") as f:
            listopt(opt, f)
        writer = make_writer(tb_dir)
    if writer:
        # options as a markdown table (reference train.py:34 / util.py:264-274)
        rows = "\n".join(f"{k} | {v}" for k, v in sorted(vars(opt).items()))
        writer.add_text("args", "Key | Value\n--- | ---\n" + rows)

    if opt.log_json and is_main:
        import json as _json

        _log_fh = open(opt.log_json, "a", buffering=1)

        def log_json(**event):
            _log_fh.write(_json.dumps({"time": time.time(), **event}) + "\n")
    else:
        def log_json(**event):
            pass

    mesh = make_mesh(opt.mesh_shape)
    if is_main:
        print(f"devices: {jax.device_count()} mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    seq_len = opt.K + opt.T + opt.F
    train_ds = ContiguousVideoClipDataset(
        opt.c_dim, opt.train_video_list_path, seq_len, not opt.no_backwards, not opt.no_flip,
        opt.image_size, True, opt.padding_size, opt.data_root,
        emit_uint8=opt.device_normalize,
    )
    from vfi_tpu.data.prefetch import Prefetcher

    train_iter = Prefetcher(
        batch_iterator(
            train_ds, opt.batch_size, not opt.serial_batches, True,
            seed=opt.seed, loop=True,
            num_shards=jax.process_count(), shard_index=jax.process_index(),
            num_workers=opt.num_threads,
        ),
        depth=2,
    )
    if is_main:
        print(f"# training videos = {len(train_ds)}")

    def val_loader(path, t_mid, k, f):
        if path is None:
            return None
        ds = ContiguousVideoClipDataset(opt.c_dim, path, k + t_mid + f, False, False,
                                        opt.image_size, False, opt.padding_size, opt.data_root)
        return ds

    val_sets = {
        "val": (val_loader(opt.val_video_list_path, opt.T, opt.K, opt.F), opt.K, opt.T, opt.F),
        "val_alt_T": (val_loader(opt.val_video_list_alt_T_path, opt.alt_T, opt.K, opt.F), opt.K, opt.alt_T, opt.F),
        "val_alt_K_F": (val_loader(opt.val_video_list_alt_K_F_path, opt.T, opt.alt_K, opt.alt_F),
                        opt.alt_K, opt.T, opt.alt_F),
    }
    # Visualization sets: TB image grids of predictions at each validation
    # sweep (reference train.py:67-89,155-160 — samples/T=..., samples/K=_F=...).
    vis_sets = {
        "val": val_loader(opt.vis_video_list_path, opt.T, opt.K, opt.F),
        "val_alt_T": val_loader(opt.vis_video_list_alt_T_path, opt.alt_T, opt.K, opt.F),
        "val_alt_K_F": val_loader(opt.vis_video_list_alt_K_F_path, opt.T, opt.alt_K, opt.alt_F),
    }

    model = create_model(opt.model_key)
    if opt.remat and hasattr(model, "remat"):
        model = model.clone(remat=True)
    cfg = TrainConfig.from_opt(opt)
    env = create_training_environment(model, cfg)

    # With --sample_KTF, prefer the single-compilation dynamic step: the
    # static path would compile one program per sampled (K, T, F) combination.
    dyn_env = None
    if opt.sample_KTF:
        from vfi_tpu.train.dynamic_env import create_dynamic_environment

        dyn_env = create_dynamic_environment(model, cfg)
        if dyn_env is None:
            print("warning: no dynamic-KTF path for this model; sampled lengths will "
                  "compile one program per combination")
        else:
            env = dyn_env  # superset: adds train_step_dynamic to the static env

    if opt.device_normalize:
        from vfi_tpu.ops.image import frames_from_uint8

        to_frames = jax.jit(lambda u8: frames_from_uint8(u8, opt.c_dim))
    else:
        to_frames = None

    def prep_targets(host_targets):
        dev = shard_batch(mesh, {"targets": host_targets})["targets"]
        return to_frames(dev) if to_frames is not None else dev

    sample = next(train_iter)

    # --device_cache: upload N batches once and cycle through them, removing
    # the per-iteration H2D that dominates the loop on upload-constrained
    # links (the dev tunnel is ~20x too slow to feed the 157 ms/step rate).
    # Batches stay in the dataset's wire format (uint8 under
    # --device_normalize), so the per-step normalize/cast work is unchanged.
    dev_cache, host_cache = None, None
    if opt.device_cache:
        # Draw from the iterator exactly like the streamed loop does (the
        # init `sample` above is consumed either way), so a cache covering a
        # whole deterministic epoch reproduces the streamed batch sequence.
        # Normalize ONCE at build time: over high-latency links the loop is
        # bound by program-launch RPCs, so the per-iter slice+normalize
        # launches are hoisted here (uint8 crosses the wire; the float
        # conversion runs on device).
        host_cache = [next(train_iter) for _ in range(opt.device_cache)]
        dev_cache = [prep_targets(np.asarray(b["targets"])) for b in host_cache]
        if is_main:
            mb = sum(b.nbytes for b in dev_cache) / 1e6 / max(1, jax.device_count())
            print(f"device cache: {len(dev_cache)} batches resident (~{mb:.0f} MB/device)")
    # Init from the HOST-LOCAL sample: params are batch-size-independent, and
    # device_get of a data-sharded global array is illegal under
    # process_count > 1 (spans non-addressable devices).
    sample_targets = np.asarray(sample["targets"])
    if to_frames is not None:
        sample_targets = np.asarray(to_frames(sample_targets))
    state = env.init_state(jax.random.PRNGKey(opt.seed), sample_targets, opt.K, opt.T, opt.F)
    n_params = sum(x.size for x in jax.tree.leaves(state.g_params))
    if is_main:
        print(f"# generator params = {n_params/1e6:.2f}M")

    total_updates = 0
    best_sum_psnr, best_sum_ssim = 0.0, 0.0
    multiproc = jax.process_count() > 1
    local_has = ckpt.has_snapshot(expr_dir, "model_latest.ckpt")
    resume = local_has
    if multiproc:
        # Host 0's checkpoint decides for everyone: on non-shared filesystems
        # only some hosts see the file, and divergent total_updates would make
        # the hosts run different numbers of jitted steps (deadlock at the
        # first collective after one host exits the loop).
        from jax.experimental import multihost_utils

        resume = bool(multihost_utils.broadcast_one_to_all(np.asarray(local_has)))
    if resume:
        if local_has:
            print("Loading latest snapshot...")
            state, counters = ckpt.load_snapshot(expr_dir, "model_latest.ckpt", state)
        else:  # pragma: no cover - multi-host without shared fs
            counters = {"updates": 0, "sum_avg_psnr_err": 0.0, "sum_avg_ssim_err": 0.0}
        if multiproc:
            state = multihost_utils.broadcast_one_to_all(state)
            counters = jax.tree.map(
                lambda v: multihost_utils.broadcast_one_to_all(np.asarray(v)), dict(counters)
            )
        total_updates = int(counters["updates"])
        best_sum_psnr = float(counters["sum_avg_psnr_err"])
        best_sum_ssim = float(counters["sum_avg_ssim_err"])
        log_json(event="resume", iter=total_updates,
                 sum_psnr=best_sum_psnr, sum_ssim=best_sum_ssim)
    state = replicate_state(mesh, state)

    rng = np.random.RandomState(opt.seed)
    import random as _random

    _random.seed(opt.seed)  # dataset temporal-crop/flip augmentation RNG
    t_start = time.time()
    while total_updates < opt.max_iter:
        if opt.profile_steps is not None:
            # SURVEY.md §5.1: tracing subsystem — capture an XLA trace window.
            if total_updates + 1 == opt.profile_steps[0]:
                jax.profiler.start_trace(opt.profile_dir)
            elif total_updates + 1 == opt.profile_steps[1]:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {opt.profile_dir}")

        if dev_cache is not None:
            ci = total_updates % len(dev_cache)
            batch = host_cache[ci]  # host copy feeds only the TB vis grid
            cached = dev_cache[ci]
        else:
            batch = next(train_iter)
            cached = None
        K, T, F = env.sample_ktf(rng, opt.sample_KTF)
        if dyn_env is not None:
            targets = cached if cached is not None else prep_targets(batch["targets"])
            state, errors = dyn_env.train_step_dynamic(state, targets, np.asarray([K, T, F]))
        else:
            if cached is not None:
                # cache entries are already sharded+normalized; skip the slice
                # launch when the static lengths consume the whole sequence
                targets = cached if cached.shape[1] == K + T + F else cached[:, : K + T + F]
            else:
                targets = prep_targets(batch["targets"][:, : K + T + F])
            state, errors = env.train_step(state, K, T, F, targets)
        total_updates += 1

        if total_updates % opt.print_freq == 0:
            errors = jax.device_get(errors)
            dt = (time.time() - t_start) / opt.print_freq
            t_start = time.time()
            msg = " ".join(f"{k}: {float(v):.4f}" for k, v in sorted(errors.items()))
            if is_main:
                print(f"iter {total_updates} ({dt*1000:.0f} ms/it) {msg}")
            log_json(event="iter", iter=total_updates, ms_per_it=dt * 1000,
                     **{k: float(v) for k, v in errors.items()})
            if writer:
                for k, v in errors.items():
                    writer.add_scalar(f"loss/{k}", float(v), total_updates)
                writer.add_scalar("time_per_item", dt, total_updates)
                seq = batch["targets"][:, : K + T + F]
                if opt.device_normalize:
                    seq = np.asarray(jax.device_get(to_frames(jax.numpy.asarray(seq))))
                # Multi-process: only main reaches this block, so run the vis
                # forward on HOST-LOCAL params (g_params is fully replicated,
                # so device_get is legal) — dispatching the mesh-wide program
                # from one controller would desync the other processes.
                g_vis = jax.device_get(state.g_params) if multiproc else state.g_params
                out = env.forward_test(g_vis, T, seq[:, :K], seq[:, K + T :])
                vis = {
                    "pred_vis_seq": np.concatenate(
                        [seq[:, :K], np.asarray(out["pred"]), seq[:, K + T :]], axis=1
                    ),
                    "target_vis_seq": seq,
                }
                grid = visual_grid(vis, K, T)
                writer.add_image("train_vis", grid.transpose(2, 0, 1), total_updates)

        if total_updates % opt.save_latest_freq == 0 and is_main:
            counters = {
                "updates": total_updates,
                "sum_avg_psnr_err": best_sum_psnr,
                "sum_avg_ssim_err": best_sum_ssim,
            }
            t_save = time.time()
            ckpt.save_snapshot(expr_dir, "model_latest.ckpt", state, counters)
            ckpt.save_snapshot(expr_dir, f"model_{total_updates:08d}.ckpt", state, counters)
            log_json(event="save", iter=total_updates, seconds=time.time() - t_save)
            t_start += time.time() - t_save  # keep ms/it a step-time series

        if total_updates % opt.validate_freq == 0:
            t_val = time.time()
            for tag, (ds, k, t_mid, f) in val_sets.items():
                if ds is None:
                    continue
                # Per-host validation sharding: each process sweeps its own
                # videolist shard; compute_errors allgathers the curves.
                loader = batch_iterator(ds, opt.batch_size, False, False,
                                        num_shards=jax.process_count(),
                                        shard_index=jax.process_index())
                psnr_c, ssim_c, _ = compute_errors(env, state, loader, k, t_mid, f, mesh)
                if writer:
                    writer.add_scalar(f"{tag}/avg_psnr", float(psnr_c.mean()), total_updates)
                    writer.add_scalar(f"{tag}/avg_ssim", float(ssim_c.mean()), total_updates)
                    writer.add_image(
                        f"{tag}/psnr_curve",
                        draw_err_plot(psnr_c, "PSNR").transpose(2, 0, 1),
                        total_updates,
                    )
                    vis_ds = vis_sets.get(tag)
                    if vis_ds is not None and len(vis_ds) > 0:
                        g_vis = jax.device_get(state.g_params) if multiproc else state.g_params
                        grid = visualize_predictions(env, g_vis, vis_ds, k, t_mid, f, opt.batch_size)
                        writer.add_image(f"samples/{tag}", grid.transpose(2, 0, 1), total_updates)
                if is_main:
                    print(f"[{tag}] iter {total_updates}: psnr {psnr_c.mean():.3f} ssim {ssim_c.mean():.4f}")
                log_json(event="val", tag=tag, iter=total_updates,
                         psnr=float(psnr_c.mean()), ssim=float(ssim_c.mean()))
                if tag == "val":
                    sum_psnr = float(psnr_c.mean(axis=0).sum())
                    sum_ssim = float(ssim_c.mean(axis=0).sum())
                    if sum_ssim > best_sum_ssim:
                        # curves are global after allgather_rows, so every
                        # process takes this branch consistently; only the
                        # main process writes.
                        best_sum_psnr, best_sum_ssim = sum_psnr, sum_ssim
                        if not is_main:
                            continue
                        ckpt.save_snapshot(
                            expr_dir,
                            "model_best.ckpt",
                            state,
                            {"updates": total_updates, "sum_avg_psnr_err": sum_psnr, "sum_avg_ssim_err": sum_ssim},
                        )
                        print(f"new best (sum ssim {sum_ssim:.4f}) -> model_best.ckpt")
                        log_json(event="best", iter=total_updates,
                                 sum_psnr=sum_psnr, sum_ssim=sum_ssim)
            t_start += time.time() - t_val  # keep ms/it a step-time series

    if is_main:
        print("training done")
        log_json(event="done", iter=total_updates)


if __name__ == "__main__":
    main()
