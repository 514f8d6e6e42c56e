#!/usr/bin/env python
"""Batch inference + PNG dump — the reference predict.py CLI, TPU-native.

Writes per-clip folders under --qual_result_root with the reference layout
(predict.py:59-120): gt_preceding_<t>.png, gt_middle_<t>.png,
pred_middle_<t>.png, gt_following_<t>.png (+ pred_middle_forward/backward and
interp_net_outputs_1/2 with --intermediate_preds).  Padding added for the
network is cropped off before saving (predict.py:69-95).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from vfi_tpu.utils.jax_setup import setup_jax

setup_jax()
from PIL import Image

from vfi_tpu.data.datasets import ContiguousVideoClipDataset, DisjointVideoClipDataset, batch_iterator
from vfi_tpu.models.registry import create_model
from vfi_tpu.train.environments import create_eval_environment
from vfi_tpu.utils import checkpoint as ckpt
from vfi_tpu.utils.config import TrainConfig, build_test_parser, listopt, parse_args


def to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1,1] float BGR -> uint8 RGB (matching the reference's PNG encoding)."""
    x = np.clip((frames + 1.0) / 2.0, 0.0, 1.0) * 255.0
    x = np.round(x).astype(np.uint8)
    if x.shape[-1] == 3:
        x = x[..., ::-1]  # BGR -> RGB for PNG
    return x


def save_video_frames(frames_u8: np.ndarray, dest: str, prefix: str, start_t: int, H: int, W: int):
    """Write [T, Hp, Wp, C] frames as PNGs, cropping off padding (predict.py:103-120)."""
    os.makedirs(dest, exist_ok=True)
    for i, frame in enumerate(frames_u8):
        img = frame[:H, :W]
        if img.shape[-1] == 1:
            img = img[..., 0]
        Image.fromarray(img).save(os.path.join(dest, f"{prefix}_{start_t + i:04d}.png"))


def main(argv=None):
    opt = parse_args(build_test_parser(), argv, allow_unknown=True)
    listopt(opt)
    # int8 serving mode (nn/quant.py): the env var is read at module-
    # construction/trace time, so set it before create_model/init below.
    validate_n = opt.validate_quant if opt.validate_quant is not None else (
        4 if opt.quantize != "none" else 0)
    model_fp = None
    if opt.quantize != "none":
        if validate_n > 0:
            # Unquantized reference model for the --validate_quant gate.  The
            # env var is read at TRACE time (nn/layers.py:27), so the gate
            # below also clears it around the reference forward's first call.
            model_fp = create_model(opt.model_key)
        os.environ["VFI_INT8"] = {"int8": "2", "int8_dynamic": "1"}[opt.quantize]

    if opt.disjoint_clips:
        ds = DisjointVideoClipDataset(
            opt.c_dim, opt.test_video_list_path, opt.K, opt.F, opt.image_size, opt.padding_size, opt.data_root,
            emit_uint8=opt.device_normalize,
        )
    else:
        ds = ContiguousVideoClipDataset(
            opt.c_dim, opt.test_video_list_path, opt.K + opt.T + opt.F, False, False,
            opt.image_size, False, opt.padding_size, opt.data_root,
            emit_uint8=opt.device_normalize,
        )
    print(f"# testing videos = {len(ds)}")

    model = create_model(opt.model_key)
    env = create_eval_environment(model, TrainConfig(K=opt.K, T=opt.T, F=opt.F))

    # Host-side classical models (optical flow) bypass jax entirely.
    host_model = getattr(model, "host_forward", None)

    def host_normalize(u8: np.ndarray) -> np.ndarray:
        """uint8 BGR -> the dataset's float pipeline ([-1,1], gray if c_dim=1);
        used under --device_normalize for the few host-side consumers (init
        sample, calibration clips, GT PNG writes)."""
        x = u8.astype(np.float32) / 255.0
        if opt.c_dim == 1:
            from vfi_tpu.ops.image import _BGR_LUMA

            x = (x @ np.asarray(_BGR_LUMA, np.float32))[..., None]
        return x * 2.0 - 1.0

    g_params = None
    if host_model is None:
        sample = ds[0]["targets"][None]
        if opt.device_normalize:
            sample = host_normalize(sample)
        if opt.disjoint_clips:
            p, f = sample[:, : opt.K], sample[:, opt.K :]
        else:
            p, f = sample[:, : opt.K], sample[:, opt.K + opt.T :]
        variables = jax.jit(model.init, static_argnums=1)(jax.random.PRNGKey(0), opt.T, p, f)
        g_params = variables.get("params", {})
        if env.needs_snapshot:
            expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
            from vfi_tpu.train.environments import TrainState

            template = TrainState(step=np.zeros((), np.int32), g_params=g_params, g_opt=None)
            # Snapshots store the full training state; we only need g_params.
            state, _ = ckpt.load_snapshot(expr_dir, opt.snapshot_file_name, template)
            g_params = state.g_params
        g_params_fp = g_params  # pre-cast f32 copy for the --validate_quant gate
        if opt.dtype == "bfloat16":
            import jax.numpy as jnp

            g_params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), g_params)
        if opt.quantize == "int8":
            # Calibrate the static activation scales on the first clips,
            # then bake them into the serving program as constants (they
            # are per-layer scalars; see nn/quant.py).
            n_cal = max(1, min(opt.calib_clips, len(ds)))
            cal = np.stack([ds[i]["targets"] for i in range(n_cal)])
            if opt.device_normalize:
                cal = host_normalize(cal)
            cp = cal[:, : opt.K]
            cf = cal[:, opt.K + opt.T :] if not opt.disjoint_clips else cal[:, opt.K :]
            if opt.dtype == "bfloat16":
                import jax.numpy as jnp

                cp, cf = jnp.asarray(cp, jnp.bfloat16), jnp.asarray(cf, jnp.bfloat16)
            calibrate = jax.jit(
                lambda v, p, f: model.apply(
                    v, opt.T, p, f, mutable=["quant"], rngs={"sample": jax.random.PRNGKey(0)}
                )[1]
            )
            upd = calibrate({"params": g_params, "quant": variables.get("quant", {})}, cp, cf)
            env.extra_collections = jax.device_get(upd)
            print(f"int8 activation scales calibrated on {n_cal} clips")

    # Multi-chip inference: shard full batches over the data mesh axis.
    # Ragged final batches are padded to the compiled shape by default (see
    # the loop below), so they shard too; with --no_pad_final_batch (or a
    # batch_size not divisible by the device count) they fall back to
    # replication.
    mesh = None
    if host_model is None and jax.device_count() > 1:
        from vfi_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"inference mesh: {mesh.devices.size} devices "
              "(full batches shard; unpadded ragged batches replicate)", flush=True)

    K, T, F = opt.K, opt.T, opt.F
    H, W = opt.image_size
    to_frames = None
    if opt.device_normalize and host_model is None:
        import jax.numpy as jnp

        from vfi_tpu.ops.image import frames_from_uint8

        out_dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32
        to_frames = jax.jit(lambda u8: frames_from_uint8(u8, opt.c_dim, dtype=out_dtype))

    if model_fp is not None and host_model is None and len(ds) > 0:
        # Self-enforcing per-checkpoint quantization gate (--validate_quant):
        # run the first clips through BOTH the quantized serving program (at
        # the serving batch shape, so this compile is reused by the main loop)
        # and an unquantized f32 reference program, and refuse to serve a
        # checkpoint whose quantized numerics degrade past --quant_tol_db.
        import jax.numpy as jnp

        n_val = min(validate_n, len(ds), opt.batch_size)
        val = np.stack([ds[i]["targets"] for i in range(n_val)])
        val_f = host_normalize(val) if opt.device_normalize else val
        vq = val
        if n_val < opt.batch_size:
            vq = np.concatenate([vq, np.repeat(vq[-1:], opt.batch_size - n_val, axis=0)])
        pq, fq = vq[:, :K], (vq[:, K:] if opt.disjoint_clips else vq[:, K + T :])
        if to_frames is not None:
            pq, fq = to_frames(pq), to_frames(fq)
        elif opt.dtype == "bfloat16":
            pq, fq = jnp.asarray(pq, jnp.bfloat16), jnp.asarray(fq, jnp.bfloat16)
        pred_q = np.asarray(env.forward_test(g_params, T, pq, fq)["pred"], np.float32)[:n_val]

        env_fp = create_eval_environment(model_fp, TrainConfig(K=K, T=T, F=F))
        pf = val_f[:, :K]
        ff = val_f[:, K:] if opt.disjoint_clips else val_f[:, K + T :]
        # VFI_INT8 is read at trace time — clear it so the reference program
        # traces with plain (unquantized) convs.
        _q_flag = os.environ.pop("VFI_INT8", None)
        try:
            pred_fp = np.asarray(
                env_fp.forward_test(g_params_fp, T, pf, ff)["pred"], np.float32)
        finally:
            if _q_flag is not None:
                os.environ["VFI_INT8"] = _q_flag

        from vfi_tpu.ops.metrics import psnr, quantize_uint8, ssim

        q_u8, fp_u8 = quantize_uint8(pred_q), quantize_uint8(pred_fp)
        agree = float(np.asarray(psnr(q_u8, fp_u8, clamp=100.0)).mean())
        if opt.disjoint_clips:
            print(f"validate_quant ({n_val} clips): quantized-vs-f32 prediction "
                  f"agreement {agree:.2f} dB (no GT middles for metric deltas)")
            ok = agree >= 30.0
            detail = f"agreement {agree:.2f} dB < 30 dB"
        else:
            gt_u8 = quantize_uint8(jnp.asarray(val_f[:, K : K + T], np.float32))
            psnr_q = float(np.asarray(psnr(q_u8, gt_u8, clamp=100.0)).mean())
            psnr_fp = float(np.asarray(psnr(fp_u8, gt_u8, clamp=100.0)).mean())
            ssim_q = float(np.asarray(ssim(q_u8, gt_u8)).mean())
            ssim_fp = float(np.asarray(ssim(fp_u8, gt_u8)).mean())
            print(f"validate_quant ({n_val} clips): PSNR f32 {psnr_fp:.3f} -> "
                  f"quantized {psnr_q:.3f} dB (delta {psnr_q - psnr_fp:+.3f}); "
                  f"SSIM {ssim_fp:.4f} -> {ssim_q:.4f} "
                  f"(delta {ssim_q - ssim_fp:+.4f}); agreement {agree:.2f} dB")
            ok = psnr_q - psnr_fp >= -opt.quant_tol_db
            detail = f"PSNR drop {psnr_fp - psnr_q:.3f} dB > tolerance {opt.quant_tol_db} dB"
        if not ok and not opt.force_quant:
            sys.exit(f"validate_quant REFUSED this checkpoint for {opt.quantize} "
                     f"serving: {detail}. Re-run with --force_quant to override, "
                     f"--quant_tol_db to widen the gate, or --validate_quant 0 "
                     f"to skip validation.")
        if not ok:
            print(f"validate_quant FAILED ({detail}) — proceeding (--force_quant)")
        del pred_q, pred_fp, env_fp

    n_done = 0
    from collections import deque

    from vfi_tpu.data.prefetch import Prefetcher

    batches = Prefetcher(
        batch_iterator(ds, opt.batch_size, False, False, num_workers=opt.num_threads), depth=2
    )
    n_batch = 0
    tracing = False

    def write_batch(out, targets, clip_labels):
        """Fetch one dispatched batch and write its PNGs.  Called from the
        in-flight drain below."""
        nonlocal n_done
        # ONE bulk D2H fetch for the whole batch: per-row out[key][b] reads
        # would each dispatch a device slice + transfer (RPC round-trips over
        # tunneled links).  The fetch stays deferred until here, so the
        # in-flight pipeline above is preserved.
        out = jax.device_get(out)
        if opt.device_normalize:
            # GT writes need the float pipeline's gray/[-1,1] encoding
            targets = host_normalize(targets)
        for b, label in enumerate(clip_labels):
            dest = os.path.join(opt.qual_result_root, label)
            save_video_frames(to_uint8(targets[b, :K]), dest, "gt_preceding", 0, H, W)
            save_video_frames(to_uint8(np.asarray(out["pred"][b])), dest, "pred_middle", K, H, W)
            if not opt.disjoint_clips:
                save_video_frames(to_uint8(targets[b, K : K + T]), dest, "gt_middle", K, H, W)
            save_video_frames(to_uint8(targets[b, -F:]), dest, "gt_following", K + T, H, W)
            if opt.intermediate_preds:
                for key, prefix in (
                    ("pred_forward", "pred_middle_forward"),
                    ("pred_backward", "pred_middle_backward"),
                    ("interp_net_outputs_1", "interp_net_outputs_1"),
                    ("interp_net_outputs_2", "interp_net_outputs_2"),
                ):
                    if key in out:
                        save_video_frames(to_uint8(np.asarray(out[key][b])), dest, prefix, K, H, W)
        n_done += len(clip_labels)
        print(f"processed {n_done}/{len(ds)} clips", flush=True)

    # Serving pipeline: keep up to VFI_INFLIGHT dispatched batches in flight
    # before blocking on the oldest one.  jax dispatch is async, so batch
    # N+1's H2D + compute overlap batch N's D2H fetch and host PNG encoding
    # (which otherwise serialize with device work — the ~8% non-device gap in
    # profile_infer.py).  Depth 1 restores the synchronous loop.
    depth = max(1, int(os.environ.get("VFI_INFLIGHT", "2")))
    inflight = deque()
    import time as _time

    t_loop0 = _time.perf_counter()
    for batch in batches:
        # Serving observability: trace a window of prediction batches (same
        # semantics as train.py --profile_steps; train.py:258-264).
        n_batch += 1
        if opt.profile_steps is not None:
            if n_batch == opt.profile_steps[0]:
                jax.profiler.start_trace(opt.profile_dir)
                tracing = True
            elif n_batch == opt.profile_steps[1] and tracing:
                # Drain (and thereby sync) the in-flight batches before
                # closing the trace — otherwise the traced batches are still
                # executing and their device events land outside the window.
                while inflight:
                    write_batch(*inflight.popleft())
                jax.profiler.stop_trace()
                tracing = False
                print(f"profiler trace written to {opt.profile_dir}")
        targets = batch["targets"]
        preceding = targets[:, :K]
        following = targets[:, -F:]

        if host_model is not None:
            if opt.device_normalize:
                # --device_normalize ships uint8 batches, but host-side models
                # (e.g. OFFillInModel) consume float32 BGR in [-1,1]
                # (models/optical_flow.py host_forward contract) — normalize on
                # the host before calling them.
                preceding = host_normalize(preceding)
                following = host_normalize(following)
            out = host_model(T, preceding, following)
        else:
            n_real = len(targets)
            if n_real < opt.batch_size and not opt.no_pad_final_batch:
                # Static-shape serving: a ragged final batch would trigger a
                # SECOND full-size XLA compile (minutes cold on paper-size
                # programs) and fall off the sharded multi-chip path.  Pad to
                # the compiled batch shape by repeating the last clip;
                # write_batch iterates the real clip labels only, so padded
                # rows are never fetched from the device or written.
                pad = opt.batch_size - n_real
                preceding = np.concatenate([preceding, np.repeat(preceding[-1:], pad, axis=0)])
                following = np.concatenate([following, np.repeat(following[-1:], pad, axis=0)])
                print(f"padded final batch {n_real} -> {opt.batch_size} "
                      "(one compiled shape; --no_pad_final_batch disables)", flush=True)
            if opt.dtype == "bfloat16" and to_frames is None:
                import jax.numpy as jnp

                preceding = jnp.asarray(preceding, jnp.bfloat16)
                following = jnp.asarray(following, jnp.bfloat16)
            if mesh is not None and len(preceding) % mesh.devices.size == 0:
                from vfi_tpu.parallel.mesh import batch_sharding
                sh = batch_sharding(mesh)
                preceding = jax.device_put(preceding, sh)
                following = jax.device_put(following, sh)
                if n_batch == 1:
                    print(f"batch sharded over {mesh.devices.size} devices", flush=True)
            if to_frames is not None:
                # uint8 crossed the host->device boundary; normalize on chip
                preceding, following = to_frames(preceding), to_frames(following)
            out = env.forward_test(g_params, T, preceding, following)
            inflight.append((out, targets, batch["clip_label"]))
            while len(inflight) >= depth:
                write_batch(*inflight.popleft())
            continue

        write_batch(out, targets, batch["clip_label"])
    while inflight:
        write_batch(*inflight.popleft())
    dt_loop = _time.perf_counter() - t_loop0
    if n_done:
        print(f"predicted {n_done} clips in {dt_loop:.2f} s "
              f"({n_done / dt_loop:.2f} clips/s, inflight={depth})", flush=True)
    if tracing:  # STOP batch never reached (short dataset) — close the trace
        jax.profiler.stop_trace()
        print(f"profiler trace written to {opt.profile_dir}")
    print("predictions written to", opt.qual_result_root)


if __name__ == "__main__":
    main()
