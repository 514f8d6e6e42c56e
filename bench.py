#!/usr/bin/env python
"""Headline benchmark: bi-TAI inference throughput on KTH-shaped inputs.

Prints ONE JSON line:
  {"metric": "bi-TAI KTH128 inference", "value": <frames/sec/chip>,
   "unit": "frames/sec/chip", "vs_baseline": <speedup vs single-core CPU proxy>}

The BASELINE.json target is >= 50x the *reference's* CPU frames/sec.  The
PyTorch-0.3/Python-2.7 reference cannot run in this image; the baseline is a
measured single-core run of the faithful modern-torch mirror of the reference
forward (tests/torch_mirror.py, parity-gated in PARITY_r03 — see
benchmarks/bench_torch_cpu.py).  A secondary, more conservative proxy (this
framework's own XLA-CPU build, which is faster than torch) is also cached.
Both numbers live in benchmarks/cpu_baseline.json; vs_baseline uses the torch
measurement.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "benchmarks", "cpu_baseline.json")

K = F = 5
T = int(os.environ.get("BENCH_T", "5"))  # 10 = the KTH m=10 headline config
H = W = 128
C = 1


def _bench_dtype() -> str:
    """bf16 is the shipped inference configuration (fastest correct path on
    v5e, measured 1.3x over f32 — bandwidth-bound forward); the recorded
    headline matches it.  Override with BENCH_DTYPE=float32."""
    return os.environ.get("BENCH_DTYPE", "bfloat16")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _bench_int8() -> bool:
    """BENCH_INT8=1 serves with the static-calibrated int8 conv mode
    (nn/quant.py; measured +4.6% over bf16 interleaved, benchmarks/ab_int8.py).
    Off by default: it changes numerics and must be quality-validated
    per-checkpoint, so the headline stays the exact bf16 path."""
    return os.environ.get("BENCH_INT8", "0") == "1"


def build(batch):
    if _bench_int8():
        os.environ["VFI_INT8"] = "2"  # read at trace time by nn.layers.Conv
    import jax
    import jax.numpy as jnp

    from vfi_tpu.models.fill_in import TAIFillInModel

    model = TAIFillInModel(gf_dim=64, c_dim=C, feature_size=3, ks=51, num_block=5)
    rng = jax.random.PRNGKey(0)
    p = jax.random.uniform(rng, (batch, K, H, W, C), minval=-1.0, maxval=1.0)
    f = jax.random.uniform(rng, (batch, F, H, W, C), minval=-1.0, maxval=1.0)
    # jit the init: flax init otherwise dispatches hundreds of individual ops,
    # each one an RPC over the axon TPU tunnel.
    variables = jax.jit(model.init, static_argnums=1)(rng, T, p, f)

    if _bench_dtype() == "bfloat16":
        variables, p, f = jax.tree.map(lambda a: a.astype(jnp.bfloat16), (variables, p, f))
    if _bench_int8():
        # one-batch calibration of the static activation scales
        calib = jax.jit(lambda v, p, f: model.apply(v, T, p, f, mutable=["quant"])[1])
        variables = {**variables, **jax.device_get(calib(variables, p, f))}

    @jax.jit
    def fwd(variables, p, f):
        return model.apply(variables, T, p, f)["pred"]

    return fwd, variables, p, f


# v5e peaks (per chip) — single source of truth in benchmarks/roofline_trace.py.
sys.path.insert(0, os.path.join(REPO, "benchmarks"))
from roofline_trace import PEAK_GBS, PEAK_TFLOPS  # noqa: E402


def program_cost(jitted, *args):
    """XLA cost analysis of the compiled program: (TFLOP, GB accessed) per
    invocation.  Custom calls (the Pallas sepconv, 3.8% of serving runtime at
    B=48) are opaque to the analysis, so both are slight underestimates."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return ca.get("flops", 0.0) / 1e12, ca.get("bytes accessed", 0.0) / 1e9
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        log(f"cost analysis unavailable: {e}")
        return None, None


def measure_fps(batch, iters, warmup=2, with_cost=True):
    import numpy as np

    fwd, variables, p, f = build(batch)
    # np.asarray forces a full device->host sync; block_until_ready alone has
    # been observed to return early on the experimental axon TPU tunnel.
    for _ in range(warmup):
        np.asarray(fwd(variables, p, f))
    # Launch all iterations, sync once at the end: device execution is
    # in-order, so the final transfer completes only after every launch —
    # this keeps per-iteration tunnel-RPC latency out of the measurement.
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(variables, p, f)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    # with_cost=False skips the AOT lower+compile pass — the CPU-proxy
    # subprocess has no persistent cache and would pay a second full-size
    # XLA:CPU compile just to discard the numbers.
    tflop, gb = program_cost(fwd, variables, p, f) if with_cost else (None, None)
    return batch * T / dt, dt, tflop, gb


def torch_cpu_fps():
    """The honest baseline: the torch mirror of the reference bi-TAI forward,
    one CPU core (measured once by benchmarks/bench_torch_cpu.py)."""
    if os.path.isfile(CACHE):
        with open(CACHE) as fh:
            data = json.load(fh)
        if "torch_cpu_fps" in data:
            return data["torch_cpu_fps"]
    log("measuring torch-CPU baseline (one-time)...")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "bench_torch_cpu.py")],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(f"bench_torch_cpu failed (rc={out.returncode}): {out.stderr[-500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["value"]


def cpu_proxy_fps():
    if os.path.isfile(CACHE):
        with open(CACHE) as fh:
            return json.load(fh)["cpu_fps"]
    log("measuring CPU baseline proxy (one-time)...")
    code = (
        "import jax, json; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from bench import measure_fps; fps, dt = measure_fps(1, 2, warmup=1, with_cost=False)[:2];"
        "print(json.dumps({'cpu_fps': fps, 'sec_per_batch1': dt}))" % REPO
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        # the proxy models the f32 PyTorch-CPU reference regardless of the
        # TPU-side dtype under measurement
        env={**os.environ, "JAX_PLATFORMS": "cpu", "BENCH_DTYPE": "float32"},
    )
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(f"cpu proxy failed (rc={out.returncode}): {out.stderr[-500:]}")
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    with open(CACHE, "w") as fh:
        json.dump(data, fh)
    return data["cpu_fps"]


def _init_backend_with_retry():
    """First device touch, with patient re-exec retries.

    The axon TPU tunnel admits one client at a time and can refuse init with
    UNAVAILABLE for many minutes after a client was killed mid-compile
    (CLAUDE.md).  jax caches a failed backend init for the process lifetime,
    so retry by re-exec'ing this script in a fresh process instead of looping
    in-process.
    """
    import jax

    attempts = int(os.environ.get("BENCH_INIT_ATTEMPTS", "8"))
    n = int(os.environ.get("_BENCH_ATTEMPT", "0"))
    try:
        return jax.devices()
    except RuntimeError as e:
        if "UNAVAILABLE" not in str(e) or n + 1 >= attempts:
            raise
        log(f"TPU backend unavailable (attempt {n + 1}/{attempts}); retrying in 120 s")
        time.sleep(120)
        os.environ["_BENCH_ATTEMPT"] = str(n + 1)
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    sys.path.insert(0, REPO)
    from vfi_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    _init_backend_with_retry()
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # B=64 is the measured single-chip sweet spot (bf16 interleaved A/Bs, r3:
    # B=24 990 < B=48 1036 < B=64 f/s; B=32 is a local dip at ~888; B=96/128
    # regress).  Mechanism (benchmarks/roofline_trace.py): XLA lays the
    # C_out=64 convs out batch-minor, so their lane occupancy is the folded
    # batch mod 128 — the doubled-batch rollout at B=64 runs them at 2B=128
    # (exact lane fill) vs 75% at B=48 and 50% at B=32.  Two independent
    # interleaved A/Bs: 994 vs 1017 and 946 vs 983 f/s (B=48 vs B=64).
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    fps, dt, tflop, gb = measure_fps(batch, iters)
    log(f"bi-TAI B={batch}: {dt * 1000:.1f} ms/batch -> {fps:.1f} middle-frames/sec")
    # Auditable roofline position (VERDICT r3 Weak #6): achieved TFLOP/s and
    # GB/s from the XLA cost analysis over the measured step time, as a
    # fraction of the v5e peaks.  The wall-clock dt includes ~8% non-device
    # time at B=48+ (profile_infer.py: 92% device-busy), so these are floors.
    mfu = hbm = None
    if tflop is not None:
        mfu = tflop / dt / PEAK_TFLOPS
        hbm = gb / dt / PEAK_GBS
        log(f"roofline: {tflop / dt:.1f} TFLOP/s ({mfu * 100:.0f}% of bf16 peak), "
            f"{gb / dt:.0f} GB/s ({hbm * 100:.0f}% of HBM peak)")

    try:
        torch_fps = torch_cpu_fps()
    except Exception as e:  # noqa: BLE001
        log(f"torch baseline failed: {e}")
        torch_fps = None
    try:
        proxy_fps = cpu_proxy_fps()
    except Exception as e:  # noqa: BLE001
        log(f"cpu proxy failed: {e}")
        proxy_fps = None

    base = torch_fps or proxy_fps
    vs = fps / base if base else None
    print(
        json.dumps(
            {
                "metric": f"bi-TAI KTH128 inference (K=F=5, T={T}, gray, "
                          f"{_bench_dtype()}{'+int8' if _bench_int8() else ''})",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                # denominator: measured 1-core torch run of the faithful
                # reference-forward mirror (tests/torch_mirror.py, parity-gated
                # in PARITY_r03); falls back to the conservative XLA-CPU proxy
                "vs_baseline": round(vs, 2) if vs else None,
                "baseline": ("torch-CPU-1-core reference mirror (f32)"
                             if torch_fps else "own-XLA-single-core-CPU proxy (f32)"),
                "vs_xla_cpu_proxy": round(fps / proxy_fps, 2) if proxy_fps else None,
                "dtype": _bench_dtype(),
                "batch": batch,
                # roofline position (see log line): fractions of v5e peak
                # 197 TFLOP/s (bf16 MXU) / 819 GB/s (HBM); floors — the XLA
                # cost analysis cannot see inside the Pallas custom call and
                # dt includes ~8% host/tunnel overhead.
                "mfu": round(mfu, 4) if mfu is not None else None,
                "hbm_frac": round(hbm, 4) if hbm is not None else None,
                "tflops_per_s": round(tflop / dt, 2) if tflop is not None else None,
                "gb_per_s": round(gb / dt, 1) if gb is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
