"""Unit tests for the adaptive separable convolution op.

Test strategy mirrors SURVEY.md §4: Pallas/MXU implementations vs. the direct
reference, plus finite-difference gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfi_tpu.ops import sepconv_direct, sepconv_mxu, sepconv_pallas, pad_for_sepconv
from vfi_tpu.ops.sepconv import _skew_rows


def _numpy_sepconv(x, v, h):
    """Brain-dead O(ks^2) numpy loop — the spec."""
    B, H, W, ks = v.shape
    C = x.shape[-1]
    out = np.zeros((B, H, W, C), np.float64)
    for b in range(B):
        for y in range(H):
            for xx in range(W):
                patch = x[b, y : y + ks, xx : xx + ks, :]  # [ks, ks, C]
                out[b, y, xx] = np.einsum("ijc,i,j->c", patch, v[b, y, xx], h[b, y, xx])
    return out


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("ks,H,W,C", [(5, 8, 8, 1), (7, 12, 10, 3)])
def test_direct_matches_numpy(ks, H, W, C):
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    B = 2
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    want = _numpy_sepconv(np.asarray(x), np.asarray(v), np.asarray(h))
    got = sepconv_direct(x, v, h)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_skew_rows():
    m = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)  # W=4, ks=3
    s = _skew_rows(m)
    assert s.shape == (4, 6)
    for x in range(4):
        for u in range(6):
            want = m[x, u - x] if 0 <= u - x < 3 else 0.0
            assert s[x, u] == want, (x, u)


@pytest.mark.parametrize("ks,H,W,C", [(5, 8, 8, 1), (51, 16, 16, 1), (7, 12, 10, 3)])
def test_mxu_matches_direct(ks, H, W, C):
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    B = 2
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    want = sepconv_direct(x, v, h)
    got = sepconv_mxu(x, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ks,H,W,C", [(5, 8, 8, 1), (5, 8, 8, 3)])
def test_pallas_interpret_matches_direct(ks, H, W, C):
    # On CPU the Pallas TPU kernel runs via the interpreter.
    from jax.experimental.pallas import tpu as pltpu

    k = jax.random.split(jax.random.PRNGKey(2), 3)
    B = 2
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    want = sepconv_direct(x, v, h)
    with pltpu.force_tpu_interpret_mode():
        got = sepconv_pallas(x, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ks,H,W,C", [(5, 8, 8, 1), (7, 12, 16, 3), (51, 16, 16, 1)])
def test_pallas_mxu_interpret_matches_direct(ks, H, W, C):
    """v2 fused kernel (banded matrix built in VMEM via log-barrel skew)."""
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.ops.sepconv import sepconv_pallas_mxu

    k = jax.random.split(jax.random.PRNGKey(5), 3)
    B = 2
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    want = sepconv_direct(x, v, h)
    with pltpu.force_tpu_interpret_mode():
        got = sepconv_pallas_mxu(x, v, h)
    # The kernel's f32 path is an explicit 3-dot bf16 hi/lo split — the same
    # math as XLA Precision.HIGH on a real MXU, carrying ~2^-16 per-product
    # error (~1e-3 absolute after a ks^2=2601-tap accumulation).  Interpret
    # mode executes the split literally, so the tolerance reflects HIGH, not
    # exact f32 (sepconv_mxu on TPU has the same error profile).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_pallas_mxu_custom_vjp_matches_mxu_grad():
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.ops.sepconv import sepconv_pallas_mxu

    ks, H, W, C, B = 5, 8, 8, 2, 1
    k = jax.random.split(jax.random.PRNGKey(6), 4)
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    ct = _rand(k[3], (B, H, W, C))

    def loss_p(x, v, h):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(sepconv_pallas_mxu(x, v, h) * ct)

    def loss_m(x, v, h):
        return jnp.sum(sepconv_mxu(x, v, h) * ct)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, v, h)
    gm = jax.grad(loss_m, argnums=(0, 1, 2))(x, v, h)
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ks,H,W,C", [(5, 8, 8, 1), (7, 16, 12, 3)])
def test_pallas_bwd_kernels_match_mxu_grads(monkeypatch, ks, H, W, C):
    """The fused Pallas adjoints (grad_x / grad_v / grad_h) must agree with
    the XLA-AD gradients of sepconv_mxu (themselves finite-difference-checked
    elsewhere).  Tolerance graded for the bf16 hi/lo split (HIGH-equivalent)."""
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.ops.sepconv import sepconv_pallas_mxu

    monkeypatch.setenv("SEPCONV_PALLAS_BWD", "1")
    k = jax.random.split(jax.random.PRNGKey(8), 4)
    B = 2
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    ct = _rand(k[3], (B, H, W, C))

    def loss_p(x, v, h):
        return jnp.sum(sepconv_pallas_mxu(x, v, h) * ct)

    def loss_m(x, v, h):
        return jnp.sum(sepconv_mxu(x, v, h) * ct)

    # the custom-vjp backward traces outside loss_p's body, so the interpret
    # context must wrap the whole grad evaluation
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, v, h)
    gm = jax.grad(loss_m, argnums=(0, 1, 2))(x, v, h)
    for name, a, b in zip(("grad_x", "grad_v", "grad_h"), gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_mxu_gradients_finite_difference():
    ks, H, W, C, B = 3, 6, 6, 1, 1
    k = jax.random.split(jax.random.PRNGKey(3), 3)
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))

    def f(x, v, h):
        return jnp.sum(jnp.sin(sepconv_mxu(x, v, h)))

    g = jax.grad(f, argnums=(0, 1, 2))(x, v, h)
    eps = 1e-3
    rng = np.random.RandomState(0)
    for argi, arr in enumerate([x, v, h]):
        arr_np = np.asarray(arr)
        for _ in range(5):
            idx = tuple(rng.randint(s) for s in arr_np.shape)
            ap, am = arr_np.copy(), arr_np.copy()
            ap[idx] += eps
            am[idx] -= eps
            args_p = [x, v, h]
            args_m = [x, v, h]
            args_p[argi] = jnp.asarray(ap)
            args_m[argi] = jnp.asarray(am)
            fd = (f(*args_p) - f(*args_m)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g[argi])[idx], fd, rtol=2e-2, atol=2e-3)


def test_pallas_custom_vjp_matches_mxu_grad():
    from jax.experimental.pallas import tpu as pltpu

    ks, H, W, C, B = 5, 8, 8, 2, 1
    k = jax.random.split(jax.random.PRNGKey(4), 4)
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    ct = _rand(k[3], (B, H, W, C))

    def loss_p(x, v, h):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(sepconv_pallas(x, v, h) * ct)

    def loss_m(x, v, h):
        return jnp.sum(sepconv_mxu(x, v, h) * ct)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, v, h)
    gm = jax.grad(loss_m, argnums=(0, 1, 2))(x, v, h)
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pad_for_sepconv():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    p = pad_for_sepconv(x, 5)
    assert p.shape == (1, 8, 8, 1)
    # replication on the top-left corner
    assert p[0, 0, 0, 0] == x[0, 0, 0, 0]
    assert p[0, -1, -1, 0] == x[0, -1, -1, 0]


def test_dispatch_defaults_per_backend(monkeypatch):
    """sepconv() picks the fused Pallas kernel on TPU and the exact-f32 XLA
    banded matmul elsewhere."""
    import importlib

    sc = importlib.import_module("vfi_tpu.ops.sepconv")

    calls = []
    monkeypatch.setattr(sc, "sepconv_mxu", lambda *a: calls.append("mxu"))
    monkeypatch.setattr(sc, "sepconv_pallas_mxu", lambda *a: calls.append("pallas_mxu"))
    monkeypatch.setattr(sc.jax, "default_backend", lambda: "cpu")
    sc.sepconv(None, None, None)
    monkeypatch.setattr(sc.jax, "default_backend", lambda: "tpu")
    sc.sepconv(None, None, None)
    assert calls == ["mxu", "pallas_mxu"]


def test_pallas_mxu_wide_image_grad():
    """Gradients of the fused-forward custom VJP at a W>128 shape must agree
    with AD through the direct spec.  (On CPU the custom-VJP backward is the
    XLA-AD banded matmul; on TPU this wide f32 shape now routes to the fused
    adjoints — see test_bwd_dispatch_wide_f32 and _use_pallas_bwd.)"""
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.ops.sepconv import sepconv_direct, sepconv_pallas_mxu

    ks, H, W, C = 5, 8, 160, 1
    k = jax.random.split(jax.random.PRNGKey(13), 3)
    x = _rand(k[0], (1, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (1, H, W, ks))
    h = _rand(k[2], (1, H, W, ks))

    def loss_p(x, v, h):
        return jnp.sum(sepconv_pallas_mxu(x, v, h) ** 2)

    def loss_d(x, v, h):
        return jnp.sum(sepconv_direct(x, v, h) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, v, h)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(x, v, h)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_pallas_bwd_kernels_wide_image(monkeypatch):
    """Column-tiled fused adjoints (round 3): W > 128 pads W to a multiple of
    the TW=128 column tile and grids over column tiles, exactly like the
    forward.  Forced on via SEPCONV_PALLAS_BWD=1; gradients must agree with
    XLA-AD through the direct spec (f32 tolerance graded for the hi/lo
    split's HIGH-equivalent precision)."""
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.ops.sepconv import sepconv_direct, sepconv_pallas_mxu

    monkeypatch.setenv("SEPCONV_PALLAS_BWD", "1")
    ks, H, W, C, B = 5, 8, 160, 3, 2  # pads 160 -> 256 = 2 column tiles
    k = jax.random.split(jax.random.PRNGKey(17), 4)
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    ct = _rand(k[3], (B, H, W, C))

    def loss_p(x, v, h):
        return jnp.sum(sepconv_pallas_mxu(x, v, h) * ct)

    def loss_d(x, v, h):
        return jnp.sum(sepconv_direct(x, v, h) * ct)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, v, h)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(x, v, h)
    for name, a, b in zip(("grad_x", "grad_v", "grad_h"), gp, gd):
        assert a.shape == b.shape, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_pallas_mxu_native_layout_opt_in(monkeypatch):
    """SEPCONV_NATIVE_LAYOUT=1 ships v/h as produced ([B,H,W,ks]) and
    transposes in VMEM; must agree with the default tap-major path."""
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.ops.sepconv import sepconv_direct, sepconv_pallas_mxu

    ks, H, W, C = 7, 8, 32, 3
    k = jax.random.split(jax.random.PRNGKey(11), 3)
    x = _rand(k[0], (2, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (2, H, W, ks))
    h = _rand(k[2], (2, H, W, ks))
    want = sepconv_direct(x, v, h)
    monkeypatch.setenv("SEPCONV_NATIVE_LAYOUT", "1")
    with pltpu.force_tpu_interpret_mode():
        got = sepconv_pallas_mxu(x, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_pallas_mxu_wide_image_column_tiling():
    """W > 128 triggers the round-3 column-tiled path (pad W to a multiple of
    128, grid over column tiles, slice the zero-padded tail).  W=160 forces
    padding to 256 and nw=2."""
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.ops.sepconv import sepconv_direct, sepconv_pallas_mxu

    ks, H, W, C = 11, 16, 160, 1
    k = jax.random.split(jax.random.PRNGKey(9), 3)
    B = 2
    x = _rand(k[0], (B, H + ks - 1, W + ks - 1, C))
    v = _rand(k[1], (B, H, W, ks))
    h = _rand(k[2], (B, H, W, ks))
    want = sepconv_direct(x, v, h)
    with pltpu.force_tpu_interpret_mode():
        got = sepconv_pallas_mxu(x, v, h)
    assert got.shape == (B, H, W, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_bwd_dispatch_wide_f32(monkeypatch):
    """Wide-image (W>128) f32 grads must dispatch to the fused adjoints: the
    XLA-AD formulation deterministically crashes the libtpu AOT compiler at
    full-model scale (jaxlib 0.9.0, reproduced at UCF 256x320 f32 B=1 and
    B=2 — PARITY_r04.md), while the adjoint program compiles and runs.  bf16
    wide shapes below the byte threshold keep the measured-preferred XLA-AD;
    an explicit SEPCONV_PALLAS_BWD overrides everything."""
    import importlib

    sc = importlib.import_module("vfi_tpu.ops.sepconv")
    monkeypatch.delenv("SEPCONV_PALLAS_BWD", raising=False)

    wide = (6, 256, 320, 51)  # UCF B=2 doubled-batch fold, S ~727 MB in f32
    assert sc._use_pallas_bwd(wide, 4)  # f32: compiler-crash workaround
    assert not sc._use_pallas_bwd(wide, 2)  # bf16: under threshold -> XLA-AD
    kth = (40, 128, 128, 51)  # KTH B=8, S ~466 MB f32: stays XLA-AD
    assert not sc._use_pallas_bwd(kth, 4)
    monkeypatch.setenv("SEPCONV_PALLAS_BWD", "0")
    assert not sc._use_pallas_bwd(wide, 4)
