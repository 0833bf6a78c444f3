"""Pallas 3x3 conv kernel: parity with the XLA conv (fwd + VJP) and the
Conv2d layer dispatch, run on CPU in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supervised_gan_tpu.ops.pallas import conv3x3 as p3
from supervised_gan_tpu.nn import core


@pytest.fixture(autouse=True)
def _interpret():
    p3._set_interpret(True)
    yield
    p3._set_interpret(False)


def _mk(H, W, C, seed=0):
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(k, (1, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, C, C)) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 2), (C,)) * 0.1
    return x, w, b


# one shape per pixel-packing factor P = 128/C (and P=1 for C>=128)
SHAPES = [(16, 32, 64), (24, 64, 32), (16, 64, 16), (16, 16, 128),
          (16, 16, 256)]


@pytest.mark.parametrize("H,W,C", SHAPES)
def test_forward_matches_xla(H, W, C):
    x, w, b = _mk(H, W, C)
    assert p3.supported(x, w, 1, 1)
    y = p3.conv3x3_same(x, w, b)
    yr = p3._xla_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("H,W,C", [(16, 32, 64), (16, 16, 128)])
def test_vjp_matches_xla(H, W, C):
    x, w, b = _mk(H, W, C, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(9), (1, H, W, C))

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    gp = jax.grad(loss(p3.conv3x3_same), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss(p3._xla_conv), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_no_bias():
    x, w, _ = _mk(16, 32, 64)
    np.testing.assert_allclose(np.asarray(p3.conv3x3_same(x, w, None)),
                               np.asarray(p3._xla_conv(x, w, None)),
                               rtol=1e-4, atol=1e-4)


def test_supported_gate():
    x, w, _ = _mk(16, 32, 64)
    assert p3.supported(x, w, 1, 1)
    assert not p3.supported(x, w, 2, 1)                     # stride
    assert not p3.supported(x, w, 1, 0)                     # padding
    assert not p3.supported(jnp.concatenate([x, x]), w, 1, 1)  # batch
    w44 = jnp.zeros((4, 4, 64, 64))
    assert not p3.supported(x, w44, 1, 1)                   # kernel size
    wio = jnp.zeros((3, 3, 64, 32))
    assert not p3.supported(x, wio, 1, 1)                   # C mismatch
    x96 = jnp.zeros((1, 16, 32, 96))
    assert not p3.supported(x96, jnp.zeros((3, 3, 96, 96)), 1, 1)
    x14 = jnp.zeros((1, 14, 32, 64))                        # H not 8-mult
    assert not p3.supported(x14, w, 1, 1)


def test_conv2d_layer_dispatch():
    """Conv2d with PALLAS_ENABLED routes supported shapes through the
    kernel and produces the same result as the XLA path."""
    layer = core.Conv2d(64, 64, 3, 1, 1)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32, 64))
    ctx = core.Ctx(train=False)
    y_ref = layer.apply(params, x, ctx)
    old = core.PALLAS_ENABLED
    core.set_pallas_enabled(True)
    try:
        y_pal = layer.apply(params, x, ctx)
    finally:
        core.set_pallas_enabled(old)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# k4 s2 p1 kernel (ops/pallas/conv4s2.py)
# --------------------------------------------------------------------------

from supervised_gan_tpu.ops.pallas import conv4s2 as p4


def _mk4(H, W, Ci, Co, seed=0):
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(k, (1, H, W, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (4, 4, Ci, Co)) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 2), (Co,)) * 0.1
    return x, w, b


@pytest.mark.parametrize("H,W,Ci,Co", [
    (32, 32, 64, 128), (32, 64, 128, 256), (64, 32, 64, 64),
    (32, 32, 256, 512)])
def test_conv4s2_forward_matches_xla(H, W, Ci, Co):
    x, w, b = _mk4(H, W, Ci, Co)
    assert p4.supported(x, w, 2, 1)
    np.testing.assert_allclose(np.asarray(p4.conv4s2_same(x, w, b)),
                               np.asarray(p4._xla_conv(x, w, b)),
                               rtol=1e-4, atol=1e-4)


def test_conv4s2_vjp_matches_xla():
    x, w, b = _mk4(32, 32, 64, 128, seed=5)
    g = jax.random.normal(jax.random.PRNGKey(9), (1, 16, 16, 128))

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    gp = jax.grad(loss(p4.conv4s2_same), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss(p4._xla_conv), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_conv4s2_supported_gate():
    x, w, _ = _mk4(32, 32, 64, 128)
    assert p4.supported(x, w, 2, 1)
    assert not p4.supported(x, w, 1, 1)                     # stride
    assert not p4.supported(x, jnp.zeros((3, 3, 64, 128)), 2, 1)
    x32 = jnp.zeros((1, 32, 32, 32))
    assert not p4.supported(x32, jnp.zeros((4, 4, 32, 64)), 2, 1)  # Ci<64
    x30 = jnp.zeros((1, 30, 32, 64))
    assert not p4.supported(x30, w, 2, 1)                   # odd/misaligned


def test_conv2d_layer_dispatch_k4s2(monkeypatch):
    monkeypatch.setenv('SGAN_TPU_CONV4S2', '1')
    layer = core.Conv2d(64, 128, 4, 2, 1)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 64))
    ctx = core.Ctx(train=False)
    y_ref = layer.apply(params, x, ctx)
    old = core.PALLAS_ENABLED
    core.set_pallas_enabled(True)
    try:
        y_pal = layer.apply(params, x, ctx)
    finally:
        core.set_pallas_enabled(old)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------ dw v2 --
def test_dw_v2_matches_xla_interpret():
    """_conv3x3_dw_v2 parity (interpret mode), like the convt4s2 tests."""
    H, W, C = 128, 128, 128       # smallest geometry the v2 gate admits
    x, w, _ = _mk(H, W, C, seed=5)
    g = jax.random.normal(jax.random.PRNGKey(11), (1, H, W, C), jnp.float32)
    assert p3.dw_v2_supported(x, g)
    dw = p3._conv3x3_dw_v2(x, g)

    def loss(wv):
        return jnp.sum(p3._xla_conv(x, wv, None) * g)

    dw_ref = jax.grad(loss)(w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-3, atol=1e-3)


def test_bwd_mode3_gates_on_dw_v2_supported(monkeypatch):
    """SGAN_TPU_CONV3_PALLAS_BWD=3 with a shape OUTSIDE the v2 dw gate must
    fall back to the XLA dw (not crash / miscompute) — the gate failure mode
    a lowered SGAN_TPU_CONV3_MIN_PIXELS exposes."""
    monkeypatch.setattr(p3, '_PALLAS_BWD', '3')
    H, W, C = 16, 32, 64          # h*w < 128*128: dw_v2_supported is False
    x, w, b = _mk(H, W, C, seed=7)
    g = jax.random.normal(jax.random.PRNGKey(13), (1, H, W, C))
    assert not p3.dw_v2_supported(x, g)

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    gp = jax.grad(loss(p3.conv3x3_same), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss(p3._xla_conv), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


# ------------------------------------------------- fused conv3x3+IN+act --
from supervised_gan_tpu.ops.pallas import conv3x3_in as p3in
from supervised_gan_tpu.ops.norm import instance_norm


def _ref_region(x, w, b, eps, slope):
    y = p3._xla_conv(x, w, b)
    y = instance_norm(y, eps)
    if slope is not None:
        y = jnp.where(y >= 0, y, y * slope)
    return y


@pytest.mark.parametrize("slope", [None, 0.0, 0.2])
def test_conv3x3_in_act_forward(slope):
    x, w, b = _mk(16, 32, 64, seed=11)
    y = p3in.conv3x3_in_act(x, w, b, 1e-5, slope)
    yr = _ref_region(x, w, b, 1e-5, slope)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=2e-4, atol=2e-4)


def test_conv3x3_in_act_vjp():
    x, w, b = _mk(16, 32, 64, seed=12)
    g = jax.random.normal(jax.random.PRNGKey(21), x.shape)

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    fused = lambda x, w, b: p3in.conv3x3_in_act(x, w, b, 1e-5, 0.2)
    ref = lambda x, w, b: _ref_region(x, w, b, 1e-5, 0.2)
    gp = jax.grad(loss(fused), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss(ref), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=2e-3)


def test_sequential_peephole_conv_in_act(monkeypatch):
    """[Conv2d(3x3), InstanceNorm2d, LeakyReLU] through Sequential must hit
    the fused region (gate forced on: default off, measured end-to-end
    negative) and agree with the unfused path."""
    monkeypatch.setattr(core, '_CONV3_IN_FUSED', True)
    seq = core.Sequential(core.Conv2d(64, 64, 3, 1, 1),
                          core.InstanceNorm2d(64),
                          core.LeakyReLU(0.2))
    params = seq.init(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 32, 64))
    ctx = core.Ctx(train=False)
    old = core.PALLAS_ENABLED
    core.set_pallas_enabled(False)
    try:
        y_ref = seq.apply(params, x, ctx)
    finally:
        core.set_pallas_enabled(old)
    core.set_pallas_enabled(True)
    try:
        y_fused = seq.apply(params, x, ctx)
    finally:
        core.set_pallas_enabled(old)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_dw_rowcols_mode_matches_xla(monkeypatch):
    """SGAN_TPU_CONV3_DW=rowcols routes dw through the merged one-dot
    row-band form; grads must match the XLA conv's."""
    monkeypatch.setattr(p3, '_DW_MODE', 'rowcols')
    x, w, b = _mk(16, 32, 64, seed=11)
    g = jax.random.normal(jax.random.PRNGKey(17), (1, 16, 32, 64))

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    gp = jax.grad(loss(p3.conv3x3_same), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss(p3._xla_conv), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_dx_pallas_mode_matches_xla(monkeypatch):
    """SGAN_TPU_CONV3_DX=pallas routes dx through the forward kernel on
    the flipped/io-transposed weights; grads must match the XLA conv's."""
    monkeypatch.setattr(p3, '_DX_MODE', 'pallas')
    x, w, b = _mk(16, 32, 64, seed=7)
    g = jax.random.normal(jax.random.PRNGKey(13), (1, 16, 32, 64))

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    gp = jax.grad(loss(p3.conv3x3_same), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss(p3._xla_conv), argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)
