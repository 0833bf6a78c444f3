"""Pallas convt4s2 kernel: parity with the XLA lhs-dilated conv (fwd +
VJP) and the ConvTranspose2d layer dispatch, on CPU in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supervised_gan_tpu.nn import core
from supervised_gan_tpu.ops.pallas import convt4s2 as pt


@pytest.fixture(autouse=True)
def _interpret():
    pt._set_interpret(True)
    yield
    pt._set_interpret(False)


def _mk(H, W, Ci, Co, seed=0):
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(k, (1, H, W, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (4, 4, Ci, Co)) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 2), (Co,)) * 0.1
    return x, w, b


# T=1 exact path (Ci >= 128: equal, halving, and growing Co) and the
# T=2 banded path (Ci = 64); one odd aspect ratio
SHAPES = [(16, 16, 512, 256), (16, 24, 256, 64), (8, 8, 256, 256),
          (16, 16, 128, 64), (16, 16, 128, 32), (24, 16, 64, 32),
          (16, 16, 64, 64)]


@pytest.mark.parametrize("H,W,Ci,Co", SHAPES)
def test_forward_matches_xla(H, W, Ci, Co):
    x, w, b = _mk(H, W, Ci, Co)
    assert pt.supported(x, w)
    y = pt.convt4s2(x, w, b)
    yr = pt._xla_convt(x, w, b)
    assert y.shape == (1, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("H,W,Ci,Co", [(16, 16, 256, 128), (16, 16, 64, 32)])
def test_vjp_matches_xla(H, W, Ci, Co):
    x, w, b = _mk(H, W, Ci, Co, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(9), (1, 2 * H, 2 * W, Co))

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    d1 = jax.grad(loss(pt.convt4s2), (0, 1, 2))(x, w, b)
    d2 = jax.grad(loss(pt._xla_convt), (0, 1, 2))(x, w, b)
    for a, r in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("H,W,Ci,Co", [(16, 16, 128, 32), (16, 16, 64, 32),
                                       (8, 8, 256, 256)])
def test_vjp_dense_mode_matches_xla(monkeypatch, H, W, Ci, Co):
    """SGAN_TPU_CONVT_BWD=dense routes the kernel's backward through
    edge_conv's dense phase-dot grads — must match the XLA joint vjp."""
    monkeypatch.setattr(pt, '_BWD_MODE', 'dense')
    x, w, b = _mk(H, W, Ci, Co, seed=5)
    g = jax.random.normal(jax.random.PRNGKey(11), (1, 2 * H, 2 * W, Co))

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    d1 = jax.grad(loss(pt.convt4s2), (0, 1, 2))(x, w, b)
    d2 = jax.grad(loss(pt._xla_convt), (0, 1, 2))(x, w, b)
    for a, r in zip(d1, d2):
        sc = float(jnp.max(jnp.abs(r))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(r) / sc,
                                   rtol=0, atol=2e-5)


@pytest.mark.parametrize("H,W,Ci,Co", [(16, 16, 128, 32), (16, 16, 64, 32),
                                       (8, 8, 256, 256)])
def test_vjp_densedw_mode_matches_xla(monkeypatch, H, W, Ci, Co):
    """SGAN_TPU_CONVT_BWD=densedw: dx stays the XLA joint form, ONLY dw
    goes through edge_conv.convt_dw_planar — must match the joint vjp."""
    monkeypatch.setattr(pt, '_BWD_MODE', 'densedw')
    x, w, b = _mk(H, W, Ci, Co, seed=7)
    g = jax.random.normal(jax.random.PRNGKey(13), (1, 2 * H, 2 * W, Co))

    def loss(f):
        return lambda x, w, b: jnp.sum(f(x, w, b) * g)

    d1 = jax.grad(loss(pt.convt4s2), (0, 1, 2))(x, w, b)
    d2 = jax.grad(loss(pt._xla_convt), (0, 1, 2))(x, w, b)
    for a, r in zip(d1, d2):
        sc = float(jnp.max(jnp.abs(r))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(r) / sc,
                                   rtol=0, atol=2e-5)


def test_unsupported_shapes_rejected():
    x, w, _ = _mk(16, 16, 48, 24)      # no lane-aligning tuple size
    assert not pt.supported(x, w)
    x, w, _ = _mk(7, 16, 128, 64)      # H not divisible by a block
    assert not pt.supported(x, w)
    x, w, _ = _mk(16, 16, 128, 64)
    assert not pt.supported(x, w, stride=1)
    assert not pt.supported(jnp.concatenate([x, x]), w)   # batch 2


def test_layer_dispatch_matches_xla():
    """ConvTranspose2d routes through the kernel in its win region and
    matches the plain ops path."""
    layer = core.ConvTranspose2d(128, 32, 4, stride=2, padding=1)
    params = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 128))

    class Ctx:
        compute_dtype = None
        train = True

    old = core.PALLAS_ENABLED
    core.set_pallas_enabled(True)
    try:
        y = layer.apply(params, x, Ctx())
    finally:
        core.set_pallas_enabled(old)
    yr = pt._xla_convt(x, params["weight"], params["bias"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-4, atol=1e-4)
