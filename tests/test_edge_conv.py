"""edge_conv reformulations (tiny-Co heads, tiny-Ci stems, tiny-Co
ConvTranspose) vs the highest-precision XLA conv, fwd + VJP, plus the
ops.conv dispatch gates.  Reference sites: CRN output head (reference
models/networks.py:794), PatchGAN stems (:816), G1 output convT (:540)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from supervised_gan_tpu.ops import conv as convmod
from supervised_gan_tpu.ops import edge_conv as e

DN = ("NHWC", "HWIO", "NHWC")


def _mk(H, Ci, Co, k, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (1, H, H, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, k, Ci, Co)) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (Co,)) * 0.1
    return x, w, b


def _xla_conv(x, w, b, s, p):
    y = lax.conv_general_dilated(
        x, w, (s, s), ((p, p), (p, p)), dimension_numbers=DN,
        precision="highest")
    return y if b is None else y + b


def _xla_convt(x, w, b, s, p):
    k = w.shape[0]
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
        lhs_dilation=(s, s), dimension_numbers=DN, precision="highest")
    return y if b is None else y + b


def _check(fn, ref, x, w, b, rtol=2e-5):
    y1, y2 = fn(x, w, b), ref(x, w, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=rtol, atol=2e-5)
    g = jax.random.normal(jax.random.PRNGKey(7), y1.shape)
    d1 = jax.grad(lambda *a: jnp.vdot(fn(*a), g), (0, 1, 2))(x, w, b)
    d2 = jax.grad(lambda *a: jnp.vdot(ref(*a), g), (0, 1, 2))(x, w, b)
    for a, r in zip(d1, d2):
        sc = float(jnp.max(jnp.abs(r))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(r) / sc,
                                   rtol=0, atol=1e-5)


# CRN head k3s1 64->1, PatchGAN head k4s1p1 512->1 (63px odd), strided
# 2-channel head, p=2 variant
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (32, 64, 1, 3, 1, 1), (33, 512, 1, 4, 1, 1),
    (32, 64, 2, 4, 2, 1), (16, 64, 4, 4, 2, 2)])
def test_head_conv(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    assert e.head_conv_supported(x, w, s, p)
    _check(lambda x, w, b: e.head_conv(x, w, b, s, p),
           lambda x, w, b: _xla_conv(x, w, b, s, p), x, w, b)


# PatchGAN stems (3ch image, 2ch map), CRN label embed k3 2->64
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (32, 3, 64, 4, 2, 1), (32, 2, 32, 4, 2, 1),
    (32, 2, 64, 3, 1, 1), (32, 1, 32, 4, 2, 1)])
def test_stem_conv(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    assert e.stem_conv_supported(x, w, s, p)
    _check(lambda x, w, b: e.stem_conv(x, w, b, s, p),
           lambda x, w, b: _xla_conv(x, w, b, s, p), x, w, b)


# G1 output convT 64->2, unet output convT 32->1
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (16, 64, 2, 4, 2, 1), (16, 32, 1, 4, 2, 1), (8, 64, 4, 4, 2, 1)])
def test_head_convt(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    assert e.head_convt_supported(x, w, s, p)
    _check(lambda x, w, b: e.head_convt(x, w, b, s, p),
           lambda x, w, b: _xla_convt(x, w, b, s, p), x, w, b)


# phase-major convT: head_convt_phase == space_to_phase(convT) with all
# three grads taken through the phase-major cotangent (the F2 cycle heads
# of the DSGAN recipe keep their output phase-major; the loss targets are
# space_to_phase'd instead)
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (16, 64, 2, 4, 2, 1), (16, 32, 1, 4, 2, 1), (16, 64, 4, 4, 2, 2),
    (8, 16, 2, 2, 2, 0)])
def test_head_convt_phase(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    assert e.head_convt_supported(x, w, s, p)
    _check(lambda x, w, b: e.head_convt_phase(x, w, b, s, p),
           lambda x, w, b: e.space_to_phase(_xla_convt(x, w, b, s, p), s),
           x, w, b)


def test_phase_space_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 12, 3))
    y = e.space_to_phase(x, 2)
    assert y.shape == (2, 4, 6, 12)
    np.testing.assert_array_equal(np.asarray(e.phase_to_space(y, 2)),
                                  np.asarray(x))
    # lane order is (q, r, c): lanes (q*s + r)*c +: c of block (i, j)
    # hold pixel (s*i + q, s*j + r)
    np.testing.assert_array_equal(np.asarray(y[0, 1, 2, 6:9]),
                                  np.asarray(x[0, 3, 4, :]))


@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (128, 2, 64, 4, 2, 1),    # D1 PatchGAN stem fed by the G1 phase head
    (64, 8, 32, 4, 2, 1),
    (33, 2, 16, 6, 3, 2)])    # s=3 geometry (nd=3 block shifts)
def test_stem_conv_phase(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    xph = e.space_to_phase(x, s)
    assert e.stem_phase_supported(xph, w, s, p)
    y1 = e.stem_conv_phase(xph, w, b, s, p)
    y2 = _xla_conv(x, w, b, s, p)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-5)
    g = jax.random.normal(jax.random.PRNGKey(7), y1.shape)
    d1 = jax.grad(lambda *a: jnp.vdot(e.stem_conv_phase(*a, s, p), g),
                  (0, 1, 2))(xph, w, b)
    d2 = jax.grad(lambda *a: jnp.vdot(_xla_conv(*a, s, p), g),
                  (0, 1, 2))(x, w, b)
    refs = (e.space_to_phase(d2[0], s), d2[1], d2[2])
    for a, r in zip(d1, refs):
        sc = float(jnp.max(jnp.abs(r))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(r) / sc,
                                   rtol=0, atol=1e-5)


@pytest.mark.parametrize("scale", [2, 4])
def test_blur_downsample_phase(scale):
    from supervised_gan_tpu.ops.resample import (blur_downsample,
                                                 blur_downsample_phase)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 2))
    ref = blur_downsample(x, scale)
    got = blur_downsample_phase(e.space_to_phase(x, 2), 2, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,Ci,Co", [(16, 8, 4), (32, 64, 64)])
@pytest.mark.parametrize("N", [1, 2])
def test_dw_gcols(H, Ci, Co, N):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, H, H, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, Ci, Co)) * 0.1
    g = jax.random.normal(jax.random.fold_in(key, 2), (N, H, H, Co))
    _, pb = jax.vjp(lambda wv: _xla_conv(x, wv, None, 1, 1), w)
    (ref,) = pb(g)
    got = e.dw_gcols(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("H,Ci,Co", [(16, 8, 4), (32, 64, 64), (17, 32, 64)])
@pytest.mark.parametrize("N", [1, 2])
def test_dw_rowdots(H, Ci, Co, N):
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (N, H, H, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, Ci, Co)) * 0.1
    g = jax.random.normal(jax.random.fold_in(key, 2), (N, H, H, Co))
    _, pb = jax.vjp(lambda wv: _xla_conv(x, wv, None, 1, 1), w)
    (ref,) = pb(g)
    got = e.dw_rowdots(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("H,W,Ci,Co", [(16, 16, 8, 4), (32, 32, 64, 64),
                                       (17, 24, 32, 64)])
@pytest.mark.parametrize("N", [1, 2])
def test_dw_rowcols(H, W, Ci, Co, N):
    """The merged one-dot row-band dw equals the XLA conv dw."""
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (N, H, W, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, Ci, Co)) * 0.1
    g = jax.random.normal(jax.random.fold_in(key, 2), (N, H, W, Co))
    _, pb = jax.vjp(lambda wv: _xla_conv(x, wv, None, 1, 1), w)
    (ref,) = pb(g)
    got = e.dw_rowcols(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)
    got2 = e.dw_rowpair02(x, g)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("H,Ci,Co,k,s,p", [(128, 64, 64, 3, 1, 1)])
def test_mid_conv(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    assert e.mid_conv_supported(x, w, s, p)
    _check(lambda x, w, b: e.mid_conv(x, w, b, s, p),
           lambda x, w, b: _xla_conv(x, w, b, s, p), x, w, b)


# CRN bilinear-upsample halving conv (ci = 2co); the form is size-
# agnostic so parity runs small, the >=256^2 dispatch gate is asserted
# separately
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [(32, 128, 64, 3, 1, 1)])
def test_crn_conv(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    _check(lambda x, w, b: e.crn_conv(x, w, b, s, p),
           lambda x, w, b: _xla_conv(x, w, b, s, p), x, w, b)


def test_crn_conv_gates():
    x, w, _ = _mk(256, 128, 64, 3)
    assert e.crn_conv_supported(x, w, 1, 1)
    assert not e.crn_conv_supported(x, w, 2, 1)      # strided
    x, w, _ = _mk(64, 128, 64, 3)                    # too small
    assert not e.crn_conv_supported(x, w, 1, 1)
    x, w, _ = _mk(256, 64, 64, 3)                    # ci != 2co
    assert not e.crn_conv_supported(x, w, 1, 1)


def test_mid_conv_gates():
    x, w, _ = _mk(128, 128, 64, 3)     # ci=128 measured a loss
    assert not e.mid_conv_supported(x, w, 1, 1)
    x, w, _ = _mk(64, 64, 64, 3)       # too small spatially
    assert not e.mid_conv_supported(x, w, 1, 1)


def test_conv2d_dispatches_head_and_stem():
    """ops.conv2d routes lane-starved shapes through edge_conv and the
    result still matches the direct XLA conv."""
    x, w, b = _mk(32, 64, 1, 3)
    y = convmod.conv2d(x, w, b, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_xla_conv(x, w, b, 1, 1)),
                               rtol=2e-5, atol=2e-5)
    x, w, b = _mk(32, 3, 64, 4)
    y = convmod.conv2d(x, w, b, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_xla_conv(x, w, b, 2, 1)),
                               rtol=2e-5, atol=2e-5)


def test_conv_transpose2d_dispatches_head():
    x, w, b = _mk(16, 64, 2, 4)
    y = convmod.conv_transpose2d(x, w, b, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_xla_convt(x, w, b, 2, 1)),
                               rtol=2e-5, atol=2e-5)


def test_mid_channel_shapes_not_dispatched():
    """Normal conv shapes must stay on the native XLA path."""
    x, w, _ = _mk(16, 64, 64, 3)
    assert not e.head_conv_supported(x, w, 1, 1)
    assert not e.stem_conv_supported(x, w, 1, 1)
    x, w, _ = _mk(16, 64, 32, 4)
    assert not e.head_convt_supported(x, w, 2, 1)


# unet trunk k4s2 32->co via the stem dot form (round-3 trunk gate: the
# 32->64 site runs 8.3 TF/s in-context under XLA's T(2,128) layout)
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (32, 32, 64, 4, 2, 1), (16, 16, 32, 4, 2, 1)])
def test_trunk_conv(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    assert e.trunk_conv_supported(x, w, s, p)
    _check(lambda x, w, b: e.stem_conv(x, w, b, s, p),
           lambda x, w, b: _xla_conv(x, w, b, s, p), x, w, b)


def test_trunk_conv_gates():
    x, w, _ = _mk(32, 64, 128, 4)      # ci above the measured win region
    assert not e.trunk_conv_supported(x, w, 2, 1)
    x, w, _ = _mk(32, 32, 64, 3)       # only k4s2
    assert not e.trunk_conv_supported(x, w, 1, 1)


# unet decoder mid-channel convT via the dense phase-dot form
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (16, 64, 32, 4, 2, 1), (8, 128, 64, 4, 2, 1), (8, 32, 8, 4, 2, 1)])
def test_trunk_convt(H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    assert e.trunk_convt_supported(x, w, s, p)
    _check(lambda x, w, b: e.head_convt(x, w, b, s, p),
           lambda x, w, b: _xla_convt(x, w, b, s, p), x, w, b,
           rtol=5e-5)


def test_trunk_convt_gates():
    x, w, _ = _mk(16, 64, 32, 4)
    assert e.trunk_convt_supported(x, w, 2, 1)
    assert not e.trunk_convt_supported(x, w, 2, 0)       # only p=1
    x = jnp.zeros((1, 0, 0, 32), jnp.float32)            # empty spatial
    w = jnp.zeros((4, 4, 32, 32), jnp.float32)
    assert not e.trunk_convt_supported(x, w, 2, 1)


# SGAN_TPU_HCT_BWD: the planar (channel-major cotangent) backward and
# the row-major fwdmode extraction must both match XLA's grads — incl.
# batch > 1, p=2, p=0 and s=3 geometries.
@pytest.mark.parametrize("mode", ["planar", "fwdmode"])
@pytest.mark.parametrize("H,Ci,Co,k,s,p,N", [
    (16, 64, 2, 4, 2, 1, 1), (16, 32, 1, 4, 2, 1, 2),
    (16, 64, 4, 4, 2, 2, 1), (8, 16, 2, 2, 2, 0, 1),
    (9, 16, 2, 3, 3, 0, 1)])
def test_head_convt_bwd_modes(monkeypatch, mode, H, Ci, Co, k, s, p, N):
    monkeypatch.setattr(e, '_HCT_BWD', mode)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, H, H, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, k, Ci, Co)) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (Co,)) * 0.1
    assert e.head_convt_supported(x, w, s, p)
    _check(lambda x, w, b: e.head_convt(x, w, b, s, p),
           lambda x, w, b: _xla_convt(x, w, b, s, p), x, w, b)


# SGAN_TPU_CONVT_PATCHES: the three dW2 patch forms of the planar bwd
# (M-major concat, K-major concat, per-shift dots) are the same math.
@pytest.mark.parametrize("patches", ["mmajor", "kmajor", "shifts"])
@pytest.mark.parametrize("H,Ci,Co,k,s,p,N", [
    (16, 64, 2, 4, 2, 1, 1), (16, 32, 1, 4, 2, 1, 2),
    (9, 16, 2, 3, 3, 0, 1)])
def test_head_convt_bwd_patch_modes(monkeypatch, patches, H, Ci, Co, k, s,
                                    p, N):
    monkeypatch.setattr(e, '_HCT_BWD', 'planar')
    monkeypatch.setattr(e, '_CONVT_PATCHES', patches)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (N, H, H, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, k, Ci, Co)) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (Co,)) * 0.1
    assert e.head_convt_supported(x, w, s, p)
    _check(lambda x, w, b: e.head_convt(x, w, b, s, p),
           lambda x, w, b: _xla_convt(x, w, b, s, p), x, w, b)


# SGAN_TPU_HCT_DW: the row-dot dW forms (no patch reuse) match the
# patch-based planar bwd — k4 s2 p1 geometries only; other geometries
# must fall through to the patches path unchanged.
@pytest.mark.parametrize("dw_mode", ["rowpairs", "rowdots"])
@pytest.mark.parametrize("H,Ci,Co,k,s,p,N", [
    (16, 64, 2, 4, 2, 1, 1), (16, 32, 1, 4, 2, 1, 2),
    (16, 64, 4, 4, 2, 1, 1),
    (9, 16, 2, 3, 3, 0, 1)])   # non-k4s2p1: exercises the fallthrough
def test_head_convt_bwd_dw_modes(monkeypatch, dw_mode, H, Ci, Co, k, s,
                                 p, N):
    monkeypatch.setattr(e, '_HCT_BWD', 'planar')
    monkeypatch.setattr(e, '_HCT_DW', dw_mode)
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (N, H, H, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, k, Ci, Co)) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (Co,)) * 0.1
    assert e.head_convt_supported(x, w, s, p)
    _check(lambda x, w, b: e.head_convt(x, w, b, s, p),
           lambda x, w, b: _xla_convt(x, w, b, s, p), x, w, b)


# SGAN_TPU_HEAD_DOT: the channel-major (kmajor) and row-major head-conv
# dot orientations are the same math in both orders.
@pytest.mark.parametrize("mode", ["kmajor", "rowmajor", "planar"])
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (32, 64, 1, 3, 1, 1), (32, 64, 2, 4, 2, 1)])
def test_head_dot_modes(monkeypatch, mode, H, Ci, Co, k, s, p):
    monkeypatch.setattr(e, '_HEAD_DOT', mode)
    x, w, b = _mk(H, Ci, Co, k)
    _check(lambda x, w, b: e.head_conv(x, w, b, s, p),
           lambda x, w, b: _xla_conv(x, w, b, s, p), x, w, b)


# SGAN_TPU_S2D=rows: H-deinterleave patch builder must match the
# canonical space-to-depth form (fwd + all grads) at the stem shapes.
@pytest.mark.parametrize("H,Ci,Co,k,s,p", [
    (32, 3, 64, 4, 2, 1), (32, 2, 32, 4, 2, 1), (32, 1, 32, 4, 2, 1)])
def test_stem_conv_s2d_rows(monkeypatch, H, Ci, Co, k, s, p):
    x, w, b = _mk(H, Ci, Co, k)
    monkeypatch.setattr(e, '_S2D_MODE', 'rows')
    assert e.stem_conv_supported(x, w, s, p)
    _check(lambda x, w, b: e.stem_conv(x, w, b, s, p),
           lambda x, w, b: _xla_conv(x, w, b, s, p), x, w, b)


# SGAN_TPU_S2D=planar: channel-major phase-plane patch builder (fwd +
# grads), incl. stride-1 stems, trunk ci=32 shapes and batch > 1.
@pytest.mark.parametrize("H,Ci,Co,k,s,p,N", [
    (32, 3, 64, 4, 2, 1, 1), (32, 2, 32, 4, 2, 1, 2),
    (32, 1, 32, 4, 2, 1, 1), (32, 2, 64, 3, 1, 1, 1),
    (16, 32, 64, 4, 2, 1, 1), (33, 2, 16, 6, 3, 0, 1)])
def test_stem_conv_s2d_planar(monkeypatch, H, Ci, Co, k, s, p, N):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, H, H, Ci), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, k, Ci, Co)) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (Co,)) * 0.1
    monkeypatch.setattr(e, '_S2D_MODE', 'planar')
    _check(lambda x, w, b: e.stem_conv(x, w, b, s, p),
           lambda x, w, b: _xla_conv(x, w, b, s, p), x, w, b)


@pytest.mark.parametrize("H,Ci,Co", [(128, 64, 64), (130, 32, 48)])
def test_mid_conv_bandpair(monkeypatch, H, Ci, Co):
    """SGAN_TPU_MID_FWD=bandpair routes mid fwd AND dx through the
    banded pair-dot form; semantics unchanged vs the XLA conv."""
    monkeypatch.setattr(e, "_MID_FWD", "bandpair")
    x, w, b = _mk(H, Ci, Co, 3)
    assert e._mid_band_ok(x, 1, 1)
    _check(lambda x, w, b: e.mid_conv(x, w, b, 1, 1),
           lambda x, w, b: _xla_conv(x, w, b, 1, 1), x, w, b)


def test_mid_bandpair_gate_falls_back(monkeypatch):
    """Odd width or batch > 1 can't pair-pack: the XLA path is used and
    stays correct."""
    monkeypatch.setattr(e, "_MID_FWD", "bandpair")
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 33, 33, 64), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 64, 64)) * 0.1
    assert not e._mid_band_ok(x, 1, 1)
    _check(lambda x, w, b: e.mid_conv(x, w, b, 1, 1),
           lambda x, w, b: _xla_conv(x, w, b, 1, 1), x, w,
           jnp.zeros((64,)))


def test_band_pair_out_matches_dus_form():
    """The einsum-with-constant-mask _band_pair_out is bit-identical to
    the explicit block placement it replaced."""
    w = jax.random.normal(jax.random.PRNGKey(11), (3, 3, 24, 40),
                          jnp.float32)
    got = e._band_pair_out(w)
    ci, co = 24, 40
    ref = np.zeros((3, 2, 2 * ci, 2 * co), np.float32)
    wn = np.asarray(w)
    for ky in range(3):
        for s in range(2):
            for p_in in range(2):
                for p_out in range(2):
                    kx = 2 * s + p_in - p_out
                    if 0 <= kx < 3:
                        ref[ky, s, p_in * ci:(p_in + 1) * ci,
                            p_out * co:(p_out + 1) * co] = wn[ky, kx]
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize("H,Ci,Co", [(32, 64, 64), (16, 24, 40)])
def test_dw_rowdots_cmajor(H, Ci, Co):
    """The lane-aligned channel-major rowdots dw equals the XLA dw."""
    x, w, _ = _mk(H, Ci, Co, 3)
    g = jax.random.normal(jax.random.PRNGKey(5), (1, H, H, Co))
    _, pb = jax.vjp(lambda wv: _xla_conv(x, wv, None, 1, 1), w)
    (ref,) = pb(g)
    got = e.dw_rowdots_cmajor(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_crn_conv_bandpair_dx(monkeypatch):
    """SGAN_TPU_CRN_DX=bandpair routes the crn halving conv's widening dx
    through the banded pair-dot form; vjp unchanged vs XLA."""
    monkeypatch.setattr(e, "_CRN_DX", "bandpair")
    x, w, b = _mk(32, 128, 64, 3)
    _check(lambda x, w, b: e.crn_conv(x, w, b, 1, 1),
           lambda x, w, b: _xla_conv(x, w, b, 1, 1), x, w, b)


@pytest.mark.parametrize("H,Ci,Co", [(16, 128, 32), (10, 24, 8)])
def test_convt_dw_rowdots(H, Ci, Co):
    """The four row-grouped convT dW dots equal XLA's joint dw for the
    k4 s2 p1 lhs-dilated form (pre-flipped kernel storage)."""
    x, w, _ = _mk(H, Ci, Co, 4)
    g = jax.random.normal(jax.random.PRNGKey(9), (1, 2 * H, 2 * H, Co))
    _, pb = jax.vjp(lambda wv: _xla_convt(x, wv, None, 2, 1), w)
    (ref,) = pb(g)
    got = e.convt_dw_rowdots(x, w, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)
    got2 = e.convt_dw_rowpairs(x, w, g)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("H,Ci,Co", [(16, 128, 256), (12, 24, 8)])
def test_conv_dw_rowdots_s2(H, Ci, Co):
    """The eight row-grouped k4s2 conv dW dots equal XLA's joint dw."""
    x, w, _ = _mk(H, Ci, Co, 4)
    oh = H // 2
    g = jax.random.normal(jax.random.PRNGKey(13), (1, oh, oh, Co))
    _, pb = jax.vjp(lambda wv: _xla_conv(x, wv, None, 2, 1), w)
    (ref,) = pb(g)
    got = e.conv_dw_rowdots_s2(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_trunk_dw_conv_vjp():
    """trunk_dw_conv (XLA fwd/dx + rowdots-s2 dw) matches the plain conv
    fwd + vjp."""
    x, w, b = _mk(64, 128, 256, 4)
    assert e.trunk_dw_supported(x, w, 2, 1)
    _check(lambda x, w, b: e.trunk_dw_conv(x, w, b, 2, 1),
           lambda x, w, b: _xla_conv(x, w, b, 2, 1), x, w, b)
