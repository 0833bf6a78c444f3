"""Op-level numerics tests against torch CPU oracles.

Each op in supervised_gan_tpu/ops must match the corresponding torch
functional op the reference relies on (cuDNN semantics), within fp32
tolerance.  Layout: ours NHWC/HWIO, torch NCHW/OIHW.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from supervised_gan_tpu import ops

RNG = np.random.RandomState(0)
TOL = dict(rtol=2e-5, atol=2e-5)


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


@pytest.mark.parametrize("stride,padding,k", [(2, 1, 4), (1, 1, 4), (1, 1, 3),
                                              (2, 1, 3), (1, 0, 7), (1, 2, 5)])
def test_conv2d(stride, padding, k):
    x = RNG.randn(2, 16, 16, 3).astype(np.float32)
    w = RNG.randn(k, k, 3, 5).astype(np.float32)
    b = RNG.randn(5).astype(np.float32)
    y = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                   stride, padding)
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # HWIO -> OIHW
    yt = F.conv2d(torch.from_numpy(nchw(x)), wt, torch.from_numpy(b),
                  stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(y), nhwc(yt.numpy()), **TOL)


@pytest.mark.parametrize("stride,padding,k", [(2, 1, 4), (1, 0, 4), (2, 1, 3)])
def test_conv_transpose2d(stride, padding, k):
    x = RNG.randn(2, 8, 8, 3).astype(np.float32)
    wt_np = RNG.randn(3, 5, k, k).astype(np.float32)  # torch (in,out,kh,kw)
    b = RNG.randn(5).astype(np.float32)
    # our layout: pre-flipped HWIO
    w = np.transpose(wt_np, (2, 3, 0, 1))[::-1, ::-1].copy()
    y = ops.conv_transpose2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             stride, padding)
    yt = F.conv_transpose2d(torch.from_numpy(nchw(x)),
                            torch.from_numpy(wt_np), torch.from_numpy(b),
                            stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(y), nhwc(yt.numpy()), **TOL)


def test_instance_norm():
    x = RNG.randn(2, 12, 12, 6).astype(np.float32) * 3 + 1
    y = ops.instance_norm(jnp.asarray(x))
    yt = F.instance_norm(torch.from_numpy(nchw(x)))
    np.testing.assert_allclose(np.asarray(y), nhwc(yt.numpy()), **TOL)


def test_batch_norm_train_stats():
    x = RNG.randn(4, 8, 8, 5).astype(np.float32) * 2 - 1
    w = RNG.randn(5).astype(np.float32)
    b = RNG.randn(5).astype(np.float32)
    y = ops.batch_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    yt = F.batch_norm(torch.from_numpy(nchw(x)), None, None,
                      torch.from_numpy(w), torch.from_numpy(b),
                      training=True)
    np.testing.assert_allclose(np.asarray(y), nhwc(yt.numpy()), **TOL)


@pytest.mark.parametrize("k,s", [(2, 2), (4, 4), (64, 64), (2, None)])
def test_avg_pool(k, s):
    x = RNG.randn(1, 64, 64, 3).astype(np.float32)
    y = ops.avg_pool(jnp.asarray(x), k, s)
    yt = F.avg_pool2d(torch.from_numpy(nchw(x)), k, s or k)
    np.testing.assert_allclose(np.asarray(y), nhwc(yt.numpy()), **TOL)


@pytest.mark.parametrize("scale", [2, 4])
def test_bilinear_upsample_align_corners(scale):
    # torch 0.3 nn.Upsample(mode='bilinear') == align_corners=True
    x = RNG.randn(1, 16, 16, 3).astype(np.float32)
    y = ops.bilinear_upsample(jnp.asarray(x), scale)
    yt = F.interpolate(torch.from_numpy(nchw(x)), scale_factor=scale,
                       mode='bilinear', align_corners=True)
    np.testing.assert_allclose(np.asarray(y), nhwc(yt.numpy()), **TOL)


def test_reflection_pad():
    x = RNG.randn(1, 8, 8, 3).astype(np.float32)
    y = ops.reflection_pad2d(jnp.asarray(x), 3)
    yt = F.pad(torch.from_numpy(nchw(x)), (3, 3, 3, 3), mode='reflect')
    np.testing.assert_allclose(np.asarray(y), nhwc(yt.numpy()), **TOL)

    y2 = ops.reflection_pad2d(jnp.asarray(x), (1, 2, 0, 3))
    yt2 = F.pad(torch.from_numpy(nchw(x)), (1, 2, 0, 3), mode='reflect')
    np.testing.assert_allclose(np.asarray(y2), nhwc(yt2.numpy()), **TOL)


def test_matlab_gauss2d_matches_fspecial():
    # golden values for fspecial('gaussian', [5 5], 1)
    k = ops.matlab_gauss2d((5, 5), 1)
    assert k.shape == (5, 5)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(k[2, 2], 0.16210282, rtol=1e-5)
    np.testing.assert_allclose(k[0, 0], 0.00296902, rtol=1e-4)


@pytest.mark.parametrize("scale", [2, 4])
def test_blur_downsample(scale):
    """Oracle: the reference's frozen gauss_filter Sequential
    (depthwise fspecial conv pad=2*sigma + AvgPool2d(k=1, stride=scale))."""
    x = RNG.randn(1, 32, 32, 2).astype(np.float32)
    y = ops.blur_downsample(jnp.asarray(x), scale)

    sigma = scale // 2
    kw = 4 * sigma + 1
    g = ops.matlab_gauss2d((kw, kw), sigma)
    filt = np.zeros((2, 2, kw, kw), dtype=np.float32)
    filt[0, 0] = g
    filt[1, 1] = g
    xt = torch.from_numpy(nchw(x))
    yt = F.conv2d(xt, torch.from_numpy(filt), padding=2 * sigma)
    yt = F.avg_pool2d(yt, kernel_size=1, stride=scale)
    np.testing.assert_allclose(np.asarray(y), nhwc(yt.numpy()), **TOL)


def test_conv2d_bf16_accumulates_f32():
    x = RNG.randn(1, 8, 8, 16).astype(np.float32)
    w = RNG.randn(3, 3, 16, 16).astype(np.float32)
    y32 = ops.conv2d(jnp.asarray(x), jnp.asarray(w), padding=1)
    ybf = ops.conv2d(jnp.asarray(x), jnp.asarray(w), padding=1,
                     compute_dtype=jnp.bfloat16)
    # mixed-precision path keeps activations in bf16 (less HBM traffic);
    # the MXU still accumulates in f32 so the values stay close
    assert ybf.dtype == jnp.bfloat16
    err = np.abs(np.asarray(y32) - np.asarray(ybf, dtype=np.float32)).max()
    assert err < 0.35, err


def test_cat_channels_keeps_generated_dtype():
    """cat_channels must cast the conditioning side to the generated
    side's dtype instead of letting jnp.concatenate promote the pair to
    f32 (the promotion made the D-stem backward carry an f32 cotangent
    through the un-space-to-depth relayout — BENCH_NOTES round 3)."""
    from supervised_gan_tpu.models.common import cat_channels
    a = jnp.ones((1, 4, 4, 3), jnp.float32)
    b = jnp.full((1, 4, 4, 2), 0.5, jnp.bfloat16)
    y = cat_channels(a, b)
    assert y.dtype == jnp.bfloat16
    assert y.shape == (1, 4, 4, 5)
    # f32 pair stays f32 (the real/real pair path)
    y2 = cat_channels(a, a)
    assert y2.dtype == jnp.float32


def test_xla_convt_dw_rowpair_matches_joint_vjp(monkeypatch):
    """SGAN_TPU_XLA_CONVT_DW=rowpair swaps only the dw half of the
    plain-XLA convT path (unet_256 decoder sites) for
    edge_conv.convt_dw_rowpairs — forward, dx, dw, db must all match the
    joint XLA VJP (round-5 perf candidate, gate default OFF)."""
    from supervised_gan_tpu.ops import conv as conv_mod
    rng = np.random.RandomState(0)
    for (h, w, ci, co) in [(2, 2, 16, 8), (8, 8, 24, 32), (5, 6, 4, 4)]:
        x = jnp.asarray(rng.randn(1, h, w, ci), jnp.float32)
        W = jnp.asarray(rng.randn(4, 4, ci, co), jnp.float32)
        b = jnp.asarray(rng.randn(co), jnp.float32)
        g = jnp.asarray(rng.randn(1, 2 * h, 2 * w, co), jnp.float32)

        def loss(x, W, b):
            return jnp.sum(conv_mod.conv_transpose2d(x, W, b) * g)

        y0 = conv_mod.conv_transpose2d(x, W, b)
        g0 = jax.grad(loss, (0, 1, 2))(x, W, b)
        monkeypatch.setattr(conv_mod, '_XLA_CONVT_DW', 'rowpair')
        y1 = conv_mod.conv_transpose2d(x, W, b)
        g1 = jax.grad(loss, (0, 1, 2))(x, W, b)
        monkeypatch.setattr(conv_mod, '_XLA_CONVT_DW', '')
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-5, atol=1e-5)
        for a, bb in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-4, atol=1e-4)
