"""Fused InstanceNorm+activation: numerics vs the composition, fwd + grad."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from supervised_gan_tpu.ops import instance_norm
from supervised_gan_tpu.ops.pallas import fused_instance_norm_act


@pytest.mark.parametrize("slope", [None, 0.0, 0.2])
def test_fused_forward_matches(slope):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8)) * 3 + 1

    def ref(x):
        y = instance_norm(x)
        if slope is None:
            return y
        return jnp.where(y >= 0, y, y * slope)

    a = np.asarray(ref(x))
    b = np.asarray(fused_instance_norm_act(x, 1e-5, slope))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("slope", [0.0, 0.2])
def test_fused_grad_matches(slope):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)) * 2

    def loss_ref(x):
        y = instance_norm(x)
        y = jnp.where(y >= 0, y, y * slope)
        return jnp.sum(y ** 2)

    def loss_fused(x):
        return jnp.sum(fused_instance_norm_act(x, 1e-5, slope) ** 2)

    ga = np.asarray(jax.grad(loss_ref)(x))
    gb = np.asarray(jax.grad(loss_fused)(x))
    np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-4)


def test_sequential_peephole_dispatch():
    """The IN->LeakyReLU pair in a Sequential produces identical output
    with the fusion enabled and disabled."""
    from supervised_gan_tpu import nn
    from supervised_gan_tpu.nn import core as nn_core

    net = nn.Sequential(nn.Conv2d(3, 8, 3, 1, 1), nn.InstanceNorm2d(8),
                        nn.LeakyReLU(0.2), nn.Conv2d(8, 3, 3, 1, 1))
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    old = nn_core.PALLAS_ENABLED
    try:
        nn_core.set_pallas_enabled(False)
        y0 = np.asarray(net.apply(params, x, nn.Ctx()))
        nn_core.set_pallas_enabled(True)
        y1 = np.asarray(net.apply(params, x, nn.Ctx()))
    finally:
        nn_core.set_pallas_enabled(old)
    np.testing.assert_allclose(y0, y1, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 4e-2)])
@pytest.mark.parametrize("slope", [None, 0.2])
def test_in_fma_form_matches(monkeypatch, dtype, tol, slope):
    """SGAN_TPU_IN_FMA (y = x*s + t in x.dtype) == the subtract form.

    In f32 the fold is near-exact; in bf16 it adds one rounding of s/t
    plus the x*s - mean*s cancellation — bounded by a few bf16 ulps of
    the pre-normalized magnitude."""
    from supervised_gan_tpu.ops.pallas import instance_norm as sin
    x = (jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 32)) * 2
         + 0.5).astype(dtype)
    g = jax.random.normal(jax.random.PRNGKey(10), x.shape).astype(dtype)

    def run():
        def loss(x):
            return jnp.sum(fused_instance_norm_act(x, 1e-5, slope)
                           * g.astype(jnp.float32))
        return (fused_instance_norm_act(x, 1e-5, slope),
                jax.grad(loss)(x))

    monkeypatch.setattr(sin, '_FMA', False)
    y_ref, dx_ref = run()
    monkeypatch.setattr(sin, '_FMA', True)
    y_f, dx_f = run()
    np.testing.assert_allclose(np.asarray(y_f, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=tol, atol=tol)
    # elements where the normalized value sits within a bf16 ulp of the
    # activation threshold can flip the leaky-relu branch between forms
    # (a measure-zero set); exclude them from the gradient comparison
    keep = np.abs(np.asarray(y_ref, np.float32)) > 16 * tol
    np.testing.assert_allclose(np.asarray(dx_f, np.float32)[keep],
                               np.asarray(dx_ref, np.float32)[keep],
                               rtol=4 * tol, atol=4 * tol)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 4e-2)])
@pytest.mark.parametrize("slope", [None, 0.2])
def test_in_stats_pair_matches(monkeypatch, dtype, tol, slope):
    """SGAN_TPU_IN_STATS=pair (one variadic reduce for mean+msq) == the
    two-pass jnp.mean form, forward and backward."""
    from supervised_gan_tpu.ops.pallas import instance_norm as sin
    x = (jax.random.normal(jax.random.PRNGKey(11), (2, 16, 16, 32)) * 2
         + 0.5).astype(dtype)
    g = jax.random.normal(jax.random.PRNGKey(12), x.shape).astype(dtype)

    def run():
        def loss(x):
            return jnp.sum(fused_instance_norm_act(x, 1e-5, slope)
                           * g.astype(jnp.float32))
        return (fused_instance_norm_act(x, 1e-5, slope),
                jax.grad(loss)(x))

    monkeypatch.setattr(sin, '_STATS', '2pass')
    y_ref, dx_ref = run()
    monkeypatch.setattr(sin, '_STATS', 'pair')
    y_p, dx_p = run()
    np.testing.assert_allclose(np.asarray(y_p, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=tol, atol=tol)
    keep = np.abs(np.asarray(y_ref, np.float32)) > 16 * tol
    np.testing.assert_allclose(np.asarray(dx_p, np.float32)[keep],
                               np.asarray(dx_ref, np.float32)[keep],
                               rtol=4 * tol, atol=4 * tol)


# ------------------------- streaming Mosaic backend ------------------- #

@pytest.mark.parametrize("shape,slope", [
    ((1, 16, 16, 64), 0.2),     # P=2 pixel packing
    ((2, 8, 16, 32), None),     # P=4, batched
    ((1, 8, 8, 128), 0.0),      # L = C
    ((1, 8, 8, 256), 0.2),      # C > 128
])
def test_stream_fwd_bwd_matches(monkeypatch, shape, slope):
    """SGAN_TPU_IN_STREAM kernels (interpret mode) == the XLA form."""
    from supervised_gan_tpu.ops.pallas import instance_norm as sin
    x = jax.random.normal(jax.random.PRNGKey(2), shape) * 2 + 0.5
    x = x.astype(jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(3), shape).astype(jnp.bfloat16)
    assert sin.stream_supported(x)

    def run():
        def loss(x):
            return jnp.sum(fused_instance_norm_act(x, 1e-5, slope)
                           * g.astype(jnp.float32))
        y = fused_instance_norm_act(x, 1e-5, slope)
        return y, jax.grad(loss)(x)

    # the stream kernels compute the f32 subtract form — compare against
    # the matching fused form, not the (default) FMA fold
    monkeypatch.setattr(sin, '_FMA', False)
    y_ref, dx_ref = run()
    monkeypatch.setattr(sin, '_IN_STREAM', True)
    monkeypatch.setattr(sin, '_INTERPRET', True)
    y_s, dx_s = run()
    np.testing.assert_allclose(np.asarray(y_s, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dx_s, np.float32),
                               np.asarray(dx_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("shape,slope", [
    ((1, 16, 16, 64), 0.2),
    ((1, 8, 8, 128), None),
    ((1, 8, 8, 256), 0.0),
])
def test_opaque_in_matches_fused(monkeypatch, shape, slope):
    """SGAN_TPU_IN_OPAQUE path (stats via XLA reduces + stream
    apply/backward, interpret mode) == the fused XLA form."""
    from supervised_gan_tpu.ops.pallas import instance_norm as sin
    monkeypatch.setattr(sin, '_INTERPRET', True)
    # the opaque apply/backward kernels compute the f32 subtract form
    monkeypatch.setattr(sin, '_FMA', False)
    x = (jax.random.normal(jax.random.PRNGKey(5), shape) * 2
         + 0.5).astype(jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(6), shape).astype(jnp.bfloat16)
    assert sin.opaque_stream_ok(x.shape)

    def run(f):
        def loss(x):
            return jnp.sum(f(x, 1e-5, slope) * g.astype(jnp.float32))
        return f(x, 1e-5, slope), jax.grad(loss)(x)

    y_ref, dx_ref = run(fused_instance_norm_act)
    y_o, dx_o = run(sin.opaque_instance_norm_act)
    np.testing.assert_allclose(np.asarray(y_o, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dx_o, np.float32),
                               np.asarray(dx_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_opaque_peephole_dispatch(monkeypatch):
    """The Sequential peephole routes [Conv3x3, IN, LReLU] through the
    opaque IN under SGAN_TPU_IN_OPAQUE and matches the gate-off chain."""
    from supervised_gan_tpu.ops.pallas import instance_norm as sin
    from supervised_gan_tpu.ops.pallas import conv3x3 as p3
    from supervised_gan_tpu import nn as snn
    nn_core = snn.core
    monkeypatch.setattr(sin, '_INTERPRET', True)
    monkeypatch.setattr(p3, '_INTERPRET', True)
    seq = nn_core.Sequential(nn_core.Conv2d(128, 128, 3, 1, 1),
                             nn_core.InstanceNorm2d(),
                             nn_core.LeakyReLU(0.2))
    params = seq.init(jax.random.PRNGKey(0))
    ctx = nn_core.Ctx(compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 16, 128))
    y0 = seq.apply(params, x, ctx)
    monkeypatch.setattr(nn_core, '_IN_OPAQUE', True)
    y1 = seq.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y0, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_stream_unsupported_shapes():
    from supervised_gan_tpu.ops.pallas import instance_norm as sin
    assert not sin.stream_supported(jnp.zeros((1, 16, 16, 48)))   # 128 % 48
    assert not sin.stream_supported(jnp.zeros((1, 3, 3, 64)))     # rows % 8
    assert not sin.stream_supported(jnp.zeros((1, 16, 3, 64)))    # (W*C)%128


def test_stream_conv3x3_in_region(monkeypatch):
    """conv3x3_in_act with the streaming norm backend == without."""
    from supervised_gan_tpu.ops.pallas import instance_norm as sin
    from supervised_gan_tpu.ops.pallas import conv3x3 as p3
    from supervised_gan_tpu.ops.pallas import conv3x3_in as p3in
    monkeypatch.setattr(p3, '_INTERPRET', True)
    key = jax.random.PRNGKey(5)
    x = (jax.random.normal(key, (1, 16, 16, 64)) * 0.7).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(6), (3, 3, 64, 64))
         * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((64,), jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(7), x.shape)

    def run():
        def loss(x, w, b):
            return jnp.sum(p3in.conv3x3_in_act(x, w, b, 1e-5, 0.2)
                           * g.astype(jnp.float32))
        y = p3in.conv3x3_in_act(x, w, b, 1e-5, 0.2)
        return (y,) + jax.grad(loss, argnums=(0, 1))(x, w, b)

    # interpret-mode pallas needs the min-pixels gate lowered
    monkeypatch.setattr(p3, '_MIN_PIXELS', 0)
    y_ref, dx_ref, dw_ref = run()
    monkeypatch.setattr(sin, '_IN_STREAM', True)
    monkeypatch.setattr(sin, '_INTERPRET', True)
    y_s, dx_s, dw_s = run()
    for a, r in ((y_s, y_ref), (dx_s, dx_ref), (dw_s, dw_ref)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=3e-2, atol=3e-2)
