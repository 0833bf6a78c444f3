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
