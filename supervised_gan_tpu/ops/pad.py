"""Padding ops (NHWC)."""

import jax.numpy as jnp


def reflection_pad2d(x, padding):
    """ReflectionPad2d. ``padding`` is an int or (left, right, top, bottom).

    Matches torch's (l, r, t, b) ordering — used by the resnet stem
    (reference models/networks.py:232,256) and by util.mul's centered
    broadcast (reference util/util.py:131-145).
    """
    if isinstance(padding, int):
        l = r = t = b = padding
    else:
        l, r, t, b = padding
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode='reflect')
