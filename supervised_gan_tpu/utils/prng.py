"""Pure-numpy threefry-2x32 fold_in, bit-exact with jax.random.fold_in.

Per-step training keys are consumed on the host side of every train-step
dispatch (models/base.py).  Computing the fold with jax costs either two
device dispatches per step (device backend) or — far worse through the
remote-execution relay — a synchronous ~30 ms value fetch (any "CPU
backend" result still lives behind the relay).  The cipher is 20 lines
of uint32 arithmetic, so run it in numpy; tests/test_utils_extra.py
asserts exact equality with jax.random.fold_in across keys and data.
"""

import numpy as np

_ROTATIONS = ((13, 15, 26, 6), (17, 29, 16, 24))
_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x, d):
    return (x << np.uint32(d)) | (x >> np.uint32(32 - d))


def threefry2x32(key, count):
    """key: (2,) uint32; count: (2,) uint32 -> (2,) uint32."""
    old = np.seterr(over='ignore')
    try:
        ks0, ks1 = np.uint32(key[0]), np.uint32(key[1])
        ks2 = ks0 ^ ks1 ^ _PARITY
        x0 = np.uint32(count[0]) + ks0
        x1 = np.uint32(count[1]) + ks1
        ks = (ks0, ks1, ks2)
        for i in range(5):
            for r in _ROTATIONS[i % 2]:
                x0 = x0 + x1
                x1 = _rotl(x1, r)
                x1 = x1 ^ x0
            x0 = x0 + ks[(i + 1) % 3]
            x1 = x1 + ks[(i + 2) % 3] + np.uint32(i + 1)
    finally:
        np.seterr(**old)
    return np.asarray([x0, x1], np.uint32)


def fold_in(key, data):
    """Bit-exact jax.random.fold_in for raw uint32[2] keys."""
    data = int(data)
    count = np.asarray([(data >> 32) & 0xFFFFFFFF, data & 0xFFFFFFFF],
                       np.uint32)
    return threefry2x32(np.asarray(key, np.uint32), count)
