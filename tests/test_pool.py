"""Device ImagePool semantics vs the reference's host implementation
(util/image_pool.py:13-42)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supervised_gan_tpu.models.pools import (init_pool, pool_query,
                                             pool_sample, pool_fill)


@pytest.mark.slow  # ~2 min of tiny-jit dispatches
def test_pool_fills_then_swaps():
    pool = init_pool(4, (2, 2, 1))
    key = jax.random.PRNGKey(0)
    # while not full, the image passes through unchanged and is stored
    for i in range(4):
        batch = jnp.full((1, 2, 2, 1), float(i))
        out, pool = pool_query(pool, batch, jax.random.fold_in(key, i))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))
    assert int(pool['num']) == 4
    stored = np.asarray(pool['images'])[:, 0, 0, 0]
    np.testing.assert_array_equal(stored, [0, 1, 2, 3])

    # full pool: output is either the new image (reject) or an evicted one
    swaps = 0
    for i in range(200):
        batch = jnp.full((1, 2, 2, 1), 100.0 + i)
        out, pool = pool_query(pool, batch, jax.random.fold_in(key, 10 + i))
        if float(out[0, 0, 0, 0]) != 100.0 + i:
            swaps += 1
    # with reject=0.5 roughly half the queries should swap
    assert 60 < swaps < 140, swaps


def test_pool_none_passthrough():
    batch = jnp.ones((2, 2, 2, 1))
    out, pool = pool_query(None, batch, jax.random.PRNGKey(0))
    assert pool is None
    np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))


def test_pool_batch_sequential_semantics():
    # a batch of 2 into an empty pool of size 1: first fills, second swaps
    pool = init_pool(1, (1, 1, 1))
    batch = jnp.asarray([[[[1.0]]], [[[2.0]]]])
    out, pool = pool_query(pool, batch, jax.random.PRNGKey(3))
    assert int(pool['num']) == 1
    assert float(out[0, 0, 0, 0]) == 1.0


def test_pool_batch_matches_reference_loop():
    """batch>1 pins the reference's PER-IMAGE loop semantics
    (util/image_pool.py:13-33): images are processed in order, the fill
    counter advances within the batch, and each image draws its own
    accept/slot randomness.  The host mirror below replays the reference
    control flow with the same key discipline — outputs and final pool
    state must match exactly (round-5 verdict item 7)."""
    def host_loop(images, num, batch, key, reject=0.5):
        size = images.shape[0]
        keys = jax.random.split(key, batch.shape[0])
        outs = []
        for x, k in zip(np.asarray(batch), keys):
            k1, k2 = jax.random.split(k)
            if num < size:                 # fill: store, pass through
                images[num] = x
                outs.append(x)
                num += 1
            elif float(jax.random.uniform(k1)) > reject:   # swap: evict
                slot = int(jax.random.randint(k2, (), 0, size))
                old = images[slot].copy()
                images[slot] = x
                outs.append(old)
            else:                          # reject: pass through
                outs.append(x)
        return np.stack(outs), images, num

    pool = init_pool(6, (2, 2, 1))
    h_images = np.zeros((6, 2, 2, 1), np.float32)
    h_num = 0
    key = jax.random.PRNGKey(7)
    for step in range(8):                  # batch 4 x 8 crosses fill->full
        batch = jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1, 1) \
            + 10.0 * step
        batch = jnp.broadcast_to(batch, (4, 2, 2, 1))
        k = jax.random.fold_in(key, step)
        out, pool = pool_query(pool, batch, k)
        h_out, h_images, h_num = host_loop(h_images, h_num, batch, k)
        np.testing.assert_array_equal(np.asarray(out), h_out)
    np.testing.assert_array_equal(np.asarray(pool['images']), h_images)
    assert int(pool['num']) == h_num


def test_pool_sample_and_fill():
    pool = init_pool(8, (1, 1, 1))
    batch = jnp.arange(8, dtype=jnp.float32).reshape(8, 1, 1, 1)
    pool = pool_fill(pool, batch)
    assert int(pool['num']) == 8
    s = pool_sample(pool, 16, jax.random.PRNGKey(1))
    vals = set(np.asarray(s).ravel().tolist())
    assert vals.issubset(set(range(8)))
    assert len(vals) > 2


def test_pool_query_inside_jit():
    pool = init_pool(4, (2, 2, 1))

    @jax.jit
    def step(pool, batch, key):
        return pool_query(pool, batch, key)

    out, pool = step(pool, jnp.ones((1, 2, 2, 1)), jax.random.PRNGKey(0))
    assert int(pool['num']) == 1
