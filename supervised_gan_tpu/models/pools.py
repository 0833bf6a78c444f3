"""Device-resident replay buffers.

The reference's ImagePool (util/image_pool.py:5-42) is host-side Python with
per-image list mutation — a host sync every step.  Here the pool is a ring
buffer *inside the jitted train step*: a (pool_size, H, W, C) HBM array plus
a fill counter, updated with dynamic slices (in-place under buffer
donation).  Semantics are identical per image:

  * while not full: store the image, return it unchanged;
  * when full: with prob (1 - reject) swap a random slot and return the
    evicted image, else pass the image through.

``sample`` draws random stored images — the fixed-noise pool
(reference models/twostage_cycle_model.py:125-127,196-197).
"""

import jax
import jax.numpy as jnp
from jax import lax


def init_pool(pool_size, image_shape, dtype=jnp.float32):
    """image_shape: (H, W, C)."""
    if pool_size <= 0:
        return None
    return {"images": jnp.zeros((pool_size,) + tuple(image_shape), dtype),
            "num": jnp.zeros((), jnp.int32)}


def pool_query(pool, batch, key, reject=0.5):
    """batch: (B, H, W, C). Returns (pooled_batch, new_pool)."""
    if pool is None:
        return batch, pool
    size = pool["images"].shape[0]

    def step(carry, inp):
        images, num = carry
        x, k = inp
        k1, k2 = jax.random.split(k)

        def not_full(args):
            images, num = args
            images = lax.dynamic_update_index_in_dim(images, x, num, 0)
            return (images, num + 1), x

        def full(args):
            images, num = args
            p = jax.random.uniform(k1)
            rid = jax.random.randint(k2, (), 0, size)
            old = lax.dynamic_index_in_dim(images, rid, 0, keepdims=False)
            swap = p > reject
            out = jnp.where(swap, old, x)
            images = lax.cond(
                swap,
                lambda im: lax.dynamic_update_index_in_dim(im, x, rid, 0),
                lambda im: im, images)
            return (images, num), out

        return lax.cond(num < size, not_full, full, (images, num))

    keys = jax.random.split(key, batch.shape[0])
    (images, num), outs = lax.scan(
        step, (pool["images"], pool["num"]), (batch, keys))
    return outs, {"images": images, "num": num}


def pool_sample(pool, batch_size, key):
    """Draw batch_size random stored images (assumes the pool was filled)."""
    size = pool["images"].shape[0]
    slots = jax.random.randint(key, (batch_size,), 0, size)
    return pool["images"][slots]


def pool_fill(pool, batch):
    """Host-side helper to pre-fill a pool (fixed-noise pool init)."""
    n = min(batch.shape[0], pool["images"].shape[0])
    images = pool["images"].at[:n].set(batch[:n])
    return {"images": images,
            "num": jnp.asarray(n, jnp.int32)}
