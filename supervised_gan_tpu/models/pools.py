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
    """batch: (B, H, W, C). Returns (pooled_batch, new_pool).

    Branchless formulation: every query performs exactly one dynamic slice
    read and one dynamic slice write (a no-op self-write when the image is
    rejected), so under buffer donation the update is in-place with no
    cond-branch buffer copies.
    """
    if pool is None:
        return batch, pool
    size = pool["images"].shape[0]

    def step(carry, inp):
        images, num = carry
        x, k = inp
        x = x.astype(images.dtype)
        k1, k2 = jax.random.split(k)
        not_full = num < size
        p = jax.random.uniform(k1)
        swap = jnp.logical_or(not_full, p > reject)
        slot = jnp.where(not_full, num, jax.random.randint(k2, (), 0, size))
        old = lax.dynamic_index_in_dim(images, slot, 0, keepdims=False)
        # stored image: x when inserting/swapping, else keep (self-write)
        stored = jnp.where(swap, x, old)
        images = lax.dynamic_update_index_in_dim(images, stored, slot, 0)
        # returned image: fresh while filling, evicted one on swap
        out = jnp.where(not_full, x, jnp.where(swap, old, x))
        num = jnp.where(not_full, num + 1, num)
        return (images, num), out

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
