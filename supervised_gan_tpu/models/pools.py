"""Device-resident replay buffers.

The reference's ImagePool (util/image_pool.py:5-42) is host-side Python with
per-image list mutation — a host sync every step.  Here the pool is a ring
buffer *inside the jitted train step*: a (pool_size, H*W*C) HBM array plus
a fill counter, updated with dynamic slices (in-place under buffer
donation).  Semantics are identical per image:

  * while not full: store the image, return it unchanged;
  * when full: with prob (1 - reject) swap a random slot and return the
    evicted image, else pass the image through.

Storage is FLAT per image: a (pool_size, H, W, C) buffer with C=1..3 lanes
tiles to (8,128) with up to 64x lane padding, and its dynamic-update-slice
writes measured 1.37 ms/step on the DSGAN bench (13 GB/s); the flat
(pool_size, H*W*C) layout tiles densely and the same writes run at
bandwidth.  Images are reshaped at the query boundary (one cheap relayout
of the 2 MB image vs a lane-starved ring write).

``sample`` draws random stored images — the fixed-noise pool
(reference models/twostage_cycle_model.py:125-127,196-197).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def init_pool(pool_size, image_shape, dtype=jnp.float32):
    """image_shape: (H, W, C); stored flat as (pool_size, H*W*C)."""
    if pool_size <= 0:
        return None
    flat = int(np.prod(image_shape))
    return {"images": jnp.zeros((pool_size, flat), dtype),
            "num": jnp.zeros((), jnp.int32)}


def _flat_images(pool):
    """Stored buffer as (size, flat); tolerates pre-flat-layout (4-D)
    checkpoints loaded from disk."""
    images = pool["images"]
    if images.ndim > 2:
        images = images.reshape(images.shape[0], -1)
    return images


def pool_query(pool, batch, key, reject=0.5):
    """batch: (B, H, W, C). Returns (pooled_batch, new_pool).

    Branchless formulation: every query performs exactly one dynamic slice
    read and one dynamic slice write (a no-op self-write when the image is
    rejected), so under buffer donation the update is in-place with no
    cond-branch buffer copies.
    """
    if pool is None:
        return batch, pool
    images0 = _flat_images(pool)
    size = images0.shape[0]
    flat_batch = batch.reshape(batch.shape[0], -1)

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
        step, (images0, pool["num"]), (flat_batch, keys))
    return outs.reshape(batch.shape), {"images": images, "num": num}


def pool_sample(pool, batch_size, key, image_shape=None):
    """Draw batch_size random stored images (assumes the pool was filled).
    image_shape: per-image (H, W, C) to reshape into; flat rows if None."""
    images = _flat_images(pool)
    size = images.shape[0]
    slots = jax.random.randint(key, (batch_size,), 0, size)
    out = images[slots]
    if image_shape is not None:
        out = out.reshape((batch_size,) + tuple(image_shape))
    return out


def pool_fill(pool, batch):
    """Host-side helper to pre-fill a pool (fixed-noise pool init)."""
    images = _flat_images(pool)
    n = min(batch.shape[0], images.shape[0])
    flat = batch.reshape(batch.shape[0], -1).astype(images.dtype)
    images = images.at[:n].set(flat[:n])
    return {"images": images,
            "num": jnp.asarray(n, jnp.int32)}
