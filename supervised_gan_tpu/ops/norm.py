"""Normalization primitives (NHWC).

Matches the reference's two normalizers (models/networks.py:43-50):
  * ``instance`` -> InstanceNorm2d(affine=False): per-(N,C) spatial
    normalization, biased variance, eps 1e-5, no learnable params.
  * ``batch``    -> BatchNorm2d(affine=True): per-C normalization over
    (N,H,W) with learnable scale/shift.

The reference never calls ``.eval()`` on its modules, so BatchNorm always
uses *batch* statistics — including at test time (models load their nets and
run forward in train mode; see e.g. models/fcgan_model.py:136-140).  We
reproduce that: ``batch_norm`` normalizes with batch statistics
unconditionally.  Running stats are still carried so exported ``.pth``
checkpoints are complete.

The mean/var reductions are done in float32 regardless of compute dtype.
"""

import jax.numpy as jnp
from jax import lax


def instance_norm(x, eps=1e-5):
    """x: (N,H,W,C) -> per-(N,C) spatially normalized, no affine.
    Statistics in float32; output keeps x's dtype (bf16 stays bf16)."""
    x32 = x.astype(jnp.float32)
    # one-pass statistics: mean and E[x^2] are sibling reductions of the
    # same operand, so XLA reads x ONCE (vs twice for E[(x-mean)^2]);
    # f32 accumulation keeps the cancellation error below bf16 data noise
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    msq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(msq - mean * mean, 0.0)
    return ((x32 - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def batch_norm(x, weight, bias, eps=1e-5):
    """x: (N,H,W,C), weight/bias: (C,). Batch statistics (train-mode)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
    msq = jnp.mean(jnp.square(x32), axis=(0, 1, 2), keepdims=True)
    var = jnp.maximum(msq - mean * mean, 0.0)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
