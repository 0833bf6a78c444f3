"""Pallas TPU kernel: fused InstanceNorm(affine=False) + activation.

The discriminator trunk repeats [conv -> InstanceNorm -> LeakyReLU] and the
generator trunks [convT -> norm -> ReLU] (reference models/networks.py:
814-835 etc.).  XLA lowers the norm+activation pair as a reduction pass
plus a normalize pass — two full reads of the activation.  This kernel
computes the per-(N,C) spatial statistics and writes the activated,
normalized output in ONE pass over VMEM-resident blocks: 1 read + 1 write.

Layout: grid over (batch, channel-blocks); each program owns the full
(H, W) plane of a channel slice, so the spatial reduction never crosses
blocks.  Channel block size is chosen to fit comfortably in VMEM.

The backward pass recomputes statistics with plain XLA ops (the math is
memory-bound either way and autodiff through pallas_call needs an explicit
VJP): dx = (g' - mean(g') - xhat * mean(g' * xhat)) * rsqrt(var + eps),
with g' = g * act'(y).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax


def pallas_available():
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:
        return False


# Backend choice (measured on v5e, bf16 activations):
#   * naive composition leaky_relu(instance_norm(x)): baseline
#   * single fused expression with custom VJP (below): ~1.5-1.75x faster
#     (one select + one cast; the VJP avoids autodiff's materialized
#     intermediates)
#   * the Mosaic kernel: currently SLOWER than the fused expression at the
#     plane sizes that fit its VMEM budget (single big block defeats
#     Mosaic's pipelining, and its scoped-VMEM f32 working set is ~16x the
#     bf16 plane, capping it to small planes anyway).
# So the fused XLA expression is the default backend; the Mosaic kernel is
# kept behind SGAN_TPU_PALLAS_IN=1 for further tuning.
import os

_VMEM_BUDGET = 768 * 1024
_USE_MOSAIC = os.environ.get('SGAN_TPU_PALLAS_IN', '') == '1'
_OUT_BARRIER = os.environ.get('SGAN_TPU_IN_BARRIER', '0') == '1'


def _kernel(x_ref, o_ref, *, eps, slope):
    x = x_ref[...].astype(jnp.float32)          # (1, H, W, C)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if slope is not None:
        y = jnp.where(y >= 0, y, y * slope)     # slope 0.0 == ReLU
    o_ref[...] = y.astype(o_ref.dtype)


def _xla_fallback(x, eps, slope):
    # one-pass statistics.  NO shared x32 node: a single f32 convert of a
    # bf16 512^2 activation feeding several fusions gets MATERIALIZED
    # (64 MB) and relayouted between them (profiled ~1 ms/step of
    # f32[512,512,64] copies at the IN sites, round-3 trace); per-consumer
    # converts duplicate into each fusion instead (convert_reduce_fusion).
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True)
    var = jnp.maximum(msq - mean * mean, 0.0)
    # activate after the cast down — see _fwd
    y = ((x.astype(jnp.float32) - mean)
         * lax.rsqrt(var + eps)).astype(x.dtype)
    if slope is not None:
        y = jnp.where(y >= 0, y, y * jnp.asarray(slope, y.dtype))
    return y


def _forward(x, eps, slope):
    n, h, w, c = x.shape
    if (not _USE_MOSAIC
            or h * w * c * x.dtype.itemsize > _VMEM_BUDGET):
        return _xla_fallback(x, eps, slope)
    from jax.experimental import pallas as pl
    spec = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, slope=slope),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,), in_specs=[spec], out_specs=spec)(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_instance_norm_act(x, eps=1e-5, slope=None):
    """InstanceNorm(affine=False) fused with LeakyReLU(slope) / ReLU
    (slope=0.0) / identity (slope=None). x: (N,H,W,C)."""
    return _forward(x, eps, slope)


def _fwd(x, eps, slope):
    # residuals carry the (tiny) per-channel stats so the backward skips
    # the full statistics pass over x (one read instead of two).
    # Same no-shared-x32 rule as _xla_fallback: per-consumer converts.
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True)
    var = jnp.maximum(msq - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)
    # normalize in f32, but activate AFTER the cast down: the activated
    # output is what crosses to the consumer (often a relayout copy into
    # a dot's rigid canonical layout — edge_conv CRN forms), and a bf16
    # node halves that copy (profiled 0.4 ms/step of f32 512^2 relayout
    # copies at this line, round-3 trace).  Sign is preserved by the
    # cast, so the select is identical; only the slope product rounds
    # once more.
    y = ((x.astype(jnp.float32) - mean) * inv).astype(x.dtype)
    if slope is not None:
        y = jnp.where(y >= 0, y, y * jnp.asarray(slope, y.dtype))
    if _OUT_BARRIER:
        # pin the materialization point to the bf16 activated output:
        # without it, layout assignment relayouts the f32 normalize
        # intermediate into the consumer's (dot) layout BEFORE the
        # downcast — f32 512^2 copies at 2x the bytes (round-3 trace)
        y = lax.optimization_barrier(y)
    return y, (x, mean, inv)


def _bwd(eps, slope, res, g):
    # Keep multi-consumer intermediates in x.dtype (bf16 in the bench
    # step): a shared f32 xhat / g' node gets materialized at 2x the
    # bytes and relayouted between its consumer fusions.  xhat() makes a
    # fresh elementwise subgraph per consumer so each fusion recomputes
    # it from the bf16 x (free — these fusions are bandwidth-bound).
    x, mean, inv = res

    def xhat():
        return (x.astype(jnp.float32) - mean) * inv

    if slope is not None:
        gp = jnp.where(xhat() >= 0, g, g * jnp.asarray(slope, g.dtype))
    else:
        gp = g
    gm = jnp.mean(gp, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    gx = jnp.mean(gp.astype(jnp.float32) * xhat(), axis=(1, 2),
                  keepdims=True)
    dx = (gp.astype(jnp.float32) - gm - xhat() * gx) * inv
    return (dx.astype(x.dtype),)


fused_instance_norm_act.defvjp(_fwd, _bwd)
