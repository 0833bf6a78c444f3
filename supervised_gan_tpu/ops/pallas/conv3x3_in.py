"""Fused conv3x3 + InstanceNorm(affine=False) [+ ReLU/LeakyReLU] region.

The round-2 lesson (BENCH_NOTES.md): ops living inside XLA fusions must be
beaten INSIDE a fusion or not at all.  The CRN trunk's 512^2 c64
[conv3x3 -> IN -> ReLU] region (reference models/networks.py:767-794) is
such a fusion chain: the conv runs as the pixel-packed Pallas kernel
(conv3x3.py), but the following InstanceNorm pays a separate full
statistics pass over the 33 MB plane.

This op extends the conv kernel with a per-lane (sum, sum-of-squares)
f32 accumulator carried across grid steps, so the IN statistics come out
of the conv pass for FREE; the normalize+activation is then a single XLA
elementwise pass (one read + one write) that fuses with its neighbors.

Backward is a hand-owned composition of the measured-fast pieces (no XLA
joint fusion is forfeited because the region's backward never was one):
  * act mask from the recomputed normalized value,
  * the standard IN backward
      dconv = rstd * (g' - mean(g') - xhat * mean(g' * xhat)),
  * dx via the SAME pallas conv kernel with the flipped kernel,
  * dw via the nine-dot contraction (conv3x3._dw_9dot),
  * db = sum(dconv)  (analytically ~0 — IN removes the bias — but kept
    so gradients match the reference composition bit-for-bit in spirit).

Dispatched from the Sequential peephole (nn/core.py) for
[Conv2d(3x3, supported), InstanceNorm2d, (Leaky)ReLU] chains; the
activation may be absent (slope=None).
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import conv3x3 as p3

# Region-scoped streaming norm: the GLOBAL streaming-IN backend
# (SGAN_TPU_IN_STREAM) measured a -21.7 ms de-fusion negative, but inside
# THIS region the normalize sits between two pallas custom calls (the
# conv kernel and its dx), so there is no XLA fusion to destroy — the
# streamed bf16 passes replace the f32-materializing XLA chain at the
# region boundary only.  Default ON (the region itself is gated by
# SGAN_TPU_CONV3_IN); SGAN_TPU_CONV3_IN_STREAM=0 restores the XLA norm.
_REGION_STREAM = _os.environ.get('SGAN_TPU_CONV3_IN_STREAM', '1') == '1'


def _stream_ok(y):
    # inorm._INTERPRET (not p3's) gates the CPU path: the stream kernels
    # run with interpret=inorm._INTERPRET, so a region test that only
    # interprets the conv must keep the XLA norm.
    from . import instance_norm as inorm
    return ((inorm._IN_STREAM or _REGION_STREAM)
            and (inorm._INTERPRET or jax.default_backend() == 'tpu')
            and inorm.stream_supported(y))


def supported(x, w, stride, padding):
    return p3.supported(x, w, stride, padding)


def _kernel(w_ref, b_ref, x_hbm, o_ref, st_ref, xbuf, *rest, BH, W2, S):
    sems = rest[-1]
    sbufs = rest[:-1]
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(block, slot):
        return pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(block * BH, BH + 2)],
            xbuf.at[slot],
            sems.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    xb = xbuf[i % 2]
    for s in range(1, S):
        sbufs[s - 1][...] = xb[:, s:W2 + s, :]

    L = xb.shape[-1]
    M = BH * W2
    acc = jnp.zeros((M, L), jnp.float32)
    for ky in range(3):
        for s in range(S):
            op = (xb[ky:ky + BH, 0:W2, :] if s == 0
                  else sbufs[s - 1][ky:ky + BH])
            acc += jnp.dot(op.reshape(M, L), w_ref[ky * S + s],
                           preferred_element_type=jnp.float32)
    acc += b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(BH, W2, L).astype(o_ref.dtype)
    # per-lane statistics of the (f32) conv output, accumulated across
    # the grid — the IN statistics pass disappears into the conv
    st = jnp.stack([jnp.sum(acc, 0), jnp.sum(acc * acc, 0)])

    @pl.when(i == 0)
    def _():
        st_ref[...] = st

    @pl.when(i > 0)
    def _():
        st_ref[...] += st


def _fwd_impl(x, w, b, eps):
    """Returns (y_conv (1,H,W,C) in x.dtype, mean (C,), rstd (C,))."""
    N, H, W, C = x.shape
    P = 1 if C % 128 == 0 else 128 // C
    S = 2 if P >= 2 else 3
    L = P * C
    W2 = W // P
    BH = p3._pick_bh(H)
    W2P = -(-(W2 + S - 1) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, P * W2P - W - 1), (0, 0)))
    xpp = xp.reshape(1, H + 2, W2P, L)
    wB = p3._band_weights(w, P)
    bL = (jnp.zeros((C,), x.dtype) if b is None else b.astype(x.dtype))
    bL = jnp.tile(bL, P).reshape(1, L)
    ypp, st = pl.pallas_call(
        functools.partial(_kernel, BH=BH, W2=W2, S=S),
        grid=(H // BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # banded weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias row
            pl.BlockSpec(memory_space=pltpu.ANY),        # packed x in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, BH, W2, L), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, H, W2, L), x.dtype),
            jax.ShapeDtypeStruct((2, L), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BH + 2, W2P, L), x.dtype),
        ] + [pltpu.VMEM((BH + 2, W2, L), x.dtype) for _ in range(S - 1)] + [
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=p3._INTERPRET,
    )(wB, bL, xpp)
    y = ypp.reshape(1, H, W, C)
    # fold the P pixel groups back to per-channel stats
    s1 = jnp.sum(st[0].reshape(P, C), 0)
    s2 = jnp.sum(st[1].reshape(P, C), 0)
    npix = float(H * W)
    mean = s1 / npix
    var = jnp.maximum(s2 / npix - mean * mean, 0.0)
    rstd = lax.rsqrt(var + eps)
    return y, mean, rstd


def _norm_act(y, mean, rstd, slope):
    from . import instance_norm as inorm
    if _stream_ok(y):
        # one streamed bf16 pass (see instance_norm.py: the XLA form
        # materializes the shared f32 normalize chain)
        return inorm.stream_apply(y, mean[None], rstd[None], slope)
    z = (y.astype(jnp.float32) - mean) * rstd
    if slope is not None:
        z = jnp.where(z >= 0, z, z * slope)
    return z.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_in_act(x, w, b, eps, slope):
    """act(InstanceNorm(conv3x3_same(x, w, b))).  slope None -> no act;
    slope 0.0 -> ReLU; else LeakyReLU(slope).  Callers gate on
    ``supported``."""
    y, mean, rstd = _fwd_impl(x, w, b, eps)
    return _norm_act(y, mean, rstd, slope)


def _vjp_fwd(x, w, b, eps, slope):
    y, mean, rstd = _fwd_impl(x, w, b, eps)
    return _norm_act(y, mean, rstd, slope), (x, w, b is not None, y, mean,
                                             rstd)


def _vjp_bwd(eps, slope, res, g):
    x, w, has_b, y, mean, rstd = res
    from . import instance_norm as inorm
    if _stream_ok(y):
        # act bwd + IN bwd as two streamed bf16 passes over (y, g)
        dconv = inorm.stream_norm_bwd(y, g, mean[None], rstd[None], slope)
    else:
        g = g.astype(jnp.float32)
        z = (y.astype(jnp.float32) - mean) * rstd  # normalized value
        if slope is not None:
            g = jnp.where(z >= 0, g, g * slope)    # act backward
        # IN backward (per-channel spatial reductions)
        gm = jnp.mean(g, axis=(1, 2), keepdims=True)
        gzm = jnp.mean(g * z, axis=(1, 2), keepdims=True)
        dconv = (rstd * (g - gm - z * gzm)).astype(x.dtype)
    # conv backward: pallas dx + nine-dot dw
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = p3._conv3x3_fwd(dconv, w_flip, None)
    dw = p3._dw_9dot(x, dconv).astype(w.dtype)
    db = jnp.sum(dconv, axis=(0, 1, 2)) if has_b else None
    return dx, dw, db


conv3x3_in_act.defvjp(_vjp_fwd, _vjp_bwd)
