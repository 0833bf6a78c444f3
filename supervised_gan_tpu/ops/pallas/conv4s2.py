"""Pallas TPU kernel: 4x4 stride-2 pad-1 convolution, pixel-packed lanes.

The k4s2p1 conv is the workhorse of the zoo's downsampling paths: every
PatchGAN discriminator trunk layer (reference models/networks.py:798-847),
every U-Net down conv (:373-419), and the DCGAN stacks.  In the DSGAN
train step the D2 bank alone runs dozens of these per iteration - by far
the largest FLOP block.

Scheme (sibling of conv3x3.py; see its docstring for the general idea):
with stride 2, viewing the input as (H, W/2, 2*Ci) - two adjacent pixels
packed into the channel dim, a free row-major reshape - makes the input
tuple count equal the OUTPUT pixel count.  The 4 horizontal taps then
become exactly 3 tuple-shift operands:

  out[p] (Co lanes) = sum_ky sum_{s=0..2} xp_tuple[2y+ky, p+s] @ B[ky, s]

where xp is the 2-px-left-padded image and B[ky, s] (2Ci, Co) holds
w[ky, kx] at pixel-slot i with kx = 2s + i - 1 (so s=0 and s=2 are
half-dense, s=1 full): 12 dots of K=2Ci>=128, N=Co per row block, 1.5x
executed-FLOP padding, zero lane padding.  The 4 vertical taps are free
major-dim row slices of the (2*BH+2)-row halo block (reshaped
(BH+1, 2, W2P, L) so the stride-2 row access is a pure major-dim index).
Halo blocks are DMA'd HBM->VMEM double-buffered; the two shifted operand
copies are the only relayouts.

Backward runs through XLA's joint conv transpose (same decision as
conv3x3.py: measured faster end-to-end than a split pallas backward).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import conv3x3 as _c3   # shares interpret/disable flags


def supported(x, w, stride, padding):
    if _c3._DISABLED:
        return False
    if x.ndim != 4 or w.ndim != 4:
        return False
    n, h, wd, ci = x.shape
    kh, kw, wci, co = w.shape
    if (kh, kw) != (4, 4) or wci != ci:
        return False
    if stride not in (2, (2, 2)) or padding not in (1, (1, 1), ((1, 1), (1, 1))):
        return False
    if n != 1:
        return False
    if ci % 64 or ci < 64:          # K = 2*Ci must fill the 128 lanes
        return False
    if co % 64 or co < 64:
        return False
    if h % 2 or wd % 2 or (wd // 2) % 8 or (h // 2) % 8:
        return False
    if h < 32:
        return False
    return True


def _band_weights(w):
    """(4, 4, Ci, Co) -> (12, 2*Ci, Co): B[ky*3+s] row-block i holds
    w[ky, 2s+i-1] (zero outside [0, 4))."""
    ci, co = w.shape[2], w.shape[3]
    z = jnp.zeros((ci, co), w.dtype)
    mats = []
    for ky in range(4):
        for s in range(3):
            rows = []
            for i in range(2):
                kx = 2 * s + i - 1
                rows.append([w[ky, kx]] if 0 <= kx < 4 else [z])
            mats.append(jnp.block(rows))
    return jnp.stack(mats)


def _kernel(w_ref, b_ref, x_hbm, o_ref, xbuf, s1, s2, sems, *, BH, W2):
    """BH output rows per step; halo block is 2*BH+2 input rows."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    R = 2 * BH + 2

    def dma(block, slot):
        return pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(block * 2 * BH, R)],
            xbuf.at[slot],
            sems.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    xb = xbuf[i % 2]                       # (R, W2P, L)
    s1[...] = xb[:, 1:W2 + 1, :]
    s2[...] = xb[:, 2:W2 + 2, :]

    L = xb.shape[-1]
    Co = o_ref.shape[-1]
    M = BH * W2
    # stride-2 vertical access: row 2r+ky == pair (r + ky//2), phase ky%2
    half = R // 2
    xb2 = xb.reshape(half, 2, xb.shape[1], L)
    s1_2 = s1.reshape(half, 2, W2, L)
    s2_2 = s2.reshape(half, 2, W2, L)

    acc = jnp.zeros((M, Co), jnp.float32)
    for ky in range(4):
        off, ph = ky // 2, ky % 2
        ops = (xb2[off:off + BH, ph, 0:W2, :],
               s1_2[off:off + BH, ph],
               s2_2[off:off + BH, ph])
        for s in range(3):
            acc += jnp.dot(ops[s].reshape(M, L), w_ref[ky * 3 + s],
                           preferred_element_type=jnp.float32)
    acc += b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(BH, W2, Co).astype(o_ref.dtype)


def _pick_bh(ho):
    for bh in (16, 8):
        if ho % bh == 0:
            return bh
    return None


def _conv4s2_fwd(x, w, b):
    N, H, W, Ci = x.shape
    Co = w.shape[3]
    L = 2 * Ci
    W2 = W // 2
    Ho = H // 2
    BH = _pick_bh(Ho)
    W2P = -(-(W2 + 2) // 8) * 8
    # rows pad (1,1); cols: 2-px left pad (one tuple), right to alignment
    xp = jnp.pad(x, ((0, 0), (1, 1), (2, 2 * W2P - W - 2), (0, 0)))
    xpp = xp.reshape(1, H + 2, W2P, L)
    wB = _band_weights(w)
    bL = (jnp.zeros((Co,), x.dtype) if b is None else b.astype(x.dtype))
    bL = bL.reshape(1, Co)
    ypp = pl.pallas_call(
        functools.partial(_kernel, BH=BH, W2=W2),
        grid=(Ho // BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, BH, W2, Co), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Ho, W2, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * BH + 2, W2P, L), x.dtype),
            pltpu.VMEM((2 * BH + 2, W2, L), x.dtype),
            pltpu.VMEM((2 * BH + 2, W2, L), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=_c3._INTERPRET,
    )(wB, bL, xpp)
    return ypp


def _xla_conv(x, w, b):
    y = lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


@jax.custom_vjp
def conv4s2_same(x, w, b):
    """4x4 stride-2 pad-1 conv via the pixel-packed Pallas kernel.
    Callers must gate on ``supported(...)``; semantics match
    ops.conv.conv2d(x, w, b, stride=2, padding=1)."""
    return _conv4s2_fwd(x, w, b)


def _vjp_fwd(x, w, b):
    return _conv4s2_fwd(x, w, b), (x, w, b is not None)


def _vjp_bwd(res, g):
    x, w, has_b = res
    _, pullback = jax.vjp(lambda xv, wv: _xla_conv(xv, wv, None), x, w)
    dx, dw = pullback(g)
    db = jnp.sum(g, axis=(0, 1, 2)) if has_b else None
    return dx, dw, db


conv4s2_same.defvjp(_vjp_fwd, _vjp_bwd)
