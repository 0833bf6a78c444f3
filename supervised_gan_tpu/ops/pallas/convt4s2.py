"""Pallas TPU kernel: 4x4 stride-2 pad-1 transposed convolution (and the
identical lhs-dilated dx of every 4x4 stride-2 forward conv).

XLA lowers ConvTranspose as a conv over the zero-dilated input
(ops/conv.py:conv_transpose2d) and runs it at ~3-7% of the v5e MXU peak at
the zoo's shapes (tools/microbench.py): the dilated input defeats its
tiling (3 of 4 taps hit structural zeros) and the small output channel
counts leave lanes empty.  The reference's G1/F2 upsampling stacks
(reference models/networks.py:493-540 FCGAN, :560-641 unet) and the dx of
every PatchGAN stride-2 conv (:798-847) are exactly this op.

Scheme — the pixel-packed family of ops/pallas/conv3x3.py, generalised to
stride-2 upsampling with Ci != Co:

  * input tuples of T adjacent pixels share the lane dim: L_in = T*Ci
    lanes (T minimal with T*Ci % 128 == 0 and 2*T*Co % 128 == 0).
  * each input tuple produces ONE output tuple of 2T pixels, L_out =
    2T*Co lanes: the stride-2 column interleave is absorbed into the
    banded block weights, so the packed output is literally the row-major
    NHWC output — no interleave pass exists anywhere.
  * out row Y = 2m+q: q=0 rows need x rows {m-1, m} (taps ky 0/2), q=1
    rows need {m, m+1} (taps 1/3) — free major-dim slices of the halo
    block.  The output block (BH, 2, U, L_out) is a free row-major view
    of (2*BH, W_out, Co).
  * columns: out pixel X = 2n+r needs x cols {n-1+r, n+r}; with a 1-px
    left pad the span per out tuple is xp tuples [t, t+S), S = 2 for
    T >= 2 else 3 — S-1 shifted VMEM copies per block, exactly like the
    3x3 kernel's tuple-shift operands.
  * T = 1 (every Ci >= 128 site — the big convTs and every dx of the
    PatchGAN k4s2 stack): the column structure is exact, not banded —
    out half pi of the tuple is sum_u dot(operand_{s=pi+u}, w[ky, pi+2u])
    with plain (Ci, Co) weight blocks: 16 dots per block and ZERO
    executed-FLOP padding.
  * T = 2 (Ci = 64 sites): banded weights
    B[q, tap, s][i*Ci:(i+1)*Ci, pi*Co:(pi+1)*Co] = w[ky(q,tap), kx] with
    kx = 2*s*T + 2*i - pi when 0 <= kx < 4; 2x executed-FLOP padding.
  * halo rows (BH+2) DMA'd HBM->VMEM double-buffered one block ahead.

`w` is the repo's stored pre-flipped HWIO ConvTranspose kernel — the same
tensor lax.conv_general_dilated consumes (utils/pth.py converts torch
layout at the boundary); dx of a forward k4s2p1 conv is this op with
flip(w).transpose(0,1,3,2) (see conv3x3.py backward notes).
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
_DISABLED = _os.environ.get('SGAN_TPU_CONVT', '') == '0'
_MIN_PIXELS = int(_os.environ.get('SGAN_TPU_CONVT_MIN_PIXELS', 16 * 16))


def _set_interpret(flag):
    global _INTERPRET
    _INTERPRET = bool(flag)


def _tuple_pixels(ci, co):
    for t in (1, 2, 4, 8):
        if (t * ci) % 128 == 0 and (2 * t * co) % 128 == 0:
            return t
    return None


def _pick_bh(h):
    for bh in (16, 8):
        if h % bh == 0:
            return bh
    return None


def supported(x, w, stride=2, padding=1, output_padding=0):
    """k4 s2 p1 op0, batch 1, lane-alignable channels, H % 8 == 0."""
    if _DISABLED:
        return False
    if x.ndim != 4 or w.ndim != 4:
        return False
    n, h, wd, ci = x.shape
    kh, kw, wci, co = w.shape
    if n != 1 or (kh, kw) != (4, 4) or wci != ci:
        return False
    if stride not in (2, (2, 2)) or padding not in (1, (1, 1)):
        return False
    if output_padding not in (0, (0, 0)):
        return False
    t = _tuple_pixels(ci, co)
    if t is None or wd % t or _pick_bh(h) is None:
        return False
    u = wd // t
    if u < 8:
        return False
    if not _INTERPRET and h * wd < _MIN_PIXELS:
        return False
    # VMEM: 2 halo buffers + S-1 shifted copies + weights must fit
    s = 2 if t >= 2 else 3
    bh = _pick_bh(h)
    wp = -(-(u + s - 1) // 8) * 8
    l_in, l_out = t * ci, 2 * t * co
    itemsize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    wbytes = (16 * ci * co if t == 1 else 4 * s * l_in * l_out) * itemsize
    vmem = (2 * (bh + 2) * wp * l_in * itemsize          # halo dbl buffer
            + (s - 1) * (bh + 2) * u * l_in * itemsize    # shifted copies
            + wbytes
            + 2 * bh * u * l_out * itemsize               # output block
            + 2 * bh * u * l_out * 4)                     # f32 accumulators
    return vmem < 13 * 1024 * 1024


# row-tap geometry: out row 2m+q, tap j reads halo row mm + _ROW_OFF[q][j]
# with weight row _KY[q][j]  (halo row 0 = x[m0-1]).
_KY = ((0, 2), (1, 3))
_ROW_OFF = ((0, 1), (1, 2))


def _phase_weights(w):
    """T=1 exact form: (4, 4, Ci, Co) -> (2, 2, 2, 2, Ci, Co) indexed
    [q, tap, pi, u] = w[_KY[q][tap], pi + 2*u]; operand shift s = pi + u."""
    return jnp.stack([
        jnp.stack([
            jnp.stack([
                jnp.stack([w[_KY[q][tap], pi + 2 * u] for u in range(2)])
                for pi in range(2)])
            for tap in range(2)])
        for q in range(2)])


def _band_weights(w, T, S):
    """(4, 4, Ci, Co) -> (2, 2, S, T*Ci, 2T*Co) banded block matrices."""
    ci, co = w.shape[2], w.shape[3]
    z = jnp.zeros((ci, co), w.dtype)
    out = []
    for q in range(2):
        taps = []
        for j in range(2):
            ky = _KY[q][j]
            ss = []
            for s in range(S):
                rows = []
                for i in range(T):
                    row = []
                    for pi in range(2 * T):
                        kx = 2 * s * T + 2 * i - pi
                        row.append(w[ky, kx] if 0 <= kx < 4 else z)
                    rows.append(row)
                ss.append(jnp.block(rows))
            taps.append(jnp.stack(ss))
        out.append(jnp.stack(taps))
    return jnp.stack(out)            # (2, 2, S, L_in, L_out)


def _kernel(w_ref, b_ref, x_hbm, o_ref, xbuf, *rest, BH, U, S, T):
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
    xb = xbuf[i % 2]                       # (BH+2, Wp, L_in)
    for s in range(1, S):
        sbufs[s - 1][...] = xb[:, s:U + s, :]

    l_in = xb.shape[-1]
    l_out = o_ref.shape[-1]
    M = BH * U
    bias = b_ref[0].astype(jnp.float32)

    def operand(d, s):
        op = (xb[d:d + BH, 0:U, :] if s == 0
              else sbufs[s - 1][d:d + BH])
        return op.reshape(M, l_in)

    for q in range(2):
        if T == 1:
            # exact phase form: out half pi = sum over taps, u of
            # operand_{s=pi+u} @ w[ky, pi+2u]; zero FLOP padding
            halves = []
            for pi in range(2):
                acc = jnp.zeros((M, l_out // 2), jnp.float32)
                for j in range(2):
                    d = _ROW_OFF[q][j]
                    for u in range(2):
                        acc += jnp.dot(operand(d, pi + u),
                                       w_ref[q, j, pi, u],
                                       preferred_element_type=jnp.float32)
                halves.append(acc)
            acc = jnp.concatenate(halves, axis=-1)
        else:
            acc = jnp.zeros((M, l_out), jnp.float32)
            for j in range(2):
                d = _ROW_OFF[q][j]
                for s in range(S):
                    acc += jnp.dot(operand(d, s), w_ref[q, j, s],
                                   preferred_element_type=jnp.float32)
        acc += bias
        o_ref[0, :, q] = acc.reshape(BH, U, l_out).astype(o_ref.dtype)


def _convt_fwd(x, w, b):
    """x: (1,H,W,Ci) -> (1,2H,2W,Co); w: (4,4,Ci,Co) pre-flipped HWIO."""
    N, H, W, Ci = x.shape
    Co = w.shape[3]
    T = _tuple_pixels(Ci, Co)
    S = 2 if T >= 2 else 3
    U = W // T
    L_in, L_out = T * Ci, 2 * T * Co
    BH = _pick_bh(H)
    Wp = -(-(U + S - 1) // 8) * 8
    # 1 row top/bottom (row halo), 1 px left + aligned right pad (col halo)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, T * Wp - W - 1), (0, 0)))
    xpp = xp.reshape(1, H + 2, Wp, L_in)
    wB = (_phase_weights(w) if T == 1 else _band_weights(w, T, S))
    wB = wB.astype(x.dtype)
    bL = (jnp.zeros((Co,), x.dtype) if b is None else b.astype(x.dtype))
    bL = jnp.tile(bL, 2 * T).reshape(1, L_out)
    ypp = pl.pallas_call(
        functools.partial(_kernel, BH=BH, U=U, S=S, T=T),
        grid=(H // BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # banded weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias row
            pl.BlockSpec(memory_space=pl.ANY),        # packed x in HBM
        ],
        out_specs=pl.BlockSpec((1, BH, 2, U, L_out),
                               lambda i: (0, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, 2, U, L_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, BH + 2, Wp, L_in), x.dtype),
        ] + [pltpu.VMEM((BH + 2, U, L_in), x.dtype) for _ in range(S - 1)] + [
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=_INTERPRET,
    )(wB, bL, xpp)
    return ypp.reshape(1, 2 * H, 2 * W, Co)


def _xla_convt(x, w, b):
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


@jax.custom_vjp
def convt4s2(x, w, b):
    """4x4 stride-2 pad-1 ConvTranspose via the pixel-packed Pallas kernel.

    Callers must gate on ``supported(...)``; semantics match
    ops.conv.conv_transpose2d(x, w, b, stride=2, padding=1).
    """
    return _convt_fwd(x, w, b)


def _vjp_fwd(x, w, b):
    return _convt_fwd(x, w, b), (x, w, b is not None)


# backward form: 'rowpairdw' (default; batch-34 A/B 27.89 -> 27.72 ms:
# the two ky rows per cotangent phase merged into one (2ci, 4co) dot —
# edge_conv.convt_dw_rowpairs); 'rowdw' (batch-29: dx XLA, dw as four
# row-grouped (ci, 4co) dots with no x patch concat —
# edge_conv.convt_dw_rowdots); 'xla' = joint XLA grads of the
# lhs-dilated conv (its dw half runs at 48-56 GB/s at the F2 decoder
# sites); 'dense'/'densedw' = the patch-concat phase forms (both
# measured negative, batches 14/19)
_BWD_MODE = _os.environ.get('SGAN_TPU_CONVT_BWD', 'rowpairdw')


def _vjp_bwd(res, g):
    x, w, has_b = res
    if _BWD_MODE == 'dense':
        from .. import edge_conv
        return edge_conv._head_convt_vjp_bwd(2, 1, (x, w, has_b), g)
    if _BWD_MODE == 'densedw':
        # dx via XLA's strided conv (strong); ONLY the 53 GB/s dw half
        # replaced by the dense phase-plane form (edge_conv)
        from .. import edge_conv
        _, pullx = jax.vjp(lambda xv: _xla_convt(xv, w, None), x)
        (dx,) = pullx(g)
        dw = edge_conv.convt_dw_planar(x, w, g, 2, 1)
        db = jnp.sum(g, axis=(0, 1, 2)) if has_b else None
        return dx, dw, db
    if _BWD_MODE in ('rowdw', 'rowpairdw'):
        # dx via XLA; dw as row-grouped (ci, 4co) dots with NO x patch
        # concat (edge_conv.convt_dw_rowdots — batch-29 arm); rowpairdw
        # merges the two ky rows per cotangent phase into one dot
        from .. import edge_conv
        _, pullx = jax.vjp(lambda xv: _xla_convt(xv, w, None), x)
        (dx,) = pullx(g)
        if _BWD_MODE == 'rowpairdw':
            dw = edge_conv.convt_dw_rowpairs(x, w, g).astype(w.dtype)
        else:
            dw = edge_conv.convt_dw_rowdots(x, w, g).astype(w.dtype)
        db = jnp.sum(g, axis=(0, 1, 2)) if has_b else None
        return dx, dw, db
    # joint XLA grads of the equivalent lhs-dilated conv: dx is a plain
    # k4s2 conv (XLA strong, BENCH_NOTES k4s2 measurements), dw a strided
    # contraction
    _, pullback = jax.vjp(lambda xv, wv: _xla_convt(xv, wv, None), x, w)
    dx, dw = pullback(g)
    db = jnp.sum(g, axis=(0, 1, 2)) if has_b else None
    return dx, dw, db


convt4s2.defvjp(_vjp_fwd, _vjp_bwd)
