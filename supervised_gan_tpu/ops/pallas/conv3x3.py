"""Pallas TPU kernel: 3x3 stride-1 SAME convolution, pixel-packed lanes.

The CRN trunk (the DSGAN G2 — reference models/networks.py:767-794) and the
label-embed blocks (:684-709) are chains of 3x3 pad-1 convolutions at
C=64 channels and 256-512px.  XLA's conv at these shapes runs ~10-20% of
the v5e MXU peak: with C=64 the channel (lane) dimension fills only half
of the 128-lane registers and a quarter of the MXU's KxN face, and its
im2col-style tap gathers pay Mosaic sublane relayouts per tap
(BENCH_NOTES.md round-1 measurements).

This kernel reformulates the conv so every MXU dot is a full (M, P*C) x
(P*C, P*C) matmul with P*C = 128 lanes:

  * "pixel packing": activations are viewed as (N, H, W/P, P*C) where P =
    128/C adjacent pixels share the 128-lane dimension (a free row-major
    reshape).  No lane padding anywhere - DMA, VPU and MXU all run full.
  * the 3 horizontal taps become S = (2 if P >= 2 else 3) *tuple-shift*
    operands: operand s is the input block shifted s tuples left, and its
    (P*C, P*C) weight matrix B_s holds w[ky, kx] at channel-block (i, j)
    where kx = s*P + i - j (0 <= kx < 3), i.e. a banded block matrix.
    For P=2 the executed-FLOP padding is 4/3; for P=1 it is exactly 1.
  * the 3 vertical taps are free row-slices of the halo block (major-dim
    indexing costs nothing), so a block needs only S-1 shifted VMEM
    copies total - not one relayout per tap like an im2col.
  * the halo block (BH+2 rows) is DMA'd HBM->VMEM double-buffered, one
    block ahead of compute, following the double-buffering pattern of the
    Pallas TPU guide.

Measured on v5e (512x512, C=64, bf16, slope methodology that cancels the
relay's fixed ~30 ms fetch cost): XLA conv 0.61 ms; this kernel 0.32 ms
including the NHWC<->packed conversions, 0.16 ms when the activation
stays packed between ops.

Backward: dx is the same SAME-conv with the kernel flipped and transposed
(w'[ky,kx,i,o] = w[2-ky,2-kx,o,i]), so it reuses this kernel at full
speed.  dw contracts over all spatial positions; it is computed with the
XLA transpose rule of the equivalent lax conv (a single large matmul-like
contraction XLA handles well).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False      # set True in tests to run the kernel on CPU

# Below this many pixels XLA's fused, VMEM-resident conv wins end-to-end;
# the DSGAN-bench A/B ladder (BENCH_NOTES.md round 2) measured the kernel
# net-negative even at 256^2 inside the full step (layout conversions do
# not fuse), so the default dispatches at 512^2 and up.
import os as _os
_MIN_PIXELS = int(_os.environ.get('SGAN_TPU_CONV3_MIN_PIXELS', 512 * 512))
_DISABLED = _os.environ.get('SGAN_TPU_CONV3', '') == '0'
# Backward mode (SGAN_TPU_CONV3_PALLAS_BWD) — default '0', XLA's joint
# conv-grad.  The v2 dw kernel measures 5.1x in isolation (0.282 ms vs
# XLA's 1.438 at 512px c64) but every split variant LOSES end-to-end on
# the DSGAN bench (profiled A/B, BENCH_NOTES round 2):
#   '2': XLA dx + pallas dw v2 — 45.8 vs 40.4 ms/step device time: the
#        split forfeits the joint fusion's shared relayouts and epilogue
#        fusions (+3.7 ms data formatting, +1.6 broadcast).
#   '3': pallas dx + pallas dw v2 — worse still (+5 ms of de-fused
#        instance-norm passes around the opaque dx custom-call).
#   '1': v1 split (M-contracted dw) — the round-2 original negative.
_PALLAS_BWD = _os.environ.get('SGAN_TPU_CONV3_PALLAS_BWD', '0')


def _set_interpret(flag):
    global _INTERPRET
    _INTERPRET = bool(flag)


def supported(x, w, stride, padding):
    """Fast path applies to: batch-1 NHWC, k3 s1 p1, C_in == C_out with
    P = 128/C integer (C in {16, 32, 64}) or C a multiple of 128, spatial
    dims divisible by the block size."""
    if _DISABLED:
        return False
    if x.ndim != 4 or w.ndim != 4:
        return False
    n, h, wd, c = x.shape
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3) or ci != c or co != c:
        return False
    if stride not in (1, (1, 1)) or padding not in (1, (1, 1), ((1, 1), (1, 1))):
        return False
    if n != 1:
        return False
    if c % 128 == 0:
        p = 1
    elif 128 % c == 0:
        p = 128 // c
    else:
        return False
    if wd % p or h % 8 or (wd // p) % 8:
        return False
    if h < 16:
        return False
    if not _INTERPRET and h * wd < _MIN_PIXELS:
        return False
    return True


@functools.lru_cache(maxsize=None)
def _band_select(P, S):
    """Constant 0/1 selector: sel[m, i, j, t] = 1 iff block (i, j) of
    banded matrix m = ky*S + s holds tap t = ky*3 + kx, kx = s*P + i - j."""
    import numpy as np
    sel = np.zeros((3 * S, P, P, 9), np.float32)
    for ky in range(3):
        for s in range(S):
            for i in range(P):
                for j in range(P):
                    kx = s * P + i - j
                    if 0 <= kx < 3:
                        sel[ky * S + s, i, j, ky * 3 + kx] = 1.0
    return sel


def _band_weights(w, P):
    """(3, 3, C, C) -> (3*S, P*C, P*C) banded block matrices.

    Block (i, j) of B[ky, s] is w[ky, kx] with kx = s*P + i - j when
    0 <= kx < 3, else zero.  Input tuples are of the 1-px-left-padded
    image (xp[c] = x[c-1]); output tuples are pixel-aligned.

    Built as ONE selection dot against a constant 0/1 tensor: the
    jnp.block/stack form lowered to ~54 latency-bound DUS fusions/step
    (1.4 ms/step at the bench's conv sites, round-3 trace); each sum has
    at most one nonzero term, so the bf16 dot is exact.
    """
    C = w.shape[2]
    P = int(P)
    S = 2 if P >= 2 else 3
    sel = jnp.asarray(_band_select(P, S), w.dtype)
    wB = jnp.einsum('mijt,tab->miajb', sel, w.reshape(9, C, C))
    return wB.reshape(3 * S, P * C, P * C)


def _kernel(w_ref, b_ref, x_hbm, o_ref, xbuf, *rest, BH, W2, S):
    sems = rest[-1]
    sbufs = rest[:-1]          # S-1 shift scratch buffers
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
    xb = xbuf[i % 2]                     # (BH+2, W2P, L) current halo block
    for s in range(1, S):
        sbufs[s - 1][...] = xb[:, s:W2 + s, :]   # the only relayout copies

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


def _pick_bh(h):
    for bh in (16, 8):
        if h % bh == 0:
            return bh
    return None


def _conv3x3_fwd(x, w, b):
    """x: (1, H, W, C) -> (1, H, W, C); w: (3, 3, C, C); b: (C,) or None."""
    N, H, W, C = x.shape
    P = 1 if C % 128 == 0 else 128 // C
    S = 2 if P >= 2 else 3
    L = P * C
    W2 = W // P
    BH = _pick_bh(H)
    W2P = -(-(W2 + S - 1) // 8) * 8
    # left pad 1 px (tap geometry), right pad to the aligned packed width
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, P * W2P - W - 1), (0, 0)))
    xpp = xp.reshape(1, H + 2, W2P, L)
    wB = _band_weights(w, P)
    bL = (jnp.zeros((C,), x.dtype) if b is None else b.astype(x.dtype))
    bL = jnp.tile(bL, P).reshape(1, L)
    ypp = pl.pallas_call(
        functools.partial(_kernel, BH=BH, W2=W2, S=S),
        grid=(H // BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # banded weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias row
            pl.BlockSpec(memory_space=pltpu.ANY),        # packed x in HBM
        ],
        out_specs=pl.BlockSpec((1, BH, W2, L), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W2, L), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, BH + 2, W2P, L), x.dtype),
        ] + [pltpu.VMEM((BH + 2, W2, L), x.dtype) for _ in range(S - 1)] + [
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=_INTERPRET,
    )(wB, bL, xpp)
    return ypp.reshape(1, H, W, C)


def _dw_kernel(g_hbm, x_hbm, o_ref, xbuf, gbuf, *rest, BH, W2, S):
    """dwB[ky*S+s] = sum over all pixels of operand_{ky,s}(x)^T @ g.

    Same operands as the forward (halo block + shifted copies, free dy row
    slices); the contraction runs over the M (pixel) dim, so both x and g
    stream in their standard layouts - this is what makes the pallas
    backward transpose-free where XLA's dw conv forces ~2.5 ms minor-dim
    relayout copies of every 512^2 operand (profiled; BENCH_NOTES round 2).
    Accumulates into the (3S, L, L) f32 output across grid steps.
    """
    sems = rest[-1]
    sbufs = rest[:-1]
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma_x(block, slot):
        return pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(block * BH, BH + 2)],
            xbuf.at[slot], sems.at[slot])

    def dma_g(block, slot):
        return pltpu.make_async_copy(
            g_hbm.at[0, pl.ds(block * BH, BH)],
            gbuf.at[slot], sems.at[2 + slot])

    @pl.when(i == 0)
    def _():
        dma_x(0, 0).start()
        dma_g(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma_x(i + 1, (i + 1) % 2).start()
        dma_g(i + 1, (i + 1) % 2).start()

    dma_x(i, i % 2).wait()
    dma_g(i, i % 2).wait()
    xb = xbuf[i % 2]
    for s in range(1, S):
        sbufs[s - 1][...] = xb[:, s:W2 + s, :]

    L = xb.shape[-1]
    M = BH * W2
    gm = gbuf[i % 2].reshape(M, L)
    for ky in range(3):
        for s in range(S):
            op = (xb[ky:ky + BH, 0:W2, :] if s == 0
                  else sbufs[s - 1][ky:ky + BH])
            d = jax.lax.dot_general(
                op.reshape(M, L), gm,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(i == 0)
            def _(d=d, ky=ky, s=s):
                o_ref[ky * S + s] = d

            @pl.when(i > 0)
            def _(d=d, ky=ky, s=s):
                o_ref[ky * S + s] += d


def _unband_dw(dB, P, C):
    """Transpose of _band_weights: fold the (3S, PC, PC) banded gradients
    back to (3, 3, C, C) by summing every block position a tap occupies."""
    S = 2 if P >= 2 else 3
    dw = jnp.zeros((3, 3, C, C), dB.dtype)
    for ky in range(3):
        for s in range(S):
            for i in range(P):
                for j in range(P):
                    kx = s * P + i - j
                    if 0 <= kx < 3:
                        blk = dB[ky * S + s, i * C:(i + 1) * C,
                                 j * C:(j + 1) * C]
                        dw = dw.at[ky, kx].add(blk)
    return dw


def _conv3x3_dw(x, g):
    """dw for the SAME conv via the pallas reduction kernel."""
    N, H, W, C = x.shape
    P = 1 if C % 128 == 0 else 128 // C
    S = 2 if P >= 2 else 3
    L = P * C
    W2 = W // P
    BH = _pick_bh(H)
    W2P = -(-(W2 + S - 1) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, P * W2P - W - 1), (0, 0)))
    xpp = xp.reshape(1, H + 2, W2P, L)
    gpp = g.reshape(1, H, W2, L)           # exactly W2 tuples - free view
    dB = pl.pallas_call(
        functools.partial(_dw_kernel, BH=BH, W2=W2, S=S),
        grid=(H // BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # g packed
            pl.BlockSpec(memory_space=pltpu.ANY),        # x packed + padded
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * S, L, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BH + 2, W2P, L), x.dtype),
            pltpu.VMEM((2, BH, W2, L), g.dtype),
        ] + [pltpu.VMEM((BH + 2, W2, L), x.dtype) for _ in range(S - 1)] + [
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=_INTERPRET,
    )(gpp, xpp)
    return _unband_dw(dB, P, C).astype(x.dtype)


def _dwT_kernel(gt_hbm, x_hbm, o_ref, xbuf, gbuf, *rest, BH, W2, S):
    """dw reduction v2: natural-form MXU dots, zero in-kernel relayouts.

    v1's dots contracted over the M (pixel) dim of two (M, L) operands,
    which Mosaic implements by relaying out an operand per tap — measured
    slower than XLA's joint transpose (BENCH_NOTES round 2).  Here g
    arrives PRE-TRANSPOSED from XLA as (L, H*W2) (one relayout of the
    whole array, ~0.1 ms), so every dot is
        dBt[tap] += dot((L, M_blk) g-block, (M_blk, L) x-operand)
    — contraction over lanes-of-LHS x sublanes-of-RHS, the MXU's native
    orientation.  X-side tap slices stay free exactly as in the forward
    kernel.  Output is dw banded and transposed: dBt[tap][l_g, l_x].
    """
    sems = rest[-1]
    sbufs = rest[:-1]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    M = BH * W2

    def dma_x(block, slot):
        return pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(block * BH, BH + 2)],
            xbuf.at[slot], sems.at[slot])

    def dma_g(block, slot):
        return pltpu.make_async_copy(
            gt_hbm.at[:, pl.ds(block * M, M)],
            gbuf.at[slot], sems.at[2 + slot])

    @pl.when(i == 0)
    def _():
        dma_x(0, 0).start()
        dma_g(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma_x(i + 1, (i + 1) % 2).start()
        dma_g(i + 1, (i + 1) % 2).start()

    dma_x(i, i % 2).wait()
    dma_g(i, i % 2).wait()
    xb = xbuf[i % 2]
    gb = gbuf[i % 2]                      # (L, M)
    for s in range(1, S):
        sbufs[s - 1][...] = xb[:, s:W2 + s, :]

    L = xb.shape[-1]
    for ky in range(3):
        for s in range(S):
            op = (xb[ky:ky + BH, 0:W2, :] if s == 0
                  else sbufs[s - 1][ky:ky + BH])
            d = jax.lax.dot_general(
                gb, op.reshape(M, L),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(i == 0)
            def _(d=d, ky=ky, s=s):
                o_ref[ky * S + s] = d

            @pl.when(i > 0)
            def _(d=d, ky=ky, s=s):
                o_ref[ky * S + s] += d


def dw_v2_supported(x, g):
    """Geometry gate for _conv3x3_dw_v2 (same packing rules as the fwd
    kernel); callers must also gate on the TPU backend."""
    n, h, w, c = x.shape
    if x.shape != g.shape or n != 1:
        return False
    if c % 128 == 0:
        p = 1
    elif 128 % c == 0:
        p = 128 // c
    else:
        return False
    return (w % p == 0 and h % 8 == 0 and (w // p) % 8 == 0
            and _pick_bh(h) is not None and h * w >= 128 * 128)


def _conv3x3_dw_v2(x, g):
    """dw via the natural-orientation pallas reduction kernel."""
    N, H, W, C = x.shape
    P = 1 if C % 128 == 0 else 128 // C
    S = 2 if P >= 2 else 3
    L = P * C
    W2 = W // P
    BH = _pick_bh(H)
    W2P = -(-(W2 + S - 1) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, P * W2P - W - 1), (0, 0)))
    xpp = xp.reshape(1, H + 2, W2P, L)
    gT = g.reshape(H * W2, L).T            # ONE XLA relayout
    dBt = pl.pallas_call(
        functools.partial(_dwT_kernel, BH=BH, W2=W2, S=S),
        grid=(H // BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # g transposed
            pl.BlockSpec(memory_space=pl.ANY),          # x packed + padded
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * S, L, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BH + 2, W2P, L), x.dtype),
            pltpu.VMEM((2, L, BH * W2), g.dtype),
        ] + [pltpu.VMEM((BH + 2, W2, L), x.dtype) for _ in range(S - 1)] + [
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        interpret=_INTERPRET,
    )(gT, xpp)
    dB = dBt.transpose(0, 2, 1)
    return _unband_dw(dB, P, C).astype(x.dtype)


def _dw_9dot(x, g):
    """Weight gradient as nine K-major MXU dots.

    XLA's own dw for a 512^2 c64 3x3 conv lowers to a 3.4%-of-peak fusion
    (1.87 ms isolated, the two largest ops of the round-3 DSGAN device
    profile); contracting each tap's shifted input slice against the
    cotangent as an explicit (HW, C) x (HW, Co) dot runs 0.34 ms — 5.5x —
    with no Mosaic involvement, so the dx conv keeps its XLA fusions
    (the round-2 split-backward penalty does not apply; BENCH_NOTES.md
    round 3)."""
    n, h, w_, c = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g2 = g.reshape(-1, co)
    outs = []
    for ky in range(3):
        for kx in range(3):
            xs = lax.slice(xp, (0, ky, kx, 0), (n, ky + h, kx + w_, c))
            outs.append(lax.dot_general(
                xs.reshape(-1, c), g2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(outs).reshape(3, 3, c, co)


_DW_MODE = _os.environ.get('SGAN_TPU_CONV3_DW', 'rowdots')
# dx form under the dot-dw modes: 'pallas' (the forward pixel-packed
# kernel on the flipped/io-transposed weights — DEFAULT, measured
# 34.05 -> 33.39 ms device on the DSGAN bench, BENCH_NOTES round 3
# batch 3) | 'xla' (conv_general_dilated — keeps XLA's epilogue fusions)
_DX_MODE = _os.environ.get('SGAN_TPU_CONV3_DX', 'pallas')


def _xla_conv(x, w, b):
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


@jax.custom_vjp
def conv3x3_same(x, w, b):
    """3x3 stride-1 pad-1 conv via the pixel-packed Pallas kernel.

    Callers must gate on ``supported(...)``; semantics match
    ops.conv.conv2d(x, w, b, stride=1, padding=1).
    """
    return _conv3x3_fwd(x, w, b)


def _vjp_fwd(x, w, b):
    return _conv3x3_fwd(x, w, b), (x, w, b is not None)


def _vjp_bwd(res, g):
    x, w, has_b = res
    if _PALLAS_BWD in ('1', '2', '3'):
        # dx: SAME conv of g with the flipped, io-transposed kernel.
        w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        if _PALLAS_BWD == '2':
            dx = _xla_conv(g, w_flip, None)     # fusible with IN bwd
        else:
            dx = _conv3x3_fwd(g, w_flip, None)
        if _PALLAS_BWD == '1':
            dw = _conv3x3_dw(x, g)
        elif dw_v2_supported(x, g):
            dw = _conv3x3_dw_v2(x, g)
        else:
            # v2 geometry gate failed (e.g. SGAN_TPU_CONV3_MIN_PIXELS
            # lowered below the kernel's packing rules): XLA dw.
            _, pb = jax.vjp(lambda wv: _xla_conv(x, wv, None), w)
            (dw,) = pb(g)
    elif _DW_MODE in ('9dot', 'gcols', 'rowdots', 'rowdots_cm', 'rowcols',
                      'rowpair02'):
        # XLA dx conv (keeps its fusions) + dot-form dw: nine K-major
        # dots (9dot), one pre-transposed single dot (gcols), or three
        # free-view row dots (rowdots — see ops/edge_conv.dw_rowdots)
        w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        if _DX_MODE == 'pallas' and supported(g, w_flip, 1, 1):
            # dx through the pixel-packed forward kernel (same geometry
            # as the primal conv); trades the XLA conv's epilogue
            # fusions for the kernel's higher MXU rate — A/B gated.
            dx = _conv3x3_fwd(g, w_flip, None)
        else:
            dx = _xla_conv(g, w_flip, None)
        if _DW_MODE == 'gcols':
            from ..edge_conv import dw_gcols
            dw = dw_gcols(x, g).astype(w.dtype)
        elif _DW_MODE == 'rowdots':
            from ..edge_conv import dw_rowdots
            dw = dw_rowdots(x, g).astype(w.dtype)
        elif _DW_MODE == 'rowcols':
            from ..edge_conv import dw_rowcols
            dw = dw_rowcols(x, g).astype(w.dtype)
        elif _DW_MODE == 'rowpair02':
            from ..edge_conv import dw_rowpair02
            dw = dw_rowpair02(x, g).astype(w.dtype)
        elif _DW_MODE == 'rowdots_cm':
            from ..edge_conv import dw_rowdots_cmajor
            dw = dw_rowdots_cmajor(x, g).astype(w.dtype)
        else:
            dw = _dw_9dot(x, g).astype(w.dtype)
    else:
        # joint XLA conv grads (SGAN_TPU_CONV3_DW=joint)
        _, pullback = jax.vjp(lambda xv, wv: _xla_conv(xv, wv, None), x, w)
        dx, dw = pullback(g)
    db = jnp.sum(g, axis=(0, 1, 2)) if has_b else None
    return dx, dw, db


conv3x3_same.defvjp(_vjp_fwd, _vjp_bwd)
