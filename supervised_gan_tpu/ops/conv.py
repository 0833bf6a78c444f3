"""Convolution primitives (NHWC, MXU-friendly).

All tensors are NHWC and kernels HWIO — the layouts XLA tiles best onto the
TPU MXU.  Semantics match ``torch.nn.Conv2d`` / ``torch.nn.ConvTranspose2d``
with symmetric integer padding and ``output_padding=0``, which is the only
configuration the reference zoo uses (reference models/networks.py — k4s2p1
PatchGAN/DCGAN stacks, 3x3 s1 p1 CRN convs, 7x7 resnet stem).

Mixed precision: inputs/kernels may be cast to ``compute_dtype`` (bfloat16 on
TPU).  The conv runs and *stays* in that dtype (the TPU MXU accumulates
bf16 x bf16 products in float32 in hardware); activations remain bf16
through the network to halve HBM traffic — norm layers compute their
statistics in float32 and cast back.  We deliberately do NOT pass
``preferred_element_type`` with mixed-precision inputs: jax's conv
transpose rule would then pair a bf16 operand with the f32 cotangent and
fail.
"""

import os

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")

# Lane-starved channel counts dispatch to the fused reformulations in
# edge_conv.py (pure XLA, backend-independent; measured on v5e in
# tools/microbench.py / BENCH_NOTES.md round 2).  Per-family kill
# switches for A/B profiling.
_EDGE = os.environ.get("SGAN_TPU_EDGE_CONV", "1") != "0"
_EDGE_HEAD = _EDGE and os.environ.get("SGAN_TPU_EDGE_HEAD", "1") != "0"
_EDGE_STEM = _EDGE and os.environ.get("SGAN_TPU_EDGE_STEM", "1") != "0"
# mid: XLA fwd/dx with the dw replaced.  The round-2 one-dot dw was a
# 0.8 ms/step net LOSS (75 MB patches relayout); the round-3 nine-dot
# dw (no patches materialization) WINS 0.6 ms/step end-to-end
# (A/B device 37.09 -> 36.50 ms) and is the default
# (SGAN_TPU_MID_DW=onedot restores the old form for A/B).
_EDGE_MID = _EDGE and os.environ.get("SGAN_TPU_EDGE_MID", "1") != "0"
# crn (banded pair dots for the 3x3 ci=2co halving convs)
_EDGE_CRN = _EDGE and os.environ.get("SGAN_TPU_EDGE_CRN", "1") != "0"
# trunk (k4s2 ci<=32 convs via the stem dot form, dodging the
# in-context T(2,128) layout trap at the unet 32->64 sites: that conv
# runs 8.3 TF/s in-context vs 50+ isolated).  A/B device 37.09 -> 36.26
# ms/step at ci<=32; widening to ci<=256 LOSES (38.27 — the D trunks
# are layout-stable already), hence the tight SGAN_TPU_TRUNK_CI_MAX=32.
_EDGE_TRUNK = _EDGE and os.environ.get("SGAN_TPU_EDGE_TRUNK", "1") != "0"
# trunk convT (mid-channel k4s2 ConvTranspose via the dense phase-dot
# form): A/B device 35.59 -> 35.39 ms/step (the unet decoder sites;
# the co >= 64 phase interleave is lane-friendly, unlike the c2 heads)
_EDGE_TRUNK_CT = _EDGE and os.environ.get("SGAN_TPU_EDGE_TRUNK_CT",
                                          "1") != "0"
# trunk dw (k4s2 128->256 D2 sites: XLA fwd/dx kept, dw replaced by the
# eight row-grouped dots of edge_conv.conv_dw_rowdots_s2 — batch-30 arm)
_EDGE_TRUNK_DW = _EDGE and os.environ.get("SGAN_TPU_TRUNK_DW", "0") != "0"


def _cast(x, w, compute_dtype):
    if compute_dtype is not None and x.dtype != compute_dtype:
        x = x.astype(compute_dtype)
    if compute_dtype is not None and w.dtype != compute_dtype:
        w = w.astype(compute_dtype)
    return x, w


def conv2d(x, w, b=None, stride=1, padding=0, compute_dtype=None):
    """2-D convolution. x: (N,H,W,C), w: (kh,kw,Cin,Cout), b: (Cout,)."""
    x, w = _cast(x, w, compute_dtype)
    if _EDGE:
        from . import edge_conv
        if _EDGE_HEAD and edge_conv.head_conv_supported(x, w, stride,
                                                        padding):
            return edge_conv.head_conv(x, w, b, stride, padding)
        # stride-1 stems win outright (0.013 vs 0.042 ms); strided stems
        # go through the space-to-depth form — forward ties XLA (0.277
        # vs 0.289 at the 512px 3->64 D stem) and the custom vjp is 18x
        # (0.052 vs 0.934)
        if _EDGE_STEM and edge_conv.stem_conv_supported(x, w, stride,
                                                         padding):
            return edge_conv.stem_conv(x, w, b, stride, padding)
        if _EDGE_TRUNK and edge_conv.trunk_conv_supported(x, w, stride,
                                                          padding):
            return edge_conv.stem_conv(x, w, b, stride, padding)
        # CRN-trunk 3x3s: XLA forward kept, dw replaced by the nine-dot
        # form (see _EDGE_MID above; SGAN_TPU_MID_DW selects the form)
        if _EDGE_MID and edge_conv.mid_conv_supported(x, w, stride,
                                                       padding):
            return edge_conv.mid_conv(x, w, b, stride, padding)
        # CRN bilinear-upsample halving convs (ci = 2co = 128): banded
        # pair dots dodge the in-step T(2,128) conv layout (573 us in
        # context vs 160 isolated; see edge_conv._crn_fwd)
        if _EDGE_CRN and edge_conv.crn_conv_supported(x, w, stride,
                                                      padding):
            return edge_conv.crn_conv(x, w, b, stride, padding)
        if _EDGE_TRUNK_DW and edge_conv.trunk_dw_supported(x, w, stride,
                                                           padding):
            return edge_conv.trunk_dw_conv(x, w, b, stride, padding)
    s = (stride, stride) if isinstance(stride, int) else stride
    p = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    y = lax.conv_general_dilated(
        x, w, window_strides=s, padding=p, dimension_numbers=_DIMS)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# Replace ONLY the dw half of the plain-XLA convT path (k4 s2 p1 batch-1
# sites outside every edge_conv gate — the unet_256 decoder) with
# edge_conv.convt_dw_rowpairs.  Default ON (round-5 A/B: cgan 23.33 ->
# 22.12 ms device, DSGAN/fcgan/jointgan wash — BENCH_NOTES round 5);
# SGAN_TPU_XLA_CONVT_DW='' restores the joint XLA VJP.
_XLA_CONVT_DW = os.environ.get('SGAN_TPU_XLA_CONVT_DW', 'rowpair')


def _convt_xla_s2(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=_DIMS)


@jax.custom_vjp
def _convt_xla_s2_rowdw(x, w):
    return _convt_xla_s2(x, w)


def _convt_rowdw_fwd(x, w):
    return _convt_xla_s2(x, w), (x, w)


def _convt_rowdw_bwd(res, g):
    x, w = res
    _, pullx = jax.vjp(lambda xv: _convt_xla_s2(xv, w), x)
    (dx,) = pullx(g)
    from . import edge_conv
    dw = edge_conv.convt_dw_rowpairs(x, w, g).astype(w.dtype)
    return dx, dw


_convt_xla_s2_rowdw.defvjp(_convt_rowdw_fwd, _convt_rowdw_bwd)


def conv_transpose2d(x, w, b=None, stride=2, padding=1, output_padding=0,
                     compute_dtype=None):
    """Transposed 2-D convolution with torch ConvTranspose2d semantics.

    x: (N,H,W,Cin), w: (kh,kw,Cin,Cout) stored *pre-flipped* (see
    utils/pth.py for the torch-layout mapping), b: (Cout,).
    Output spatial size: (H-1)*stride - 2*padding + k + output_padding.

    Implemented as a conv with input (lhs) dilation, which XLA lowers to the
    MXU directly — the canonical TPU formulation of deconvolution.
    ``output_padding`` adds rows/cols at the bottom/right, matching torch.
    """
    x, w = _cast(x, w, compute_dtype)
    if _EDGE:
        from . import edge_conv
        if edge_conv.head_convt_supported(x, w, stride, padding,
                                          output_padding):
            return edge_conv.head_convt(x, w, b, stride, padding)
        if _EDGE_TRUNK_CT and edge_conv.trunk_convt_supported(
                x, w, stride, padding, output_padding):
            return edge_conv.head_convt(x, w, b, stride, padding)
    kh, kw = w.shape[0], w.shape[1]
    s = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    op = output_padding
    if (_XLA_CONVT_DW == 'rowpair' and (kh, kw) == (4, 4) and s == (2, 2)
            and (ph, pw) == (1, 1) and op in (0, (0, 0))
            and x.shape[0] == 1 and x.shape[1] > 0 and x.shape[2] > 0):
        # h/w > 0: an under-sized unet can carry 0-size inner activations
        # (XLA's empty convs are fine; the rowpair dw reshape is not)
        # The big-co decoder convTs outside every edge_conv gate keep
        # XLA's strong lhs-dilated forward and dx, but swap the dw half —
        # measured at 226-246 GB/s on the cgan unet_256 decoder
        # (BENCH_NOTES round 4) — for the row-pair dot form that won on
        # the DSGAN heads.
        y = _convt_xla_s2_rowdw(x, w)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph + op),
                 (kw - 1 - pw, kw - 1 - pw + op)),
        lhs_dilation=s,
        dimension_numbers=_DIMS)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def depthwise_conv2d(x, w, stride=1, padding=0, compute_dtype=None):
    """Depthwise conv. x: (N,H,W,C), w: (kh,kw,1,C)."""
    x, w = _cast(x, w, compute_dtype)
    s = (stride, stride) if isinstance(stride, int) else stride
    p = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    return lax.conv_general_dilated(
        x, w, window_strides=s, padding=p,
        dimension_numbers=_DIMS, feature_group_count=x.shape[-1])
