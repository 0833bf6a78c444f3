"""Reformulated convolutions for lane-starved channel counts.

XLA's TPU conv puts channels in the 128-lane dimension, so convs whose
input or output channels are tiny run orders of magnitude below the
bandwidth bound (tools/microbench.py, v5e):

  * k3s1 64->1 @512px (the CRN output head, reference
    models/networks.py:794): fwd 0.53 ms, joint vjp 3.75 ms — 0.04% peak.
  * k4s2 3->64 @512px (every PatchGAN stem, reference :816): fwd
    0.29 ms, vjp 0.93 ms.
  * k4s2 64->2 ConvTranspose (G1 output, reference :540): 0.23 ms.

Both are bandwidth-bound ops (hundreds of GFLOP/s at most); the fix is a
formulation whose data movement XLA can schedule well.  Two rules fell
out of the measurements (all numbers v5e, slope methodology):

  1. read the big tensor ONCE, through a single dense dot — XLA does not
     CSE k*k shifted slice-reads of the same array (the per-tap
     multiply+reduce form still read x 9 times: 0.40 ms vs 0.53).
  2. never strided-slice a lane-starved tensor — a k4s2 im2col via
     16 strided slices of a 3-channel image ran 7.3 ms (25x WORSE than
     XLA); one space-to-depth relayout followed by contiguous slices
     fixes it.

Forms (each a custom_vjp unit whose backward obeys the same rules):

  * tiny Co ("head"): t = xp @ W (ci, k*k*co) once, then y = sum of k*k
    shifted contiguous slices of t.  Measured 0.051/0.218 ms fwd/vjp at
    the 512px CRN head vs XLA's 0.53/3.75 (10x/17x); the 63px PatchGAN
    head: 0.007/0.005 vs 0.069/0.233.
  * tiny Ci ("stem"): space-to-depth (stride > 1) or plain shifts
    (stride 1), concat to an (M, k*k*Ci) patches matrix, ONE dense
    matmul.  Forward ties XLA at the 512px D stem (0.277 vs 0.289) and
    the vjp is 18x (0.052 vs 0.934).
  * tiny Co ConvTranspose ("head_convt"): phase form — t = x @ W once,
    per-phase sums of contiguous slices, one interleave at the end.
    0.023/0.252 ms fwd/vjp vs XLA's 0.232/0.904 at the G1 output.

All functions take NHWC x, HWIO w and match ops.conv.conv2d /
conv_transpose2d semantics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import os as _os

# heads: dispatch when Co*4 <= Ci (measured win region); stems: Ci tiny
HEAD_MAX_CO = 4
STEM_MAX_CI = 8
# convT-head forward form: 'split' (one dot per row phase — the phase
# interleave becomes a free reshape + a full-lane stack; A/B device
# 35.39 -> 34.83 ms) | 'dense' (one phase-major dot + a 2-lane
# transpose) | 'sum' (per-phase tap sums — the round-2 original)
_HCT_MODE = _os.environ.get('SGAN_TPU_HCT', 'split')
# convT-head BACKWARD form at co <= HEAD_MAX_CO: 'planar' consumes the
# cotangent channel-major (see _head_convt_bwd_planar) | 'fwdmode'
# mirrors _HCT_MODE's split/dense row-phase extraction.
_HCT_BWD = _os.environ.get('SGAN_TPU_HCT_BWD', 'planar')
# head-conv dot orientation: 'kmajor' feeds the per-position dot the
# (ci, M) view of the PLANAR padded input.  Hypothesis was that the dot
# wants a (C sublane, M lane) tiled operand anyway (the row-major form
# pays a 0.23 ms/step 290 GB/s tile-transposing reshape per 512px site,
# round-3 base_s6 trace at edge_conv.py:87) — MEASURED -1.39 ms
# NEGATIVE end-to-end (arm w 33.97 vs 32.58): the channel-major lhs
# costs more elsewhere in the dot/epilogue than the reshape it removes.
_HEAD_DOT = _os.environ.get('SGAN_TPU_HEAD_DOT', 'rowmajor')
# 3x3 s1 dw form: 'rowdots' (three free-view row dots, default after the
# round-3 A/B: 30.67 -> 30.09 ms device) | 'rowcols' (the three row dots
# merged into ONE (3c, 3co) dot — see dw_rowcols) | '9dot' | 'gcols' |
# 'onedot'
_MID_DW = _os.environ.get('SGAN_TPU_MID_DW', 'rowdots')
# mid-conv fwd/dx form: 'bandpair' (crn-style banded pair dots; batch-25
# A/B: 28.82 -> 28.51 ms device) or 'xla' (the plain conv)
_MID_FWD = _os.environ.get('SGAN_TPU_MID_FWD', 'bandpair')
# crn halving-conv dx form: 'bandpair' (batch-27 A/B: 28.51 -> 28.35 ms
# device) or 'xla' (the plain widening conv)
_CRN_DX = _os.environ.get('SGAN_TPU_CRN_DX', 'bandpair')
# dW2 patches orientation in the planar convT bwd ('kmajor' measured
# -0.98 ms, see _head_convt_bwd_planar)
_CONVT_PATCHES = _os.environ.get('SGAN_TPU_CONVT_PATCHES', 'mmajor')
# head-convT dW form: 'patches' reuses the forward's |D|^2 patch concat
# for the dW2 dot — but that SECOND consumer wants a K-major tiling, so
# XLA shuttles the 37.7 MB buffer back into S(1) and tile-transposes it
# (session-12 HLO: copy-start.1/.5 + the copy.2592x trio at the G1
# c64->c2 head sites, ~0.85 ms/step).  'rowpairs'/'rowdots' compute dW
# with the batch-34 convT row-dot recipe instead (k4 s2 p1 only; no
# patch reuse — the forward concat keeps ONE consumer and never
# round-trips).  A/B device (batch 36): 27.716 -> 26.773 ms, 35.8
# img/s — rowpairs is the default ('patches' restores the reuse form).
_HCT_DW = _os.environ.get('SGAN_TPU_HCT_DW', 'rowpairs')


def _pad_hw(x, ph, pw):
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))


# ---------------------------------------------------------------- heads

def _head_fwd(x, w, b, stride, padding):
    """Conv with tiny Co, restructured so x is read ONCE.

    The naive per-tap multiply+reduce form reads x k*k times (XLA does
    not CSE the shifted slice reads; measured 0.40 ms at 512px 64->1 vs
    0.53 for its conv).  Two stages instead: (1) one dense dot
    t = xp @ W, W: (ci, k*k*co) — per-position, per-tap partial sums;
    (2) y = sum of k*k shifted slices of t, each selecting its tap's co
    lanes — an elementwise sum over a small f32 array that XLA fuses.
    """
    kh, kw, ci, co = w.shape
    n, h, wd, _ = x.shape
    s = stride
    xp = _pad_hw(x, padding, padding)
    hp, wp = h + 2 * padding, wd + 2 * padding
    oh = (hp - kh) // s + 1
    ow = (wp - kw) // s + 1
    wm = w.transpose(2, 0, 1, 3).reshape(ci, kh * kw * co)
    if _HEAD_DOT == 'planar' and s == 1:
        # fully planar: K-major dot emitting channel-major t planes,
        # tap sums as contiguous plane slices, output moveaxis'd back
        # (free at co = 1).  Unlike 'kmajor' (which left t row-major and
        # paid the transpose on the other side of the dot, -1.39 ms),
        # nothing here ever puts the k*k*co axis minor.
        xpT = jnp.moveaxis(xp, 3, 1).reshape(n, ci, hp * wp)
        tT = jax.lax.dot_general(
            wm.T.astype(xp.dtype), xpT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (k*k*co, n, hp*wp)
        tT = jnp.moveaxis(tT, 1, 0).reshape(n, kh * kw * co, hp, wp)
        acc = jnp.zeros((n, co, oh, ow), jnp.float32)
        for ky in range(kh):
            for kx in range(kw):
                j = ky * kw + kx
                acc = acc + lax.slice(
                    tT, (0, j * co, ky, kx),
                    (n, (j + 1) * co, ky + oh, kx + ow))
        if b is not None:
            acc = acc + b.astype(jnp.float32)[None, :, None, None]
        return jnp.moveaxis(acc, 1, 3).astype(x.dtype)
    if _HEAD_DOT == 'kmajor':
        # feed the dot the channel-major (ci, M) view: XLA lays the
        # padded activation out planar ({2,1,3,0}) and the dot's lhs
        # tiling is (C sublanes, M lanes) — the row-major (M, ci)
        # reshape in the else-branch tile-transposes 64 MB at the CRN
        # 512px head sites (reshape.11296/7, round-3 base_s6 trace)
        xpT = jnp.moveaxis(xp, 3, 1).reshape(n, ci, hp * wp)
        t = jax.lax.dot_general(
            xpT, wm.astype(xp.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        t = jax.lax.dot_general(
            xp.reshape(n * hp * wp, ci), wm.astype(xp.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    t = t.reshape(n, hp, wp, kh * kw * co)
    acc = jnp.zeros((n, oh, ow, co), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            j = ky * kw + kx
            acc = acc + t[:, ky:ky + (oh - 1) * s + 1:s,
                          kx:kx + (ow - 1) * s + 1:s,
                          j * co:(j + 1) * co]
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(x.dtype)


def _head_dx(g, w, xshape, stride, padding):
    """dx of the head conv = (lhs-dilated) conv of g with the flipped,
    io-transposed kernel — a tiny-Ci conv, i.e. a stem."""
    kh, kw, ci, co = w.shape
    s = stride
    wT = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
    if s == 1:
        return _stem_fwd(g, wT, None, 1, kh - 1 - padding)
    # strided: zero-dilate g onto the padded-x grid, then full conv
    n, h, wd, _ = xshape
    hp, wp = h + 2 * padding, wd + 2 * padding
    oh, ow = g.shape[1], g.shape[2]
    cfg = ((0, 0, 0),
           (0, hp - kh - (oh - 1) * s, s - 1),
           (0, wp - kw - (ow - 1) * s, s - 1),
           (0, 0, 0))
    gd = jax.lax.pad(g, jnp.zeros((), g.dtype), cfg)
    dxp = _stem_fwd(gd, wT, None, 1, kh - 1)
    if padding:
        dxp = dxp[:, padding:-padding, padding:-padding, :]
    return dxp


def _head_dw(x, g, wshape, stride, padding):
    """dw as ONE dot over padded-x positions against dilated-g patches:
    dw[ky,kx,c,o] = sum_{a,b} xp[a,b,c] * gd[a-ky, b-kx, o], with gd the
    zero-dilated g on the xp grid — the patches are k*k shifted slices
    of a (k-1)-lo-padded gd (layout-only; g has tiny co, so the patch
    tensor is small)."""
    kh, kw, ci, co = wshape
    n, h, wd, _ = x.shape
    s = stride
    oh, ow = g.shape[1], g.shape[2]
    hp, wp = h + 2 * padding, wd + 2 * padding
    xp = _pad_hw(x, padding, padding)
    # gd on the xp grid (g[i] lives at xp row s*i), then lo-pad by k-1
    cfg = ((0, 0, 0),
           (kh - 1, hp - (oh - 1) * s - 1, s - 1),
           (kw - 1, wp - (ow - 1) * s - 1, s - 1),
           (0, 0, 0))
    gd = jax.lax.pad(g, jnp.zeros((), g.dtype), cfg)
    cols = []
    for ky in range(kh):
        for kx in range(kw):
            oy, ox = kh - 1 - ky, kw - 1 - kx
            cols.append(gd[:, oy:oy + hp, ox:ox + wp, :])
    gcols = jnp.concatenate(cols, axis=-1)          # (n, hp, wp, k*k*co)
    dw = jax.lax.dot_general(
        xp.reshape(n * hp * wp, ci), gcols.reshape(n * hp * wp, -1),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dw.reshape(ci, kh, kw, co).transpose(1, 2, 0, 3)


def head_conv_supported(x, w, stride, padding):
    kh, kw, ci, co = w.shape
    return (co <= HEAD_MAX_CO and ci >= 16 and kh == kw
            and isinstance(stride, int) and isinstance(padding, int))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def head_conv(x, w, b, stride, padding):
    """Tiny-Co conv in fused reduction form (callers gate on
    head_conv_supported); semantics = ops.conv.conv2d."""
    return _head_fwd(x, w, b, stride, padding)


def _head_vjp_fwd(x, w, b, stride, padding):
    return _head_fwd(x, w, b, stride, padding), (x, w, b is not None)


def _head_vjp_bwd(stride, padding, res, g):
    x, w, has_b = res
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32) if has_b else None
    g = g.astype(x.dtype)
    dx = _head_dx(g, w, x.shape, stride, padding).astype(x.dtype)
    dw = _head_dw(x, g, w.shape, stride, padding).astype(w.dtype)
    return dx, dw, db


head_conv.defvjp(_head_vjp_fwd, _head_vjp_bwd)


# ---------------------------------------------------------------- stems

def _im2col(x, kh, kw, stride, padding, oh, ow):
    """(n, oh, ow, kh*kw*ci) patches from contiguous slices (stride 1).

    Strided slices of lane-starved tensors are pathological on TPU
    (measured 16 x 0.45 ms at the 512px 3-channel stem); stride > 1 must
    go through _im2col_s2d instead."""
    assert stride == 1
    n = x.shape[0]
    xp = _pad_hw(x, padding, padding)
    cols = []
    for ky in range(kh):
        for kx in range(kw):
            cols.append(xp[:, ky:ky + oh, kx:kx + ow, :])
    return jnp.concatenate(cols, axis=-1)


def _s2d_ok(x, k, s, p):
    return (s > 1 and k % s == 0
            and (x.shape[1] + 2 * p) % s == 0
            and (x.shape[2] + 2 * p) % s == 0)


def _im2col_s2d(x, k, stride, padding, oh, ow):
    """Strided-conv patches via space-to-depth: ONE relayout moves the
    s x s pixel block into lanes, after which every tap is a contiguous
    slice.  Channel order: (a, b, dy, dx, c) with ky = s*a + dy.
    Matching weight reorder: _w_s2d."""
    n, h, wd, ci = x.shape
    s = stride
    xp = _pad_hw(x, padding, padding)
    hp, wp = h + 2 * padding, wd + 2 * padding
    xs = xp.reshape(n, hp // s, s, wp // s, s, ci)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // s, wp // s,
                                                s * s * ci)
    t = k // s
    cols = []
    for a in range(t):
        for b in range(t):
            cols.append(xs[:, a:a + oh, b:b + ow, :])
    return jnp.concatenate(cols, axis=-1)


def _w_s2d(w, stride):
    """(k, k, ci, co) -> (k*k*ci, co) in _im2col_s2d's channel order."""
    k, _, ci, co = w.shape
    s = stride
    t = k // s
    w6 = w.reshape(t, s, t, s, ci, co)           # (a, dy, b, dx, c, o)
    return w6.transpose(0, 2, 1, 3, 4, 5).reshape(k * k * ci, co)


def _w_s2d_inv(dw2, k, stride, ci, co):
    """Inverse of _w_s2d on the gradient."""
    s = stride
    t = k // s
    d6 = dw2.reshape(t, t, s, s, ci, co).transpose(0, 2, 1, 3, 4, 5)
    return d6.reshape(k, k, ci, co)


# SGAN_TPU_S2D=rows (DEFAULT): build the strided-conv patches by
# H-deinterleave instead of the 6-D space-to-depth transpose.  The
# canonical form's (hp/s, s, wp/s, s, ci) -> (hp/s, wp/s, s, s, ci)
# transpose interleaves two row streams at s*ci-element granularity —
# 2-6 lanes at the ci<=3 D stems, profiled 21 GB/s reshape+copy pairs
# (0.26 ms/site/step, round-3 o_newdef trace at edge_conv.py:219-220).
# Here dy never enters the lane dim: per dy, xp[:, dy::s] takes
# full-row strided slices (row = wp*ci contiguous elements) and every
# remaining tap is a free view; channel order becomes (dy, a, b, dx, c)
# with the weight reorder and dw inverse adjusted to match.
# A/B (round-3 batch 9): 33.39 -> 32.58 ms device (29.84 img/s) — the
# stem packs AND the convT-head dx cotangent packs all ride this
# builder.  SGAN_TPU_S2D=xpose restores the canonical form.
# Batch 13: SGAN_TPU_S2D=planar (channel-major phase-plane patches,
# _stem_planar_patches) measured a further +0.27 ms (30.94 -> 30.67 ms
# device) and is the default; 'rows' restores the H-deinterleave form.
_S2D_MODE = _os.environ.get('SGAN_TPU_S2D', 'planar')


def _im2col_s2d_rows(x, k, stride, padding, oh, ow):
    n, h, wd, ci = x.shape
    s = stride
    xp = _pad_hw(x, padding, padding)
    hp, wp = h + 2 * padding, wd + 2 * padding
    t = k // s
    cols = []
    for dy in range(s):
        xd = lax.slice(xp, (0, dy, 0, 0), (n, hp, wp, ci), (1, s, 1, 1))
        xv = xd.reshape(n, hp // s, wp // s, s * ci)
        for a in range(t):
            for b in range(t):
                cols.append(xv[:, a:a + oh, b:b + ow, :])
    return jnp.concatenate(cols, axis=-1)


def _w_s2d_rows(w, stride):
    """(k, k, ci, co) -> (k*k*ci, co) in _im2col_s2d_rows's channel order
    (dy, a, b, dx, c)."""
    k, _, ci, co = w.shape
    s = stride
    t = k // s
    w6 = w.reshape(t, s, t, s, ci, co)           # (a, dy, b, dx, c, o)
    return w6.transpose(1, 0, 2, 3, 4, 5).reshape(k * k * ci, co)


def _w_s2d_rows_inv(dw2, k, stride, ci, co):
    s = stride
    t = k // s
    d6 = dw2.reshape(s, t, t, s, ci, co).transpose(1, 0, 2, 3, 4, 5)
    return d6.reshape(k, k, ci, co)


# SGAN_TPU_S2D=planar: build the stem patches CHANNEL-MAJOR.  The rows
# builder still reads/writes the pixel tensor in its (..., ci<=8)-minor
# layout — physically 128/ci-times tile-padded, profiled 173-395 GB/s
# at the D-stem sites (edge_conv.py:295/300, round-3 z trace, ~1.0
# ms/step).  Here the tensor is phase-decomposed once into s*s DENSE
# channel-major planes (multiply-reduce deinterleaves — the batch-12
# machinery), every tap is a contiguous slice, the patches are K-major
# (k*k*ci, M) with the weight consumed as a plain w.reshape(-1, co),
# and the dw contraction needs no s2d reorder at all.
def _stem_planar_ok(x, stride):
    return (x.shape[0] >= 1 and x.ndim == 4
            and (stride == 1 or (x.shape[1] % stride == 0
                                 and x.shape[2] % stride == 0)))


def _phase_planes(x, s):
    """Channel-major phase decomposition: x (n, h, w, ci) ->
    G[q][r] = (n, ci, h//s, w//s) holding pixels (s*i+q, s*j+r)."""
    xT = jnp.moveaxis(x, 3, 1)
    wpl = _deint_w_planes(xT, s)
    hs = [_deint_h_planes(wpl[r], s) for r in range(s)]
    return [[hs[r][q] for r in range(s)] for q in range(s)]


def _stem_planar_patches(x, k, s, p, oh, ow):
    """K-major stem patches (n, k*k*ci, oh*ow), row order (ky, kx, ci)
    matching w.reshape(k*k*ci, co).  Output pixel o reads input row
    s*o + ky - p = plane ((ky-p) mod s) at block row o + (ky-p)//s —
    a contiguous slice of a padded dense plane."""
    n, h, wd, ci = x.shape
    if s == 1:
        G = [[jnp.moveaxis(x, 3, 1)]]
    else:
        G = _phase_planes(x, s)
    hb, wb = h // s, wd // s
    amin = (0 - p) // s
    amax = (k - 1 - p) // s
    ph_t = max(0, -amin)
    ph_b = max(0, (oh - 1 + amax) - (hb - 1))
    pw_l = max(0, -amin)
    pw_r = max(0, (ow - 1 + amax) - (wb - 1))
    Gp = [[jnp.pad(Gq, ((0, 0), (0, 0), (ph_t, ph_b), (pw_l, pw_r)))
           for Gq in row] for row in G]
    cols = []
    for ky in range(k):
        d = ky - p
        qq, aa = d % s, (d - d % s) // s
        for kx in range(k):
            d2 = kx - p
            rr, bb = d2 % s, (d2 - d2 % s) // s
            sl = lax.slice(Gp[qq][rr], (0, 0, ph_t + aa, pw_l + bb),
                           (n, ci, ph_t + aa + oh, pw_l + bb + ow))
            cols.append(sl.reshape(n, ci, oh * ow))
    return jnp.concatenate(cols, axis=1)


def stem_conv_supported(x, w, stride, padding):
    kh, kw, ci, co = w.shape
    return (ci <= STEM_MAX_CI and co >= 16 and kh == kw
            and isinstance(stride, int) and isinstance(padding, int)
            and (stride == 1
                 or (_s2d_ok(x, kh, stride, padding)
                     and (kh - 2 * padding) % stride == 0)))


def trunk_conv_supported(x, w, stride, padding):
    """Gate for routing mid-channel k4s2 trunk convs (unet encoders, the
    PatchGAN trunks) through the stem dot form.

    These convs are fast ISOLATED (50-150 TF/s) but in the full step XLA
    assigns them T(2,128) activation layouts and brackets them with
    relayout copies (8-27 TF/s in-context, round-3 trace) — the same
    context trap the CRN halving convs dodged with dots.  The dot form's
    rigid canonical layouts cannot be re-laid-out by the scheduler.
    Math is stem_conv's (channel-count generic)."""
    kh, kw, ci, co = w.shape
    ci_max = int(_os.environ.get('SGAN_TPU_TRUNK_CI_MAX', '32'))
    return (8 < ci <= ci_max and co >= 16 and kh == kw == 4
            and stride == 2 and isinstance(padding, int)
            and x.shape[1] * x.shape[2] <= 512 * 512
            and _s2d_ok(x, kh, stride, padding)
            and (kh - 2 * padding) % stride == 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def stem_conv(x, w, b, stride, padding):
    """Tiny-Ci conv as explicit im2col + one dense matmul (callers gate
    on stem_conv_supported); semantics = ops.conv.conv2d."""
    return _stem_fwd(x, w, b, stride, padding)


def _stem_patches_w(x, w, stride, padding, oh, ow):
    kh = w.shape[0]
    if stride == 1:
        return (_im2col(x, kh, kh, 1, padding, oh, ow),
                w.reshape(-1, w.shape[3]))
    if _S2D_MODE == 'rows':
        return (_im2col_s2d_rows(x, kh, stride, padding, oh, ow),
                _w_s2d_rows(w, stride))
    return (_im2col_s2d(x, kh, stride, padding, oh, ow),
            _w_s2d(w, stride))


def _stem_fwd(x, w, b, stride, padding):
    kh, kw, ci, co = w.shape
    n, h, wd, _ = x.shape
    oh = (h + 2 * padding - kh) // stride + 1
    ow = (wd + 2 * padding - kw) // stride + 1
    if _S2D_MODE == 'planar' and _stem_planar_ok(x, stride):
        pg = _stem_planar_patches(x, kh, stride, padding, oh, ow)
        y = jax.lax.dot_general(
            pg, w.reshape(kh * kw * ci, co).astype(pg.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())))  # (n, M, co)
        y = y.reshape(n, oh, ow, co)
    else:
        patches, wm = _stem_patches_w(x, w, stride, padding, oh, ow)
        y = jax.lax.dot_general(
            patches.reshape(n * oh * ow, -1), wm.astype(patches.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())))
        y = y.reshape(n, oh, ow, co)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _stem_vjp_fwd(x, w, b, stride, padding):
    return _stem_fwd(x, w, b, stride, padding), (x, w, b is not None)


def _stem_vjp_bwd(stride, padding, res, g):
    x, w, has_b = res
    # the cotangent often arrives f32 (loss-side upcasts); all other
    # grads in the framework flow bf16, and keeping g f32 doubles the
    # dx phase-interleave relayout traffic (profiled ~1.6 ms/step)
    g = g.astype(x.dtype)
    kh, kw, ci, co = w.shape
    n, oh, ow, _ = g.shape
    gm = g.reshape(n * oh * ow, co)
    # dw: patches^T @ g — one dense (K, M) x (M, co) matmul
    if _S2D_MODE == 'planar' and _stem_planar_ok(x, stride):
        pg = _stem_planar_patches(x, kh, stride, padding, oh, ow)
        dw = jax.lax.dot_general(
            pg, g.reshape(n, oh * ow, co).astype(pg.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))))  # (n, K, co)
        dw = dw.sum(0).reshape(kh, kw, ci, co).astype(w.dtype)
    else:
        patches, _ = _stem_patches_w(x, w, stride, padding, oh, ow)
        dw = jax.lax.dot_general(
            patches.reshape(n * oh * ow, -1), gm.astype(patches.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())))
        if stride == 1:
            dw = dw.reshape(kh, kw, ci, co).astype(w.dtype)
        elif _S2D_MODE == 'rows':
            dw = _w_s2d_rows_inv(dw, kh, stride, ci, co).astype(w.dtype)
        else:
            dw = _w_s2d_inv(dw, kh, stride, ci, co).astype(w.dtype)
    s = stride
    h, wd = x.shape[1], x.shape[2]
    wT = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
    if s > 1:
        # dx is a ConvTranspose to tiny channels — one dense phase dot
        # (the per-phase tap-sum form profiled 3 x 0.57 ms/step of 2-lane
        # loop fusions on the DSGAN bench; BENCH_NOTES.md round 3)
        dx = _head_convt_fwd_dense(g, wT, None, s, padding)
    else:
        # dx is the full conv of g back to tiny channels — a head conv
        # (gather form; the scatter dual profiled 0.6 ms/step of
        # dynamic-update-slice)
        dx = _head_fwd(g, wT, None, 1, kh - 1 - padding)
    dx = dx.astype(x.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32) if has_b else None
    return dx, dw, db


stem_conv.defvjp(_stem_vjp_fwd, _stem_vjp_bwd)


# -------------------------------------------- phase-major-input stems

def stem_phase_supported(xph, w, stride, padding):
    """Gate for stem_conv_phase: strided conv whose input arrives in
    space_to_phase(x, stride) layout and whose output grid equals the
    phase block grid (k4s2p1 PatchGAN stems: (2H+2p-k)//s+1 == H)."""
    kh, kw, ci, co = w.shape
    s = stride
    return (kh == kw and isinstance(s, int) and s >= 2
            and isinstance(padding, int) and 0 <= padding < s
            and co >= 16 and xph.shape[-1] == s * s * ci
            and (s * xph.shape[1] + 2 * padding - kh) // s + 1
            == xph.shape[1]
            and (s * xph.shape[2] + 2 * padding - kw) // s + 1
            == xph.shape[2])


def _phase_stem_geometry(k, s, p):
    """Kernel row ky reads pixel s*A - p + ky of output block A — i.e.
    block A + dy, phase qy with ky = s*dy + qy + p.  Returns the block
    shift range."""
    dmin = (0 - p) // s          # floor division: negative for p > 0
    dmax = (k - 1 - p) // s
    return dmin, dmax


def _w_phase_stem(w, s, p):
    """(k, k, ci, co) -> ((nd*s)^2 * ci, co) rows ordered (dy, dx, qy,
    qx, ci) to match the full-lane shifted-slice patches of
    _stem_phase_fwd; (d, q) cells with no kernel tap hold zeros."""
    k, _, ci, co = w.shape
    dmin, dmax = _phase_stem_geometry(k, s, p)
    zz = jnp.zeros((ci, co), w.dtype)
    rows = []
    for dy in range(dmin, dmax + 1):
        for dx in range(dmin, dmax + 1):
            for qy in range(s):
                ky = s * dy + qy + p
                for qx in range(s):
                    kx = s * dx + qx + p
                    rows.append(w[ky, kx] if 0 <= ky < k and 0 <= kx < k
                                else zz)
    return jnp.concatenate(rows, 0)


def _stem_phase_patches(xph, k, s, p):
    """Full-lane block-shift patches: pad the BLOCK grid (not the pixel
    grid) and concat the nd x nd shifted slices, all s*s*ci lanes each.
    Unused (d, q) combinations ride along as zero rows of the weight
    matrix — the redundancy buys contiguous full-lane reads (sub-lane
    slice-concat pieces measured hostile on TPU; file header rule 2)."""
    n, hb, wb, ssci = xph.shape
    dmin, dmax = _phase_stem_geometry(k, s, p)
    pl, pr = -dmin, dmax
    xpp = jnp.pad(xph, ((0, 0), (pl, pr), (pl, pr), (0, 0)))
    cols = [xpp[:, pl + dy:pl + dy + hb, pl + dx:pl + dx + wb, :]
            for dy in range(dmin, dmax + 1)
            for dx in range(dmin, dmax + 1)]
    return jnp.concatenate(cols, -1)


def _stem_phase_fwd(xph, w, b, stride, padding):
    """k-s-p conv reading its input DIRECTLY in phase-major layout.

    The pixel-space stem pays a pad + space-to-depth relayout per call
    (_im2col_s2d); when the producer is a phase-major convT head
    (head_convt_phase) the interleave-then-repack round trip is pure
    data formatting.  space_to_phase's lane order (q, r, c) is the same
    block order s2d uses, so the patches here are shifted full-lane
    slices of the phase tensor itself and the tap selection moves into
    the weight-matrix row order (_w_phase_stem)."""
    k = w.shape[0]
    co = w.shape[3]
    n, hb, wb, _ = xph.shape
    patches = _stem_phase_patches(xph, k, stride, padding)
    w2 = _w_phase_stem(w, stride, padding).astype(patches.dtype)
    y = jax.lax.dot_general(
        patches.reshape(n * hb * wb, -1), w2,
        dimension_numbers=(((1,), (0,)), ((), ())))
    y = y.reshape(n, hb, wb, co)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def stem_conv_phase(xph, w, b, stride, padding):
    """conv2d(phase_to_space(xph, stride), w, b, stride, padding) without
    ever materializing the pixel tensor; dx is returned in the SAME
    phase-major layout (callers gate on stem_phase_supported)."""
    return _stem_phase_fwd(xph, w, b, stride, padding)


def _stem_phase_vjp_fwd(xph, w, b, stride, padding):
    return (_stem_phase_fwd(xph, w, b, stride, padding),
            (xph, w, b is not None))


def _stem_phase_vjp_bwd(stride, padding, res, g):
    xph, w, has_b = res
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32) if has_b else None
    g = g.astype(xph.dtype)
    k = w.shape[0]
    s, p = stride, padding
    ci, co = w.shape[2], w.shape[3]
    n, hb, wb, _ = g.shape
    gm = g.reshape(n * hb * wb, co)
    # dw: patches^T @ g, then pick the k*k defined (d, q) row blocks
    # (the zero-row positions carry no parameters)
    patches = _stem_phase_patches(xph, k, s, p)
    dw2 = jax.lax.dot_general(
        patches.reshape(n * hb * wb, -1), gm.astype(patches.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())))
    dmin, dmax = _phase_stem_geometry(k, s, p)
    nd = dmax - dmin + 1
    rows = []
    for ky in range(k):
        dy, qy = (ky - p) // s, (ky - p) % s
        row = []
        for kx in range(k):
            dx, qx = (kx - p) // s, (kx - p) % s
            blk = (((dy - dmin) * nd + (dx - dmin)) * s * s
                   + qy * s + qx)
            row.append(dw2[blk * ci:(blk + 1) * ci])
        rows.append(jnp.stack(row))
    dw = jnp.stack(rows).astype(w.dtype)
    # dx (phase layout): d_patches = g @ w2^T, then the transpose of the
    # shifted-slice concat — each (dy, dx) lane block pads back to its
    # shifted block position and the pieces sum (elementwise, fusable)
    w2 = _w_phase_stem(w, s, p).astype(g.dtype)
    dpatches = jax.lax.dot_general(
        gm, w2, dimension_numbers=(((1,), (1,)), ((), ())))
    ssci = s * s * ci
    dpatches = dpatches.reshape(n, hb, wb, nd * nd, ssci)
    pl, pr = -dmin, dmax
    acc = None
    idx = 0
    for dy in range(dmin, dmax + 1):
        for dx in range(dmin, dmax + 1):
            piece = jnp.pad(dpatches[:, :, :, idx, :],
                            ((0, 0), (pl + dy, pr - dy),
                             (pl + dx, pr - dx), (0, 0)))
            acc = piece if acc is None else acc + piece
            idx += 1
    dxph = acc[:, pl:pl + hb, pl:pl + wb, :].astype(xph.dtype)
    return dxph, dw, db


stem_conv_phase.defvjp(_stem_phase_vjp_fwd, _stem_phase_vjp_bwd)


# ------------------------------------------------- one-dot dw mid convs

def dw_onedot(x, g, wshape, stride, padding):
    """dw of a conv as ONE patches^T @ g matmul (the stem-dw form at any
    channel count).  XLA's native dw conv pays minor-dim relayouts of
    both operands; this reads x once into an im2col patches matrix
    (contiguous slices; space-to-depth first when strided) and contracts
    over all positions in a single dot."""
    kh, kw, ci, co = wshape
    n, oh, ow, _ = g.shape
    if stride == 1:
        patches = _im2col(x, kh, kw, 1, padding, oh, ow)
    else:
        patches = _im2col_s2d(x, kh, stride, padding, oh, ow)
    dw = jax.lax.dot_general(
        patches.reshape(n * oh * ow, -1),
        g.reshape(n * oh * ow, co).astype(patches.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if stride == 1:
        return dw.reshape(kh, kw, ci, co)
    return _w_s2d_inv(dw, kh, stride, ci, co)


def mid_conv_supported(x, w, stride, padding):
    """k3s1 mid-channel convs (the CRN trunk): XLA's forward is fine but
    its dw runs at ~4% peak; only dw is replaced.  Measured win at
    ci = co = 64 (vjp 0.263 vs 0.568 at 256px); ci = 128 LOSES (the
    9*ci-lane patches matrix outgrows its benefit: 1.21 ms), hence the
    tight channel gate."""
    kh, kw, ci, co = w.shape
    return (kh == kw and kh == 3 and stride == 1
            and 16 <= ci <= 64 and 16 <= co <= 64
            and isinstance(padding, int)
            and x.shape[1] * x.shape[2] >= 128 * 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mid_conv(x, w, b, stride, padding):
    """Native-XLA forward conv with a one-dot-dw backward (callers gate
    on mid_conv_supported); semantics = ops.conv.conv2d."""
    return _mid_fwd(x, w, b, stride, padding)


def _mid_band_ok(x, stride, padding):
    """Pair-packing needs s1 p1, batch 1, even width (crn_conv's form)."""
    return (stride == 1 and padding == 1 and x.shape[0] == 1
            and x.shape[2] % 2 == 0)


def _mid_fwd(x, w, b, stride, padding):
    if _MID_FWD == 'bandpair' and _mid_band_ok(x, stride, padding):
        # banded pair dots (see _crn_fwd): at ci = co = 64 the block
        # matrices are (128, 128) — full MXU lanes — and the dot form
        # dodges the in-context T(2,128) conv layout + patch-build
        # fusions (conv.py:85 block, 171-255 GB/s in the round-3 in_fma
        # trace)
        return _crn_fwd(x, w, b)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _mid_vjp_fwd(x, w, b, stride, padding):
    return _mid_fwd(x, w, b, stride, padding), (x, w, b is not None)


def _mid_vjp_bwd(stride, padding, res, g):
    x, w, has_b = res
    kh = w.shape[0]
    # dx: the SAME-shape conv of g with the flipped, io-transposed
    # kernel — same shape class as the forward, so it takes the same
    # banded pair-dot route under SGAN_TPU_MID_FWD=bandpair
    wT = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
    if (_MID_FWD == 'bandpair' and kh == 3
            and _mid_band_ok(g, stride, padding)):
        dx = _crn_fwd(g, wT, None)
    else:
        dx = jax.lax.conv_general_dilated(
            g, wT, (1, 1), ((kh - 1 - padding, kh - 1 - padding),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # NOTE: routing this dw through the pallas kernel measured isolated
    # 2.6x (0.053 vs 0.14 ms) but LOST end-to-end — the packing
    # conversions around the custom-call do not fuse at 256px (the same
    # lesson as the fwd kernel's >=512px dispatch gate); the pure-XLA
    # one-dot form composes.
    if (_MID_DW in ('9dot', 'gcols', 'rowdots')
            and kh == 3 and padding == 1 and stride == 1):
        # dot-form dw: no patches materialization (the one-dot form's
        # 75 MB relayout was the round-2 net loss); see dw3x3
        dw = dw3x3(x, g).astype(w.dtype)
    else:
        dw = dw_onedot(x, g, w.shape, stride, padding).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32) if has_b else None
    return dx.astype(x.dtype), dw, db


mid_conv.defvjp(_mid_vjp_fwd, _mid_vjp_bwd)


# ------------------------------------------- CRN halving convs (ci = 2co)

def _band_pair_out(w):
    """(3, 3, Ci, Co) -> B[ky, s] of shape (2*Ci, 2*Co).

    Banded block matrices for the pair-packed forward: output tuples are 2
    adjacent pixels x Co lanes; input operand s is the tuple view of the
    1-px-left-padded image shifted s tuples right.  Block (p_in, p_out)
    of B[ky, s] holds w[ky, kx] with kx = 2s + p_in - p_out (the +1 from
    the pad and the -1 from tap centering cancel), 0 <= kx < 3.

    Built as ONE einsum against a constant 0/1 placement mask instead of
    48 dynamic-update-slices (each output block receives exactly one tap
    or zero, so the masked sum is bit-exact in any dtype; the DUS chain
    showed up as constant_dynamic-update-slice fusions in the round-3
    in_fma trace)."""
    ci, co = w.shape[2], w.shape[3]
    M = np.zeros((3, 2, 2, 2), np.float32)      # (kx, s, p_in, p_out)
    for s in range(2):
        for p_in in range(2):
            for p_out in range(2):
                kx = 2 * s + p_in - p_out
                if 0 <= kx < 3:
                    M[kx, s, p_in, p_out] = 1.0
    B = jnp.einsum('yxad,xspq->yspaqd', w,
                   jnp.asarray(M, w.dtype))    # (ky, s, p_in, ci, p_out, co)
    return B.reshape(3, 2, 2 * ci, 2 * co)


def _crn_fwd(x, w, b):
    """Pair-packed banded-dot forward: 6 MXU dots (H*W/2, 2Ci) x (2Ci, 2Co).

    The CRN bilinear-upsample convs (3,3,128,64 at 256px — reference
    models/networks.py:738-764 UpsampleBlock, the two largest fwd ops of
    the round-3 DSGAN device profile) run 3.6x slower INSIDE the step
    (573 us) than isolated (160 us): in context XLA assigns them a
    T(2,128) activation layout and brackets them with relayout copies.
    Dots take rigid canonical layouts, so this form is immune to the
    context: 0.163 ms isolated (59 TF/s-equiv incl. the 4/3 band
    padding), and the pad/slice/reshape around it are fusable bandwidth
    ops, not opaque conv configs."""
    n, h, W, ci = x.shape
    co = w.shape[3]
    W2 = W // 2
    B = _band_pair_out(w.astype(x.dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xpp = xp.reshape(n, h + 2, (W + 2) // 2, 2 * ci)
    acc = None
    for ky in range(3):
        for s in range(2):
            op = lax.slice(xpp, (0, ky, s, 0), (n, ky + h, s + W2, 2 * ci))
            d = lax.dot_general(op.reshape(-1, 2 * ci), B[ky, s],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    y = acc.reshape(n, h, W, co).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


_CRN_MIN_PIXELS = int(_os.environ.get('SGAN_TPU_CRN_MIN_PIXELS',
                                      str(128 * 128)))


def crn_conv_supported(x, w, stride, padding):
    """k3 s1 p1 halving convs: ci = 2*co = 128 (the CRN pyramid's
    concat(label-embed, upsampled-features) inputs), batch 1, even width.
    The pixel gate is tunable (SGAN_TPU_CRN_MIN_PIXELS): the batch-28 A/B
    lowered it 256^2 -> 128^2 — the 128px halving conv's XLA dW alone ran
    at 90 GB/s / 0.15 ms/step (fusion.7722 + convert_add_fusion.37,
    round-3 mid_bandpair trace); below 128^2 the sites are too cheap to
    matter and small-size dispatch risks the usual composition tax."""
    kh, kw, ci, co = w.shape
    n, h, wd, _ = x.shape
    return (kh == kw and kh == 3 and stride == 1 and padding == 1
            and ci == 128 and co == 64 and n == 1
            and wd % 2 == 0 and h * wd >= _CRN_MIN_PIXELS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def crn_conv(x, w, b, stride, padding):
    """3x3 s1 p1 halving conv (ci = 2co) as banded pair dots; XLA dx
    (the widening conv g 64->128 runs at 81 TF/s isolated — already
    optimal) + nine-dot dw (0.228 vs XLA's 0.310 ms isolated).  Callers
    gate on crn_conv_supported; semantics = ops.conv.conv2d."""
    return _crn_fwd(x, w, b)


def _crn_vjp_fwd(x, w, b, stride, padding):
    return _crn_fwd(x, w, b), (x, w, b is not None)


def _nine_dot_dw(x, g):
    """dw as nine K-major dots, any (ci, co) — same form as
    ops/pallas/conv3x3._dw_9dot (BENCH_NOTES.md round 3)."""
    n, h, w_, c = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g2 = g.reshape(-1, co)
    outs = []
    for ky in range(3):
        for kx in range(3):
            xs = lax.slice(xp, (0, ky, kx, 0), (n, ky + h, kx + w_, c))
            outs.append(lax.dot_general(
                xs.reshape(-1, c), g2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(outs).reshape(3, 3, c, co)


def dw_gcols(x, g):
    """dw of a SAME 3x3 conv as ONE K-major MXU dot over explicitly
    pre-transposed operands.

    The nine-dot form (_nine_dot_dw) re-reads K-major copies of BOTH
    operands nine times and accumulates through dynamic-update-slice
    (round-3 trace at the 512px c64 sites: 1.40 ms/step of DUS dots plus
    0.82 ms of XLA-inserted 6-output transposed materializations).  Here
    each operand is transposed ONCE by hand — (n,c,H,W), channel-major —
    after which the 9 shifted tap slices are contiguous reads, their
    lane-concat is a plain bandwidth fusion, and the whole gradient is a
    single (9c, HW) x (co, HW) contraction over the shared minor dim."""
    n, h, w_, c = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xpT = jnp.moveaxis(xp, 3, 1)                    # (n, c, h+2, w+2)
    gT = jnp.moveaxis(g, 3, 1).reshape(n, co, h * w_)
    cols = []
    for ky in range(3):
        for kx in range(3):
            cols.append(lax.slice(xpT, (0, 0, ky, kx),
                                  (n, c, ky + h, kx + w_)))
    xcolsT = jnp.concatenate(cols, axis=1).reshape(n, 9 * c, h * w_)
    dw = lax.dot_general(xcolsT, gT, (((2,), (2,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    return dw.sum(0).reshape(3, 3, c, co)


def dw_rowdots(x, g):
    """dw of a SAME 3x3 conv as THREE per-row dots with free-view lhs.

    The nine-dot form's per-tap lhs ``xs.reshape(-1, c)`` is a strided
    W-slice, so XLA materializes a K-major copy of BOTH operands per tap
    (round-3 s7 trace: 1.5 ms/step of 67 MB constant_DUS fusions at the
    512px c64 sites).  Here the lhs for row-tap ky is
    ``xp[:, ky:ky+h, :, :]`` — full contiguous rows of the padded input,
    a layout-preserving view — and the three kx taps ride the RHS
    instead: g zero-padded onto the wp grid at the three shifts and
    lane-concatenated to (M', 3co) (one bandwidth fusion; 3co >= 96
    lanes at every dispatch site, so no tile padding).  Traffic:
    3 view-reads of xp + 2x the 3co gcols vs the nine-dot's 9 strided
    read+write pairs.  dw[ky, kx] = sum_{i,j} xp[i+ky, j+kx] * g[i, j]:
    flattening (n, i, m) is safe because the tap pairing is elementwise
    in the flattened index."""
    n, h, w_, c = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = w_ + 2
    gcols = jnp.concatenate(
        [jnp.pad(g, ((0, 0), (0, 0), (kx, 2 - kx), (0, 0)))
         for kx in range(3)], axis=-1).reshape(n * h * wp, 3 * co)
    outs = []
    for ky in range(3):
        lhs = lax.slice(xp, (0, ky, 0, 0),
                        (n, ky + h, wp, c)).reshape(n * h * wp, c)
        outs.append(lax.dot_general(
            lhs, gcols, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.stack(outs).reshape(3, c, 3, co).transpose(0, 2, 1, 3)


def dw_rowcols(x, g):
    """dw of a SAME 3x3 conv as ONE (3c, 3co) dot over lane-concatenated
    row bands — dw_rowdots with the three ky dots merged.

    rowdots' three ky dots share the same (M', 3co) gcols rhs, so the
    dots re-read it three times (round-3 base_s10 trace: six 0.162
    ms/step dot fusions at the two 512px c64 Pallas sites, 833 GB/s —
    bandwidth-bound on the re-reads, not MXU-bound).  Here the three ky
    row bands — the same layout-preserving full-row views rowdots feeds
    its lhs dots — are lane-concatenated to (M', 3c) (the exact
    mechanism as the g-side gcols, one bandwidth fusion, no strided
    slices), and a single dot contracts both 3-block operands:
    t[ky*c+ci, kx*co+o] = sum_M xp[i+ky, j, ci] * gpad[i, j-kx, o]
    = dw[ky, kx, ci, o].  Dot traffic: (3c + 3co) * M' read ONCE vs
    rowdots' (3c + 9co) * M'.  Unlike the round-2 'onedot' im2col form
    (9ci-wide strided patches, a 75 MB relayout) the kx taps ride the
    rhs, so the lhs is 3c wide and every slice is contiguous."""
    n, h, w_, c = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = w_ + 2
    xcols = jnp.concatenate(
        [lax.slice(xp, (0, ky, 0, 0), (n, ky + h, wp, c))
         for ky in range(3)], axis=-1).reshape(n * h * wp, 3 * c)
    gcols = jnp.concatenate(
        [jnp.pad(g, ((0, 0), (0, 0), (kx, 2 - kx), (0, 0)))
         for kx in range(3)], axis=-1).reshape(n * h * wp, 3 * co)
    t = lax.dot_general(xcols, gcols, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return t.reshape(3, c, 3, co).transpose(0, 2, 1, 3)


def dw_rowpair02(x, g):
    """dw_rowdots with the ky = 0 and ky = 2 dots merged into ONE
    (2c, 3co) dot — the batch-34 rowpair recipe, conservatively.

    The full three-way merge (dw_rowcols) canonicalized to M-on-lanes
    layouts and paid 293 GB/s physical reshapes of both operands
    (batch 33).  Here only the outer row bands lane-concat (2c = 128
    lanes at the c64 dispatch sites — one full lane tile) while the
    dot form stays the rowdots one; gcols is re-read twice per dw
    instead of three times."""
    n, h, w_, c = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = w_ + 2
    gcols = jnp.concatenate(
        [jnp.pad(g, ((0, 0), (0, 0), (kx, 2 - kx), (0, 0)))
         for kx in range(3)], axis=-1).reshape(n * h * wp, 3 * co)
    lhs02 = jnp.concatenate(
        [lax.slice(xp, (0, ky, 0, 0), (n, ky + h, wp, c))
         for ky in (0, 2)], axis=-1).reshape(n * h * wp, 2 * c)
    d02 = lax.dot_general(lhs02, gcols, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    lhs1 = lax.slice(xp, (0, 1, 0, 0),
                     (n, 1 + h, wp, c)).reshape(n * h * wp, c)
    d1 = lax.dot_general(lhs1, gcols, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dw = jnp.stack([d02[:c], d1, d02[c:]])
    return dw.reshape(3, c, 3, co).transpose(0, 2, 1, 3)


def dw_rowdots_cmajor(x, g):
    """dw_rowdots with ONE channel-major lhs materialization.

    At the 512px c64 Pallas-conv3x3 sites the rowdots lhs "free views"
    are not free: the dot's canonical lhs layout is channel-major and
    the three ky row-slices start at lane offsets ky*wp (wp = 514, not
    128-aligned), so XLA materializes THREE ~67 MB padded copies per dw
    (fusion.150/153 in the round-3 mid_bandpair trace, 0.63 ms/step at
    430 GB/s).  Here the padded input is transposed to channel-major
    ONCE with its width padded to a lane multiple, after which the three
    ky slices are tile-aligned dense sub-matrices — genuinely free.  The
    extra zero columns contribute nothing (gcols is zero there too)."""
    n, h, w_, c = x.shape
    co = g.shape[-1]
    wp = w_ + 2
    wpa = -(-wp // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wpa - wp), (0, 0)))
    xpT = jnp.moveaxis(xp, 3, 1).reshape(n, c, (h + 2) * wpa)
    gcols = jnp.concatenate(
        [jnp.pad(g, ((0, 0), (0, 0), (kx, wpa - w_ - kx), (0, 0)))
         for kx in range(3)], axis=-1).reshape(n, h * wpa, 3 * co)
    outs = []
    for ky in range(3):
        lhs = lax.slice(xpT, (0, 0, ky * wpa),
                        (n, c, ky * wpa + h * wpa))
        outs.append(lax.dot_general(
            lhs, gcols, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    return (jnp.stack(outs).sum(1)
            .reshape(3, c, 3, co).transpose(0, 2, 1, 3))


def dw3x3(x, g):
    """SAME 3x3 s1 dw in the gated form (SGAN_TPU_MID_DW)."""
    if _MID_DW == 'rowdots':
        return dw_rowdots(x, g)
    if _MID_DW == 'rowcols':
        return dw_rowcols(x, g)
    if _MID_DW == 'rowdots_cm':
        return dw_rowdots_cmajor(x, g)
    if _MID_DW == 'gcols':
        return dw_gcols(x, g)
    return _nine_dot_dw(x, g)


def _crn_vjp_bwd(stride, padding, res, g):
    x, w, has_b = res
    wT = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
    if _CRN_DX == 'bandpair' and _mid_band_ok(g, 1, 1):
        # the widening dx (co -> ci) through the same banded pair dots as
        # the forward: in-context the XLA conv pays 255 GB/s patch-build
        # fusions at the 256px sites (fusion.328/332, round-3
        # mid_bandpair trace) that the dot form doesn't
        dx = _crn_fwd(g, wT, None)
    else:
        dx = jax.lax.conv_general_dilated(
            g, wT, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dw = dw3x3(x, g).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32) if has_b else None
    return dx.astype(x.dtype), dw, db


crn_conv.defvjp(_crn_vjp_fwd, _crn_vjp_bwd)


# ------------------------------------------------------- convT heads

def head_convt_supported(x, w, stride, padding, output_padding=0):
    kh, kw, ci, co = w.shape
    return (co <= HEAD_MAX_CO and ci >= 16 and kh == kw
            and isinstance(stride, int) and isinstance(padding, int)
            and output_padding == 0 and kh > padding
            and (kh - 2 * padding) % stride == 0)


def trunk_convt_supported(x, w, stride, padding, output_padding=0):
    """Gate for mid-channel k4s2 ConvTranspose (unet decoders) through the
    dense phase-dot form.  Same machinery as head_convt (channel-generic);
    at co >= 64 the final phase interleave is lane-friendly, unlike the
    co <= 4 heads that motivated the dense form."""
    kh, kw, ci, co = w.shape
    co_max = int(_os.environ.get('SGAN_TPU_TRUNK_CONVT_CO_MAX', '256'))
    return (HEAD_MAX_CO < co <= co_max and ci >= 16 and kh == kw == 4
            and stride == 2 and padding == 1 and output_padding == 0
            and 1 <= x.shape[1] * x.shape[2] <= 256 * 256)


def _phase_taps(k, s, p):
    """For each output phase q (Y = s*m + q): the (ky, d) pairs with
    y[Y] += w[ky] x[m + d], from the stored-pre-flipped lhs-dilated form
    y[Y] = sum_ky w[ky] x[(Y + ky - (k-1-p)) / s]."""
    taps = []
    for q in range(s):
        lst = []
        for ky in range(k):
            num = q + ky - (k - 1 - p)
            if num % s == 0:
                lst.append((ky, num // s))
        taps.append(lst)
    return taps


# space_to_phase form: 'rows' (default) builds the phase-major tensor
# from s strided full-row slices + free reshapes + one lane concat — the
# same H-deinterleave trick as _im2col_s2d_rows.  The 6-D transpose form
# ('xpose') interleaves at c-element granularity and profiled 11-16 GB/s
# on the fcgan-family real-side interleave (reshape.1268, round-5
# jointgan trace: 0.29 ms/step of a 6.37 ms step).
_S2P_MODE = _os.environ.get('SGAN_TPU_S2P', 'rows')


def space_to_phase(x, s):
    """Pixel NHWC -> phase-major (n, H/s, W/s, s*s*c), lane order (q, r, c)
    — the inverse of the convT phase interleave and the same block order as
    _im2col_s2d's space-to-depth."""
    n, h, w, c = x.shape
    if _S2P_MODE == 'rows':
        parts = []
        for q in range(s):
            xq = lax.slice(x, (0, q, 0, 0), (n, h, w, c), (1, s, 1, 1))
            # (n, h/s, w, c) -> (n, h/s, w/s, s*c): free reshape, lane
            # order (r, c) by row-major layout
            parts.append(xq.reshape(n, h // s, w // s, s * c))
        return jnp.concatenate(parts, axis=-1)
    x6 = x.reshape(n, h // s, s, w // s, s, c)
    return x6.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // s, w // s,
                                                  s * s * c)


def phase_to_space(y, s):
    """Inverse of space_to_phase."""
    n, oh, ow, sc = y.shape
    c = sc // (s * s)
    y6 = y.reshape(n, oh, ow, s, s, c)
    return y6.transpose(0, 1, 3, 2, 4, 5).reshape(n, oh * s, ow * s, c)


def _convt_geometry(k, s, padding, h, wd):
    """Shared geometry of the dense convT forms: tap table, per-phase output
    size, sorted tap offsets and the symmetric x padding."""
    taps = _phase_taps(k, s, padding)
    O = h - 1 + (k - 2 * padding) // s
    OW = wd - 1 + (k - 2 * padding) // s
    ds = sorted({d for lst in taps for (_, d) in lst})
    pt = max(0, -ds[0])
    pb = max(0, max(O, OW) - 1 + ds[-1] - (min(h, wd) - 1))
    return taps, O, OW, ds, pt, pb


def _convt_patches(x, ds, pt, pb, O, OW):
    """(n, O, OW, |D|^2*ci) shifted contiguous slices of the padded input."""
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pt, pb), (0, 0)))
    cols = []
    for a in ds:
        for bb in ds:
            cols.append(xp[:, pt + a:pt + a + O, pt + bb:pt + bb + OW, :])
    return jnp.concatenate(cols, axis=-1)


def _convt_w2(w, taps, ds, s):
    """(shift, phase) block matrix (|D|^2*ci, s*s*co): block (a, bb) x
    (q, r) holds w[ky, kx] when the tap tables place (ky, kx) there."""
    ci, co = w.shape[2], w.shape[3]
    zz = jnp.zeros((ci, co), w.dtype)
    kymap = {q: {d: ky for ky, d in taps[q]} for q in range(s)}
    rows = []
    for a in ds:
        for bb in ds:
            row = []
            for q in range(s):
                for r in range(s):
                    ky = kymap[q].get(a)
                    kx = kymap[r].get(bb)
                    row.append(zz if ky is None or kx is None
                               else w[ky, kx])
            rows.append(row)
    return jnp.block(rows)


def _dw2_to_w(dW2, taps, ds, k, s, ci, co, dtype):
    """Extract the (k, k, ci, co) kernel gradient from the dense-form
    dW2 = patches^T @ g (16 tiny slices of the (|D|^2*ci, s*s*co) result)."""
    dmap = {}
    for q in range(s):
        for ky, d in taps[q]:
            dmap[ky] = (q, d)
    didx = {d: i for i, d in enumerate(ds)}
    nd = len(ds)
    rows = []
    for ky in range(k):
        qy, dy = dmap[ky]
        ai = didx[dy]
        row = []
        for kx in range(k):
            qx, dx2 = dmap[kx]
            bi = didx[dx2]
            blk = dW2[(ai * nd + bi) * ci:(ai * nd + bi + 1) * ci,
                      (qy * s + qx) * co:(qy * s + qx + 1) * co]
            row.append(blk)
        rows.append(jnp.stack(row))
    return jnp.stack(rows).astype(dtype)


def _head_convt_fwd_dense(x, w, b, stride, padding):
    """Tiny-Co ConvTranspose as ONE dense dot straight to phase-major
    channels.

    The phase form (_head_convt_fwd) reads k*k channel-slices of its
    t-tensor per output phase — at co <= 4 those are 2-lane loop fusions
    (profiled 3 x 0.57 ms/step at 11 GB/s on the DSGAN bench: the dx of
    every D stem flows through here).  This form concatenates the |D|^2
    shifted contiguous slices of x (D = the phase-tap row offsets, an
    im2col over the tap window) and contracts once against a
    (|D|^2*ci, s*s*co) block matrix holding w[ky, kx] at the (shift,
    phase) positions the tap table prescribes — the tap sums become the
    K dimension of a single MXU dot, and only the final phase interleave
    remains."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    s = stride
    taps, O, OW, ds, pt, pb = _convt_geometry(k, s, padding, h, wd)
    patches = _convt_patches(x, ds, pt, pb, O, OW)   # (n, O, OW, |D|^2*ci)
    # (shift, phase) block matrix; at most one (ky, kx) lands per cell
    w2 = _convt_w2(w, taps, ds, s)               # (|D|^2*ci, s*s*co)
    pm = patches.reshape(n * O * OW, -1)
    if _HCT_MODE == 'split':
        # one dot PER ROW PHASE q (w2's column order is (q, r, co), so
        # each q-block is a contiguous slice): the W-phase interleave
        # becomes a free row-major reshape of (OW, r), and the H-phase
        # interleave a stack along a fresh axis after O — a concat whose
        # inner runs are s*OW*co contiguous elements (full lanes).  The
        # single-dot form instead pays a true (q over OW) transpose with
        # co-element inner runs — 2-lane relayouts at the co<=4 sites
        # (profiled 1.3 ms/step, round-3 trace).  Extra cost: patches is
        # read s times instead of once.
        parts = []
        for q in range(s):
            w2q = w2[:, q * s * co:(q + 1) * s * co]
            tq = jax.lax.dot_general(
                pm, w2q.astype(x.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            parts.append(tq.reshape(n, O, OW, s, co)
                         .astype(x.dtype)
                         .reshape(n, O, s * OW, co))
        y = jnp.stack(parts, axis=2).reshape(n, s * O, s * OW, co)
    else:
        t = jax.lax.dot_general(
            pm, w2.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = t.reshape(n, O, OW, s, s, co)
        y = t.transpose(0, 1, 3, 2, 4, 5).reshape(n, s * O, s * OW, co)
        y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def head_convt(x, w, b, stride, padding):
    """Tiny-Co ConvTranspose (w stored pre-flipped HWIO, see
    ops.conv.conv_transpose2d) as ONE dense phase-major dot
    (_head_convt_fwd_dense) — never a strided slice of a lane-starved
    tensor (measured pathological: the zero-dilate form ran 0.58/7.3 ms
    fwd/vjp at 256px 64->2 vs XLA's 0.23/0.90; BENCH_NOTES.md round 2).
    The earlier per-phase tap-sum form (_head_convt_fwd, SGAN_TPU_HCT=sum
    re-enables) left 3 x 0.57 ms/step of 2-lane loop fusions in the
    DSGAN step — the co<=4 phase accumulators are lane-starved no matter
    how they are fed (round-3 note); the dense form keeps the tap sums in
    the K dimension of the dot.  Callers gate on head_convt_supported."""
    if _HCT_MODE == 'sum':
        return _head_convt_fwd(x, w, b, stride, padding)
    return _head_convt_fwd_dense(x, w, b, stride, padding)


def _head_convt_fwd(x, w, b, stride, padding):
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    s = stride
    taps = _phase_taps(k, s, padding)
    O = h - 1 + (k - 2 * padding) // s           # output rows per phase
    OW = wd - 1 + (k - 2 * padding) // s         # output cols per phase
    ds = [d for lst in taps for (_, d) in lst]
    pl = max(0, -min(ds))
    pr = max(0, max(O, OW) - 1 + max(ds) - (min(h, wd) - 1))
    wm = w.transpose(2, 0, 1, 3).reshape(ci, k * k * co)
    t = jax.lax.dot_general(
        x.reshape(n * h * wd, ci), wm.astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # cast BEFORE the pad/tap sums: the 4-tap channel-sliced reads of t
    # are lane-starved loop fusions (profiled 11 GB/s, 3 x 0.57 ms/step on
    # the DSGAN bench) and f32 doubles their traffic; the later interleave
    # transpose is a real relayout with the same 2x (round-2 note).  A
    # k*k-term bf16 sum costs ~2 ulp on data already quantized to bf16.
    t = t.reshape(n, h, wd, k * k * co).astype(x.dtype)
    t = jnp.pad(t, ((0, 0), (pl, pr), (pl, pr), (0, 0)))
    phases = []
    for q in range(s):
        row = []
        for r in range(s):
            acc = jnp.zeros((n, O, OW, co), x.dtype)
            for ky, dy in taps[q]:
                for kx, dx_ in taps[r]:
                    j = ky * k + kx
                    acc = acc + t[:, pl + dy:pl + dy + O,
                                  pl + dx_:pl + dx_ + OW,
                                  j * co:(j + 1) * co]
            if b is not None:
                acc = acc + b.astype(acc.dtype)
            row.append(acc)
        phases.append(row)
    y = jnp.stack([jnp.stack(row) for row in phases])    # (s, s, n, O, OW, co)
    return y.transpose(2, 3, 0, 4, 1, 5).reshape(n, s * O, s * OW, co)


def _deint_w_planes(gT, s):
    """Channel-major (n, c, H, X) -> s planes (n, c, H, X//s), plane r
    holding columns X = s*j + r, via a multiply-reduce over the minor
    pair dim — never a lane-strided slice (file header rule 2)."""
    n, c, H, X = gT.shape
    gv = gT.reshape(n, c, H, X // s, s)
    eye = jnp.eye(s, dtype=gT.dtype)
    return [jnp.sum(gv * eye[r], axis=-1) for r in range(s)]


def _deint_h_planes(p, s):
    """(n, c, H, OW) -> s planes (n, c, H//s, OW), plane q holding rows
    H = s*i + q — the H dual of _deint_w_planes.  Strided sublane
    slices measured 25 GB/s here (60 x 21 us/step, round-3 v2_confirm
    trace); the multiply-reduce form reads/writes dense."""
    n, c, H, OW = p.shape
    pv = p.reshape(n, c, H // s, s, OW)
    eye = jnp.eye(s, dtype=p.dtype)
    return [jnp.sum(pv * eye[q][:, None], axis=3) for q in range(s)]


def _convt_patches_kmajor(x, ds, pt, pb, O, OW):
    """(n, |D|^2*ci, O*OW) channel-major dual of _convt_patches, row
    order (a, bb, ci).  The (M, K) form gets relayouted into the dW2
    dot's K-major operand tiles (0.55 ms/step of bf16[72,8,256,256]
    copies at the G1 head site, round-3 s1 trace); built K-major the
    dot consumes it natively."""
    n, h, wd, ci = x.shape
    xT = jnp.moveaxis(x, 3, 1)
    xp = jnp.pad(xT, ((0, 0), (0, 0), (pt, pb), (pt, pb)))
    cols = []
    for a in ds:
        for bb in ds:
            sl = lax.slice(xp, (0, 0, pt + a, pt + bb),
                           (n, ci, pt + a + O, pt + bb + OW))
            cols.append(sl.reshape(n, ci, O * OW))
    return jnp.concatenate(cols, axis=1)


def convt_dw_planar(x, w, g, stride, padding):
    """dw-only planar backward of a k/s/p ConvTranspose: the dense
    phase-plane dW2 form of _head_convt_bwd_planar without its co cap.

    The cotangent is deinterleaved into s*s DENSE channel-major phase
    planes by two multiply-reduce stages (never a strided slice), then
    ONE K-major dot against the |D|^2 shifted-patch concat of x yields
    dW2, from which the (k,k,ci,co) kernel grad is 16 tiny slices.
    Built for the F2 convt4s2 ci=128,co=32 decoder sites whose joint
    XLA dw runs at 53 GB/s (round-3 s8 trace, fusion.8654/8655);
    dispatched from ops/pallas/convt4s2.py under
    SGAN_TPU_CONVT_BWD=densedw (dx stays the strong XLA strided conv)."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    s = stride
    taps, O, OW, ds, pt, pb = _convt_geometry(k, s, padding, h, wd)
    g = g.astype(x.dtype)
    gT = jnp.moveaxis(g, 3, 1)                    # (n, co, H, X)
    wplanes = _deint_w_planes(gT, s)              # r -> (n, co, H, OW)
    hsplit = [_deint_h_planes(wplanes[r], s) for r in range(s)]
    rows = []
    for q in range(s):
        for r in range(s):
            rows.append(hsplit[r][q].reshape(n, co, O * OW))
    grT = jnp.concatenate(rows, axis=1)            # (n, s*s*co, M)
    patches = _convt_patches(x, ds, pt, pb, O, OW)
    pmb = patches.reshape(n, O * OW, -1)
    dW2T = jax.lax.dot_general(
        grT, pmb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (n, s*s*co, K)
    dW2 = jnp.swapaxes(dW2T.sum(0), 0, 1)          # (K, s*s*co) — tiny
    return _dw2_to_w(dW2, taps, ds, k, s, ci, co, w.dtype)


def convt_dw_rowdots(x, w, g):
    """dW of the k4 s2 p1 ConvTranspose (pre-flipped HWIO storage) as
    FOUR row-grouped MXU dots — the dw_rowdots recipe transposed to the
    convT geometry.

    From the lhs-dilated form y[Y,X,d] = sum w[ky,kx,a,d] xd[Y+ky-2,
    X+kx-2,a] (xd = 2-dilated x): with cotangent phase planes
    G[q][r][i,j,d] = g[2i+q, 2j+r, d],

        dW[ky,kx,a,d] = sum_{i,j} x[i-dlt(ky), j-eps(kx), a]
                                   * G[ky%2][kx%2][i, j, d]

    with dlt/eps = (+1, 0, 0, -1).  The lhs for row ky is a contiguous
    row-slice view of the 1-px-padded x (the shifts never touch lanes);
    the four kx taps ride the rhs as zero-embedded lane concats of the
    phase planes (4co lanes).  Unlike 'densedw' (convt_dw_planar) there
    is NO |D|^2 patch concat of x, and unlike 'shifts' the dots contract
    the full M = h*(w+2) dim with (ci, 4co) = (128, 128) outputs — the
    geometry that won for conv3x3 (dw_rowdots, batch 16).  Phase planes
    come from two multiply-reduce stages (file header rule: never a
    strided slice)."""
    n, h, wd, ci = x.shape
    co = g.shape[-1]
    g = g.astype(x.dtype)
    # pixel-major phase planes G[q][r]: (n, h, wd, co)
    gv = g.reshape(n, h, 2, 2 * wd, co)
    eye = jnp.eye(2, dtype=g.dtype)
    rowp = [jnp.sum(gv * eye[q][None, None, :, None, None], axis=2)
            for q in range(2)]
    planes = {}
    for q in range(2):
        pv = rowp[q].reshape(n, h, wd, 2, co)
        for r in range(2):
            planes[(q, r)] = jnp.sum(
                pv * eye[r][None, None, None, :, None], axis=3)
    dlt = {0: 1, 1: 0, 2: 0, 3: -1}
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = wd + 2
    outs = []
    for ky in range(4):
        q = ky % 2
        # rhs[.., jp, kx*co+d] = G[q][kx%2][.., jp-1+eps(kx), d]:
        # embed each plane at col start 1-eps(kx) in a (wd+2)-wide strip
        rhs = jnp.concatenate(
            [jnp.pad(planes[(q, kx % 2)],
                     ((0, 0), (0, 0),
                      (1 - dlt[kx], wp - wd - 1 + dlt[kx]), (0, 0)))
             for kx in range(4)], axis=-1).reshape(n, h * wp, 4 * co)
        lhs = lax.slice(xp, (0, 1 - dlt[ky], 0, 0),
                        (n, 1 - dlt[ky] + h, wp, ci)).reshape(n, h * wp, ci)
        outs.append(lax.dot_general(
            lhs, rhs, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))     # (n, ci, 4co)
    dw = jnp.stack(outs).sum(1)                      # (4, ci, 4co)
    return dw.reshape(4, ci, 4, co).transpose(0, 2, 1, 3)


def convt_dw_rowpairs(x, w, g):
    """convt_dw_rowdots with the two ky rows of each cotangent phase
    merged into ONE (2ci, 4co) dot.

    The four ky dots use only TWO distinct rhs strips (q = ky % 2), each
    read twice.  Lane-concatenating the ky and ky+2 lhs row bands (the
    same free full-row views) halves the dot count and reads each rhs
    once: dot traffic (2ci + 4co) * M per phase vs (2ci + 8co) * M."""
    n, h, wd, ci = x.shape
    co = g.shape[-1]
    g = g.astype(x.dtype)
    gv = g.reshape(n, h, 2, 2 * wd, co)
    eye = jnp.eye(2, dtype=g.dtype)
    rowp = [jnp.sum(gv * eye[q][None, None, :, None, None], axis=2)
            for q in range(2)]
    planes = {}
    for q in range(2):
        pv = rowp[q].reshape(n, h, wd, 2, co)
        for r in range(2):
            planes[(q, r)] = jnp.sum(
                pv * eye[r][None, None, None, :, None], axis=3)
    dlt = {0: 1, 1: 0, 2: 0, 3: -1}
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = wd + 2
    blocks = {}
    for q in range(2):
        rhs = jnp.concatenate(
            [jnp.pad(planes[(q, kx % 2)],
                     ((0, 0), (0, 0),
                      (1 - dlt[kx], wp - wd - 1 + dlt[kx]), (0, 0)))
             for kx in range(4)], axis=-1).reshape(n, h * wp, 4 * co)
        lhs = jnp.concatenate(
            [lax.slice(xp, (0, 1 - dlt[ky], 0, 0),
                       (n, 1 - dlt[ky] + h, wp, ci))
             for ky in (q, q + 2)], axis=-1).reshape(n, h * wp, 2 * ci)
        d = lax.dot_general(lhs, rhs, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32).sum(0)
        blocks[q], blocks[q + 2] = d[:ci], d[ci:]
    dw = jnp.stack([blocks[ky] for ky in range(4)])  # (4, ci, 4co)
    return dw.reshape(4, ci, 4, co).transpose(0, 2, 1, 3)


def conv_dw_rowdots_s2(x, g):
    """dW of a k4 s2 p1 conv as EIGHT row-grouped MXU dots — the convT
    rowdw recipe mirrored to the forward conv (phases live on x):

        dW[ky,kx,a,d] = sum_{i,j} XP[ky%2][kx%2][i+ky//2, j+kx//2, a]
                                   * g[i,j,d]

    with XP the four multiply-reduce phase planes of the 1-px-padded x.
    One dot per (ky, kx%2): lhs = a contiguous row-slice view of the
    phase plane, rhs = the cotangent lane-concat at col offsets {0, 1}
    (2co lanes).  No patch concat, full-M contractions.  Built for the
    D2 trunk 128->256 sites whose joint XLA dw runs at 76-98 GB/s
    (fusion.684 + convert_add_fusion.20, round-3 crn_128px trace)."""
    n, h, wd, ci = x.shape
    oh, ow, co = g.shape[1], g.shape[2], g.shape[3]
    g = g.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H2, W2 = (h + 2) // 2, (wd + 2) // 2
    eye = jnp.eye(2, dtype=x.dtype)
    xv = xp.reshape(n, H2, 2, wd + 2, ci)
    rowp = [jnp.sum(xv * eye[q][None, None, :, None, None], axis=2)
            for q in range(2)]
    XP = {}
    for q in range(2):
        pv = rowp[q].reshape(n, H2, W2, 2, ci)
        for r in range(2):
            XP[(q, r)] = jnp.sum(
                pv * eye[r][None, None, None, :, None], axis=3)
    rhs = jnp.concatenate(
        [jnp.pad(g, ((0, 0), (0, 0), (eps, W2 - ow - eps), (0, 0)))
         for eps in (0, 1)], axis=-1).reshape(n, oh * W2, 2 * co)
    blocks = {}
    for ky in range(4):
        q, dlt = ky % 2, ky // 2
        for r in range(2):
            lhs = lax.slice(XP[(q, r)], (0, dlt, 0, 0),
                            (n, dlt + oh, W2, ci))
            d = lax.dot_general(
                lhs.reshape(n, oh * W2, ci), rhs,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (n, ci, 2co)
            blocks[(ky, r)] = d.sum(0)
    return jnp.stack([jnp.stack(
        [blocks[(ky, kx % 2)][:, (kx // 2) * co:(kx // 2 + 1) * co]
         for kx in range(4)]) for ky in range(4)])       # (4,4,ci,co)


def trunk_dw_supported(x, w, stride, padding):
    """k4 s2 p1 trunk convs whose XLA dw is bandwidth-starved: the
    measured-slow pocket is ci = 128 -> co = 256 (the D2 PatchGAN
    mid-depth doubling) — deeper sites (256->512+) are already MXU-bound
    in XLA (646-1572 GB/s equivalents) and shallower ones ride the
    s2d/stem forms."""
    kh, kw, ci, co = w.shape
    n, h, wd, _ = x.shape
    return (kh == kw == 4 and stride == 2 and padding == 1
            and ci == 128 and co == 256 and h % 2 == 0 and wd % 2 == 0
            and h * wd >= 64 * 64)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def trunk_dw_conv(x, w, b, stride, padding):
    """Plain XLA k4s2 conv whose backward splits dx (XLA, strong) from
    dw (conv_dw_rowdots_s2).  Callers gate on trunk_dw_supported;
    semantics = ops.conv.conv2d."""
    return _mid_fwd(x, w, b, 2, padding)


def _trunk_dw_vjp_fwd(x, w, b, stride, padding):
    return _mid_fwd(x, w, b, 2, padding), (x, w, b is not None)


def _trunk_dw_vjp_bwd(stride, padding, res, g):
    x, w, has_b = res
    _, pullx = jax.vjp(
        lambda xv: jax.lax.conv_general_dilated(
            xv, w.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
    (dx,) = pullx(g)
    dw = conv_dw_rowdots_s2(x, g).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32) if has_b else None
    return dx.astype(x.dtype), dw, db


trunk_dw_conv.defvjp(_trunk_dw_vjp_fwd, _trunk_dw_vjp_bwd)


def _head_convt_bwd_planar(x, w, g, stride, padding, has_b):
    """head_convt backward that consumes the cotangent CHANNEL-MAJOR.

    At co <= 4 every row-major (..., co)-minor tensor is tiled
    (8, 128) over (W, co) — physically 128/co-times padded — so the
    split/dense extractions' g6/gq reshapes and the planar->row-major
    copy XLA inserts to feed them run at 13-18 GB/s effective
    (~1.1 ms/step across the three DSGAN c2 head sites, round-3 base_s6
    trace at conv.py:118 / generators.py:31).  XLA already keeps the
    incoming cotangent planar ({2,1,3,0}); here the moveaxis to
    (n, co, H, X) is a layout no-op, the W-phase deinterleave is a
    multiply-reduce over the minor pair dim, the H-phase split is a
    sublane-strided full-lane slice, and both grads are K-major dots
    whose operands never put co in the minor dim."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    s = stride
    taps, O, OW, ds, pt, pb = _convt_geometry(k, s, padding, h, wd)
    H, X = s * O, s * OW
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32) if has_b else None
    g = g.astype(x.dtype)
    gT = jnp.moveaxis(g, 3, 1)                    # (n, co, H, X)
    wplanes = _deint_w_planes(gT, s)              # r -> (n, co, H, OW)
    # full phase decomposition G[q][r]: (n, co, O, OW), all dense —
    # every downstream read is then a CONTIGUOUS slice
    G = [None] * s
    hsplit = [_deint_h_planes(wplanes[r], s) for r in range(s)]
    G = [[hsplit[r][q] for r in range(s)] for q in range(s)]
    if (_HCT_DW in ('rowpairs', 'rowdots') and k == 4 and s == 2
            and padding == 1 and H == 2 * h and X == 2 * wd):
        # no patch reuse: the forward's |D|^2 concat keeps one consumer
        # (see _HCT_DW note at the top of the file)
        dw_fn = convt_dw_rowpairs if _HCT_DW == 'rowpairs' \
            else convt_dw_rowdots
        dw = dw_fn(x, w, g).astype(w.dtype)
        return _head_convt_bwd_dx(x, w, g, G, stride, padding,
                                  taps, O, OW), dw, db
    # dw: dW2^T = g_rows @ patches, rows ordered (q, r, co) to match
    # _dw2_to_w's column order — the phase planes ARE the rows
    rows = []
    for q in range(s):
        for r in range(s):
            rows.append(G[q][r].reshape(n, co, O * OW))
    grT = jnp.concatenate(rows, axis=1)            # (n, s*s*co, M)
    if _CONVT_PATCHES == 'kmajor':
        # MEASURED -0.98 ms NEGATIVE (p1 arm, round-3): building the
        # |D|^2 channel-major x copies costs more than the (M, K)
        # concat + the dot's K-major relayout it replaces
        pT = _convt_patches_kmajor(x, ds, pt, pb, O, OW)
        dW2T = jax.lax.dot_general(
            grT, pT, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # (n, s*s*co, K)
    elif _CONVT_PATCHES == 'shifts':
        # no patch tensor at all: one tall-reduction dot per (a, bb)
        # shift whose rhs is a CONTIGUOUS slice view of the padded x.
        # Replaces the (M, K) concat + its K-major relayout + S(1)
        # staging (3 x 75 MB bf16[72,8,256,256] copies/step at the G1
        # c64->c2 head site, round-3 fu trace); gr is re-read |D|^2
        # times but is only s*s*co lanes wide.
        xp = jnp.pad(x, ((0, 0), (pt, pb), (pt, pb), (0, 0)))
        parts = []
        for a in ds:
            for bb in ds:
                sl = lax.slice(xp, (0, pt + a, pt + bb, 0),
                               (n, pt + a + O, pt + bb + OW, ci))
                parts.append(jax.lax.dot_general(
                    grT, sl.reshape(n, O * OW, ci),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32))  # (n, s*s*co, ci)
        dW2T = jnp.concatenate(parts, axis=2)      # (n, s*s*co, K)
    else:
        patches = _convt_patches(x, ds, pt, pb, O, OW)
        pmb = patches.reshape(n, O * OW, -1)
        dW2T = jax.lax.dot_general(
            grT, pmb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # (n, s*s*co, K)
    dW2 = jnp.swapaxes(dW2T.sum(0), 0, 1)          # (K, s*s*co) — tiny
    dw = _dw2_to_w(dW2, taps, ds, k, s, ci, co, w.dtype)
    return _head_convt_bwd_dx(x, w, g, G, stride, padding,
                              taps, O, OW), dw, db


def _head_convt_bwd_dx(x, w, g, G, stride, padding, taps, O, OW):
    """dx of the planar head-convT backward = conv(g, wT, stride=s,
    padding=p) — output grid (h, wd), the convT's input grid — from the
    phase planes G[q][r] (n, co, O, OW): tap (ky, kx) reads plane
    ((ky-p) mod s, (kx-p) mod s) at block offset ((ky-p)//s, (kx-p)//s):
    k*k contiguous views, one dense dot."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    s = stride
    wT = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
    amin = (0 - padding) // s
    amax = (k - 1 - padding) // s
    ph_t = max(0, -amin)
    ph_b = max(0, (h - 1 + amax) - (O - 1))
    pw_l = max(0, -amin)
    pw_r = max(0, (wd - 1 + amax) - (OW - 1))
    Gp = [[jnp.pad(G[q][r], ((0, 0), (0, 0), (ph_t, ph_b), (pw_l, pw_r)))
           for r in range(s)] for q in range(s)]
    cols = []
    for ky in range(k):
        dyy = ky - padding
        qq, aa = dyy % s, (dyy - dyy % s) // s
        for kx in range(k):
            dxx = kx - padding
            rr, bb = dxx % s, (dxx - dxx % s) // s
            sl = lax.slice(
                Gp[qq][rr],
                (0, 0, ph_t + aa, pw_l + bb),
                (n, co, ph_t + aa + h, pw_l + bb + wd))  # (n, co, h, wd)
            cols.append(sl.reshape(n, co, h * wd))
    pg = jnp.concatenate(cols, axis=1)             # (n, k*k*co, h*wd)
    dx = jax.lax.dot_general(
        pg, wT.reshape(k * k * co, ci),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (n, h*wd, ci)
    return dx.reshape(n, h, wd, ci).astype(x.dtype)


def _head_convt_vjp_fwd(x, w, b, stride, padding):
    return head_convt(x, w, b, stride, padding), (x, w, b is not None)


def _head_convt_vjp_bwd(stride, padding, res, g):
    x, w, has_b = res
    if (_HCT_BWD == 'planar' and w.shape[3] <= HEAD_MAX_CO
            and stride > 1):
        return _head_convt_bwd_planar(x, w, g, stride, padding, has_b)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32) if has_b else None
    g = g.astype(x.dtype)
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    s = stride
    # dx of a ConvTranspose is the plain strided conv of g with the
    # flipped, io-transposed kernel — a tiny-Ci STEM shape (Ci = co <= 4):
    # XLA's native conv ran it at 18 GB/s (0.52 ms/step per site on the
    # DSGAN bench); the space-to-depth stem form is the measured fix
    wT = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(g.dtype)
    if (s > 1 and co <= 32 and _s2d_ok(g, k, s, padding)
            and (k - 2 * padding) % s == 0):
        # stem dot form only at small Ci (= co): the ci<=256 trunk A/B
        # showed the s2d form loses where XLA's layout is stable
        dx = _stem_fwd(g, wT, None, s, padding)
    else:
        dx = jax.lax.conv_general_dilated(
            g, wT, (s, s), ((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dw via the dense-form transpose: dW2 = patches^T @ t_grad, ONE
    # (M, |D|^2*ci) x (M, s*s*co) dot, then a 16-tiny-slice extraction
    # from the (|D|^2*ci, s*s*co) result.  The earlier per-(ky,kx)
    # column extraction sliced the de-interleaved cotangent at co<=4
    # lane granularity — profiled 3 x 0.57 ms/step of 2-lane loop
    # fusions on the DSGAN bench (round-3 trace); here the cotangent is
    # consumed whole as the dot's N dimension.
    taps, O, OW, ds, pt, pb = _convt_geometry(k, s, padding, h, wd)
    patches = _convt_patches(x, ds, pt, pb, O, OW)   # (n, O, OW, |D|^2*ci)
    pm = patches.reshape(n * O * OW, -1)
    if _HCT_MODE == 'split':
        # mirror of the forward's split-by-row-phase: gq = every s-th
        # OUTPUT ROW of g (contiguous full-row runs), its (OW, r) merge
        # is free, and the per-q dots write contiguous column blocks of
        # dW2 — no (q over OW) de-interleave transpose of the cotangent.
        g6 = g.reshape(n, O, s, OW * s * co)
        dparts = []
        for q in range(s):
            gq = g6[:, :, q, :].reshape(n * O * OW, s * co)
            dparts.append(jax.lax.dot_general(
                pm, gq, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        dW2 = jnp.concatenate(dparts, axis=-1)   # (|D|^2*ci, s*s*co)
    else:
        tg = g.reshape(n, O, s, OW, s, co).transpose(0, 1, 3, 2, 4, 5)
        dW2 = jax.lax.dot_general(
            pm, tg.reshape(n * O * OW, s * s * co),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (|D|^2*ci, s*s*co)
    dw = _dw2_to_w(dW2, taps, ds, k, s, ci, co, w.dtype)
    return dx.astype(x.dtype), dw, db


head_convt.defvjp(_head_convt_vjp_fwd, _head_convt_vjp_bwd)


# -------------------------------------------- phase-major convT outputs

def _head_convt_phase_fwd(x, w, b, stride, padding):
    """head_convt that RETURNS the phase-major tensor — the dense form's
    natural dot output (n, O, OW, s*s*co), lane order (q, r, co) — without
    ever interleaving to pixel space.

    space_to_phase(head_convt(x, w, b)) == head_convt_phase(x, w, b)
    bit-for-bit in f32.  Motivation (round-3 trace): when every consumer of
    a co<=4 convT output is an elementwise loss (the F2 cycle heads of the
    DSGAN recipe, reference twostage_cycle_model.py:381-388), the pixel
    interleave in the forward and the matching space-to-depth of the
    cotangent in the backward are pure formatting on 2-lane tensors
    (~2 ms/step at 512px); keeping the tensor phase-major and
    space-to-depth'ing the gradient-free loss TARGET instead removes both.
    """
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    s = stride
    taps, O, OW, ds, pt, pb = _convt_geometry(k, s, padding, h, wd)
    patches = _convt_patches(x, ds, pt, pb, O, OW)
    w2 = _convt_w2(w, taps, ds, s)
    t = jax.lax.dot_general(
        patches.reshape(n * O * OW, -1), w2.astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = t.reshape(n, O, OW, s * s * co).astype(x.dtype)
    if b is not None:
        y = y + jnp.tile(b, s * s).astype(y.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def head_convt_phase(x, w, b, stride, padding):
    """Tiny-Co ConvTranspose returning phase-major output (see
    _head_convt_phase_fwd); callers gate on head_convt_supported and
    consume the (q, r, co)-ordered lanes with space_to_phase'd peers."""
    return _head_convt_phase_fwd(x, w, b, stride, padding)


def _head_convt_phase_vjp_fwd(x, w, b, stride, padding):
    return _head_convt_phase_fwd(x, w, b, stride, padding), (x, w, b is not None)


def _head_convt_phase_vjp_bwd(stride, padding, res, g):
    """All three grads consume the PHASE-MAJOR cotangent directly — no
    de-interleave anywhere: db folds the phase copies of each co lane,
    dW2 is one patches^T @ g dot, and dx mirrors the forward (shifted
    contiguous slices of g against the transposed block matrix)."""
    x, w, has_b = res
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    s = stride
    taps, O, OW, ds, pt, pb = _convt_geometry(k, s, padding, h, wd)
    if has_b:
        db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32)
        db = db.reshape(s * s, co).sum(0)
    else:
        db = None
    g = g.astype(x.dtype)
    gm = g.reshape(n * O * OW, s * s * co)
    # dw: ONE (M, |D|^2*ci) x (M, s*s*co) dot, then the 16-slice extraction
    patches = _convt_patches(x, ds, pt, pb, O, OW)
    dW2 = jax.lax.dot_general(
        patches.reshape(n * O * OW, -1), gm,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = _dw2_to_w(dW2, taps, ds, k, s, ci, co, w.dtype)
    # dx[j] = sum_{(a,bb)} g[j - (a,bb)] @ W[(a,bb)]^T — the mirror of the
    # forward's patches form: |D|^2 shifted contiguous slices of the padded
    # phase cotangent, one dense dot against the transposed block matrix
    w2 = _convt_w2(w, taps, ds, s).astype(g.dtype)
    nd = len(ds)
    lo = max(0, ds[-1])
    hi_h = max(0, (h - 1 - ds[0]) - (O - 1))
    hi_w = max(0, (wd - 1 - ds[0]) - (OW - 1))
    gp = jnp.pad(g, ((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)))
    gcols = []
    wrows = []
    for i, a in enumerate(ds):
        for j, bb in enumerate(ds):
            gcols.append(gp[:, lo - a:lo - a + h, lo - bb:lo - bb + wd, :])
            wrows.append(w2[(i * nd + j) * ci:(i * nd + j + 1) * ci, :].T)
    gpat = jnp.concatenate(gcols, axis=-1)       # (n, h, wd, |D|^2*s*s*co)
    wD = jnp.concatenate(wrows, axis=0)          # (|D|^2*s*s*co, ci)
    dx = jax.lax.dot_general(
        gpat.reshape(n * h * wd, -1), wD,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx = dx.reshape(n, h, wd, ci).astype(x.dtype)
    return dx, dw, db


head_convt_phase.defvjp(_head_convt_phase_vjp_fwd, _head_convt_phase_vjp_bwd)
