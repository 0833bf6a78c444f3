"""Spatial resampling ops (NHWC).

Covers the reference's full resampling surface:
  * bilinear x-s upsample (torch 0.3 ``nn.Upsample(mode='bilinear')``,
    align_corners=True semantics) — the ``transform_1to2`` pair and CRN
    'bilinear' upsample blocks (reference models/cgan_model.py:51-57,
    models/networks.py:750-755),
  * AvgPool2d(k, s) — ``transform_inverse`` and the CRN label pyramid
    (reference models/networks.py:712-731),
  * the multi-scale discriminator front-end: MATLAB-fspecial Gaussian blur
    (depthwise) followed by stride-``scale`` subsampling
    (reference models/networks.py:22-40,125-129,807-813).

Bilinear upsampling is implemented as two dense interpolation-matrix
contractions (height then width).  For the integer scales used here the
matrices are tiny and static, so XLA lowers the whole op onto the MXU —
far faster on TPU than a gather-based formulation.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from .conv import depthwise_conv2d


def _interp_matrix(in_size, out_size, align_corners=True, dtype=np.float32):
    """(out_size, in_size) bilinear interpolation matrix."""
    A = np.zeros((out_size, in_size), dtype=dtype)
    if out_size == 1 or in_size == 1:
        A[:, 0] = 1.0
        return A
    if align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.clip((np.arange(out_size) + 0.5) * scale - 0.5, 0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (src - i0).astype(dtype)
    A[np.arange(out_size), i0] += 1.0 - w
    A[np.arange(out_size), i1] += w
    return A


def bilinear_upsample(x, scale, align_corners=True):
    """x: (N,H,W,C) -> (N, H*scale, W*scale, C).

    In mixed precision the interpolation matmuls run in the input dtype
    with f32 accumulation — bilinear weights are exactly representable to
    bf16's 8 mantissa bits only approximately, but the operands are
    activations already quantized to bf16, so the extra error is below
    one ulp of the data.
    """
    n, h, w, c = x.shape
    Ah = jnp.asarray(_interp_matrix(h, h * scale, align_corners)).astype(x.dtype)
    Aw = jnp.asarray(_interp_matrix(w, w * scale, align_corners)).astype(x.dtype)
    y = jnp.einsum('oh,nhwc->nowc', Ah, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum('pw,nhwc->nhpc', Aw, y.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def avg_pool(x, kernel, stride=None, padding=0):
    """AvgPool2d(kernel, stride) on NHWC. Count includes padding (torch default).

    Exact-tiling pools (stride == kernel, no padding, divisible extent)
    run as separable mean-matrix matmuls instead of lax.reduce_window:
    the CRN label pyramid pools 2-channel maps (nn/generators.py:328),
    and reduce-window on lane-starved data measured 8 GB/s — 1.9 ms/step
    of the DSGAN bench — while the einsum form (like bilinear_upsample)
    rides the MXU and has matmul adjoints.
    """
    stride = kernel if stride is None else stride
    k = (kernel, kernel) if isinstance(kernel, int) else kernel
    s = (stride, stride) if isinstance(stride, int) else stride
    n, h, w, c = x.shape
    if (k == s and padding == 0 and h % k[0] == 0 and w % k[1] == 0):
        # block-diagonal mean matrices (out, in).  1/k is exact in bf16
        # only for power-of-two k; otherwise keep the matrices and the
        # intermediate in f32 (matches the reduce_window path's numerics)
        # and cast once at the end.
        pow2 = (k[0] & (k[0] - 1)) == 0 and (k[1] & (k[1] - 1)) == 0
        mdt = x.dtype if pow2 else jnp.float32
        # build the mean matrices host-side: the jnp .at[].set form
        # lowered to a device scatter that XLA does NOT constant-fold
        # (0.18 ms/step of jvp()/scatter in the round-3 in_fma trace)
        Mh = np.zeros((h // k[0], h), np.float32)
        Mh[np.repeat(np.arange(h // k[0]), k[0]), np.arange(h)] = 1.0 / k[0]
        Mw = np.zeros((w // k[1], w), np.float32)
        Mw[np.repeat(np.arange(w // k[1]), k[1]), np.arange(w)] = 1.0 / k[1]
        y = jnp.einsum('oh,nhwc->nowc', jnp.asarray(Mh).astype(mdt), x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum('pw,nhwc->nhpc', jnp.asarray(Mw).astype(mdt),
                       y.astype(mdt),
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    p = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    y = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add,
                          (1, k[0], k[1], 1), (1, s[0], s[1], 1), p)
    return (y / (k[0] * k[1])).astype(x.dtype)


def blur_downsample_phase(xph, s, scale_factor, compute_dtype=None):
    """blur_downsample(phase_to_space(xph, s), scale_factor) without ever
    materializing the pixel tensor.

    xph: (N, H/s, W/s, s*s*C) in edge_conv.space_to_phase lane order
    (qy, qx, c) — pixel row j = s*jb + qy.  The separable blur matrices
    are reshaped (out, H/s, s) so the contraction reads the phase lanes in
    place; output is the pixel-space downsampled tensor (same values as
    the pixel path, same f32 accumulation)."""
    n, hb, wb, ssc = xph.shape
    c = ssc // (s * s)
    if scale_factor <= 1:
        from .edge_conv import phase_to_space
        return phase_to_space(xph, s)
    Ah = jnp.asarray(_blur_matrix(hb * s, scale_factor)).reshape(-1, hb, s)
    Aw = jnp.asarray(_blur_matrix(wb * s, scale_factor)).reshape(-1, wb, s)
    x6 = xph.reshape(n, hb, wb, s, s, c).astype(jnp.float32)
    t = jnp.einsum('ohq,nhwqrc->nowrc', Ah, x6,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum('pwr,nowrc->nopc', Aw, t,
                   preferred_element_type=jnp.float32)
    return y.astype(xph.dtype)


def matlab_gauss2d(shape=(3, 3), sigma=0.5):
    """MATLAB fspecial('gaussian') — reference models/networks.py:22-33."""
    m, n = [(ss - 1.0) / 2.0 for ss in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    s = h.sum()
    if s != 0:
        h /= s
    return h.astype(np.float32)


def gauss_blur_kernel(scale_factor):
    """Depthwise HWIO (kw,kw,1,1) blur kernel for a multi-scale D front-end.

    sigma = scale//2 (the reference is Python 2: ``scale_factor / 2`` is
    integer division), kw = 4*sigma + 1 — reference models/networks.py:125-129.
    """
    sigma = scale_factor // 2
    kw = 4 * sigma + 1
    k = matlab_gauss2d((kw, kw), sigma)
    return k.reshape(kw, kw, 1, 1)


def _blur_matrix(size, scale_factor, dtype=np.float32):
    """(ceil(size/s), size) matrix: rows are the 1-D Gaussian (fspecial is
    separable: gauss2d = outer(g, g)) centered at the stride-s sample
    positions with zero padding 2*sigma — so two matmuls reproduce the
    depthwise blur + subsample exactly, but on the MXU instead of a
    lane-padded depthwise conv (C is tiny here)."""
    sigma = scale_factor // 2
    kw = 4 * sigma + 1
    g = matlab_gauss2d((kw, 1), sigma)[:, 0]
    # normalize like the 2-D kernel: outer(g1,g1) of the unnormalized 1-D
    # gaussian, then /= sum. Our g is column-normalized; outer(g,g) of
    # normalized 1-D == normalized 2-D since fspecial normalizes globally.
    half = kw // 2  # == 2*sigma == conv padding: output size preserved
    out_size = -(-size // scale_factor)
    A = np.zeros((out_size, size), dtype=dtype)
    for o in range(out_size):
        center = o * scale_factor
        for t in range(kw):
            src = center + t - half
            if 0 <= src < size:
                A[o, src] = g[t]
    return A


def blur_downsample(x, scale_factor, compute_dtype=None):
    """Gaussian blur (padding 2*sigma) + stride-``scale`` subsample.

    Equivalent to the reference's frozen ``gauss_filter`` Sequential
    (depthwise-diagonal MATLAB-fspecial conv then AvgPool2d(k=1, s=scale),
    reference models/networks.py:807-813), implemented as two separable
    interpolation-matrix contractions so the work lands on the MXU.
    """
    if scale_factor <= 1:
        return x
    n, h, w, c = x.shape
    Ah = jnp.asarray(_blur_matrix(h, scale_factor))
    Aw = jnp.asarray(_blur_matrix(w, scale_factor))
    y = jnp.einsum('oh,nhwc->nowc', Ah, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum('pw,nhwc->nhpc', Aw, y, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)
