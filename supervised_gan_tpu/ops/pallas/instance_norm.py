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
from jax.experimental import pallas as pl


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
# '0' off (default) | '1' every site (measured -3+ ms: program-wide
# de-fusion) | 'big' only sites >= 2^24 elements (the two 512px c64
# normalize chains whose f32 intermediate gets relayouted at full f32
# width before the downcast — copy.18152/18585, round-3 s8 trace)
_OUT_BARRIER = os.environ.get('SGAN_TPU_IN_BARRIER', '0')
# FMA normalize form: fold the stats into per-(N,C) scale/shift vectors
# cast to x.dtype and compute y = x*s + t entirely IN x's dtype.  With
# bf16 activations this removes every f32 elementwise node after the
# stats reduce — nothing left for layout assignment to relayout at f32
# width in front of rigid-layout (dot) consumers, and no barrier needed.
# Costs one extra rounding of s/t to bf16 (~2^-9 relative) plus bf16
# cancellation x*s - mean*s near x ~ mean.  A/B'd on device (round-3
# batch 23): 29.093 -> 29.010 ms, reproduced twice; the f32 relayout
# copies at the 512px IN sites vanish and the rowdots shift fusion
# doubles its bandwidth (430 -> 904 GB/s).  Default ON ('0' restores
# the f32 subtract form).
_FMA = os.environ.get('SGAN_TPU_IN_FMA', '1') == '1'
# Stats form: '2pass' computes mean and mean-of-squares as two separate
# jnp.mean reduces (per-consumer converts — the no-shared-x32 rule);
# 'pair' computes both in ONE variadic lax.reduce whose input fusion
# reads x once (the two separate convert_reduce fusions each read the
# full activation: profiled 584 GB/s effective = 2x read amplification
# at the 512px IN sites, round-3 s10 trace, convert_reduce_fusion.6/7).
_STATS = os.environ.get('SGAN_TPU_IN_STATS', '2pass')


def _stats_mean_pair(x):
    """One-pass f32 (mean, mean-of-squares) over axes (1, 2) of an NHWC
    activation, keepdims — a single variadic reduce so x is read once."""
    xf = x.astype(jnp.float32)
    s1, s2 = lax.reduce((xf, xf * xf),
                        (jnp.float32(0), jnp.float32(0)),
                        lambda a, b: (a[0] + b[0], a[1] + b[1]), (1, 2))
    n, _, _, c = x.shape
    npix = x.shape[1] * x.shape[2]
    return (s1 / npix).reshape(n, 1, 1, c), (s2 / npix).reshape(n, 1, 1, c)


def _stats_mean_msq(x):
    """f32 (mean, mean-of-squares) over axes (1, 2), keepdims, in the
    form chosen by SGAN_TPU_IN_STATS."""
    if _STATS == 'pair':
        return _stats_mean_pair(x)
    # NO shared x32 node — see _xla_fallback
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    msq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True)
    return mean, msq


def _normalize(x, mean, inv):
    """(x - mean) * inv with the dtype strategy chosen by SGAN_TPU_IN_FMA."""
    if _FMA:
        s = inv.astype(x.dtype)
        t = (-(mean * inv)).astype(x.dtype)
        return x * s + t
    return ((x.astype(jnp.float32) - mean) * inv).astype(x.dtype)


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
    mean, msq = _stats_mean_msq(x)
    var = jnp.maximum(msq - mean * mean, 0.0)
    # activate after the cast down — see _fwd
    y = _normalize(x, mean, lax.rsqrt(var + eps))
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
    if _IN_STREAM and (_INTERPRET or jax.default_backend() == 'tpu') \
            and stream_supported(x):
        y, mean, rstd = _stream_fwd(x, eps, slope)
        return y, (x, mean, rstd)
    # residuals carry the (tiny) per-channel stats so the backward skips
    # the full statistics pass over x (one read instead of two).
    mean, msq = _stats_mean_msq(x)
    var = jnp.maximum(msq - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)
    # normalize in f32, but activate AFTER the cast down: the activated
    # output is what crosses to the consumer (often a relayout copy into
    # a dot's rigid canonical layout — edge_conv CRN forms), and a bf16
    # node halves that copy (profiled 0.4 ms/step of f32 512^2 relayout
    # copies at this line, round-3 trace).  Sign is preserved by the
    # cast, so the select is identical; only the slope product rounds
    # once more.
    y = _normalize(x, mean, inv)
    if slope is not None:
        y = jnp.where(y >= 0, y, y * jnp.asarray(slope, y.dtype))
    if _OUT_BARRIER == '1' or (_OUT_BARRIER == 'big'
                               and x.size >= (1 << 24)):
        # pin the materialization point to the bf16 activated output:
        # without it, layout assignment relayouts the f32 normalize
        # intermediate into the consumer's (dot) layout BEFORE the
        # downcast — f32 512^2 copies at 2x the bytes (round-3 trace)
        y = lax.optimization_barrier(y)
    return y, (x, mean, inv)


def _bwd(eps, slope, res, g):
    x, mean, inv = res
    if mean.ndim == 2:      # streaming-backend residuals: (N, C) stats
        return (_stream_bwd(x, g, mean, inv, slope),)
    # Keep multi-consumer intermediates in x.dtype (bf16 in the bench
    # step): a shared f32 xhat / g' node gets materialized at 2x the
    # bytes and relayouted between its consumer fusions.  xhat() makes a
    # fresh elementwise subgraph per consumer so each fusion recomputes
    # it from the bf16 x (free — these fusions are bandwidth-bound).

    def xhat():
        if _FMA:
            return _normalize(x, mean, inv)        # x.dtype chain
        return (x.astype(jnp.float32) - mean) * inv

    if slope is not None:
        gp = jnp.where(xhat() >= 0, g, g * jnp.asarray(slope, g.dtype))
    else:
        gp = g
    if _STATS == 'pair':
        # one-pass: g (and x via xhat) read once by the variadic reduce
        gp32 = gp.astype(jnp.float32)
        s1, s2 = lax.reduce((gp32, gp32 * xhat()),
                            (jnp.float32(0), jnp.float32(0)),
                            lambda a, b: (a[0] + b[0], a[1] + b[1]), (1, 2))
        n, _, _, c = x.shape
        npix = x.shape[1] * x.shape[2]
        gm = (s1 / npix).reshape(n, 1, 1, c)
        gx = (s2 / npix).reshape(n, 1, 1, c)
    else:
        gm = jnp.mean(gp, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        gx = jnp.mean(gp.astype(jnp.float32) * xhat(), axis=(1, 2),
                      keepdims=True)
    if _FMA:
        # stay in g.dtype after the (f32) reductions: no f32 elementwise
        # nodes for layout assignment to widen
        dx = (gp - gm.astype(g.dtype)
              - xhat() * gx.astype(g.dtype)) * inv.astype(g.dtype)
        return (dx.astype(x.dtype),)
    dx = (gp.astype(jnp.float32) - gm - xhat() * gx) * inv
    return (dx.astype(x.dtype),)


fused_instance_norm_act.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------- #
# Streaming Mosaic backend (SGAN_TPU_IN_STREAM)
#
# The XLA forms above still materialize f32 planes: the normalize chain
# (x32 - mean) * inv has several consumers (output cast, VJP recompute),
# and XLA shares ONE f32 node between their fusions — profiled 64 MB
# f32[512,512,64] buffers + async relayout copies at instance_norm.py:116
# (~2+ ms/step across the bench's IN sites, round-3 o_newdef trace).
#
# These kernels never leave bf16 in HBM: each pass streams row blocks
# through VMEM (BlockSpec auto-pipelining — the round-2 whole-plane
# kernel defeated pipelining, which is why it lost), upcasting to f32
# only inside the block.  Cost is the streaming minimum: fwd = 2 reads +
# 1 write of the plane; bwd = 2 reads of (x, g) + 1 write.
#
# Lane mapping: the (N, H, W, C) plane is viewed 2-D as (rows, L) with
#   * C % 128 == 0: L = C (free reshape, lanes = channels), stats fold
#     over nothing;
#   * 128 % C == 0: L = 128 holding P = 128/C pixel groups of the C
#     channels (free reshape, requires (W * C) % 128 == 0), stats fold
#     the P groups, mean/rstd rows are tiled back P times.
#
# MEASURED NEGATIVE (round-3 q_instream arm): 55.08 ms device vs 33.39
# baseline (-21.7 ms).  Pulling the IN sites out of XLA's fusions is a
# program-wide de-fusion: the producers/consumers that used to fuse the
# normalize chain into themselves become standalone low-bandwidth
# fusions (28-50 GB/s fusion.* blocks all over the q_instream trace),
# costing far more than the f32 materialization saved.  Kept as a
# tested, default-OFF path; the interpret-mode parity tests in
# tests/test_fused_norm.py keep it honest.
# --------------------------------------------------------------------- #

_IN_STREAM = os.environ.get('SGAN_TPU_IN_STREAM', '0') == '1'
_INTERPRET = False      # set True in tests to run the kernels on CPU


def _set_interpret(flag):
    global _INTERPRET
    _INTERPRET = bool(flag)


def stream_supported(x):
    if x.ndim != 4:
        return False
    n, h, w, c = x.shape
    if c % 128 and (128 % c or (w * c) % 128):
        return False
    rows = (h * w * c) // max(c, 128)
    return rows > 0 and _rows_block(rows) is not None


def _rows_block(rows):
    """Rows per grid step: a divisor of `rows` near 512 sublanes."""
    for rb in (512, 256, 128, 64, 32, 16, 8):
        if rows % rb == 0:
            return rb
    return None


def _geom(x):
    n, h, w, c = x.shape
    L = c if c % 128 == 0 else 128
    rows = h * w * c // L
    rb = _rows_block(rows)
    return n, rows, rb, L, (128 // c if c < 128 else 1)


def _fwd_stats_kernel(x_ref, st_ref):
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)
    st = jnp.concatenate([jnp.sum(xf, 0, keepdims=True),
                          jnp.sum(xf * xf, 0, keepdims=True)], 0)

    @pl.when(j == 0)
    def _():
        st_ref[0] = st

    @pl.when(j > 0)
    def _():
        st_ref[0] += st


def _fwd_apply_kernel(x_ref, m_ref, r_ref, o_ref, *, slope):
    z = (x_ref[0].astype(jnp.float32) - m_ref[0]) * r_ref[0]
    if slope is not None:
        z = jnp.where(z >= 0, z, z * slope)
    o_ref[0] = z.astype(o_ref.dtype)


def _bwd_stats_kernel(x_ref, g_ref, m_ref, r_ref, st_ref, *, slope):
    j = pl.program_id(1)
    xhat = (x_ref[0].astype(jnp.float32) - m_ref[0]) * r_ref[0]
    gp = g_ref[0].astype(jnp.float32)
    if slope is not None:
        gp = jnp.where(xhat >= 0, gp, gp * slope)
    st = jnp.concatenate([jnp.sum(gp, 0, keepdims=True),
                          jnp.sum(gp * xhat, 0, keepdims=True)], 0)

    @pl.when(j == 0)
    def _():
        st_ref[0] = st

    @pl.when(j > 0)
    def _():
        st_ref[0] += st


def _bwd_apply_kernel(x_ref, g_ref, m_ref, r_ref, gm_ref, gz_ref, o_ref,
                      *, slope):
    xhat = (x_ref[0].astype(jnp.float32) - m_ref[0]) * r_ref[0]
    gp = g_ref[0].astype(jnp.float32)
    if slope is not None:
        gp = jnp.where(xhat >= 0, gp, gp * slope)
    dx = (gp - gm_ref[0] - xhat * gz_ref[0]) * r_ref[0]
    o_ref[0] = dx.astype(o_ref.dtype)


def _row_spec(rb, L):
    return pl.BlockSpec((1, rb, L), lambda n, j: (n, j, 0))


def _lane_spec(L):
    return pl.BlockSpec((1, 1, L), lambda n, j: (n, 0, 0))


def _fold_stats(st, P, C):
    """(N, 2, L) f32 kernel sums -> per-channel (N, 1, 1, C) means."""
    if P == 1:
        return st[:, 0], st[:, 1]
    return (jnp.sum(st[:, 0].reshape(-1, P, C), 1),
            jnp.sum(st[:, 1].reshape(-1, P, C), 1))


def _lane_rows(v, P):
    """(N, C) f32 -> (N, 1, L) rows for the kernels (tile the P groups)."""
    if P > 1:
        v = jnp.tile(v, (1, P))
    return v[:, None, :]


def _stream_stats(x2, N, rows, rb, L):
    return pl.pallas_call(
        _fwd_stats_kernel,
        grid=(N, rows // rb),
        in_specs=[_row_spec(rb, L)],
        out_specs=pl.BlockSpec((1, 2, L), lambda n, j: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 2, L), jnp.float32),
        interpret=_INTERPRET,
    )(x2)


def _stream_mean_rstd(x2, N, rows, rb, L, P, C, npix, eps):
    st = _stream_stats(x2, N, rows, rb, L)
    s1, s2 = _fold_stats(st, P, C)
    mean = s1 / npix
    var = jnp.maximum(s2 / npix - mean * mean, 0.0)
    return mean, lax.rsqrt(var + eps)


def stream_apply(x, mean, rstd, slope):
    """act((x - mean) * rstd) with all HBM traffic in x.dtype.
    x: (N,H,W,C); mean, rstd: (N,C) f32."""
    N, H, W, C = x.shape
    _, rows, rb, L, P = _geom(x)
    x2 = x.reshape(N, rows, L)
    mrow, rrow = _lane_rows(mean, P), _lane_rows(rstd, P)
    y2 = pl.pallas_call(
        functools.partial(_fwd_apply_kernel, slope=slope),
        grid=(N, rows // rb),
        in_specs=[_row_spec(rb, L), _lane_spec(L), _lane_spec(L)],
        out_specs=_row_spec(rb, L),
        out_shape=jax.ShapeDtypeStruct((N, rows, L), x.dtype),
        interpret=_INTERPRET,
    )(x2, mrow, rrow)
    return y2.reshape(x.shape)


def _stream_fwd(x, eps, slope):
    """Returns (y, mean (N,C), rstd (N,C)); all HBM traffic in x.dtype."""
    N, H, W, C = x.shape
    _, rows, rb, L, P = _geom(x)
    x2 = x.reshape(N, rows, L)
    mean, rstd = _stream_mean_rstd(x2, N, rows, rb, L, P, C, H * W, eps)
    return stream_apply(x, mean, rstd, slope), mean, rstd


def _stream_bwd(x, g, mean, rstd, slope):
    N, H, W, C = x.shape
    _, rows, rb, L, P = _geom(x)
    x2 = x.reshape(N, rows, L)
    g2 = g.reshape(N, rows, L)
    mrow, rrow = _lane_rows(mean, P), _lane_rows(rstd, P)
    st = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, slope=slope),
        grid=(N, rows // rb),
        in_specs=[_row_spec(rb, L), _row_spec(rb, L), _lane_spec(L),
                  _lane_spec(L)],
        out_specs=pl.BlockSpec((1, 2, L), lambda n, j: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 2, L), jnp.float32),
        interpret=_INTERPRET,
    )(x2, g2, mrow, rrow)
    s1, s2 = _fold_stats(st, P, C)
    npix = float(H * W)
    gmrow = _lane_rows(s1 / npix, P)
    gzrow = _lane_rows(s2 / npix, P)
    dx2 = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, slope=slope),
        grid=(N, rows // rb),
        in_specs=[_row_spec(rb, L), _row_spec(rb, L), _lane_spec(L),
                  _lane_spec(L), _lane_spec(L), _lane_spec(L)],
        out_specs=_row_spec(rb, L),
        out_shape=jax.ShapeDtypeStruct((N, rows, L), x.dtype),
        interpret=_INTERPRET,
    )(x2, g2, mrow, rrow, gmrow, gzrow)
    return dx2.reshape(x.shape)


# IN-only backward given (x, cotangent, stats) — also the dconv of a
# fused conv+IN+act region when called with x = the conv output
# (ops/pallas/conv3x3_in.py).
stream_norm_bwd = _stream_bwd


# --------------------------------------------------------------------- #
# Opaque-producer IN (SGAN_TPU_IN_OPAQUE, dispatched from the nn/core
# Sequential peephole for pallas-conv3x3 -> IN(+act) pairs only).
#
# Mechanism (round-3 s8/fu traces, /tmp HLO dump): when the IN's input
# is a pallas custom-call output, the per-consumer f32 converts of the
# no-shared-x32 rule cannot fuse upward into the (opaque) producer, so
# CSE re-merges them into ONE convert node — which XLA then
# materializes as a full-width f32 relayout copy + S(1) staging
# (copy.17107 + f32[1,512,256,128] copy-start/done pairs, ~0.4-0.6
# ms/step across the two CRN c128 sites).  The global IN_STREAM arm
# lost -21.7 ms because it de-fused XLA-produced sites; HERE there is
# no producer fusion to lose: stats still read x through ONE fused
# convert_reduce pass (the only remaining f32 convert of x), while the
# normalize/backward passes are the bf16-resident stream kernels.
# --------------------------------------------------------------------- #

def opaque_stream_ok(shape):
    """stream_supported on a shape (the conv OUTPUT shape, pre-build)."""
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    if c % 128 and (128 % c or (w * c) % 128):
        return False
    rows = (h * w * c) // max(c, 128)
    return rows > 0 and _rows_block(rows) is not None


def _opaque_fwd_impl(x, eps, slope):
    n, h, w, c = x.shape
    mean4, msq4 = _stats_mean_msq(x)
    var = jnp.maximum(msq4 - mean4 * mean4, 0.0)
    inv = lax.rsqrt(var + eps)
    mean = mean4.reshape(n, c)
    rstd = inv.reshape(n, c)
    return stream_apply(x, mean, rstd, slope), mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def opaque_instance_norm_act(x, eps=1e-5, slope=None):
    """InstanceNorm(+act) whose normalize/backward HBM traffic stays in
    x.dtype — for inputs produced by an opaque custom call.  Callers
    must gate on opaque_stream_ok(x.shape)."""
    return _opaque_fwd_impl(x, eps, slope)[0]


def _opaque_vjp_fwd(x, eps, slope):
    y, mean, rstd = _opaque_fwd_impl(x, eps, slope)
    return y, (x, mean, rstd)


def _opaque_vjp_bwd(eps, slope, res, g):
    x, mean, rstd = res
    return (_stream_bwd(x, g, mean, rstd, slope),)


opaque_instance_norm_act.defvjp(_opaque_vjp_fwd, _opaque_vjp_bwd)
