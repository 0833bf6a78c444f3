"""Minimal functional module system for the network zoo.

Design (TPU-first, not a torch translation):
  * A ``Layer`` is an immutable config object with two pure methods:
    ``init(key) -> params`` and ``apply(params, x, ctx) -> y``.  Parameters
    are plain nested dicts (pytrees); there is no mutable module state, so
    every network composes directly with ``jax.jit`` / ``jax.grad`` / sharding.
  * Parameter-tree structure intentionally mirrors torch ``state_dict``
    naming (``Sequential`` children keyed by their *position index*, custom
    modules by attribute name) so ``.pth`` checkpoints round-trip via a pure
    flatten/unflatten (see utils/pth.py; reference models/base_model.py:44-61).
  * Kernels are stored HWIO and activations NHWC — the MXU-native layouts.
    ConvTranspose kernels are stored pre-flipped for the lax lhs-dilated
    formulation (layout conversion happens once, at .pth import/export).
  * Randomness (dropout, injected Gaussian noise) is threaded through a
    ``Ctx`` whose per-call keys are derived deterministically by fold_in —
    replacing torch's global-generator ``normal_()`` stream.

Weight init matches the reference's ``weights_init``
(models/networks.py:13-19): Conv*/ConvT* weights ~ N(0, 0.02), BatchNorm
weight ~ N(1, 0.02) and bias 0.  Conv biases keep the torch-0.3 default
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) that ``weights_init`` does not touch.

Train/eval: the reference never calls ``.eval()``, so dropout and batch-norm
batch statistics are active at *test* time too (the published recipes depend
on this for sample diversity).  ``Ctx(train=...)`` exists for unit tests, but
the drivers always run with ``train=True`` to reproduce that behavior.
"""

import math

import jax
import jax.numpy as jnp

from ..ops import (conv2d, conv_transpose2d, instance_norm, batch_norm,
                   avg_pool, bilinear_upsample, reflection_pad2d)


class Ctx:
    """Per-forward context: RNG stream, train flag, compute dtype."""

    def __init__(self, key=None, train=True, compute_dtype=None):
        self.key = key
        self.train = train
        self.compute_dtype = compute_dtype
        self._n = 0

    def rng(self):
        if self.key is None:
            raise ValueError("this forward pass needs a PRNG key: Ctx(key=...)")
        k = jax.random.fold_in(self.key, self._n)
        self._n += 1
        return k


class Layer:
    """Base layer: stateless config; params live in an external pytree."""

    def init(self, key):
        return {}

    def apply(self, params, x, ctx):
        raise NotImplementedError

    def children(self):
        """Named sub-layers, introspected from instance attributes.

        Custom modules that hold a dict of sub-layers (e.g. CRN blocks)
        store it under ``self.blocks``; its entries are flattened into the
        child namespace so parameter paths match torch attribute names.
        """
        out = {}
        for k, v in vars(self).items():
            if isinstance(v, Layer):
                out[k] = v
            elif k == 'blocks' and isinstance(v, dict):
                out.update(v)
        return out

    def param_kinds(self):
        """Own (leaf) parameter kinds: name -> 'conv'|'convt'|'bn'|'bias'."""
        return {}


# Pallas kernel dispatch: set from --no_pallas / platform at model init.
PALLAS_ENABLED = False

# A/B gate for the fused conv3x3+IN(+act) region (ops/pallas/conv3x3_in.py).
# Default OFF: the measured end-to-end A/B is a small NEGATIVE — device
# step 42.19 ms fused vs 41.73 split (23.12 vs 23.32 img/s); the custom
# call's layout copies (2 x 0.2 ms/step f32 relayouts at the 512px sites)
# outweigh the statistics pass it absorbs.  See BENCH_NOTES.md round 3.
import os as _os
_CONV3_IN_FUSED = _os.environ.get('SGAN_TPU_CONV3_IN', '0') == '1'

# Opaque-producer streaming IN (pallas-conv3x3 -> IN(+act) pairs): the
# normalize/backward read the custom-call output in bf16 via the stream
# kernels instead of a CSE-merged f32 convert that XLA materializes as
# a full-width relayout (see ops/pallas/instance_norm.py, opaque block).
_IN_OPAQUE = _os.environ.get('SGAN_TPU_IN_OPAQUE', '0') == '1'

# A conv bias immediately followed by a mean-subtracting norm is
# functionally INERT: InstanceNorm(affine=False) / our stateless BatchNorm
# subtract the per-channel mean, which removes a per-channel constant
# EXACTLY (and bilinear upsampling in between preserves constants — its
# weights sum to 1).  The reference keeps these biases (torch Conv2d
# defaults) but their values cannot affect any output; their "gradient" is
# pure fp reduction noise that still costs a full cotangent reduction per
# conv (profiled ~1.2 ms/step of f32[512]/f32[256] convert_reduce fusions
# on the DSGAN bench, round-3 trace) and random-walks the saved values.
# With the peephole the bias params stay in the tree (golden counts,
# .pth round-trip unchanged) but are skipped in the forward, so their
# exact gradient is zero and Adam holds them frozen.
# SGAN_TPU_SKIP_INERT_BIAS=0 restores the reference arithmetic.
_SKIP_INERT_BIAS = _os.environ.get('SGAN_TPU_SKIP_INERT_BIAS', '1') != '0'


def set_pallas_enabled(flag):
    global PALLAS_ENABLED
    PALLAS_ENABLED = bool(flag)


class Sequential(Layer):
    """Position-indexed container; params keyed '0', '1', ... like torch.

    Applies a peephole fusion when Pallas is enabled: an InstanceNorm2d
    immediately followed by LeakyReLU/ReLU dispatches to the fused
    single-pass TPU kernel (ops/pallas/instance_norm.py)."""

    def __init__(self, *layers):
        self.layers = list(layers)

    def init(self, key):
        params = {}
        keys = jax.random.split(key, max(len(self.layers), 1))
        for i, layer in enumerate(self.layers):
            p = layer.init(keys[i])
            if p:
                params[str(i)] = p
        return params

    def apply(self, params, x, ctx, start=0):
        # start > 0: resume mid-chain (a caller consumed the first layers
        # itself, e.g. a phase-major stem — params keys stay positional)
        i = start
        n = len(self.layers)
        while i < n:
            layer = self.layers[i]
            if PALLAS_ENABLED and _CONV3_IN_FUSED and isinstance(layer, Conv2d) \
                    and layer.kernel == 3 and layer.stride == 1 \
                    and layer.padding == 1 and i + 1 < n \
                    and isinstance(self.layers[i + 1], InstanceNorm2d):
                # fused conv3x3 + IN (+act) region: the IN statistics ride
                # the conv kernel's accumulator (ops/pallas/conv3x3_in.py)
                from ..ops.pallas import conv3x3 as p3
                if p3._INTERPRET or jax.default_backend() == 'tpu':
                    w = params[str(i)]["weight"]
                    b = params[str(i)].get("bias")
                    xc = x
                    if ctx.compute_dtype is not None:
                        xc = x.astype(ctx.compute_dtype)
                        w = w.astype(ctx.compute_dtype)
                    from ..ops.pallas import conv3x3_in as p3in
                    if p3in.supported(xc, w, 1, 1):
                        slope = None
                        skip = 2
                        if i + 2 < n and isinstance(self.layers[i + 2],
                                                    (LeakyReLU, ReLU)):
                            nxt = self.layers[i + 2]
                            slope = (nxt.slope
                                     if isinstance(nxt, LeakyReLU) else 0.0)
                            skip = 3
                        x = p3in.conv3x3_in_act(
                            xc, w, b, self.layers[i + 1].eps, slope)
                        i += skip
                        continue
            if PALLAS_ENABLED and _IN_OPAQUE and isinstance(layer, Conv2d) \
                    and layer.kernel == 3 and layer.stride == 1 \
                    and layer.padding == 1 and i + 1 < n \
                    and isinstance(self.layers[i + 1], InstanceNorm2d):
                from ..ops.pallas import conv3x3 as p3
                from ..ops.pallas import instance_norm as pin
                if p3._INTERPRET or jax.default_backend() == 'tpu':
                    xc = x if ctx.compute_dtype is None \
                        else x.astype(ctx.compute_dtype)
                    w = params[str(i)]["weight"]
                    wc = w if ctx.compute_dtype is None \
                        else w.astype(ctx.compute_dtype)
                    yshape = xc.shape[:3] + (wc.shape[3],)
                    if (p3.supported(xc, wc, 1, 1)
                            and pin.opaque_stream_ok(yshape)):
                        inert = (_SKIP_INERT_BIAS and layer.bias
                                 and self._inert_bias_at(i))
                        y = layer.apply(params.get(str(i), {}), x, ctx,
                                        inert_bias=inert)
                        slope = None
                        skip = 2
                        if i + 2 < n and isinstance(self.layers[i + 2],
                                                    (LeakyReLU, ReLU)):
                            nxt = self.layers[i + 2]
                            slope = (nxt.slope
                                     if isinstance(nxt, LeakyReLU) else 0.0)
                            skip = 3
                        x = pin.opaque_instance_norm_act(
                            y, self.layers[i + 1].eps, slope)
                        i += skip
                        continue
            if PALLAS_ENABLED and isinstance(layer, InstanceNorm2d) \
                    and i + 1 < n \
                    and isinstance(self.layers[i + 1], (LeakyReLU, ReLU)):
                from ..ops.pallas import fused_instance_norm_act
                nxt = self.layers[i + 1]
                slope = nxt.slope if isinstance(nxt, LeakyReLU) else 0.0
                x = fused_instance_norm_act(x, layer.eps, slope)
                i += 2
                continue
            if (_SKIP_INERT_BIAS
                    and isinstance(layer, (Conv2d, ConvTranspose2d))
                    and layer.bias and self._inert_bias_at(i)):
                x = layer.apply(params.get(str(i), {}), x, ctx,
                                inert_bias=True)
                i += 1
                continue
            x = layer.apply(params.get(str(i), {}), x, ctx)
            i += 1
        return x

    def _inert_bias_at(self, i):
        """True when layer i's bias is cancelled exactly downstream: the
        next layer (allowing one constant-preserving Upsample in between)
        is a mean-subtracting norm (see _SKIP_INERT_BIAS above)."""
        j = i + 1
        if j < len(self.layers) and isinstance(self.layers[j], Upsample):
            j += 1
        return (j < len(self.layers)
                and isinstance(self.layers[j], (InstanceNorm2d, BatchNorm2d)))

    def children(self):
        return {str(i): layer for i, layer in enumerate(self.layers)}


def _conv_init(key, shape_hwio, fan_in, bias, weight_std=0.02):
    kw, kb = jax.random.split(key)
    p = {"weight": jax.random.normal(kw, shape_hwio, jnp.float32) * weight_std}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(
            kb, (shape_hwio[-1],), jnp.float32, -bound, bound)
    return p


class Conv2d(Layer):
    def __init__(self, in_nc, out_nc, kernel, stride=1, padding=0, bias=True):
        self.in_nc, self.out_nc = in_nc, out_nc
        self.kernel, self.stride, self.padding, self.bias = kernel, stride, padding, bias

    def init(self, key):
        k = self.kernel
        return _conv_init(key, (k, k, self.in_nc, self.out_nc),
                          self.in_nc * k * k, self.bias)

    def apply(self, params, x, ctx, inert_bias=False):
        # inert_bias: the Sequential peephole proved the bias is cancelled
        # exactly by the following mean-subtracting norm — skip it (and
        # its full-cotangent db reduction in the backward)
        bias = None if inert_bias else params.get("bias")
        if (PALLAS_ENABLED and self.padding == 1
                and (self.kernel, self.stride) in ((3, 1), (4, 2))):
            from ..ops.pallas import conv3x3 as p3
            if p3._INTERPRET or jax.default_backend() == 'tpu':
                w, b = params["weight"], bias
                if ctx.compute_dtype is not None:
                    x = x.astype(ctx.compute_dtype)
                    w = w.astype(ctx.compute_dtype)
                if self.kernel == 3:
                    if p3.supported(x, w, self.stride, self.padding):
                        return p3.conv3x3_same(x, w, b)
                else:
                    # measured net-negative on the DSGAN bench (XLA's k4s2
                    # runs 17-43% of peak already; BENCH_NOTES.md round 2)
                    # - opt-in for further tuning
                    import os
                    if os.environ.get('SGAN_TPU_CONV4S2') == '1':
                        from ..ops.pallas import conv4s2 as p4
                        if p4.supported(x, w, self.stride, self.padding):
                            return p4.conv4s2_same(x, w, b)
        return conv2d(x, params["weight"], bias,
                      self.stride, self.padding, ctx.compute_dtype)

    def param_kinds(self):
        k = {"weight": "conv"}
        if self.bias:
            k["bias"] = "bias"
        return k


class ConvTranspose2d(Layer):
    def __init__(self, in_nc, out_nc, kernel, stride=2, padding=1, bias=True,
                 output_padding=0):
        self.in_nc, self.out_nc = in_nc, out_nc
        self.kernel, self.stride, self.padding, self.bias = kernel, stride, padding, bias
        self.output_padding = output_padding

    def init(self, key):
        k = self.kernel
        # torch-0.3 fan_in for ConvTranspose is in_channels * k * k as well.
        return _conv_init(key, (k, k, self.in_nc, self.out_nc),
                          self.in_nc * k * k, self.bias)

    def apply(self, params, x, ctx, inert_bias=False):
        # see Conv2d.apply: bias exactly cancelled by the following norm
        bias = None if inert_bias else params.get("bias")
        if (PALLAS_ENABLED and self.kernel == 4 and self.stride == 2
                and self.padding == 1 and self.output_padding == 0):
            from ..ops.pallas import convt4s2 as pt
            if pt._INTERPRET or jax.default_backend() == 'tpu':
                w, b = params["weight"], bias
                if ctx.compute_dtype is not None:
                    x = x.astype(ctx.compute_dtype)
                    w = w.astype(ctx.compute_dtype)
                # measured win region (BENCH_NOTES round 2): tiny spatial
                # (XLA's lhs-dilated conv is weak there) or small Co;
                # elsewhere XLA ties or wins.  The co<=32 branch (the F2
                # unet decoder 128->32 sites) is separately gated for A/B:
                # its XLA-side dw runs at 53 GB/s in the round-3 s8 trace
                # (SGAN_TPU_CONVT4S2_CO32=0 routes those through XLA).
                import os as _os
                h, wd, co = x.shape[1], x.shape[2], w.shape[3]
                co_gate = (co <= 32 and _os.environ.get(
                    'SGAN_TPU_CONVT4S2_CO32', '1') != '0')
                if ((h * wd <= 256 or co_gate)
                        and pt.supported(x, w, self.stride, self.padding,
                                         self.output_padding)):
                    return pt.convt4s2(x, w, b)
        return conv_transpose2d(x, params["weight"], bias,
                                self.stride, self.padding,
                                self.output_padding, ctx.compute_dtype)

    def param_kinds(self):
        k = {"weight": "convt"}
        if self.bias:
            k["bias"] = "bias"
        return k


class BatchNorm2d(Layer):
    def __init__(self, nc, eps=1e-5):
        self.nc, self.eps = nc, eps

    def init(self, key):
        return {"weight": jax.random.normal(key, (self.nc,), jnp.float32) * 0.02 + 1.0,
                "bias": jnp.zeros((self.nc,), jnp.float32)}

    def apply(self, params, x, ctx):
        return batch_norm(x, params["weight"], params["bias"], self.eps)

    def param_kinds(self):
        return {"weight": "bn", "bias": "bias"}


class InstanceNorm2d(Layer):
    """affine=False — no parameters (reference models/networks.py:47)."""

    def __init__(self, nc=None, eps=1e-5):
        self.eps = eps

    def apply(self, params, x, ctx):
        if PALLAS_ENABLED:
            # the fused op with slope=None: one-pass statistics + a custom
            # VJP whose residuals skip the backward stats recompute
            from ..ops.pallas import fused_instance_norm_act
            return fused_instance_norm_act(x, self.eps, None)
        return instance_norm(x, self.eps)


class ReLU(Layer):
    def apply(self, params, x, ctx):
        return jax.nn.relu(x)


class LeakyReLU(Layer):
    def __init__(self, slope=0.2):
        self.slope = slope

    def apply(self, params, x, ctx):
        return jax.nn.leaky_relu(x, self.slope)


class Tanh(Layer):
    def apply(self, params, x, ctx):
        return jnp.tanh(x)


class Sigmoid(Layer):
    def apply(self, params, x, ctx):
        return jax.nn.sigmoid(x)


class Dropout(Layer):
    def __init__(self, p=0.5):
        self.p = p

    def apply(self, params, x, ctx):
        if not ctx.train or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(ctx.rng(), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class GaussianNoise(Layer):
    """y + sigma * N(0, 1) — the per-level noise injection
    (reference models/networks.py:414-417, 759-764)."""

    def __init__(self, sigma=0.1):
        self.sigma = sigma

    def apply(self, params, x, ctx):
        return x + self.sigma * jax.random.normal(ctx.rng(), x.shape, x.dtype)


class ReflectionPad2d(Layer):
    def __init__(self, padding):
        self.padding = padding

    def apply(self, params, x, ctx):
        return reflection_pad2d(x, self.padding)


class AvgPool2d(Layer):
    def __init__(self, kernel, stride=None, padding=0):
        self.kernel, self.stride, self.padding = kernel, stride, padding

    def apply(self, params, x, ctx):
        return avg_pool(x, self.kernel, self.stride, self.padding)


class Upsample(Layer):
    """Bilinear x-scale upsample, torch-0.3 align_corners=True semantics."""

    def __init__(self, scale_factor=2, mode='bilinear'):
        assert mode == 'bilinear'
        self.scale = scale_factor

    def apply(self, params, x, ctx):
        return bilinear_upsample(x, self.scale)


def jit_init(layer, key):
    """Initialize a layer's params under jit: one compiled program instead
    of hundreds of per-parameter RNG dispatches (18x faster model startup
    through the remote-execution relay: 132s -> 7s for the DSGAN CRN).
    On CPU the dispatches are cheap and per-config compiles dominate (the
    test suite builds many small nets), so eager init is used there."""
    if jax.default_backend() == 'cpu':
        return layer.init(key)
    return jax.jit(layer.init)(key)


def count_params(params):
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
