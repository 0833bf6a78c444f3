"""Discriminator zoo.

  * NLayerDiscriminator    (reference models/networks.py:798-847)
  * NLayerDiscriminatorSep (reference models/networks.py:851-942)
  * DCGANDiscriminator     (reference models/networks.py:1074-1129)

Multi-scale front-end: for scale_factor > 1 the reference prepends a frozen
``gauss_filter`` (depthwise MATLAB-fspecial blur + stride-``scale``
subsample, models/networks.py:807-813).  Here that front-end is a fixed
*function* (ops.blur_downsample) rather than a parameter, so the optimizer
naturally sees only learnable weights — the invariant the reference enforces
by hand ("all learnable parameters should be in netD.model!!!",
models/fcgan_model.py:101-103).

Padding note: the reference computes ``padw = int(np.ceil((kw-1)/2))`` under
Python 2 integer division => padw = 1 (the same k4s2p1 PatchGAN as pix2pix).
"""

import jax
import jax.numpy as jnp

from .core import (Layer, Sequential, Conv2d, LeakyReLU, Sigmoid)
from ..ops import blur_downsample


def _trunk(input_nc, ndf, n_layers, norm_layer, use_sigmoid, logit_nc):
    layers = [Conv2d(input_nc, ndf, 4, 2, 1), LeakyReLU(0.2)]
    nf_mult = 1
    for n in range(1, n_layers):
        prev, nf_mult = nf_mult, min(2 ** n, 8)
        layers += [Conv2d(ndf * prev, ndf * nf_mult, 4, 2, 1),
                   norm_layer(ndf * nf_mult), LeakyReLU(0.2)]
    prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
    layers += [Conv2d(ndf * prev, ndf * nf_mult, 4, 1, 1),
               norm_layer(ndf * nf_mult), LeakyReLU(0.2),
               Conv2d(ndf * nf_mult, logit_nc, 4, 1, 1)]
    if use_sigmoid:
        layers.append(Sigmoid())
    return Sequential(*layers)


class NLayerDiscriminator(Layer):
    """PatchGAN with optional blur-downsample front-end; logits map is
    (N, H', W', 1) or (N, H', W', num_classes)."""

    def __init__(self, input_nc, ndf=64, n_layers=3, norm_layer=None,
                 use_sigmoid=False, scale_factor=1, num_classes=2):
        from .core import BatchNorm2d
        norm_layer = norm_layer or BatchNorm2d
        self.scale_factor = scale_factor
        logit_nc = 1 if num_classes == 2 else num_classes
        self.model = _trunk(input_nc, ndf, n_layers, norm_layer, use_sigmoid,
                            logit_nc)

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx, phase_in=0):
        """phase_in = s > 0: x arrives in edge_conv.space_to_phase(·, s)
        layout (a phase-major convT-head producer, e.g. the DSGAN G1).
        The blur front-end reads the phase lanes in place
        (ops.resample.blur_downsample_phase) and the scale-1 stem consumes
        the phase tensor directly (edge_conv.stem_conv_phase) — the pixel
        interleave + space-to-depth round trip never happens."""
        if phase_in:
            from ..ops.edge_conv import (stem_conv_phase,
                                         stem_phase_supported,
                                         phase_to_space)
            if self.scale_factor > 1:
                from ..ops.resample import blur_downsample_phase
                x = blur_downsample_phase(x, phase_in, self.scale_factor,
                                          ctx.compute_dtype)
            else:
                first = self.model.layers[0]
                p0 = params["model"]["0"]
                xc, wc = x, p0["weight"]
                if ctx.compute_dtype is not None:
                    xc = x.astype(ctx.compute_dtype)
                    wc = wc.astype(ctx.compute_dtype)
                if (first.stride == phase_in and stem_phase_supported(
                        xc, wc, first.stride, first.padding)):
                    h = stem_conv_phase(xc, wc, p0.get("bias"),
                                        first.stride, first.padding)
                    return self.model.apply(params["model"], h, ctx,
                                            start=1)
                x = phase_to_space(x, phase_in)
        elif self.scale_factor > 1:
            x = blur_downsample(x, self.scale_factor, ctx.compute_dtype)
        return self.model.apply(params["model"], x, ctx)


class NLayerDiscriminatorSep(Layer):
    """Splits the input into label channels (2) and image channel (1), feeds
    them through separate 2-layer towers netA / netB, concatenates features
    and runs a shared trunk.  Requires input_nc == 3.

    (The reference's CPU branch mistakenly routes x_B through netA,
    models/networks.py:940 — a latent crash; we implement the working GPU
    semantics: netB processes the image channel.)
    """

    def __init__(self, input_nc, ndf=64, n_layers=3, norm_layer=None,
                 use_sigmoid=False, scale_factor=1, num_classes=2):
        from .core import BatchNorm2d
        norm_layer = norm_layer or BatchNorm2d
        assert input_nc == 3
        self.scale_factor = scale_factor
        logit_nc = 1 if num_classes == 2 else num_classes
        n_sep = 2

        def tower(in_nc):
            layers = [Conv2d(in_nc, ndf, 4, 2, 1), LeakyReLU(0.2)]
            nf_mult = 1
            for n in range(1, n_sep):
                prev, nf_mult = nf_mult, min(2 ** n, 8)
                layers += [Conv2d(ndf * prev, ndf * nf_mult, 4, 2, 1),
                           norm_layer(ndf * nf_mult), LeakyReLU(0.2)]
            return Sequential(*layers)

        self.netA = tower(2)
        self.netB = tower(1)

        nf_mult = 2 * min(2 ** (n_sep - 1), 8)
        layers = []
        for n in range(n_sep, n_layers):
            prev, nf_mult = nf_mult, min(2 ** n, 8)
            layers += [Conv2d(ndf * prev, ndf * nf_mult, 4, 2, 1),
                       norm_layer(ndf * nf_mult), LeakyReLU(0.2)]
        prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
        layers += [Conv2d(ndf * prev, ndf * nf_mult, 4, 1, 1),
                   norm_layer(ndf * nf_mult), LeakyReLU(0.2),
                   Conv2d(ndf * nf_mult, logit_nc, 4, 1, 1)]
        if use_sigmoid:
            layers.append(Sigmoid())
        self.model = Sequential(*layers)

    def init(self, key):
        ka, kb, km = jax.random.split(key, 3)
        return {"netA": self.netA.init(ka),
                "netB": self.netB.init(kb),
                "model": self.model.init(km)}

    def apply(self, params, x, ctx):
        if self.scale_factor > 1:
            x = blur_downsample(x, self.scale_factor, ctx.compute_dtype)
        y_a = self.netA.apply(params["netA"], x[..., 0:2], ctx)
        y_b = self.netB.apply(params["netB"], x[..., 2:3], ctx)
        y = jnp.concatenate([y_a, y_b], -1)
        return self.model.apply(params["model"], y, ctx)


class DCGANDiscriminator(Layer):
    """Fixed 128x128 DCGAN discriminator -> per-sample scalar in (0,1)."""

    def __init__(self, nc=3, ndf=64):
        from .core import BatchNorm2d
        self.model = Sequential(
            Conv2d(nc, ndf // 2, 4, 2, 1, bias=False), LeakyReLU(0.2),
            Conv2d(ndf // 2, ndf, 4, 2, 1, bias=False),
            BatchNorm2d(ndf), LeakyReLU(0.2),
            Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False),
            BatchNorm2d(ndf * 2), LeakyReLU(0.2),
            Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
            BatchNorm2d(ndf * 4), LeakyReLU(0.2),
            Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False),
            BatchNorm2d(ndf * 8), LeakyReLU(0.2),
            Conv2d(ndf * 8, 1, 4, 1, 0, bias=False), Sigmoid())

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx):
        y = self.model.apply(params["model"], x, ctx)
        return y.reshape(y.shape[0], -1)[:, 0]
