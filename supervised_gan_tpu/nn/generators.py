"""Generator zoo.

Re-implements every generator in reference models/networks.py as a pure
functional layer (NHWC activations, HWIO kernels).  Structure, channel
arithmetic, layer ordering and parameter naming match the reference exactly
so parameter counts and ``.pth`` checkpoints line up:

  * FCGANGenerator            (models/networks.py:493-540)
  * FCGANGeneratorStar        (models/networks.py:543-639)
  * UnetGenerator (+ skip blk)(models/networks.py:318-419)
  * CascadedRefinementNetwork (models/networks.py:642-794)
  * ResnetGenerator (+ block) (models/networks.py:221-311)
  * AutoEncoder               (models/networks.py:422-490)
  * DCGANGenerator            (models/networks.py:1015-1071)

All "activation" arguments accept 'tanh' | 'sigmoid' | 'softmax' | 'none'
(the reference passes nn.Module activations into forward; segmentation uses
softmax/sigmoid heads).
"""

import jax
import jax.numpy as jnp

from .core import (Layer, Sequential, Conv2d, ConvTranspose2d, ReLU,
                   LeakyReLU, Dropout, ReflectionPad2d, BatchNorm2d)
from ..ops import avg_pool, bilinear_upsample


def activate(y, activation='tanh'):
    if activation == 'tanh':
        return jnp.tanh(y)
    if activation == 'sigmoid':
        return jax.nn.sigmoid(y)
    if activation == 'softmax':
        return jax.nn.softmax(y, axis=-1)
    if activation in (None, 'none'):
        return y
    raise ValueError('unknown activation %r' % (activation,))


class FCGANGenerator(Layer):
    """DCGAN-style ConvTranspose stack from a noise image.

    use_fcn (noiseSize != 1): first layer is k4 s2 p1; otherwise a k4 s1 p0
    projection from 1x1.  Spatial output = noiseSize * 2^n_layers when fcn.
    Norm is always BatchNorm (define_G hardcodes it for 'fcgan',
    reference models/networks.py:87).
    """

    def __init__(self, noise_nc, input_nc, ngf=64, n_layers=3,
                 use_dropout=False, use_fcn=False):
        nf_mult = min(2 ** (n_layers - 1), 8)
        if use_fcn:
            first = ConvTranspose2d(noise_nc, ngf * nf_mult, 4, 2, 1, bias=False)
        else:
            first = ConvTranspose2d(noise_nc, ngf * nf_mult, 4, 1, 0, bias=False)
        layers = [first, BatchNorm2d(ngf * nf_mult), ReLU()]
        for n in range(1, n_layers):
            prev = nf_mult
            nf_mult = min(2 ** (n_layers - n - 1), 8)
            layers += [ConvTranspose2d(ngf * prev, ngf * nf_mult, 4, 2, 1),
                       BatchNorm2d(ngf * nf_mult)]
            if use_dropout:
                layers.append(Dropout(0.5))
            layers.append(ReLU())
        layers.append(ConvTranspose2d(ngf, input_nc, 4, 2, 1, bias=False))
        self.model = Sequential(*layers)

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx, activation='tanh', phase_out=False):
        if not phase_out:
            return activate(self.model.apply(params["model"], x, ctx),
                            activation)
        # Phase-major output (see UnetGenerator.apply): the convT head
        # emits its dense dot's natural (q, r, co) lane order; phase-
        # aware consumers (stem_conv_phase D stems, space_to_phase'd
        # elementwise-loss targets) read it without any pixel interleave.
        from ..ops import edge_conv as ec
        layers = self.model.layers
        head = layers[-1]
        h = Sequential(*layers[:-1]).apply(params["model"], x, ctx)
        hp = params["model"].get(str(len(layers) - 1), {})
        w, b = hp["weight"], hp.get("bias")
        hc = h
        if ctx.compute_dtype is not None:
            hc = h.astype(ctx.compute_dtype)
            w = w.astype(ctx.compute_dtype)
        if ec.head_convt_supported(hc, w, head.stride, head.padding):
            y = ec.head_convt_phase(hc, w, b, head.stride, head.padding)
            return activate(y, activation)
        y = head.apply(hp, h, ctx)
        return ec.space_to_phase(activate(y, activation), head.stride)


class FCGANGeneratorStar(Layer):
    """Two coupled ConvTranspose towers (label tower a, image tower b);
    tower b consumes cat(ha, hb) at every level.  Requires n_layers==5,
    use_fcn, input_nc==2 (reference models/networks.py:549-551)."""

    def __init__(self, noise_nc, input_nc, ngf=64, n_layers=3,
                 use_dropout=False, use_fcn=False):
        assert n_layers == 5 and use_fcn and input_nc == 2
        self.noise_nc = noise_nc // 2
        out_nc = 1

        def up(ic, oc, final=False):
            if final:
                return Sequential(ConvTranspose2d(ic, oc, 4, 2, 1, bias=False))
            return Sequential(ConvTranspose2d(ic, oc, 4, 2, 1, bias=False),
                              BatchNorm2d(oc), ReLU())

        mults = [8, 8, 4, 2, 1]
        self.blocks = {}
        ic = self.noise_nc
        for i, m in enumerate(mults):
            self.blocks['conv%da' % i] = up(ic, ngf * m)
            ic = ngf * m
        self.blocks['conv5a'] = up(ngf, out_nc, final=True)
        # tower b: levels 1..5 take concatenated [ha, hb] features
        self.blocks['conv0b'] = up(self.noise_nc, ngf * 8)
        b_in = [ngf * 8 * 2, ngf * 8 * 2, ngf * 4 * 2, ngf * 2 * 2]
        b_out = [ngf * 8, ngf * 4, ngf * 2, ngf * 1]
        for i in range(4):
            self.blocks['conv%db' % (i + 1)] = up(b_in[i], b_out[i])
        self.blocks['conv5b'] = up(ngf * 2, out_nc, final=True)

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks))
        return {name: child.init(k)
                for (name, child), k in zip(sorted(self.blocks.items()), keys)}

    def apply(self, params, noise, ctx, activation='tanh'):
        def run(name, x):
            return self.blocks[name].apply(params[name], x, ctx)

        noise1 = noise[..., :self.noise_nc]
        noise2 = noise[..., self.noise_nc:2 * self.noise_nc]
        hb = run('conv0b', noise1)
        ha = run('conv0a', noise2)
        for i in range(1, 5):
            hb = run('conv%db' % i, jnp.concatenate([ha, hb], -1))
            ha = run('conv%da' % i, ha)
        hb = run('conv5b', jnp.concatenate([ha, hb], -1))
        ha = run('conv5a', ha)
        return activate(jnp.concatenate([ha, hb], -1), activation)


class UnetSkipConnectionBlock(Layer):
    """One U-Net level.  Forward: y = model(x); optionally inject Gaussian
    noise; return cat([y, x]) when this level keeps its skip connection
    (reference models/networks.py:373-419)."""

    def __init__(self, outer_nc, inner_nc, submodule=None, innermost=False,
                 norm_layer=BatchNorm2d, use_dropout=False,
                 add_gaussian_noise=False, gaussian_sigma=0.1,
                 add_skip_this=True, add_skip_sub=True):
        self.add_gauss = add_gaussian_noise
        self.gauss_sigma = gaussian_sigma
        self.add_skip_this = add_skip_this
        downconv = Conv2d(outer_nc, inner_nc, 4, 2, 1)
        if innermost:
            layers = [LeakyReLU(0.2), downconv,
                      ReLU(), ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1),
                      norm_layer(outer_nc)]
        else:
            nc_mult = 2 if add_skip_sub else 1
            layers = [LeakyReLU(0.2), downconv, norm_layer(inner_nc),
                      submodule,
                      ReLU(), ConvTranspose2d(inner_nc * nc_mult, outer_nc, 4, 2, 1),
                      norm_layer(outer_nc)]
            if use_dropout:
                layers.append(Dropout(0.5))
        self.model = Sequential(*layers)

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx):
        y = self.model.apply(params["model"], x, ctx)
        if self.add_gauss:
            y = y + self.gauss_sigma * jax.random.normal(ctx.rng(), y.shape, y.dtype)
        return jnp.concatenate([y, x], -1) if self.add_skip_this else y


class UnetGenerator(Layer):
    """Recursive U-Net; num_downs=7 for unet_128, 8 for unet_256.

    ``num_skips`` limits how many levels keep their skip concat (counted from
    the innermost).  The ``noise`` forward argument is accepted and *ignored*,
    faithfully to the reference (models/networks.py:362-367): stochasticity
    comes only from dropout / injected Gaussian noise.
    """

    def __init__(self, input_nc, output_nc, num_downs, ngf=64,
                 norm_layer=BatchNorm2d, use_dropout=False, use_residual=False,
                 add_gaussian_noise=False, gaussian_sigma=0.1, num_skips=-1):
        self.use_residual = use_residual
        if num_skips < 0:
            num_skips = num_downs
        gauss = dict(add_gaussian_noise=add_gaussian_noise,
                     gaussian_sigma=gaussian_sigma)

        add_skip_this = num_skips >= 1
        block = UnetSkipConnectionBlock(ngf * 8, ngf * 8, norm_layer=norm_layer,
                                        innermost=True, add_skip_this=add_skip_this,
                                        **gauss)
        for i in range(num_downs - 5):
            add_skip_sub, add_skip_this = add_skip_this, num_skips >= i + 2
            block = UnetSkipConnectionBlock(ngf * 8, ngf * 8, block,
                                            norm_layer=norm_layer,
                                            use_dropout=use_dropout,
                                            add_skip_this=add_skip_this,
                                            add_skip_sub=add_skip_sub, **gauss)
        for outer_mult, inner_mult, skip_at in ((4, 8, num_downs - 3),
                                                (2, 4, num_downs - 2),
                                                (1, 2, num_downs - 1)):
            add_skip_sub, add_skip_this = add_skip_this, num_skips >= skip_at
            block = UnetSkipConnectionBlock(ngf * outer_mult, ngf * inner_mult,
                                            block, norm_layer=norm_layer,
                                            add_skip_this=add_skip_this,
                                            add_skip_sub=add_skip_sub, **gauss)
        nc_mult = 2 if add_skip_this else 1
        self.model = Sequential(
            Conv2d(input_nc, ngf, 4, 2, 1),
            block,
            ReLU(),
            ConvTranspose2d(ngf * nc_mult, output_nc, 4, 2, 1))

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx, noise=None, activation='tanh',
              phase_out=False):
        if not phase_out:
            y = self.model.apply(params["model"], x, ctx)
            return activate(x + y if self.use_residual else y, activation)
        # Phase-major output: space_to_phase(pixel output, stride) — same
        # elements, (q, r, co) lane order.  When every consumer is an
        # elementwise loss this removes the co<=4 pixel interleave in the
        # forward AND the matching space-to-depth of the cotangent in the
        # backward (~2 ms/step at 512px on the DSGAN bench, round-3 trace);
        # callers space_to_phase the gradient-free loss targets instead.
        from ..ops import edge_conv as ec
        layers = self.model.layers
        head = layers[-1]
        h = Sequential(*layers[:-1]).apply(params["model"], x, ctx)
        s = head.stride
        hp = params["model"].get(str(len(layers) - 1), {})
        if not self.use_residual:
            w, b = hp["weight"], hp.get("bias")
            hc = h
            if ctx.compute_dtype is not None:
                hc = h.astype(ctx.compute_dtype)
                w = w.astype(ctx.compute_dtype)
            if ec.head_convt_supported(hc, w, s, head.padding):
                y = ec.head_convt_phase(hc, w, b, s, head.padding)
                return activate(y, activation)
        y = head.apply(hp, h, ctx)
        y = activate(x + y if self.use_residual else y, activation)
        return ec.space_to_phase(y, s)


class CrnUpsampleBlock(Layer):
    """convt: ConvT k4s2p1 + norm;  bilinear: Conv3x3 + x2 bilinear + norm.
    Optional additive Gaussian noise (reference models/networks.py:738-764)."""

    def __init__(self, input_nc, output_nc, mode='convt', norm_layer=BatchNorm2d,
                 add_gaussian_noise=False, gaussian_sigma=0.1):
        self.add_gauss = add_gaussian_noise
        self.gauss_sigma = gaussian_sigma
        self.mode = mode
        if mode == 'convt':
            self.model = Sequential(
                ConvTranspose2d(input_nc, output_nc, 4, 2, 1, bias=False),
                norm_layer(output_nc))
        elif mode == 'bilinear':
            from .core import Upsample
            self.model = Sequential(
                Conv2d(input_nc, output_nc, 3, 1, 1),
                Upsample(2, 'bilinear'),
                norm_layer(output_nc))
        else:
            raise NotImplementedError('UpsampleBlock mode [%s]' % mode)

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx):
        y = self.model.apply(params["model"], x, ctx)
        if self.add_gauss:
            y = y + self.gauss_sigma * jax.random.normal(ctx.rng(), y.shape, y.dtype)
        return y


class CrnInterBlock(Layer):
    """(n_layers-1) x [ReLU, Conv3x3, norm] then [ReLU, Conv3x3 (+norm unless
    outermost)] (reference models/networks.py:767-794)."""

    def __init__(self, input_nc, output_nc, n_layers=1, norm_layer=BatchNorm2d,
                 outer_most=False):
        layers = []
        for _ in range(1, n_layers):
            layers += [ReLU(), Conv2d(input_nc, input_nc, 3, 1, 1),
                       norm_layer(input_nc)]
        layers += [ReLU(), Conv2d(input_nc, output_nc, 3, 1, 1)]
        if not outer_most:
            layers.append(norm_layer(output_nc))
        self.model = Sequential(*layers)

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx):
        return self.model.apply(params["model"], x, ctx)


class CascadedRefinementNetwork(Layer):
    """6-scale cascaded refinement: at each scale the label is AvgPool-
    downsampled (64,32,16,8,4,2), embedded by a (shared or per-scale) 3x3
    conv block, concatenated with the upsampled hidden state
    (reference models/networks.py:642-735).  Input spatial size must be
    64 * noiseSize (label pool64 must match the noise image)."""

    def __init__(self, input_nc, output_nc, noise_nc, ngf=64, n_layers=5,
                 norm_layer=BatchNorm2d, concat_label=False,
                 upsample_mode='convt', add_gaussian_noise=False,
                 gaussian_sigma=0.1, share_label_weights=True, n_layers_block=1):
        assert n_layers == 5
        self.concat_label = concat_label
        self.share_label_weights = share_label_weights
        gauss = dict(add_gaussian_noise=add_gaussian_noise,
                     gaussian_sigma=gaussian_sigma)

        def hblock(in_nc, out_nc, outer_most=False, with_gauss=True):
            return Sequential(
                CrnUpsampleBlock(in_nc, ngf, mode=upsample_mode,
                                 norm_layer=norm_layer,
                                 **(gauss if with_gauss else
                                    dict(add_gaussian_noise=False,
                                         gaussian_sigma=gaussian_sigma))),
                CrnInterBlock(ngf, out_nc, n_layers=n_layers_block,
                              norm_layer=norm_layer, outer_most=outer_most))

        self.blocks = {
            'blockh5': hblock(noise_nc + input_nc, ngf),
            'blockh4': hblock(ngf + ngf, ngf),
            'blockh3': hblock(ngf + ngf, ngf),
            'blockh2': hblock(ngf + ngf, ngf),
            'blockh1': hblock(ngf + ngf, ngf),
            'blockh0': hblock(ngf + ngf, output_nc, outer_most=True,
                              with_gauss=False),
        }

        def lblock():
            return Sequential(Conv2d(input_nc, ngf, 3, 1, 1),
                              norm_layer(ngf))

        if share_label_weights:
            self.blocks['blockl'] = lblock()
        else:
            for i in range(5):
                self.blocks['blockl%d' % i] = lblock()

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks))
        return {name: child.init(k)
                for (name, child), k in zip(sorted(self.blocks.items()), keys)}

    def apply(self, params, label, noise, ctx, activation='tanh'):
        def run(name, x):
            return self.blocks[name].apply(params[name], x, ctx)

        h = run('blockh5', jnp.concatenate([avg_pool(label, 64), noise], -1))
        for pool, hname, lidx in ((32, 'blockh4', 4), (16, 'blockh3', 3),
                                  (8, 'blockh2', 2), (4, 'blockh1', 1),
                                  (2, 'blockh0', 0)):
            l = avg_pool(label, pool)
            lname = 'blockl' if self.share_label_weights else 'blockl%d' % lidx
            l = run(lname, l)
            h = run(hname, jnp.concatenate([l, h], -1))
        out = activate(h, activation)
        if self.concat_label:
            return jnp.concatenate([label, out], -1)
        return out


class ResnetBlock(Layer):
    """3x3 reflect-padded residual block (reference models/networks.py:272-311)."""

    def __init__(self, dim, padding_type='reflect', norm_layer=BatchNorm2d,
                 use_dropout=False):
        assert padding_type == 'reflect'
        layers = [ReflectionPad2d(1), Conv2d(dim, dim, 3, 1, 0),
                  norm_layer(dim), ReLU()]
        if use_dropout:
            layers.append(Dropout(0.5))
        layers += [ReflectionPad2d(1), Conv2d(dim, dim, 3, 1, 0),
                   norm_layer(dim)]
        self.conv_block = Sequential(*layers)

    def init(self, key):
        return {"conv_block": self.conv_block.init(key)}

    def apply(self, params, x, ctx):
        return x + self.conv_block.apply(params["conv_block"], x, ctx)


class ResnetGenerator(Layer):
    """Johnson-style resnet generator (reference models/networks.py:221-268).
    Note the reference appends an in-model Tanh when not use_residual and
    then applies Tanh *again* in forward; reproduced faithfully."""

    def __init__(self, input_nc, output_nc, ngf=64, norm_layer=BatchNorm2d,
                 use_dropout=False, n_blocks=6, use_residual=False):
        self.use_residual = use_residual
        layers = [ReflectionPad2d(3), Conv2d(input_nc, ngf, 7, 1, 0),
                  norm_layer(ngf), ReLU()]
        for i in range(2):
            mult = 2 ** i
            layers += [Conv2d(ngf * mult, ngf * mult * 2, 3, 2, 1),
                       norm_layer(ngf * mult * 2), ReLU()]
        mult = 4
        for _ in range(n_blocks):
            layers.append(ResnetBlock(ngf * mult, 'reflect', norm_layer,
                                      use_dropout))
        for i in range(2):
            mult = 2 ** (2 - i)
            layers += [ConvTranspose2d(ngf * mult, ngf * mult // 2, 3, 2, 1,
                                       output_padding=1),
                       norm_layer(ngf * mult // 2), ReLU()]
        layers += [ReflectionPad2d(3), Conv2d(ngf, output_nc, 7, 1, 0)]
        if not use_residual:
            from .core import Tanh
            layers.append(Tanh())
        self.model = Sequential(*layers)

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx, noise=None, activation='tanh'):
        y = self.model.apply(params["model"], x, ctx)
        return jnp.tanh(x + y) if self.use_residual else jnp.tanh(y)


class AutoEncoder(Layer):
    """Strided conv encoder to min(2^n, 8) latent channels, ConvT decoder
    (reference models/networks.py:422-490)."""

    def __init__(self, input_nc, output_nc, n_layers=3, ngf=64,
                 norm_layer=BatchNorm2d, use_dropout=False):
        layers = [Conv2d(input_nc, ngf, 4, 2, 1), norm_layer(ngf), ReLU()]
        nf_mult = 1
        for n in range(1, n_layers):
            prev, nf_mult = nf_mult, min(2 ** n, 8)
            layers += [Conv2d(prev * ngf, ngf * nf_mult, 4, 2, 1),
                       norm_layer(ngf * nf_mult)]
            if use_dropout:
                layers.append(Dropout(0.2))
            layers.append(ReLU())
        latent_nc = min(2 ** n_layers, 8)
        layers.append(Conv2d(nf_mult * ngf, latent_nc, 4, 2, 1, bias=False))
        nf_mult = min(2 ** (n_layers - 1), 8)
        layers += [ConvTranspose2d(latent_nc, ngf * nf_mult, 4, 2, 1, bias=False),
                   norm_layer(ngf * nf_mult), ReLU()]
        for n in range(1, n_layers):
            prev, nf_mult = nf_mult, min(2 ** (n_layers - n - 1), 8)
            layers += [ConvTranspose2d(ngf * prev, ngf * nf_mult, 4, 2, 1),
                       norm_layer(ngf * nf_mult)]
            if use_dropout:
                layers.append(Dropout(0.5))
            layers.append(ReLU())
        layers.append(ConvTranspose2d(ngf, output_nc, 4, 2, 1, bias=False))
        self.model = Sequential(*layers)

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx, noise=None, activation='tanh'):
        return activate(self.model.apply(params["model"], x, ctx), activation)


class DCGANGenerator(Layer):
    """Fixed 128x128 modified DCGAN stack (reference models/networks.py:1015-1071)."""

    def __init__(self, nz=100, nc=3, ngf=64):
        from .core import Tanh
        self.model = Sequential(
            ConvTranspose2d(nz, ngf * 8, 4, 1, 0, bias=False),
            BatchNorm2d(ngf * 8), ReLU(),
            ConvTranspose2d(ngf * 8, ngf * 4, 4, 2, 1, bias=False),
            BatchNorm2d(ngf * 4), ReLU(),
            ConvTranspose2d(ngf * 4, ngf * 2, 4, 2, 1, bias=False),
            BatchNorm2d(ngf * 2), ReLU(),
            ConvTranspose2d(ngf * 2, ngf, 4, 2, 1, bias=False),
            BatchNorm2d(ngf), ReLU(),
            ConvTranspose2d(ngf, ngf // 2, 4, 2, 1, bias=False),
            BatchNorm2d(ngf // 2), ReLU(),
            ConvTranspose2d(ngf // 2, nc, 4, 2, 1, bias=False),
            Tanh())

    def init(self, key):
        return {"model": self.model.init(key)}

    def apply(self, params, x, ctx, activation='tanh'):
        # in-model Tanh; the activation argument is ignored like the reference
        return self.model.apply(params["model"], x, ctx)
