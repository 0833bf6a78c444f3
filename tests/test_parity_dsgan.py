"""DSGAN-stack parity vs torch oracles.

Round-1 had torch oracles for fcgan/unet/PatchGAN only; the CRN (the DSGAN
G2), fcgan_star, and the separable discriminator rested on structure +
golden param counts.  These tests rebuild each of them as an independent
torch module (mirroring reference models/networks.py:642-794, :543-639,
:851-942), load OUR weights through the .pth boundary, and assert forward
numerics — then compose the full DSGAN generation stack
(G1 -> transform_1to2 -> G2, the reference test.py path,
twostage_cycle_model.py:229-239) on identical noise and assert pixel-level
agreement (L1 / PSNR).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from supervised_gan_tpu import nn
from supervised_gan_tpu.utils import pth as pthio


# --------------------------------------------------------------------------
# torch oracles
# --------------------------------------------------------------------------

class TorchCrnUp(torch.nn.Module):
    """CrnUpsampleBlock, bilinear mode (reference networks.py:745-757)."""

    def __init__(self, in_nc, out_nc):
        super().__init__()
        self.model = torch.nn.Sequential(
            torch.nn.Conv2d(in_nc, out_nc, 3, 1, 1),
            torch.nn.Upsample(scale_factor=2, mode='bilinear',
                              align_corners=True),
            torch.nn.InstanceNorm2d(out_nc, affine=False))

    def forward(self, x):
        return self.model(x)


class TorchCrnInter(torch.nn.Module):
    """CrnInterBlock (reference networks.py:767-794)."""

    def __init__(self, in_nc, out_nc, n_layers, outer_most=False):
        super().__init__()
        layers = []
        for _ in range(1, n_layers):
            layers += [torch.nn.ReLU(),
                       torch.nn.Conv2d(in_nc, in_nc, 3, 1, 1),
                       torch.nn.InstanceNorm2d(in_nc, affine=False)]
        layers += [torch.nn.ReLU(), torch.nn.Conv2d(in_nc, out_nc, 3, 1, 1)]
        if not outer_most:
            layers.append(torch.nn.InstanceNorm2d(out_nc, affine=False))
        self.model = torch.nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class TorchCRN(torch.nn.Module):
    """CascadedRefinementNetwork oracle: 6 cascaded scales, shared label
    block, bilinear upsampling, instance norm, no gaussian noise
    (reference networks.py:642-735)."""

    def __init__(self, input_nc, output_nc, noise_nc, ngf, n_layers_block):
        super().__init__()

        def hblock(in_nc, out_nc, outer_most=False):
            return torch.nn.Sequential(
                TorchCrnUp(in_nc, ngf),
                TorchCrnInter(ngf, out_nc, n_layers_block, outer_most))

        self.blockh5 = hblock(noise_nc + input_nc, ngf)
        self.blockh4 = hblock(ngf + ngf, ngf)
        self.blockh3 = hblock(ngf + ngf, ngf)
        self.blockh2 = hblock(ngf + ngf, ngf)
        self.blockh1 = hblock(ngf + ngf, ngf)
        self.blockh0 = hblock(ngf + ngf, output_nc, outer_most=True)
        self.blockl = torch.nn.Sequential(
            torch.nn.Conv2d(input_nc, ngf, 3, 1, 1),
            torch.nn.InstanceNorm2d(ngf, affine=False))

    def forward(self, label, noise):
        pool = torch.nn.functional.avg_pool2d
        h = self.blockh5(torch.cat([pool(label, 64), noise], 1))
        for p, blk in ((32, self.blockh4), (16, self.blockh3),
                       (8, self.blockh2), (4, self.blockh1),
                       (2, self.blockh0)):
            l = self.blockl(pool(label, p))
            h = blk(torch.cat([l, h], 1))
        return torch.tanh(h)


class TorchStar(torch.nn.Module):
    """FCGANGeneratorStar oracle: label tower a + image tower b, tower b
    consuming cat(ha, hb) per level (reference networks.py:543-639)."""

    def __init__(self, noise_nc, ngf):
        super().__init__()
        self.half = noise_nc // 2

        def up(ic, oc, final=False):
            if final:
                return torch.nn.Sequential(
                    torch.nn.ConvTranspose2d(ic, oc, 4, 2, 1, bias=False))
            return torch.nn.Sequential(
                torch.nn.ConvTranspose2d(ic, oc, 4, 2, 1, bias=False),
                torch.nn.BatchNorm2d(oc), torch.nn.ReLU())

        mults = [8, 8, 4, 2, 1]
        ic = self.half
        for i, m in enumerate(mults):
            setattr(self, 'conv%da' % i, up(ic, ngf * m))
            ic = ngf * m
        self.conv5a = up(ngf, 1, final=True)
        self.conv0b = up(self.half, ngf * 8)
        b_in = [ngf * 16, ngf * 16, ngf * 8, ngf * 4]
        b_out = [ngf * 8, ngf * 4, ngf * 2, ngf]
        for i in range(4):
            setattr(self, 'conv%db' % (i + 1), up(b_in[i], b_out[i]))
        self.conv5b = up(ngf * 2, 1, final=True)

    def forward(self, noise):
        noise1 = noise[:, :self.half]
        noise2 = noise[:, self.half:2 * self.half]
        hb = self.conv0b(noise1)
        ha = self.conv0a(noise2)
        for i in range(1, 5):
            hb = getattr(self, 'conv%db' % i)(torch.cat([ha, hb], 1))
            ha = getattr(self, 'conv%da' % i)(ha)
        hb = self.conv5b(torch.cat([ha, hb], 1))
        ha = self.conv5a(ha)
        return torch.tanh(torch.cat([ha, hb], 1))


class TorchSepD(torch.nn.Module):
    """NLayerDiscriminatorSep oracle, working-GPU semantics
    (reference networks.py:851-942; n_sep=2)."""

    def __init__(self, ndf, n_layers, use_sigmoid):
        super().__init__()

        def tower(in_nc):
            return torch.nn.Sequential(
                torch.nn.Conv2d(in_nc, ndf, 4, 2, 1),
                torch.nn.LeakyReLU(0.2),
                torch.nn.Conv2d(ndf, ndf * 2, 4, 2, 1),
                torch.nn.InstanceNorm2d(ndf * 2, affine=False),
                torch.nn.LeakyReLU(0.2))

        self.netA = tower(2)
        self.netB = tower(1)
        nf = 2 * 2
        layers = []
        for n in range(2, n_layers):
            prev, nf = nf, min(2 ** n, 8)
            layers += [torch.nn.Conv2d(ndf * prev, ndf * nf, 4, 2, 1),
                       torch.nn.InstanceNorm2d(ndf * nf, affine=False),
                       torch.nn.LeakyReLU(0.2)]
        prev, nf = nf, min(2 ** n_layers, 8)
        layers += [torch.nn.Conv2d(ndf * prev, ndf * nf, 4, 1, 1),
                   torch.nn.InstanceNorm2d(ndf * nf, affine=False),
                   torch.nn.LeakyReLU(0.2),
                   torch.nn.Conv2d(ndf * nf, 1, 4, 1, 1)]
        if use_sigmoid:
            layers.append(torch.nn.Sigmoid())
        self.model = torch.nn.Sequential(*layers)

    def forward(self, x):
        y = torch.cat([self.netA(x[:, 0:2]), self.netB(x[:, 2:3])], 1)
        return self.model(y)


def _load_oracle(oracle, net, params, tmp_path, name):
    path = str(tmp_path / name)
    pthio.save_pth(path, net, params)
    oracle.load_state_dict(torch.load(path, map_location='cpu',
                                      weights_only=True))
    oracle.train()      # the reference never calls .eval()
    return oracle


def _nchw(a):
    return torch.from_numpy(np.transpose(np.asarray(a), (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# --------------------------------------------------------------------------
# per-net numerics
# --------------------------------------------------------------------------

def test_crn_numerics_vs_torch(tmp_path):
    net = nn.define_G(2, 1, 8, 'crn', 'instance', False, n_layers_G=5,
                      noise_nc=4, upsample_mode='bilinear',
                      n_layers_CRN_block=2)
    params = net.init(jax.random.PRNGKey(0))
    oracle = _load_oracle(TorchCRN(2, 1, 4, 8, 2), net, params,
                          tmp_path, 'crn.pth')
    rng = np.random.RandomState(0)
    label = rng.uniform(-1, 1, (1, 128, 128, 2)).astype(np.float32)
    noise = rng.randn(1, 2, 2, 4).astype(np.float32)
    ours = np.asarray(net.apply(params, jnp.asarray(label),
                                jnp.asarray(noise), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(label), _nchw(noise)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_fcgan_star_numerics_vs_torch(tmp_path):
    net = nn.define_G(2, 0, 4, 'fcgan_star', 'instance', False,
                      n_layers_G=5, use_fcn=True, noise_nc=4)
    params = net.init(jax.random.PRNGKey(1))
    oracle = _load_oracle(TorchStar(4, 4), net, params,
                          tmp_path, 'star.pth')
    noise = np.random.RandomState(1).randn(1, 2, 2, 4).astype(np.float32)
    ours = np.asarray(net.apply(params, jnp.asarray(noise), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(noise)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_sep_discriminator_numerics_vs_torch(tmp_path):
    d = nn.define_D(3, 4, 'n_layers_sep', n_layers_D=3, norm='instance',
                    use_sigmoid=True, scale_factor=1)
    params = d.init(jax.random.PRNGKey(2))
    oracle = _load_oracle(TorchSepD(4, 3, True), d, params,
                          tmp_path, 'sepd.pth')
    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    ours = np.asarray(d.apply(params, jnp.asarray(x), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------------------
# end-to-end DSGAN generation stack (the test.py path) on identical noise
# --------------------------------------------------------------------------

def test_dsgan_stack_pixel_parity(tmp_path):
    """G1 (fcgan) -> transform_1to2 (bilinear x2) -> G2 (CRN), both sides
    fed the same noise.  This is what test.py executes per sample for the
    DSGAN recipe (reference twostage_cycle_model.py:229-239)."""
    from tests.test_pth import torch_fcgan

    g1 = nn.define_G(2, 0, 8, 'fcgan', 'instance', False, n_layers_G=3,
                     use_fcn=True, noise_nc=4)
    g2 = nn.define_G(2, 1, 8, 'crn', 'instance', False, n_layers_G=5,
                     noise_nc=4, upsample_mode='bilinear',
                     n_layers_CRN_block=2)
    p1 = g1.init(jax.random.PRNGKey(3))
    p2 = g2.init(jax.random.PRNGKey(4))
    o1 = _load_oracle(torch_fcgan(4, 2, 8, 3, True), g1, p1,
                      tmp_path, 'g1.pth')
    o2 = _load_oracle(TorchCRN(2, 1, 4, 8, 2), g2, p2, tmp_path, 'g2.pth')

    rng = np.random.RandomState(7)
    z1 = rng.randn(1, 4, 4, 4).astype(np.float32)       # -> 64px label
    z2 = rng.randn(1, 2, 2, 4).astype(np.float32)       # CRN noise @128px

    from supervised_gan_tpu.ops import bilinear_upsample
    fake_a = g1.apply(p1, jnp.asarray(z1), nn.Ctx())
    fake_a_up = bilinear_upsample(fake_a, 2)
    fake_b = g2.apply(p2, fake_a_up, jnp.asarray(z2), nn.Ctx())

    with torch.no_grad():
        t_a = torch.tanh(o1.model(_nchw(z1)))
        t_a_up = torch.nn.functional.interpolate(
            t_a, scale_factor=2, mode='bilinear', align_corners=True)
        t_b = o2(t_a_up, _nchw(z2))

    for ours, theirs, name in ((fake_a, t_a, 'fake_A'),
                               (fake_b, t_b, 'fake_B')):
        a, b = np.asarray(ours), _nhwc(theirs)
        l1 = float(np.mean(np.abs(a - b)))
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(4.0 / mse) if mse > 0 else np.inf  # range [-1,1]
        assert psnr > 40.0, (name, l1, psnr)
        assert l1 < 1e-2, (name, l1)


class TorchUnetBlock(torch.nn.Module):
    """UnetSkipConnectionBlock oracle (reference networks.py:373-419),
    all-skips configuration, no gaussian injection."""

    def __init__(self, outer_nc, inner_nc, submodule=None, innermost=False,
                 use_dropout=False):
        super().__init__()
        down = torch.nn.Conv2d(outer_nc, inner_nc, 4, 2, 1)
        if innermost:
            layers = [torch.nn.LeakyReLU(0.2), down, torch.nn.ReLU(),
                      torch.nn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1),
                      torch.nn.InstanceNorm2d(outer_nc, affine=False)]
        else:
            layers = [torch.nn.LeakyReLU(0.2), down,
                      torch.nn.InstanceNorm2d(inner_nc, affine=False),
                      submodule, torch.nn.ReLU(),
                      torch.nn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1),
                      torch.nn.InstanceNorm2d(outer_nc, affine=False)]
            if use_dropout:
                layers.append(torch.nn.Dropout(0.5))
        self.model = torch.nn.Sequential(*layers)

    def forward(self, x):
        return torch.cat([self.model(x), x], 1)


class TorchUnet(torch.nn.Module):
    """UnetGenerator oracle (num_downs levels, all skip connections)."""

    def __init__(self, input_nc, output_nc, num_downs, ngf,
                 use_dropout=False):
        super().__init__()
        block = TorchUnetBlock(ngf * 8, ngf * 8, innermost=True)
        for _ in range(num_downs - 5):
            block = TorchUnetBlock(ngf * 8, ngf * 8, block,
                                   use_dropout=use_dropout)
        for outer, inner in ((4, 8), (2, 4), (1, 2)):
            block = TorchUnetBlock(ngf * outer, ngf * inner, block)
        self.model = torch.nn.Sequential(
            torch.nn.Conv2d(input_nc, ngf, 4, 2, 1), block, torch.nn.ReLU(),
            torch.nn.ConvTranspose2d(ngf * 2, output_nc, 4, 2, 1))

    def forward(self, x):
        return torch.tanh(self.model(x))


def test_unet_numerics_vs_torch(tmp_path):
    net = nn.define_G(1, 2, 8, 'unet_128', 'instance', False, noise_nc=4)
    params = net.init(jax.random.PRNGKey(5))
    oracle = _load_oracle(TorchUnet(1, 2, 7, 8), net, params,
                          tmp_path, 'unet.pth')
    x = np.random.RandomState(5).uniform(
        -1, 1, (1, 128, 128, 1)).astype(np.float32)
    ours = np.asarray(net.apply(params, jnp.asarray(x),
                                nn.Ctx(train=False)))
    with torch.no_grad():
        oracle.eval()       # dropout off to match Ctx(train=False)
        theirs = _nhwc(oracle(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
