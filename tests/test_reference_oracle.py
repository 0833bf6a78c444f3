"""Direct-reference oracles: import /root/reference/models/networks.py
ITSELF (under installed torch, with its Python-2-isms shimmed) and assert
our zoo against the reference's own forward — closing the mirror-drift
hole of the hand-written oracles in test_parity_dsgan.py (a shared
misreading of the reference would pass those silently; it cannot pass
these).

Shims (semantics the reference gets from Python 2 / torch 0.3):
  * ``int(np.ceil((kw - 1) / 2))`` == 1 under py2 (PatchGAN padw,
    networks.py:805,:858); py3 true division would give 2,
  * ``sigma = scale_factor / 2`` is integer division (gauss blur sigma,
    networks.py:127,:808,:864),
  * ``nn.Upsample(mode='bilinear')`` means align_corners=True in torch 0.3
    (networks.py:753).
Everything else executes verbatim from the reference file.
"""

import types

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from supervised_gan_tpu import nn
from supervised_gan_tpu.utils import pth as pthio

REF_NETWORKS = '/root/reference/models/networks.py'


@pytest.fixture(scope='module')
def refnet():
    with open(REF_NETWORKS) as f:
        src = f.read()
    src = src.replace('int(np.ceil((kw - 1) / 2))', '(kw - 1) // 2')
    src = src.replace('scale_factor / 2', 'scale_factor // 2')
    src = src.replace("mode='bilinear')",
                      "mode='bilinear', align_corners=True)")
    # Reference bug: NLayerDiscriminatorSep's CPU branch routes x_B
    # through netA (networks.py:940) and crashes on channel mismatch;
    # only the GPU branch uses netB.  Shim to the working-GPU semantics
    # (what the published experiments ran, and what we implement).
    src = src.replace('y_B = self.netA(x_B)', 'y_B = self.netB(x_B)')
    mod = types.ModuleType('reference_networks')
    exec(compile(src, REF_NETWORKS, 'exec'), mod.__dict__)
    return mod


def _load_ours(oracle, net, params, tmp_path, name, allow_missing=()):
    """Push OUR params through the .pth boundary into the reference
    module.  strict unless allow_missing (prefix match) is given."""
    path = str(tmp_path / name)
    pthio.save_pth(path, net, params)
    sd = torch.load(path, map_location='cpu', weights_only=True)
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    bad = [k for k in missing
           if not k.endswith('num_batches_tracked')
           and not any(k.startswith(p) for p in allow_missing)]
    assert not bad, bad
    oracle.train()      # the reference never calls .eval()
    return oracle


def _nchw(a):
    return torch.from_numpy(np.transpose(np.asarray(a), (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_crn_vs_reference_forward(refnet, tmp_path):
    """CascadedRefinementNetwork (reference networks.py:642-735) via the
    reference's own define_G('crn')."""
    oracle = refnet.define_G(2, 1, 8, 'crn', norm='instance',
                             use_dropout=False, n_layers_G=5, noise_nc=4,
                             upsample_mode='bilinear', n_layers_CRN_block=2,
                             share_label_weights=True)
    net = nn.define_G(2, 1, 8, 'crn', 'instance', False, n_layers_G=5,
                      noise_nc=4, upsample_mode='bilinear',
                      n_layers_CRN_block=2)
    params = net.init(jax.random.PRNGKey(0))
    _load_ours(oracle, net, params, tmp_path, 'crn.pth')
    rng = np.random.RandomState(0)
    label = rng.uniform(-1, 1, (1, 128, 128, 2)).astype(np.float32)
    noise = rng.randn(1, 2, 2, 4).astype(np.float32)
    ours = np.asarray(net.apply(params, jnp.asarray(label),
                                jnp.asarray(noise), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(label), _nchw(noise)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_patchgan_blur_vs_reference_forward(refnet, tmp_path):
    """NLayerDiscriminator with the multi-scale gauss front-end (reference
    networks.py:798-847).  The reference's define_D SETS the fspecial blur
    weights (:125-129); our export skips them (recomputed as a fixed
    function), so the comparison exercises our blur_downsample against the
    reference's own dense diagonal blur conv + AvgPool stride."""
    oracle = refnet.define_D(3, 8, 'n_layers', n_layers_D=3,
                             norm='instance', use_sigmoid=True,
                             scale_factor=2)
    d = nn.define_D(3, 8, 'n_layers', n_layers_D=3, norm='instance',
                    use_sigmoid=True, scale_factor=2)
    params = d.init(jax.random.PRNGKey(1))
    _load_ours(oracle, d, params, tmp_path, 'd.pth',
               allow_missing=('gauss_filter',))
    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    ours = np.asarray(d.apply(params, jnp.asarray(x), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(x)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_patchgan_noblur_vs_reference_forward(refnet, tmp_path):
    """scale_factor=1 PatchGAN: checks the py2 padw=1 trunk geometry."""
    oracle = refnet.define_D(3, 8, 'n_layers', n_layers_D=3,
                             norm='instance', use_sigmoid=False,
                             scale_factor=1)
    d = nn.define_D(3, 8, 'n_layers', n_layers_D=3, norm='instance',
                    use_sigmoid=False, scale_factor=1)
    params = d.init(jax.random.PRNGKey(2))
    _load_ours(oracle, d, params, tmp_path, 'd1.pth')
    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    ours = np.asarray(d.apply(params, jnp.asarray(x), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(x)))
    assert ours.shape == theirs.shape      # padw=1 -> 7x7 patch map
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_fcgan_vs_reference_forward(refnet, tmp_path):
    """FCGANGenerator (reference networks.py:493-541; define_G forces
    BatchNorm for fcgan regardless of --norm, :87)."""
    oracle = refnet.define_G(2, 0, 8, 'fcgan', norm='instance',
                             use_dropout=False, n_layers_G=3,
                             use_fcn=True, noise_nc=4)
    net = nn.define_G(2, 0, 8, 'fcgan', 'instance', False, n_layers_G=3,
                      use_fcn=True, noise_nc=4)
    params = net.init(jax.random.PRNGKey(3))
    _load_ours(oracle, net, params, tmp_path, 'g1.pth')
    z = np.random.RandomState(3).randn(1, 4, 4, 4).astype(np.float32)
    ours = np.asarray(net.apply(params, jnp.asarray(z), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(z)))     # forward applies tanh
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_fcgan_star_vs_reference_forward(refnet, tmp_path):
    """FCGANGeneratorStar twin-tower generator (networks.py:543-639)."""
    oracle = refnet.define_G(2, 0, 4, 'fcgan_star', norm='instance',
                             use_dropout=False, n_layers_G=5,
                             use_fcn=True, noise_nc=4)
    net = nn.define_G(2, 0, 4, 'fcgan_star', 'instance', False,
                      n_layers_G=5, use_fcn=True, noise_nc=4)
    params = net.init(jax.random.PRNGKey(4))
    _load_ours(oracle, net, params, tmp_path, 'star.pth')
    z = np.random.RandomState(4).randn(1, 2, 2, 4).astype(np.float32)
    ours = np.asarray(net.apply(params, jnp.asarray(z), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(z)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_sep_d_vs_reference_forward(refnet, tmp_path):
    """NLayerDiscriminatorSep (networks.py:851-942, n_sep=2)."""
    oracle = refnet.define_D(3, 4, 'n_layers_sep', n_layers_D=3,
                             norm='instance', use_sigmoid=True,
                             scale_factor=1)
    d = nn.define_D(3, 4, 'n_layers_sep', n_layers_D=3, norm='instance',
                    use_sigmoid=True, scale_factor=1)
    params = d.init(jax.random.PRNGKey(5))
    _load_ours(oracle, d, params, tmp_path, 'sepd.pth')
    x = np.random.RandomState(5).randn(1, 64, 64, 3).astype(np.float32)
    ours = np.asarray(d.apply(params, jnp.asarray(x), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_unet_vs_reference_forward(refnet, tmp_path):
    """UnetGenerator unet_128 (networks.py define_G:70-72) — ignored-noise
    second forward arg and num_skips default."""
    oracle = refnet.define_G(3, 2, 8, 'unet_128', norm='instance',
                             use_dropout=False)
    net = nn.define_G(3, 2, 8, 'unet_128', 'instance', False)
    params = net.init(jax.random.PRNGKey(6))
    _load_ours(oracle, net, params, tmp_path, 'unet.pth')
    x = np.random.RandomState(6).randn(1, 128, 128, 3).astype(np.float32)
    ours = np.asarray(net.apply(params, jnp.asarray(x), nn.Ctx()))
    with torch.no_grad():
        theirs = _nhwc(oracle(_nchw(x), None))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
