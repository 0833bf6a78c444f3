"""Checkpoint interop tests: torch .pth round-trip with numerics parity.

Builds a torch oracle net layer-by-layer from the same config, loads our
exported .pth into it, and checks the torch forward matches ours — the
strongest possible evidence that layout conversion (HWIO<->OIHW, convT
flips) is lossless.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from supervised_gan_tpu import nn
from supervised_gan_tpu.utils import pth as pthio


def torch_fcgan(noise_nc, input_nc, ngf, n_layers, use_fcn):
    """Independent torch oracle mirroring FCGANGenerator's structure
    (this mirrors the published architecture, used here only as a test
    oracle for checkpoint-layout parity)."""
    layers = []
    nf = min(2 ** (n_layers - 1), 8)
    if use_fcn:
        layers.append(torch.nn.ConvTranspose2d(noise_nc, ngf * nf, 4, 2, 1,
                                               bias=False))
    else:
        layers.append(torch.nn.ConvTranspose2d(noise_nc, ngf * nf, 4, 1, 0,
                                               bias=False))
    layers += [torch.nn.BatchNorm2d(ngf * nf), torch.nn.ReLU()]
    for n in range(1, n_layers):
        prev, nf = nf, min(2 ** (n_layers - n - 1), 8)
        layers += [torch.nn.ConvTranspose2d(ngf * prev, ngf * nf, 4, 2, 1),
                   torch.nn.BatchNorm2d(ngf * nf), torch.nn.ReLU()]
    layers.append(torch.nn.ConvTranspose2d(ngf, input_nc, 4, 2, 1,
                                           bias=False))
    m = torch.nn.Module()
    m.model = torch.nn.Sequential(*layers)
    return m


def test_pth_roundtrip_numerics(tmp_path):
    net = nn.define_G(2, 0, 8, 'fcgan', 'instance', False, n_layers_G=3,
                      use_fcn=True, noise_nc=4)
    params = net.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'g.pth')
    pthio.save_pth(path, net, params)

    oracle = torch_fcgan(4, 2, 8, 3, True)
    sd = torch.load(path, map_location='cpu', weights_only=True)
    oracle.load_state_dict(sd)
    oracle.train()  # batch statistics, like the reference

    noise = np.random.RandomState(0).randn(1, 4, 4, 4).astype(np.float32)
    ours = net.apply(params, jnp.asarray(noise), nn.Ctx(jax.random.PRNGKey(1)))
    with torch.no_grad():
        theirs = torch.tanh(oracle.model(
            torch.from_numpy(np.transpose(noise, (0, 3, 1, 2)))))
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-4)


def test_pth_import_back(tmp_path):
    net = nn.define_G(2, 0, 8, 'fcgan', 'instance', False, n_layers_G=3,
                      use_fcn=True, noise_nc=4)
    params = net.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'g.pth')
    pthio.save_pth(path, net, params)
    params2 = pthio.load_pth(path, net)
    flat1 = pthio._flatten(params)
    flat2 = pthio._flatten(params2)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]),
                                   np.asarray(flat2[k]), rtol=1e-6)


def test_pth_unet_roundtrip(tmp_path):
    # deep nested Sequential naming (unet_128)
    net = nn.define_G(1, 2, 8, 'unet_128', 'instance', True, noise_nc=4)
    params = net.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'f2.pth')
    pthio.save_pth(path, net, params)
    params2 = pthio.load_pth(path, net)
    flat1, flat2 = pthio._flatten(params), pthio._flatten(params2)
    assert set(flat1) == set(flat2)
    # spot-check deep nesting keys exist in torch naming convention
    sd = torch.load(path, map_location='cpu', weights_only=True)
    assert any(k.startswith('model.1.model.') for k in sd)


def test_full_state_roundtrip(tmp_path):
    state = {'a': jnp.arange(5.0), 'b': {'c': jnp.ones((2, 2))}}
    p = str(tmp_path / 's.pkl')
    pthio.save_state(p, state)
    loaded = pthio.load_state(p)
    np.testing.assert_array_equal(loaded['a'], np.arange(5.0))
    np.testing.assert_array_equal(loaded['b']['c'], np.ones((2, 2)))
