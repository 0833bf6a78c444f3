"""Extra parity tests: discriminator numerics vs a torch oracle through the
.pth boundary, the aligned-dataset model path, TestModel, and fcgan latent
interpolation."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from supervised_gan_tpu import nn
from supervised_gan_tpu.utils import pth as pthio


def torch_patchgan(input_nc, ndf, n_layers, use_sigmoid):
    """Torch PatchGAN oracle (standard pix2pix stack, instance norm,
    py2 padw=1) used to validate our D numerics through the .pth boundary."""
    layers = [torch.nn.Conv2d(input_nc, ndf, 4, 2, 1),
              torch.nn.LeakyReLU(0.2)]
    nf = 1
    for n in range(1, n_layers):
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
    m = torch.nn.Module()
    m.model = torch.nn.Sequential(*layers)
    return m


def test_discriminator_numerics_vs_torch(tmp_path):
    d = nn.define_D(3, 8, 'n_layers', n_layers_D=3, norm='instance',
                    use_sigmoid=True, scale_factor=1)
    params = d.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'd.pth')
    pthio.save_pth(path, d, params)

    oracle = torch_patchgan(3, 8, 3, True)
    oracle.load_state_dict(torch.load(path, map_location='cpu',
                                      weights_only=True))
    oracle.train()

    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    ours = np.asarray(d.apply(params, jnp.asarray(x), nn.Ctx()))
    with torch.no_grad():
        theirs = oracle.model(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_discriminator_multiscale_numerics_vs_torch(tmp_path):
    """scale_factor=2 path: our separable-matmul blur front-end must match
    the torch depthwise fspecial blur + stride subsample composition."""
    from supervised_gan_tpu.ops import matlab_gauss2d
    import torch.nn.functional as F

    d = nn.define_D(3, 8, 'n_layers', n_layers_D=2, norm='instance',
                    use_sigmoid=True, scale_factor=2)
    params = d.init(jax.random.PRNGKey(1))
    path = str(tmp_path / 'd2.pth')
    pthio.save_pth(path, d, params)
    oracle = torch_patchgan(3, 8, 2, True)
    oracle.load_state_dict(torch.load(path, map_location='cpu',
                                      weights_only=True))

    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    ours = np.asarray(d.apply(params, jnp.asarray(x), nn.Ctx()))

    g = matlab_gauss2d((5, 5), 1)
    filt = np.zeros((3, 3, 5, 5), np.float32)
    for i in range(3):
        filt[i, i] = g
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    xt = F.conv2d(xt, torch.from_numpy(filt), padding=2)
    xt = F.avg_pool2d(xt, kernel_size=1, stride=2)
    with torch.no_grad():
        theirs = oracle.model(xt).numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-3)


def _mkimgs(root, sub, n=3, size=128, wide=False):
    from PIL import Image
    d = root / sub
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    shape = (size, size * 2 if wide else size, 3)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, shape, dtype=np.uint8)
                        ).save(str(d / ('%03d.png' % i)))


def test_cgan_aligned_dataset_path(tmp_path):
    """aligned mode: A|B side-by-side images, coupled crop/flip."""
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model
    from supervised_gan_tpu.data import CreateDataLoader
    _mkimgs(tmp_path / 'data', 'train', wide=True)
    opt = TrainOptions().parse(
        ['--dataroot', str(tmp_path / 'data'), '--name', 'al',
         '--model', 'cgan', '--which_direction', 'AtoB',
         '--dataset_mode', 'aligned', '--loadSize', '128',
         '--fineSize', '128', '--batchSize', '1',
         '--which_model_netG', 'unet_128', '--ngf', '8',
         '--which_model_netD', 'n_layers', '--n_layers_D', '2',
         '--ndf', '8', '--scale_factor', '1', '--lambda_D', '0.5',
         '--lambda_A', '10', '--noise_nc', '4', '--noiseSize', '4',
         '--norm', 'instance', '--no_lsgan', '--which_channel', 'rg_b',
         '--manualSeed', '0', '--checkpoints_dir', str(tmp_path / 'ck'),
         '--display_id', '0', '--no_flip'])
    model = create_model(opt)
    loader = CreateDataLoader(opt)
    data = next(iter(loader))
    assert data['A'].shape == (1, 128, 128, 3)
    assert data['B'].shape == (1, 128, 128, 3)
    model.set_input(data)
    assert model.input_A.shape == (1, 128, 128, 2)
    assert model.input_B.shape == (1, 128, 128, 1)
    model.optimize_parameters()
    for v in model.get_current_errors().values():
        assert np.isfinite(v)


def test_test_model(tmp_path):
    """TestModel: bare A->B inference from a saved G."""
    from supervised_gan_tpu.options import TestOptions
    from supervised_gan_tpu.models import create_model
    _mkimgs(tmp_path / 'data', 'test')
    # save a resnet G checkpoint first
    net = nn.define_G(3, 3, 8, 'resnet_6blocks', 'instance', False)
    params = net.init(jax.random.PRNGKey(0))
    ck = tmp_path / 'ck' / 'tm'
    ck.mkdir(parents=True)
    pthio.save_pth(str(ck / 'latest_net_G.pth'), net, params)
    opt = TestOptions().parse(
        ['--dataroot', str(tmp_path / 'data'), '--name', 'tm',
         '--model', 'test', '--dataset_mode', 'single',
         '--loadSize', '64', '--fineSize', '64', '--batchSize', '1',
         '--which_model_netG', 'resnet_6blocks', '--ngf', '8',
         '--input_nc', '3', '--output_nc', '3', '--norm', 'instance',
         '--no_dropout', '--manualSeed', '0',
         '--checkpoints_dir', str(tmp_path / 'ck'), '--display_id', '0'])
    model = create_model(opt)
    batch = {'A': np.zeros((1, 64, 64, 3), np.float32), 'A_paths': ['x.png']}
    model.set_input(batch)
    model.test()
    vis = model.get_current_visuals()
    assert set(vis) == {'real_A', 'fake_B'}


def test_fcgan_interpolation(tmp_path):
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model
    _mkimgs(tmp_path / 'data', 'train', size=32)
    opt = TrainOptions().parse(
        ['--dataroot', str(tmp_path / 'data'), '--name', 'ip',
         '--model', 'fcgan', '--which_direction', 'A',
         '--dataset_mode', 'single', '--loadSize', '32', '--fineSize', '32',
         '--batchSize', '1', '--which_model_netG', 'deconv',
         '--n_layers_G', '3', '--ngf', '8', '--which_model_netD', 'n_layers',
         '--n_layers_D', '2', '--ndf', '8', '--scale_factor', '1',
         '--lambda_D', '1', '--noise_nc', '4', '--noiseSize', '2',
         '--norm', 'instance', '--no_dropout', '--which_channel', 'rg_b',
         '--manualSeed', '0', '--checkpoints_dir', str(tmp_path / 'ck'),
         '--display_id', '0'])
    model = create_model(opt)
    model.set_input({'A': np.zeros((1, 32, 32, 3), np.float32),
                     'A_paths': ['x.png']})
    model.interpolate(0.0)
    f0 = np.asarray(model.fake)
    model.interpolate(1.0)
    f1 = np.asarray(model.fake)
    model.interpolate(0.5)
    fm = np.asarray(model.fake)
    assert np.abs(f0 - f1).max() > 1e-5
    assert np.abs(fm - f0).max() > 1e-6 and np.abs(fm - f1).max() > 1e-6
