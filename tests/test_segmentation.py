"""Segmentation model tests: train steps, metric accumulation, val protocol."""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e/compile tier; deselect with -m 'not slow'

from PIL import Image

from supervised_gan_tpu.options import TrainOptions
from supervised_gan_tpu.models import create_model


@pytest.fixture(scope='module')
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp('vnc')
    rng = np.random.RandomState(0)
    for sub in ('train', 'val', 'test'):
        d = root / sub
        d.mkdir()
        for i in range(3):
            arr = np.zeros((128, 128, 3), np.uint8)
            arr[..., 0] = (rng.rand(128, 128) > 0.6) * 255
            arr[..., 1] = 255 - arr[..., 0]
            arr[..., 2] = rng.randint(0, 255, (128, 128))
            Image.fromarray(arr).save(str(d / ('%03d.png' % i)))
    return str(root)


SEG_ARGS = ['--which_direction', 'AtoB', '--which_channel', 'b_rg',
            '--which_model_netG', 'unet_128', '--ngf', '8',
            '--noise_nc', '4', '--noiseSize', '4', '--norm', 'instance',
            '--which_metric', 'RandScore', 'meanIU',
            '--lambda_A', '1']


def base(dataroot, ckpt, name, model, extra):
    return ['--dataroot', dataroot, '--name', name, '--model', model,
            '--dataset_mode', 'single', '--loadSize', '128',
            '--fineSize', '128', '--batchSize', '1', '--norm', 'instance',
            '--manualSeed', '0', '--checkpoints_dir', ckpt,
            '--display_id', '0'] + extra


def make_batch():
    rng = np.random.RandomState(0)
    arr = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    # make label channels one-hot-ish
    arr[..., 0] = np.sign(arr[..., 0])
    arr[..., 1] = -arr[..., 0]
    return {'A': arr, 'A_paths': ['x.png']}


def test_segmentation_no_D(dataroot, tmp_path):
    opt = TrainOptions().parse(base(
        dataroot, str(tmp_path), 'seg', 'segmentation',
        SEG_ARGS + ['--which_model_netD', 'None']))
    model = create_model(opt)
    model.reset_accs()
    batch = make_batch()
    for _ in range(2):
        model.set_input(batch)
        model.optimize_parameters()
        model.accum_accs()
    errs = model.get_current_errors()
    assert list(errs) == ['G_CE'] and np.isfinite(errs['G_CE'])
    accs = model.get_current_accs()
    assert set(accs) == {'RandScore', 'meanIU'}
    assert 0 <= accs['meanIU'] <= 1
    vis = model.get_current_visuals()
    assert set(vis) == {'image', 'label', 'prediction'}


def test_segmentation_with_D_and_sigmoid(dataroot, tmp_path):
    opt = TrainOptions().parse(base(
        dataroot, str(tmp_path), 'segd', 'segmentation',
        SEG_ARGS + ['--which_model_netD', 'n_layers', '--n_layers_D', '2',
                    '--ndf', '8', '--scale_factor', '1', '--lambda_D', '0.5',
                    '--no_lsgan', '--use_sigmoid_ss',
                    '--weights', '1', '2']))
    model = create_model(opt)
    batch = make_batch()
    model.set_input(batch)
    model.optimize_parameters()
    errs = model.get_current_errors()
    assert list(errs) == ['G_CE', 'G_GAN']
    for v in errs.values():
        assert np.isfinite(v)


def test_segmentation_val_mode_and_ce(dataroot, tmp_path):
    opt = TrainOptions().parse(base(
        dataroot, str(tmp_path), 'segv', 'segmentation',
        SEG_ARGS + ['--which_model_netD', 'None', '--noiseSizeVal', '2']))
    model = create_model(opt)
    model.set_input(make_batch())
    model.reset_accs()
    model.forward(val_mode=True)
    model.accum_accs()
    model.compute_cross_entropy_loss()
    assert np.isfinite(model.get_current_errors()['G_CE'])
    assert model.get_current_accs()['meanIU'] >= 0


def test_segmentation_background_onehot(dataroot, tmp_path):
    opt = TrainOptions().parse(base(
        dataroot, str(tmp_path), 'segb', 'segmentation',
        ['--which_direction', 'AtoB', '--which_channel', 'b_r',
         '--which_model_netG', 'unet_128', '--ngf', '8',
         '--noise_nc', '4', '--noiseSize', '4',
         '--which_metric', 'meanIU', '--which_model_netD', 'None',
         '--add_background_onehot', '--add_background_onehot_acc']))
    model = create_model(opt)
    assert model.num_classes == 2
    model.reset_accs()
    model.set_input(make_batch())
    model.optimize_parameters()
    model.accum_accs()
    assert np.isfinite(model.get_current_errors()['G_CE'])


def test_segmentation_cycle(dataroot, tmp_path):
    opt = TrainOptions().parse(base(
        dataroot, str(tmp_path), 'segc', 'segmentation_cycle',
        ['--which_direction', 'AtoB', '--which_channel', 'b_rg',
         '--which_model_netG1', 'unet_128', '--ngf1', '8',
         '--noiseSize1', '4', '--noise_nc1', '4',
         '--which_model_netG2', 'unet_128', '--ngf2', '8',
         '--noiseSize2', '4', '--noise_nc2', '4',
         '--which_model_netD2', 'n_layers', '--n_layers_D2', '2',
         '--ndf2', '8', '--scale_factor2', '1', '--lambda_D2', '0.5',
         '--no_lsgan2', '--which_metric', 'meanIU',
         '--lambda_A', '10', '--lambda_B', '1', '--lambda_A_cycle', '1']))
    model = create_model(opt)
    model.reset_accs()
    batch = make_batch()
    for _ in range(2):
        model.set_input(batch)
        model.optimize_parameters()
        model.accum_accs()
    errs = model.get_current_errors()
    assert list(errs) == ['G_CE', 'G_GAN']
    vis = model.get_current_visuals()
    assert 'recon' in vis
    model.save('latest')
    model.flush_checkpoints()
    model.test()
    assert model.fake_B.shape == (1, 128, 128, 2)


def test_exec_train_ss_then_test_ss(dataroot, tmp_path, monkeypatch):
    """Drive the REAL train_ss.py and test_ss.py entry points end-to-end
    (regression: test_ss.py:46 calls model.get_image_paths(), which was
    missing from the BaseModel protocol — every per-image save path
    crashed for cgan-style recipes)."""
    import sys
    import train_ss as train_ss_entry
    import test_ss as test_ss_entry
    common = ['--dataroot', dataroot, '--name', 'exec_ss',
              '--model', 'segmentation', '--dataset_mode', 'single',
              '--loadSize', '128', '--fineSize', '128', '--batchSize', '1',
              '--manualSeed', '0', '--display_id', '0',
              '--checkpoints_dir', str(tmp_path / 'ck')]
    # SEG_ARGS ends with the train-only --lambda_A 1 (TestOptions rejects it)
    args = common + SEG_ARGS[:-2]
    monkeypatch.setattr(sys, 'argv', ['train_ss.py'] + common + SEG_ARGS + [
        '--niter', '1', '--niter_decay', '1', '--print_freq', '2',
        '--save_epoch_freq', '2', '--nThreads', '1'])
    train_ss_entry.main()
    assert (tmp_path / 'ck' / 'exec_ss' / 'latest_net_G.pth').exists()
    monkeypatch.setattr(sys, 'argv', ['test_ss.py'] + args + [
        '--results_dir', str(tmp_path / 'res'), '--how_many', '2',
        '--which_epoch', 'latest', '--phase', 'test',
        '--serial_batches', '--no_flip', '--no_rotate'])
    test_ss_entry.main()
    imgs = list((tmp_path / 'res' / 'exec_ss' / 'test_latest'
                 / 'images').glob('*.png'))
    assert imgs, 'test_ss saved no per-image results'
