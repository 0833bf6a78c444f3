"""End-to-end fcgan slice: tiny config, synthetic data, real train steps.

Covers the reference gate for build-plan step 4 (SURVEY.md §7): the
UnsupervisedGAN/JointGAN recipe trains, losses move, checkpoints round-trip,
and test-time sampling is deterministic under the seed.
"""

import os
import sys
import subprocess

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e/compile tier; deselect with -m 'not slow'

from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from supervised_gan_tpu.options import TrainOptions, TestOptions
from supervised_gan_tpu.models import create_model
from supervised_gan_tpu.data import CreateDataLoader


@pytest.fixture(scope='module')
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp('vnc')
    for phase in ('train', 'test'):
        d = root / phase
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(4):
            arr = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / ('%03d.png' % i)))
    return str(root)


def fcgan_args(dataroot, ckpt_dir, extra=()):
    return ['--dataroot', dataroot, '--name', 'fcgan_test',
            '--model', 'fcgan', '--which_direction', 'A',
            '--dataset_mode', 'single', '--loadSize', '32',
            '--fineSize', '32', '--batchSize', '1',
            '--which_model_netG', 'deconv', '--n_layers_G', '3',
            '--ngf', '8', '--which_model_netD', 'n_layers',
            '--n_layers_D', '2', '2', '--ndf', '8',
            '--scale_factor', '1', '2', '--lambda_D', '0.5', '0.4',
            '--noise_nc', '4', '--noiseSize', '2', '--norm', 'instance',
            '--no_dropout', '--n_update_G', '2', '--no_lsgan',
            '--which_channel', 'rg_b', '--manualSeed', '0',
            '--checkpoints_dir', ckpt_dir, '--display_id', '0',
            '--pool_size', '8'] + list(extra)


@pytest.fixture(scope='module')
def trained(dataroot, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp('ckpt'))
    opt = TrainOptions().parse(fcgan_args(dataroot, ckpt))
    model = create_model(opt)
    loader = CreateDataLoader(opt)
    losses = []
    for i, data in enumerate(loader):
        model.set_input(data)
        model.optimize_parameters()
        losses.append(model.get_current_errors())
    model.save('latest')
    model.flush_checkpoints()
    return dict(model=model, opt=opt, ckpt=ckpt, losses=losses)


def test_fcgan_phase_g_equivalence(dataroot, tmp_path, monkeypatch):
    """SGAN_TPU_PHASE_G1 on the fcgan recipe: G's phase-major output feeds
    the pool and both D front-ends (stem + blur) with no pixel interleave
    inside the step; losses and visuals must match the pixel formulation."""
    from supervised_gan_tpu.models import fcgan as fc
    errs = {}
    vis = {}
    for flag in (False, True):
        monkeypatch.setattr(fc, '_PHASE_G', flag)
        ckpt = str(tmp_path / ('ck%d' % flag))
        opt = TrainOptions().parse(fcgan_args(
            dataroot, ckpt, extra=['--ndf', '16', '--name', 'fcph']))
        model = create_model(opt)
        if flag:
            assert model._phase_g and model._g_s == 2
        loader = CreateDataLoader(opt)
        e_ = []
        for data in loader:
            model.set_input(data)
            model.optimize_parameters()
            e_.append(model.get_current_errors())
        errs[flag] = e_
        vis[flag] = model.get_current_visuals()
    for e0, e1 in zip(errs[False], errs[True]):
        for k in e0:
            np.testing.assert_allclose(e1[k], e0[k], rtol=5e-4, atol=1e-5)
    for k in vis[False]:
        np.testing.assert_allclose(vis[True][k].astype(np.float32),
                                   vis[False][k].astype(np.float32),
                                   atol=2.0)


def test_training_runs_and_losses_finite(trained):
    for e in trained['losses']:
        for k, v in e.items():
            assert np.isfinite(v), (k, v)
    assert set(trained['losses'][0]) == {'G_GAN', 'D_real', 'D_fake'}


def test_visuals_shapes(trained):
    vis = trained['model'].get_current_visuals()
    assert set(vis) == {'real_label', 'real_image', 'fake_label',
                        'fake_image'}
    for v in vis.values():
        assert v.shape == (32, 32, 3) and v.dtype == np.uint8


def test_checkpoints_written(trained):
    d = os.path.join(trained['ckpt'], 'fcgan_test')
    for f in ('latest_net_G.pth', 'latest_net_D_0.pth', 'latest_net_D_1.pth',
              'latest_state.pkl', 'opt.txt'):
        assert os.path.exists(os.path.join(d, f)), f


def test_params_change_during_training(dataroot, tmp_path):
    import jax
    ckpt = str(tmp_path / 'ckpt2')
    opt = TrainOptions().parse(fcgan_args(dataroot, ckpt))
    model = create_model(opt)
    before = jax.device_get(model.state['params']['G'])
    loader = CreateDataLoader(opt)
    data = next(iter(loader))
    model.set_input(data)
    model.optimize_parameters()
    after = jax.device_get(model.state['params']['G'])
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    changed = any(np.abs(a - b).max() > 0 for a, b in zip(flat_a, flat_b))
    assert changed


def strip_train_flags(args):
    out, skip = [], 0
    for i, a in enumerate(args):
        if skip:
            skip -= 1
            continue
        if a == '--lambda_D':
            skip = 2
        elif a == '--n_update_G':
            skip = 1
        elif a == '--pool_size':
            skip = 1
        elif a == '--no_lsgan':
            pass
        else:
            out.append(a)
    return out


def test_test_time_sampling_deterministic(trained, dataroot, tmp_path):
    ckpt = trained['ckpt']
    args = strip_train_flags(
        fcgan_args(dataroot, ckpt, extra=['--results_dir',
                                          str(tmp_path / 'r')]))
    opt1 = TestOptions().parse(args)
    m1 = create_model(opt1)
    m1.test()
    f1 = np.asarray(m1.fake)
    opt2 = TestOptions().parse(args)
    m2 = create_model(opt2)
    m2.test()
    f2 = np.asarray(m2.fake)
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (1, 32, 32, 3)


def test_lr_decay(trained):
    model = trained['model']
    lr0 = model.old_lr
    model.update_learning_rate()
    expected = lr0 - model.opt.lr / model.opt.niter_decay
    assert abs(model.old_lr - expected) < 1e-12
