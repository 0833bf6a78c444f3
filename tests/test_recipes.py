"""Smoke + behavior tests for every GAN recipe (tiny configs, CPU).

Each test builds the recipe through create_model (the real factory path),
runs a few optimizer steps on synthetic data, and checks: finite losses with
the reference's exact metric names, visuals keys, checkpoint files, and
test-time behavior.
"""

import os

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
    for sub in ('train', 'test', 'trainA', 'trainB'):
        d = root / sub
        d.mkdir()
        for i in range(3):
            arr = rng.randint(0, 255, (128, 128, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / ('%03d.png' % i)))
    return str(root)


def base_args(dataroot, ckpt, name, model, extra):
    return ['--dataroot', dataroot, '--name', name, '--model', model,
            '--dataset_mode', 'single', '--loadSize', '128',
            '--fineSize', '128', '--batchSize', '1',
            '--which_channel', 'rg_b', '--norm', 'instance',
            '--manualSeed', '0', '--checkpoints_dir', ckpt,
            '--display_id', '0', '--pool_size', '4'] + extra


def run_steps(opt, n=2, extra_inputs=()):
    model = create_model(opt)
    rng = np.random.RandomState(0)
    batch = {'A': rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32),
             'A_paths': ['x.png']}
    if 'B' in extra_inputs:
        batch['B'] = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
        batch['B_paths'] = ['y.png']
    errs = []
    for _ in range(n):
        model.set_input(batch)
        model.optimize_parameters()
        errs.append(model.get_current_errors())
    return model, errs


def check_finite(errs):
    for e in errs:
        for k, v in e.items():
            assert np.isfinite(v), (k, v)


CGAN_ARCH = ['--which_direction', 'AtoB', '--which_model_netG', 'unet_128',
             '--ngf', '8', '--which_model_netD', 'n_layers',
             '--n_layers_D', '2', '--ndf', '8', '--scale_factor', '1',
             '--lambda_D', '0.5', '--lambda_A', '10', '--noise_nc', '4',
             '--noiseSize', '4', '--no_lsgan']

TS_ARCH = ['--which_direction', 'AtoB', '--transform_1to2', 'bilinear_2',
           '--which_model_netG1', 'fcgan', '--n_layers_G1', '4',
           '--ngf1', '8', '--noiseSize1', '2', '--noise_nc1', '4',
           '--which_model_netD1', 'n_layers', '--n_layers_D1', '2',
           '--ndf1', '8', '--scale_factor1', '1', '--lambda_D1', '0.5',
           '--which_model_netG2', 'crn', '--n_layers_G2', '5',
           '--ngf2', '8', '--upsample_mode2', 'bilinear',
           '--which_model_netF2', 'unet_128', '--nff2', '8',
           '--noiseSize2', '2', '--noise_nc2', '4',
           '--which_model_netD2', 'n_layers', '--n_layers_D2', '2',
           '--ndf2', '8', '--scale_factor2', '1', '--lambda_D2', '0.5',
           '--no_lsgan1', '--no_lsgan2', '--no_dropout1']

CYC_ARCH = ['--which_direction', 'AtoB',
            '--which_model_netG1', 'unet_128', '--ngf1', '8',
            '--noiseSize1', '2', '--noise_nc1', '4',
            '--which_model_netG2', 'unet_128', '--ngf2', '8',
            '--noiseSize2', '2', '--noise_nc2', '4',
            '--which_model_netD1', 'n_layers', '--n_layers_D1', '2',
            '--ndf1', '8', '--scale_factor1', '1', '--lambda_D1', '0.5',
            '--no_lsgan1']


def test_cgan(dataroot, tmp_path):
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'cg', 'cgan',
        CGAN_ARCH + ['--weights', '2', '4']))
    model, errs = run_steps(opt)
    check_finite(errs)
    assert list(errs[0]) == ['G_GAN', 'G_L1', 'D_real', 'D_fake']
    assert set(model.get_current_visuals()) == {'real_A', 'fake_B', 'real_B'}
    model.save('latest')
    model.flush_checkpoints()
    assert os.path.exists(os.path.join(str(tmp_path), 'cg',
                                       'latest_net_G.pth'))


def test_cgan_auto_pack_equivalence(dataroot, tmp_path, monkeypatch):
    """SGAN_TPU_PHASE_D2's auto mode: bank_apply gates on the bank itself,
    so the cgan recipe inherits the one-pack-per-bank phase path with no
    recipe wiring; losses must match the pixel formulation."""
    from supervised_gan_tpu.models import common as cm
    arch = CGAN_ARCH + ['--n_layers_D', '2', '2', '--scale_factor', '1',
                        '2', '--lambda_D', '0.5', '0.4', '--ndf', '16',
                        '--weights', '2', '4']
    errs = {}
    for flag in (False, True):
        monkeypatch.setattr(cm, '_PACK_BANK', flag)
        opt = TrainOptions().parse(base_args(
            dataroot, str(tmp_path), 'cgp%d' % flag, 'cgan', arch))
        model, e_ = run_steps(opt)
        errs[flag] = e_
    for e0, e1 in zip(errs[False], errs[True]):
        for k in e0:
            np.testing.assert_allclose(e1[k], e0[k], rtol=5e-4, atol=1e-5)


def test_cgan_n_update_2(dataroot, tmp_path):
    """Engine resample path: n_update_D/G > 1 (regression: the G-resample
    branch once referenced an undefined symbol and crashed at trace time)."""
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'cgn', 'cgan',
        CGAN_ARCH + ['--n_update_G', '2', '--n_update_D', '2']))
    model, errs = run_steps(opt, n=1)
    check_finite(errs)


def test_cgan2(dataroot, tmp_path):
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'cg2', 'cgan2',
        CGAN_ARCH + ['--dataset_mode', 'unaligned',
                     '--pool_reject_prob', '0.3']))
    opt.dataset_mode = 'unaligned'
    model, errs = run_steps(opt, extra_inputs=('B',))
    check_finite(errs)
    assert list(errs[0]) == ['G_GAN', 'D_real', 'D_fake']
    vis = model.get_current_visuals()
    assert 'fake_B_fake_A' in vis and 'fake_A' in vis


def test_cgan_cycle(dataroot, tmp_path):
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'cgc', 'cgan_cycle', CYC_ARCH))
    model, errs = run_steps(opt)
    check_finite(errs)
    assert list(errs[0]) == ['G1', 'G2', 'D1']
    assert set(model.get_current_visuals()) == {'real_A', 'real_B', 'fake_B',
                                                'recon_A'}


def test_cgan2_cycle(dataroot, tmp_path):
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'cgc2', 'cgan2_cycle',
        CYC_ARCH + ['--dataset_mode', 'unaligned']))
    model, errs = run_steps(opt, extra_inputs=('B',))
    check_finite(errs)
    assert list(errs[0]) == ['G1', 'real_cycle', 'fake_cycle', 'D1']
    assert 'recon_fake_A' in model.get_current_visuals()


def test_cgan_causal(dataroot, tmp_path):
    import jax
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'cgz', 'cgan_causal',
        CYC_ARCH + ['--dataset_mode', 'unaligned', '--really_CausalGAN']))
    model, errs = run_steps(opt, extra_inputs=('B',))
    check_finite(errs)
    assert list(errs[0]) == ['G1', 'G2', 'D1']
    # LG must stay at initialization (zero-grad quirk reproduced)
    lg_after = jax.device_get(model.state['params']['LG'])
    model.save('latest')
    model.flush_checkpoints()
    assert os.path.exists(os.path.join(str(tmp_path), 'cgz',
                                       'latest_net_LG.pth'))


def test_twostage(dataroot, tmp_path):
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'ts', 'twostage',
        TS_ARCH + ['--GAN_losses_D2', 'real_fake', 'fake_fake',
                   '--GAN_losses_G2', 'real_fake', 'fake_fake']))
    model, errs = run_steps(opt)
    check_finite(errs)
    assert list(errs[0]) == ['G2_GAN', 'D2', 'G1_GAN', 'D1']
    model.test()
    assert model.fake_A.shape == (1, 64, 64, 2)
    assert model.fake_B_from_fake_A.shape == (1, 128, 128, 1)


def test_twostage_multiclass(dataroot, tmp_path):
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'tsm', 'twostage',
        TS_ARCH + ['--use_multi_class_GAN']))
    model, errs = run_steps(opt)
    check_finite(errs)


def test_twostage_cycle_fixed_noise_and_seq(dataroot, tmp_path):
    import jax
    ckpt = str(tmp_path)
    opt = TrainOptions().parse(base_args(
        dataroot, ckpt, 'tsc', 'twostage_cycle',
        TS_ARCH + ['--lambda_A', '10', '--lambda_B', '10',
                   '--lambda_A_cycle', '5', '--lambda_fake_cycle', '1',
                   '--use_fixed_noise1', '--noise_pool_size', '8']))
    model, errs = run_steps(opt)
    check_finite(errs)
    assert list(errs[0]) == ['G2_GAN', 'G2_real_cycle', 'G2_fake_cycle',
                             'D2', 'G1_GAN', 'D1']
    model.save('seq')
    model.flush_checkpoints()

    # sequential training: reload G1+D1 from the 'seq' checkpoint
    opt2 = TrainOptions().parse(base_args(
        dataroot, ckpt, 'tsc2', 'twostage_cycle',
        TS_ARCH + ['--sequential_train', '--which_model_to_load', 'G1', 'D1',
                   '--pretrained_model_dir', os.path.join(ckpt, 'tsc'),
                   '--which_epoch_sequential', 'seq']))
    model2 = create_model(opt2)
    g1_a = jax.device_get(model.state['params']['G1'])
    g1_b = jax.device_get(model2.state['params']['G1'])
    flat_a = jax.tree_util.tree_leaves(g1_a)
    flat_b = jax.tree_util.tree_leaves(g1_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_twostage_cycle_phase_f2_equivalence(dataroot, tmp_path, monkeypatch):
    """SGAN_TPU_PHASE_F2 keeps the F2 cycle outputs phase-major and
    space_to_phase's the BCE targets instead — the losses are elementwise
    means, so the whole train step must match the pixel-space formulation
    to fp tolerance, and the visuals must interleave back."""
    from supervised_gan_tpu.models import twostage_cycle as tsc
    lam = ['--lambda_A', '10', '--lambda_B', '10',
           '--lambda_A_cycle', '5', '--lambda_fake_cycle', '1']
    errs = {}
    vis = {}
    for flag in (False, True):
        monkeypatch.setattr(tsc, '_PHASE_F2', flag)
        opt = TrainOptions().parse(base_args(
            dataroot, str(tmp_path), 'tscp%d' % flag, 'twostage_cycle',
            TS_ARCH + lam))
        model, e_ = run_steps(opt)
        errs[flag] = e_
        vis[flag] = model.get_current_visuals()
    for e0, e1 in zip(errs[False], errs[True]):
        for k in e0:
            np.testing.assert_allclose(e1[k], e0[k], rtol=5e-4, atol=1e-5)
    for k in vis[False]:
        assert vis[False][k].shape == vis[True][k].shape
        np.testing.assert_allclose(vis[True][k].astype(np.float32),
                                   vis[False][k].astype(np.float32),
                                   atol=2.0)  # uint8 images, fp rounding


def test_twostage_cycle_phase_g1_equivalence(dataroot, tmp_path, monkeypatch):
    """SGAN_TPU_PHASE_G1 keeps fake_A phase-major through the taps, pool1
    and the D1 bank (stem_conv_phase at scale 1, blur_downsample_phase at
    scale 2); the pixel formulation must match to fp tolerance and the
    visuals must interleave back."""
    from supervised_gan_tpu.models import twostage_cycle as tsc
    # D1 bank with BOTH front-ends (scale 1 -> phase stem, scale 2 ->
    # phase blur); ndf1 16 so the stem passes stem_phase_supported
    arch = TS_ARCH + ['--n_layers_D1', '2', '2', '--scale_factor1', '1',
                      '2', '--lambda_D1', '0.5', '0.4', '--ndf1', '16',
                      '--lambda_A', '10', '--lambda_B', '10',
                      '--lambda_A_cycle', '5', '--lambda_fake_cycle', '1',
                      '--GAN_losses_D2', 'real_fake', 'fake_fake',
                      '--GAN_losses_G2', 'real_fake', 'fake_fake']
    errs = {}
    vis = {}
    for flag in (False, True):
        monkeypatch.setattr(tsc, '_PHASE_G1', flag)
        opt = TrainOptions().parse(base_args(
            dataroot, str(tmp_path), 'tscg%d' % flag, 'twostage_cycle',
            arch))
        model, e_ = run_steps(opt)
        if flag:
            assert model._phase_g1 and model._g1_s == 2
        errs[flag] = e_
        vis[flag] = model.get_current_visuals()
    for e0, e1 in zip(errs[False], errs[True]):
        for k in e0:
            np.testing.assert_allclose(e1[k], e0[k], rtol=5e-4, atol=1e-5)
    for k in vis[False]:
        assert vis[False][k].shape == vis[True][k].shape
        np.testing.assert_allclose(vis[True][k].astype(np.float32),
                                   vis[False][k].astype(np.float32),
                                   atol=2.0)


def test_twostage_cycle_phase_d2_equivalence(dataroot, tmp_path,
                                             monkeypatch):
    """SGAN_TPU_PHASE_D2 packs the D2 pair input once per bank apply and
    every member consumes it phase-major; losses/visuals must match the
    per-stem pixel formulation."""
    from supervised_gan_tpu.models import twostage_cycle as tsc
    arch = TS_ARCH + ['--n_layers_D2', '2', '2', '--scale_factor2', '1',
                      '2', '--lambda_D2', '0.5', '0.4', '--ndf2', '16',
                      '--lambda_A', '10', '--lambda_B', '10',
                      '--lambda_A_cycle', '5', '--lambda_fake_cycle', '1',
                      '--GAN_losses_D2', 'real_fake', 'fake_fake',
                      '--GAN_losses_G2', 'real_fake', 'fake_fake']
    errs = {}
    for flag in (False, True):
        monkeypatch.setattr(tsc, '_PHASE_D2', flag)
        opt = TrainOptions().parse(base_args(
            dataroot, str(tmp_path), 'tscd%d' % flag, 'twostage_cycle',
            arch))
        model, e_ = run_steps(opt)
        errs[flag] = e_
    for e0, e1 in zip(errs[False], errs[True]):
        for k in e0:
            np.testing.assert_allclose(e1[k], e0[k], rtol=5e-4, atol=1e-5)


def test_twostage_phase_g1_equivalence(dataroot, tmp_path, monkeypatch):
    """The non-cycle twostage recipe under SGAN_TPU_PHASE_G1 (same pipeline
    as twostage_cycle's, through its own train step)."""
    from supervised_gan_tpu.models import twostage as ts
    arch = TS_ARCH + ['--n_layers_D1', '2', '2', '--scale_factor1', '1',
                      '2', '--lambda_D1', '0.5', '0.4', '--ndf1', '16',
                      '--GAN_losses_D2', 'real_fake', 'fake_fake',
                      '--GAN_losses_G2', 'real_fake', 'fake_fake']
    errs = {}
    vis = {}
    for flag in (False, True):
        monkeypatch.setattr(ts, '_PHASE_G1', flag)
        opt = TrainOptions().parse(base_args(
            dataroot, str(tmp_path), 'tsg%d' % flag, 'twostage', arch))
        model, e_ = run_steps(opt)
        if flag:
            assert model._phase_g1 and model._g1_s == 2
        errs[flag] = e_
        vis[flag] = model.get_current_visuals()
    for e0, e1 in zip(errs[False], errs[True]):
        for k in e0:
            np.testing.assert_allclose(e1[k], e0[k], rtol=5e-4, atol=1e-5)
    for k in vis[False]:
        np.testing.assert_allclose(vis[True][k].astype(np.float32),
                                   vis[False][k].astype(np.float32),
                                   atol=2.0)


def test_twostage_factd(dataroot, tmp_path):
    opt = TrainOptions().parse(base_args(
        dataroot, str(tmp_path), 'tsf', 'twostage_factd',
        TS_ARCH + ['--GAN_losses_D2', 'real_fake',
                   '--GAN_losses_G2', 'real_fake']))
    model, errs = run_steps(opt)
    check_finite(errs)
    assert list(errs[0]) == ['G2_GAN', 'D2', 'G1_GAN', 'D1']
