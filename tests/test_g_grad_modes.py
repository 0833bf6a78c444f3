"""The two generator-gradient forms (recompute vs vjp-recorded) are the
same math at the same linearization point — metrics must agree bitwise-ish.
(The vjp form is what runs on TPU when Pallas conv kernels are active,
since XLA cannot CSE opaque custom-calls; see models/common.py.)"""

import os

import numpy as np

from supervised_gan_tpu.options import TrainOptions
from supervised_gan_tpu.models import create_model

import pytest
pytestmark = pytest.mark.slow  # heavy e2e/compile tier; deselect with -m 'not slow'



def _run_steps(tmp_path, mode, n=3):
    os.environ['SGAN_TPU_G_GRAD'] = mode
    try:
        opt = TrainOptions().parse(
            ['--dataroot', '/tmp/unused', '--name', 'gg_%s' % mode,
             '--model', 'twostage_cycle', '--which_direction', 'AtoB',
             '--dataset_mode', 'single', '--loadSize', '64',
             '--fineSize', '64', '--transform_1to2', 'bilinear_2',
             '--batchSize', '1', '--which_channel', 'rg_b',
             '--which_model_netG1', 'fcgan', '--n_layers_G1', '3',
             '--ngf1', '4', '--noiseSize1', '1', '--noise_nc1', '4',
             '--which_model_netD1', 'n_layers', '--n_layers_D1', '2',
             '--ndf1', '4', '--scale_factor1', '1', '--lambda_D1', '0.5',
             '--which_model_netG2', 'crn', '--n_layers_G2', '5',
             '--ngf2', '4', '--upsample_mode2', 'bilinear',
             '--which_model_netF2', 'unet_128', '--nff2', '4',
             '--noiseSize2', '1', '--noise_nc2', '4',
             '--which_model_netD2', 'n_layers', '--n_layers_D2', '2',
             '--ndf2', '4', '--scale_factor2', '1', '--lambda_D2', '0.5',
             '--norm', 'instance', '--no_dropout1', '--no_lsgan1',
             '--no_lsgan2', '--manualSeed', '0', '--pool_size', '4',
             '--n_update_G', '2',
             '--checkpoints_dir', str(tmp_path / mode), '--display_id', '0'])
        model = create_model(opt)
        rng = np.random.RandomState(0)
        batch = {'A': rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32),
                 'A_paths': ['x.png']}
        out = []
        for _ in range(n):
            model.set_input(batch)
            model.optimize_parameters()
            out.append(dict(model.get_current_errors()))
        return out
    finally:
        del os.environ['SGAN_TPU_G_GRAD']


def test_vjp_matches_recompute(tmp_path):
    a = _run_steps(tmp_path, 'recompute')
    b = _run_steps(tmp_path, 'vjp')
    for ea, eb in zip(a, b):
        assert set(ea) == set(eb)
        for k in ea:
            np.testing.assert_allclose(ea[k], eb[k], rtol=2e-4, atol=1e-6,
                                       err_msg=k)
