"""End-to-end determinism: identical seeds give identical training metrics
and parameters across independent model builds (the TPU-native replacement
for the reference's global-seed contract, SURVEY.md §4)."""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e/compile tier; deselect with -m 'not slow'

from PIL import Image

import jax

from supervised_gan_tpu.options import TrainOptions
from supervised_gan_tpu.models import create_model


@pytest.fixture(scope='module')
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp('vnc')
    d = root / 'train'
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(str(d / ('%d.png' % i)))
    return str(root)


def build_and_run(dataroot, ckpt, seed, steps=3):
    opt = TrainOptions().parse(
        ['--dataroot', dataroot, '--name', 'det%d' % seed, '--model',
         'fcgan', '--which_direction', 'A', '--dataset_mode', 'single',
         '--loadSize', '32', '--fineSize', '32', '--batchSize', '1',
         '--which_model_netG', 'deconv', '--n_layers_G', '3', '--ngf', '8',
         '--which_model_netD', 'n_layers', '--n_layers_D', '2', '--ndf', '8',
         '--scale_factor', '1', '--lambda_D', '1', '--noise_nc', '4',
         '--noiseSize', '2', '--norm', 'instance', '--no_dropout',
         '--no_lsgan', '--which_channel', 'rg_b',
         '--manualSeed', str(seed), '--checkpoints_dir', ckpt,
         '--display_id', '0', '--pool_size', '4'])
    model = create_model(opt)
    rng = np.random.RandomState(7)
    batch = {'A': rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
             'A_paths': ['x.png']}
    errs = []
    for _ in range(steps):
        model.set_input(batch)
        model.optimize_parameters()
        errs.append(model.get_current_errors())
    return model, errs


def test_same_seed_identical_training(dataroot, tmp_path):
    m1, e1 = build_and_run(dataroot, str(tmp_path / 'a'), seed=3)
    m2, e2 = build_and_run(dataroot, str(tmp_path / 'b'), seed=3)
    for a, b in zip(e1, e2):
        for k in a:
            assert a[k] == b[k], (k, a[k], b[k])
    p1 = jax.tree_util.tree_leaves(jax.device_get(m1.state['params']))
    p2 = jax.tree_util.tree_leaves(jax.device_get(m2.state['params']))
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_different_seed_different_training(dataroot, tmp_path):
    _, e1 = build_and_run(dataroot, str(tmp_path / 'c'), seed=1, steps=1)
    _, e2 = build_and_run(dataroot, str(tmp_path / 'd'), seed=2, steps=1)
    assert any(e1[0][k] != e2[0][k] for k in e1[0])
