"""Tests for the aux utilities: raw PNG encoder, rand-F metric, mul_padded,
diagnose probe, and fcgan latent reconstruction (recon.py path)."""

import numpy as np
import pytest
from PIL import Image

from supervised_gan_tpu.utils.png import save_png
from supervised_gan_tpu.utils.metrics import compute_rand_f_scores
from supervised_gan_tpu.utils.images import diagnose_network


def test_raw_png_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (16, 24, 3), dtype=np.uint8)
    p = str(tmp_path / 'x.png')
    save_png(arr, p)
    back = np.asarray(Image.open(p).convert('RGB'))
    # reference writes rows bottom-up: decoded image is vertically flipped
    np.testing.assert_array_equal(back, arr[::-1])


def test_rand_f_score_perfect_and_degraded():
    rng = np.random.RandomState(0)
    t = (rng.rand(64, 64) > 0.6).astype(np.float64)
    perfect = compute_rand_f_scores(t, t)
    assert perfect.shape == (1,)
    assert perfect[0] > 0.99
    s = (rng.rand(64, 64) > 0.6).astype(np.float64)
    degraded = compute_rand_f_scores(s, t)
    assert degraded[0] < perfect[0]


def test_mul_padded_centering():
    import jax.numpy as jnp
    from supervised_gan_tpu.models.common import mul_padded
    a = jnp.ones((1, 4, 4, 1))
    b = jnp.full((1, 8, 10, 1), 2.0)
    y = mul_padded(a, b)
    assert y.shape == (1, 8, 10, 1)
    np.testing.assert_allclose(np.asarray(y), 2.0)
    # same-size fast path
    y2 = mul_padded(b, b)
    np.testing.assert_allclose(np.asarray(y2), 4.0)


def test_diagnose_network():
    grads = {'a': np.full((3,), 2.0), 'b': {'c': np.full((2, 2), 4.0)}}
    assert diagnose_network(grads, 'test') == 3.0


def test_fcgan_reconstruction(tmp_path):
    """recon.py path: LBFGS inversion reduces BCE vs the init noise."""
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model
    root = tmp_path / 'data' / 'train'
    root.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(str(root / ('%d.png' % i)))
    opt = TrainOptions().parse(
        ['--dataroot', str(tmp_path / 'data'), '--name', 'rec',
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
    batch = {'A': rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
             'A_paths': ['x.png']}
    model.set_input(batch)
    err, ll, ll_init = model.reconstruction()
    assert np.isfinite(err) and np.isfinite(ll) and np.isfinite(ll_init)
    assert model.fake.shape == (1, 32, 32, 3)
    # optimized noise should fit at least as well as a random init
    from supervised_gan_tpu.nn.losses import bce_loss
    init_err = float(bce_loss((model.fake_init + 1) / 2,
                              (model.real + 1) / 2))
    assert err <= init_err + 1e-5
