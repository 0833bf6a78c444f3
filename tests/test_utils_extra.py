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


def test_visualizer_single_pane_grid(tmp_path):
    """--display_single_pane_ncols > 0: one grid pane + a label table
    (reference util/visualizer.py:33-73), exercised against a fake visdom
    client; white padding cells complete the last row."""
    import numpy as np
    from types import SimpleNamespace
    from collections import OrderedDict
    from supervised_gan_tpu.utils.visualizer import Visualizer

    opt = SimpleNamespace(display_id=0, isTrain=True, no_html=True,
                          display_winsize=64, name='sp',
                          checkpoints_dir=str(tmp_path), display_port=1,
                          display_single_pane_ncols=2)
    (tmp_path / 'sp').mkdir()
    vz = Visualizer(opt)

    calls = {}

    class FakeVis:
        def images(self, images, nrow, win, padding, opts):
            calls['images'] = (len(images), nrow, win, opts['title'])

        def text(self, html, win, opts):
            calls['text'] = (html, win)

    vz.vis = FakeVis()
    vz.display_id = 10
    vis = OrderedDict([('a', np.zeros((8, 8, 3), np.uint8)),
                       ('b', np.zeros((8, 8, 3), np.uint8)),
                       ('c', np.zeros((8, 8, 3), np.uint8))])
    vz.display_current_results(vis, epoch=1)
    n, nrow, win, title = calls['images']
    assert (n, nrow, win) == (4, 2, 11)      # 3 visuals + 1 white pad cell
    assert title == 'sp images'
    html, win2 = calls['text']
    assert win2 == 12 and html.count('<tr>') == 2 and '<td>c</td>' in html


def test_visualizer_single_pane_no_server(tmp_path):
    """A dead visdom client must degrade to files-only, not raise."""
    from types import SimpleNamespace
    from collections import OrderedDict
    import numpy as np
    from supervised_gan_tpu.utils.visualizer import Visualizer

    opt = SimpleNamespace(display_id=0, isTrain=True, no_html=True,
                          display_winsize=64, name='sp2',
                          checkpoints_dir=str(tmp_path), display_port=1,
                          display_single_pane_ncols=2)
    (tmp_path / 'sp2').mkdir()
    vz = Visualizer(opt)

    class DeadVis:
        def images(self, *a, **k):
            raise ConnectionError('no server')

    vz.vis = DeadVis()
    vz.display_current_results(
        OrderedDict([('a', np.zeros((8, 8, 3), np.uint8))]), epoch=1)
    assert vz.vis is None


def test_numpy_fold_in_bit_exact_with_jax():
    """utils/prng.fold_in must be BIT-EXACT with jax.random.fold_in —
    per-step training keys rely on it (models/base.py next_step_key)."""
    import jax
    import numpy as np
    from supervised_gan_tpu.utils.prng import fold_in
    for seed in (0, 1, 42, 987654321):
        k = jax.random.PRNGKey(seed)
        for n in (0, 1, 3, 17, 2**31 + 5, 2**32 - 1):
            a = np.asarray(jax.random.fold_in(k, n))
            b = fold_in(np.asarray(k), n)
            assert (a == b).all(), (seed, n, a, b)
