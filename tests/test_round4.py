"""Round-4 surface: repo-local compile cache default, the parameterized
quality-eval geometry builder, and the SGAN_TPU_AUTO_LAYOUT probe path
(AUTO parameter layouts on the donated packed state)."""

import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, 'tools'))

from supervised_gan_tpu.models import create_model
from supervised_gan_tpu.models.packing import PackedState
from supervised_gan_tpu.options import TrainOptions


def test_cache_dir_defaults_inside_repo(monkeypatch):
    """/tmp and ~/.cache get wiped between sessions; the default cache
    dir must live under the repo tree (runtime/cache.py)."""
    import jax
    from supervised_gan_tpu.runtime import enable_compilation_cache
    monkeypatch.delenv('SGAN_TPU_XLA_CACHE', raising=False)
    monkeypatch.delenv('SGAN_TPU_PLATFORM', raising=False)
    # snapshot the jax config the helper mutates so this test can't leak
    # cache settings into later tests in the same process
    keys = ('jax_compilation_cache_dir',
            'jax_persistent_cache_min_compile_time_secs',
            'jax_persistent_cache_min_entry_size_bytes')
    saved = {k: getattr(jax.config, k) for k in keys}
    try:
        path = enable_compilation_cache()
        assert path == os.path.join(ROOT, '.xla_cache')
        assert os.path.isdir(path)
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)


def test_build_args_geometry():
    """fcgan label = noiseSize*2^(n+1) must land at px/2 (bilinear_2
    doubles it); CRN consumes a pool64 label."""
    from quality_eval import build_args, GAN_NET_ARGS

    # 128px must reproduce the r03 constants exactly
    net128, _, _, _ = build_args(128, 8)
    assert net128 == GAN_NET_ARGS

    def val(lst, flag):
        return lst[lst.index(flag) + 1]

    from supervised_gan_tpu.options import TrainOptions, TestOptions

    for px in (128, 256, 512):
        net, train, ss_net, ss_train = build_args(px, 16)
        n_g1 = int(val(net, '--n_layers_G1'))
        assert 4 * 2 ** (n_g1 + 1) == px // 2
        assert int(val(net, '--noiseSize2')) == px // 64
        assert int(val(net, '--fineSize')) == px
        assert val(net, '--ngf1') == val(net, '--ngf2') == '16'
        # D depth scales with resolution
        assert val(train, '--n_layers_D1') == ('2' if px == 128 else '3')
        # every arg list must parse through the real option surface
        base = ['--dataroot', '/tmp/x', '--name', 'qa%d' % px,
                '--checkpoints_dir', '/tmp/qa_ckpt', '--display_id', '0']
        assert TrainOptions().parse(base + train).fineSize == px
        assert TestOptions().parse(base + net).fineSize == px
        assert TrainOptions().parse(base + ss_train).fineSize == px
        assert TestOptions().parse(base + ss_net).fineSize == px


def test_bce_gradient_bounded_at_saturation():
    """Regression (round 4): f32 tanh/sigmoid DO reach exactly 0/1, and
    the naive autodiff of the clamped-forward BCE returned NaN there —
    one saturated pixel NaN'd whole 256px GAN training runs.  The custom
    VJP must match torch's eps-clamped backward: finite everywhere,
    analytic (p-t)/(p(1-p)) in the interior."""
    import jax
    import jax.numpy as jnp
    from supervised_gan_tpu.nn.losses import bce_loss

    for p0, t0 in [(0.0, 1.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0),
                   (3e-8, 1.0), (0.5, 0.3)]:
        g = jax.grad(lambda p: bce_loss(p, jnp.array(t0)))(jnp.array(p0))
        assert np.isfinite(float(g)), (p0, t0, float(g))
    # interior matches the analytic derivative
    p0, t0 = 0.37, 0.8
    g = float(jax.grad(lambda p: bce_loss(p, jnp.array(t0)))(jnp.array(p0)))
    np.testing.assert_allclose(g, (p0 - t0) / (p0 * (1 - p0)), rtol=1e-5)
    # saturated logits through sigmoid: grad ~ (p - t), never NaN
    fs = lambda z: bce_loss(jax.nn.sigmoid(z), jnp.array(1.0))
    for z in (-200.0, -90.0, 0.0, 200.0):
        assert np.isfinite(float(jax.grad(fs)(jnp.array(z))))


FCGAN_ARGS = [
    '--dataroot', '/tmp/unused', '--name', 'auto_t', '--model', 'fcgan',
    '--which_direction', 'A', '--dataset_mode', 'single',
    '--loadSize', '32', '--fineSize', '32', '--batchSize', '1',
    '--which_model_netG', 'deconv', '--n_layers_G', '3', '--ngf', '4',
    '--which_model_netD', 'n_layers', '--n_layers_D', '2', '--ndf', '4',
    '--scale_factor', '1', '--lambda_D', '1.0', '--noise_nc', '2',
    '--noiseSize', '2', '--norm', 'instance', '--no_dropout',
    '--n_update_G', '1', '--no_lsgan', '--which_channel', 'rg_b',
    '--manualSeed', '7', '--display_id', '0',
]


def _run3(tmp_path, name):
    opt = TrainOptions().parse(
        FCGAN_ARGS + ['--checkpoints_dir', str(tmp_path), '--name', name])
    model = create_model(opt)
    rng = np.random.RandomState(3)
    batch = {'A': rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
             'A_paths': ['x.png']}
    for _ in range(3):
        model.set_input(batch)
        model.optimize_parameters()
    assert isinstance(model.state, PackedState)
    return model.get_current_errors()


def test_cache_data_bit_identical(tmp_path):
    """--cache_data (RAM cache of the decode+resize prefix) must produce
    bit-identical batches to the streaming path, for single and aligned
    datasets — augmentation randomness stays per-sample."""
    from PIL import Image
    from supervised_gan_tpu.data import CreateDataLoader
    from supervised_gan_tpu.options import TrainOptions

    rng = np.random.RandomState(0)
    for sub in ('train',):
        d = tmp_path / 'data' / sub
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
                            ).save(str(d / ('%03d.png' % i)))

    def batches(mode, extra):
        args = ['--dataroot', str(tmp_path / 'data'), '--name', 'cd_t',
                '--model', 'fcgan', '--which_direction', 'A',
                '--dataset_mode', mode, '--loadSize', '48',
                '--fineSize', '32', '--batchSize', '1', '--nThreads', '1',
                '--which_channel', 'rg_b', '--manualSeed', '3',
                '--display_id', '0',
                '--checkpoints_dir', str(tmp_path / 'ck')] + extra
        loader = CreateDataLoader(TrainOptions().parse(args))
        out = []
        for _ in range(2):                       # two epochs: hits cache
            for item in loader.load_data():
                out.append({k: np.asarray(v) for k, v in item.items()
                            if not k.endswith('paths')})
        return out

    for mode in ('single', 'aligned'):
        ref = batches(mode, [])
        cached = batches(mode, ['--cache_data'])
        assert len(ref) == len(cached) == 8
        for r, c in zip(ref, cached):
            assert set(r) == set(c)
            for k in r:
                np.testing.assert_array_equal(r[k], c[k])


def test_bce_gradient_matches_torch_bceloss():
    """Direct oracle: our custom VJP must reproduce torch.nn.BCELoss's
    backward (the reference's loss, models/networks.py GANLoss) on
    random AND exactly-saturated predictions."""
    import jax
    import jax.numpy as jnp
    import torch
    from supervised_gan_tpu.nn.losses import bce_loss

    rng = np.random.RandomState(0)
    p = np.concatenate([rng.rand(64).astype(np.float32),
                        np.array([0.0, 1.0, 3e-8, 1 - 3e-8], np.float32)])
    t = np.concatenate([(rng.rand(64) > 0.5).astype(np.float32),
                        np.array([1.0, 0.0, 1.0, 0.0], np.float32)])
    tp = torch.tensor(p, requires_grad=True)
    loss = torch.nn.BCELoss()(tp, torch.tensor(t))
    loss.backward()
    ours = np.asarray(jax.grad(
        lambda q: bce_loss(q, jnp.array(t)))(jnp.array(p)))
    np.testing.assert_allclose(
        float(bce_loss(jnp.array(p), jnp.array(t))), float(loss.detach()),
        rtol=1e-6)
    np.testing.assert_allclose(ours, tp.grad.numpy(), rtol=1e-5, atol=1e-8)


def test_abort_on_nan_stops_training(tmp_path, monkeypatch):
    """--abort_on_nan must SystemExit at the first non-finite printed
    metric instead of training through a poisoned state."""
    import sys

    from PIL import Image
    import train as train_entry

    d = tmp_path / 'data' / 'train'
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(str(d / ('%03d.png' % i)))

    real_create = train_entry.create_model

    def poisoned_create(opt):
        model = real_create(opt)
        model.get_current_errors = lambda: {'G_GAN': float('nan')}
        return model

    monkeypatch.setattr(train_entry, 'create_model', poisoned_create)
    monkeypatch.setattr(sys, 'argv', ['train.py'] + FCGAN_ARGS + [
        '--dataroot', str(tmp_path / 'data'), '--name', 'nan_t',
        '--checkpoints_dir', str(tmp_path / 'ck'), '--loadSize', '32',
        '--fineSize', '32', '--niter', '1', '--niter_decay', '0',
        '--print_freq', '1', '--nThreads', '1', '--abort_on_nan'])
    with pytest.raises(SystemExit, match='abort_on_nan'):
        train_entry.main()


@pytest.mark.slow
def test_auto_layout_training_matches(tmp_path, monkeypatch):
    """SGAN_TPU_AUTO_LAYOUT=1 (AUTO layouts on the donated packed state)
    must not change training numerics — layouts are physical only."""
    monkeypatch.setenv('SGAN_TPU_PACK_STATE', '1')
    monkeypatch.delenv('SGAN_TPU_AUTO_LAYOUT', raising=False)
    e_ref = _run3(tmp_path, 'auto_off')
    monkeypatch.setenv('SGAN_TPU_AUTO_LAYOUT', '1')
    e_auto = _run3(tmp_path, 'auto_on')
    for k in e_ref:
        np.testing.assert_allclose(e_auto[k], e_ref[k], rtol=2e-4,
                                   atol=2e-4)
