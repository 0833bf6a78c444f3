"""Chunked dispatch (BaseModel.train_chunk / --steps_per_dispatch):
scanning K iterations in one jit call uses the same per-step fold_in
key sequence as K set_input+optimize_parameters calls.  The scanned
program fuses differently, so agreement is up to XLA reassociation
noise amplified by the adversarial updates — tolerances reflect that."""

import jax
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e/compile tier; deselect with -m 'not slow'


from supervised_gan_tpu.models import create_model
from supervised_gan_tpu.options import TrainOptions

FCGAN_ARGS = [
    '--dataroot', '/tmp/unused', '--name', 'chunk_t', '--model', 'fcgan',
    '--which_direction', 'A', '--dataset_mode', 'single',
    '--loadSize', '32', '--fineSize', '32', '--batchSize', '1',
    '--which_model_netG', 'deconv', '--n_layers_G', '3', '--ngf', '4',
    '--which_model_netD', 'n_layers', '--n_layers_D', '2', '--ndf', '4',
    '--scale_factor', '1', '--lambda_D', '1.0', '--noise_nc', '2',
    '--noiseSize', '2', '--norm', 'instance', '--no_dropout',
    '--n_update_G', '1', '--no_lsgan', '--which_channel', 'rg_b',
    '--manualSeed', '7', '--display_id', '0',
]


def _batches(n):
    rng = np.random.RandomState(3)
    return [{'A': rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
             'A_paths': ['x.png']} for _ in range(n)]


def _build(tmp_path, name):
    opt = TrainOptions().parse(
        FCGAN_ARGS + ['--checkpoints_dir', str(tmp_path), '--name', name])
    return create_model(opt)


def test_chunk_matches_per_step(tmp_path):
    batches = _batches(4)

    m1 = _build(tmp_path, 'single')
    for b in batches:
        m1.set_input(b)
        m1.optimize_parameters()
    e1 = m1.get_current_errors()
    p1 = jax.tree_util.tree_map(np.asarray, m1.state['params'])

    m2 = _build(tmp_path, 'chunked')
    m2.train_chunk(batches)
    e2 = m2.get_current_errors()
    p2 = jax.tree_util.tree_map(np.asarray, m2.state['params'])

    assert m1._step_count == m2._step_count
    for k in e1:
        np.testing.assert_allclose(e1[k], e2[k], rtol=1e-3, atol=1e-4,
                                   err_msg=k)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-3)


def test_chunk_then_steps_continue_key_sequence(tmp_path):
    """A chunk advances _step_count so later per-step calls fold the
    same keys a pure per-step run would."""
    batches = _batches(3)
    m = _build(tmp_path, 'mixed')
    m.train_chunk(batches[:2])
    assert m._step_count == 2
    m.set_input(batches[2])
    m.optimize_parameters()
    assert m._step_count == 3


def test_train_driver_chunked(tmp_path, monkeypatch):
    """train.py --steps_per_dispatch 2 runs end-to-end: chunks flush at
    print/save boundaries and at epoch end."""
    import sys
    from PIL import Image
    root = tmp_path / 'data'
    (root / 'train').mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / 'train' / f'{i:03d}.png')
    import train as train_entry
    args = FCGAN_ARGS + [
        '--checkpoints_dir', str(tmp_path), '--name', 'chunk_drv',
        '--steps_per_dispatch', '2', '--niter', '1', '--niter_decay', '0',
        '--print_freq', '4', '--display_freq', '4',
        '--save_latest_freq', '100', '--save_epoch_freq', '1',
        '--no_flip', '--no_rotate', '--serial_batches',
    ]
    args[args.index('--dataroot') + 1] = str(root)
    monkeypatch.setattr(sys, 'argv', ['train.py'] + args)
    train_entry.main()
    assert (tmp_path / 'chunk_drv' / 'latest_net_G.pth').exists()
    assert (tmp_path / 'chunk_drv' / 'latest_state.pkl').exists()


def test_partial_chunk_uses_per_step_fallback(tmp_path):
    """A second chunk length must NOT compile a second scan program
    (~10 min through the relay); it runs through the per-step program and
    matches pure per-step training exactly."""
    batches = _batches(5)
    m_chunk = _build(tmp_path, 'chunk_mix')
    m_chunk.train_chunk(batches[:3])      # compiles the k=3 scan
    m_chunk.train_chunk(batches[3:])      # k=2: per-step fallback
    assert list(m_chunk._multi_steps) == [3]

    m_ref = _build(tmp_path, 'chunk_mix_ref')
    for b in batches:
        m_ref.set_input(b)
        m_ref.optimize_parameters()

    # fallback path is the SAME per-step program -> near-exact agreement
    e1, e2 = m_chunk.get_current_errors(), m_ref.get_current_errors()
    for k in e2:
        np.testing.assert_allclose(e1[k], e2[k], rtol=2e-3, atol=2e-3)
