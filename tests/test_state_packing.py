"""State packing at the jit boundary (models/packing.py): bit-exact
roundtrip, training equivalence vs the unpacked program, and the lazy
materialized view non-hot-path code depends on."""

import numpy as np
import jax
import pytest

from supervised_gan_tpu.models import create_model
from supervised_gan_tpu.models.packing import (StatePacker, PackedState,
                                               materialize_state)
from supervised_gan_tpu.options import TrainOptions

FCGAN_ARGS = [
    '--dataroot', '/tmp/unused', '--name', 'pack_t', '--model', 'fcgan',
    '--which_direction', 'A', '--dataset_mode', 'single',
    '--loadSize', '32', '--fineSize', '32', '--batchSize', '1',
    '--which_model_netG', 'deconv', '--n_layers_G', '3', '--ngf', '4',
    '--which_model_netD', 'n_layers', '--n_layers_D', '2', '--ndf', '4',
    '--scale_factor', '1', '--lambda_D', '1.0', '--noise_nc', '2',
    '--noiseSize', '2', '--norm', 'instance', '--no_dropout',
    '--n_update_G', '1', '--no_lsgan', '--which_channel', 'rg_b',
    '--manualSeed', '7', '--display_id', '0',
]


def _build(tmp_path, name):
    opt = TrainOptions().parse(
        FCGAN_ARGS + ['--checkpoints_dir', str(tmp_path), '--name', name])
    return create_model(opt)


def _batch():
    rng = np.random.RandomState(3)
    return {'A': rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
            'A_paths': ['x.png']}


def test_pack_roundtrip_bit_exact(tmp_path):
    model = _build(tmp_path, 'pack_rt')
    state = materialize_state(model.state)
    # force a tiny threshold so BOTH packed and big paths are exercised
    packer = StatePacker(state, threshold=1 << 10)
    assert packer.n_big > 0 and packer.n_big < len(packer.plan)
    rt = packer._unpack_jit(packer._pack_jit(state))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(rt)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_training_matches_unpacked(tmp_path, monkeypatch):
    batch = _batch()

    monkeypatch.setenv('SGAN_TPU_PACK_STATE', '0')
    ref = _build(tmp_path, 'pack_off')
    for _ in range(3):
        ref.set_input(batch)
        ref.optimize_parameters()
    e_ref = ref.get_current_errors()

    monkeypatch.setenv('SGAN_TPU_PACK_STATE', '1')
    packed = _build(tmp_path, 'pack_on')
    for _ in range(3):
        packed.set_input(batch)
        packed.optimize_parameters()
    assert isinstance(packed.state, PackedState)
    e_pack = packed.get_current_errors()

    for k in e_ref:
        np.testing.assert_allclose(e_pack[k], e_ref[k], rtol=2e-4,
                                   atol=2e-4)


def test_group_packed_training_matches(tmp_path, monkeypatch):
    """SGAN_TPU_GROUP_PACK=1 (one boundary f32 buffer per optimizer
    group for the param leaves) trains identically to the shared-buffer
    packing and produces per-group plan keys."""
    from supervised_gan_tpu.models.packing import materialize_state
    batch = _batch()

    monkeypatch.setenv('SGAN_TPU_PACK_STATE', '1')
    monkeypatch.delenv('SGAN_TPU_GROUP_PACK', raising=False)
    ref = _build(tmp_path, 'gpack_off')
    for _ in range(3):
        ref.set_input(batch)
        ref.optimize_parameters()
    e_ref = ref.get_current_errors()

    monkeypatch.setenv('SGAN_TPU_GROUP_PACK', '1')
    grp = _build(tmp_path, 'gpack_on')
    for _ in range(3):
        grp.set_input(batch)
        grp.optimize_parameters()
    assert isinstance(grp.state, PackedState)
    e_grp = grp.get_current_errors()

    packer = grp.state.packer
    keys = {p[0] for p in packer.plan if p is not None}
    assert any(':' in k for k in keys), keys  # per-group buffers exist
    # roundtrip through the grouped plan stays bit-exact
    st = materialize_state(grp.state)
    rt = packer._unpack_jit(packer._pack_jit(st))
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for k in e_ref:
        np.testing.assert_allclose(e_grp[k], e_ref[k], rtol=2e-4,
                                   atol=2e-4)


def test_packed_state_view_save_resume(tmp_path, monkeypatch):
    monkeypatch.setenv('SGAN_TPU_PACK_STATE', '1')
    model = _build(tmp_path, 'pack_sr')
    model.set_input(_batch())
    model.optimize_parameters()
    # lazy logical view (the test()/save() access pattern)
    params = model.state['params']
    assert 'G' in params
    # test-time generation through state['params']
    model.test()
    # checkpoint + exact resume through the packed state
    model.save('latest')
    model.flush_checkpoints()
    opt2 = TrainOptions().parse(
        FCGAN_ARGS + ['--checkpoints_dir', str(tmp_path), '--name',
                      'pack_sr', '--continue_train', '--which_epoch',
                      'latest'])
    model2 = create_model(opt2)
    p1 = jax.device_get(materialize_state(model.state))['params']
    p2 = jax.device_get(materialize_state(model2.state))['params']
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compiler_options_from_env(monkeypatch):
    from supervised_gan_tpu.runtime import compiler_options_from_env
    monkeypatch.delenv('SGAN_TPU_COMPILER_OPTIONS', raising=False)
    assert compiler_options_from_env() is None
    monkeypatch.setenv('SGAN_TPU_COMPILER_OPTIONS',
                       'xla_tpu_scoped_vmem_limit_kib=65536; a_b=c=d ;')
    assert compiler_options_from_env() == {
        'xla_tpu_scoped_vmem_limit_kib': '65536', 'a_b': 'c=d'}
    monkeypatch.setenv('SGAN_TPU_COMPILER_OPTIONS', 'novalue')
    import pytest
    with pytest.raises(ValueError):
        compiler_options_from_env()
