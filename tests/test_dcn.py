"""Multi-host (DCN) data parallelism: 2 processes x 4 virtual CPU devices
must produce the same metrics as the single-process 8-device mesh.

The reference has zero multi-process support (SURVEY.md §2.12); this is the
TPU-first extension: jax.distributed.initialize behind --dcn_* flags, a
global mesh, and global batch arrays built per-process from the (identical,
same-seed) host batch.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e/compile tier; deselect with -m 'not slow'


import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARGS_TMPL = ("['--dataroot', '/tmp/unused', '--name', 'dcn', '--model', "
             "'fcgan', '--which_direction', 'A', '--dataset_mode', 'single',"
             "'--loadSize', '32', '--fineSize', '32', '--batchSize', '8',"
             "'--which_model_netG', 'deconv', '--n_layers_G', '3',"
             "'--ngf', '8', '--which_model_netD', 'n_layers',"
             "'--n_layers_D', '2', '--ndf', '8', '--scale_factor', '1',"
             "'--lambda_D', '1', '--noise_nc', '4', '--noiseSize', '2',"
             "'--norm', 'instance', '--no_dropout', '--no_lsgan',"
             "'--which_channel', 'rg_b', '--manualSeed', '0',"
             "'--checkpoints_dir', %(ckpt)r, '--display_id', '0',"
             "'--data_mesh', '8', '--pool_size', '4'%(extra)s]")

CHILD = """
import os, sys, json
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, %(root)r)
import numpy as np
from supervised_gan_tpu.options import TrainOptions
from supervised_gan_tpu.models import create_model

opt = TrainOptions().parse(%(args)s)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
model = create_model(opt)
rng = np.random.RandomState(0)
batch = {'A': rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
         'A_paths': ['%%d.png' %% i for i in range(8)]}
for _ in range(2):
    model.set_input(batch)
    model.optimize_parameters()
errs = model.get_current_errors()
if jax.process_index() == 0:
    with open(%(out)r, 'w') as f:
        json.dump(errs, f)
print('child %%d done' %% jax.process_index())
"""


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / 'metrics.json')
    procs = []
    for pid in range(2):
        extra = (", '--dcn_coordinator', 'localhost:%d',"
                 "'--dcn_num_processes', '2', '--dcn_process_id', '%d'"
                 % (port, pid))
        args = ARGS_TMPL % {'ckpt': str(tmp_path / ('ck%d' % pid)),
                            'extra': extra}
        script = CHILD % {'root': ROOT, 'args': args, 'out': out}
        path = tmp_path / ('child%d.py' % pid)
        path.write_text(textwrap.dedent(script))
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
        env.pop('PYTEST_CURRENT_TEST', None)
        procs.append(subprocess.Popen(
            [sys.executable, str(path)], env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('DCN child timed out')
        logs.append(stdout.decode(errors='replace'))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    with open(out) as f:
        dcn_errs = json.load(f)

    # single-process 8-device reference run, same config and batch
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model
    args = eval(ARGS_TMPL % {'ckpt': str(tmp_path / 'ck_sp'), 'extra': ''})
    opt = TrainOptions().parse(args)
    model = create_model(opt)
    rng = np.random.RandomState(0)
    batch = {'A': rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
             'A_paths': ['%d.png' % i for i in range(8)]}
    for _ in range(2):
        model.set_input(batch)
        model.optimize_parameters()
    sp_errs = model.get_current_errors()

    assert set(dcn_errs) == set(sp_errs)
    for k in sp_errs:
        np.testing.assert_allclose(dcn_errs[k], sp_errs[k], rtol=5e-3,
                                   atol=1e-5, err_msg=k)
