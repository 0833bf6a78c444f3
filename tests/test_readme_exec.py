"""Execute (not just parse) the published README commands.

Each of the six README recipe commands (reference README.md:18,23,33,38,45,
51) is rewritten to a reduced geometry (small widths, 64-128px, 1 epoch,
2 images) and run through the REAL CLI entry points (train.main / test.main)
on CPU — exercising options -> data -> model -> jitted step -> checkpoint IO
exactly as a user would.  Geometry-only flags are rewritten; every
behavioral flag of the published command is preserved.
"""

import shlex
import sys

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e/compile tier; deselect with -m 'not slow'


import train as train_entry
import test as test_entry

from tests.test_readme_commands import (
    DSGAN_TRAIN, DSGAN_TEST, SGAN_STEP1, SGAN_STEP2, JOINTGAN, UNSUPGAN)


def rewrite(cmd, overrides):
    """Replace (or append) flag values in a CLI string.  Handles the list-
    valued flags (--n_layers_D 3 4 3 4 ...)."""
    toks = shlex.split(cmd)
    out = []
    seen = set()
    i = 0
    while i < len(toks):
        t = toks[i]
        assert t.startswith('--'), t
        vals = []
        i += 1
        while i < len(toks) and not toks[i].startswith('--'):
            vals.append(toks[i])
            i += 1
        name = t[2:]
        if name in overrides:
            seen.add(name)
            new = overrides[name]
            if new is None:
                continue                      # drop the flag
            out.append(t)
            out.extend(str(v) for v in (new if isinstance(new, (list, tuple))
                                        else [new]))
        else:
            out.append(t)
            out.extend(vals)
    for name, new in overrides.items():
        if name in seen or new is None:
            continue
        out.append('--' + name)
        out.extend(str(v) for v in (new if isinstance(new, (list, tuple))
                                    else [new]))
    return out


def _mkdata(root, n=2, size=256):
    from PIL import Image
    d = root / 'train'
    d.mkdir(parents=True, exist_ok=True)
    (root / 'test').mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(d / ('%03d.png' % i)))
        Image.fromarray(arr).save(str(root / 'test' / ('%03d.png' % i)))


def run_train(monkeypatch, args):
    monkeypatch.setattr(sys, 'argv', ['train.py'] + args)
    train_entry.main()


def run_test(monkeypatch, args):
    monkeypatch.setattr(sys, 'argv', ['test.py'] + args)
    test_entry.main()


FAST = {'niter': 1, 'niter_decay': 1, 'display_freq': 1000,
        'print_freq': 2, 'save_epoch_freq': 2, 'nThreads': 1,
        'display_id': 0, 'max_dataset_size': 2}

FCGAN_SMALL = dict(FAST, loadSize=64, fineSize=64, n_layers_G=4, ngf=4,
                   ndf=4, n_layers_D=[2, 2, 2], noise_nc=4, noiseSize=2)


@pytest.mark.parametrize("name,cmd", [
    ('sgan_step1', SGAN_STEP1), ('jointgan', JOINTGAN),
    ('unsupgan', UNSUPGAN)])
def test_exec_readme_fcgan_commands(name, cmd, tmp_path, monkeypatch):
    _mkdata(tmp_path / 'data', size=64)
    args = rewrite(cmd, dict(FCGAN_SMALL, dataroot=str(tmp_path / 'data'),
                             checkpoints_dir=str(tmp_path / 'ck')))
    run_train(monkeypatch, args)
    ck = tmp_path / 'ck' / ('sgan_gan' if name == 'sgan_step1' else name)
    assert (ck / 'latest_net_G.pth').exists()
    assert (ck / 'latest_net_D_2.pth').exists()


def test_exec_readme_sgan_step2(tmp_path, monkeypatch):
    """SGAN step 2 (cgan, unet, WeightedL1 via the README's --weight_L1
    alias, gaussian noise injection).  unet_256 -> unet_128 at 128px."""
    _mkdata(tmp_path / 'data', size=256)
    args = rewrite(SGAN_STEP2, dict(
        FAST, dataroot=str(tmp_path / 'data'),
        checkpoints_dir=str(tmp_path / 'ck'),
        loadSize=256, fineSize=128, which_model_netG='unet_128',
        ngf=4, ndf=4, n_layers_D=[2, 2], scale_factor=[1, 1],
        lambda_D=[0.5, 0.5], noise_nc=4, noiseSize=4))
    run_train(monkeypatch, args)
    ck = tmp_path / 'ck' / 'sgan_cgan'
    assert (ck / 'latest_net_G.pth').exists()
    # test.py's conditional branch (opt.model.startswith('cgan')) walks the
    # dataset and saves per-image results via model.get_image_paths() —
    # regression for the missing BaseModel protocol method
    targs = ['--dataroot', str(tmp_path / 'data'), '--name', 'sgan_cgan',
             '--model', 'cgan', '--which_direction', 'AtoB',
             '--dataset_mode', 'single', '--loadSize', '256',
             '--fineSize', '128', '--batchSize', '1', '--input_nc', '2',
             '--output_nc', '1', '--which_model_netG', 'unet_128',
             '--ngf', '4', '--noise_nc', '4', '--noiseSize', '4',
             '--norm', 'instance', '--manualSeed', '0',
             '--add_gaussian_noise', '--which_channel', 'rg_b',
             '--serial_batches', '--no_flip', '--no_rotate',
             '--how_many', '2', '--nThreads', '1', '--display_id', '0',
             '--checkpoints_dir', str(tmp_path / 'ck'),
             '--results_dir', str(tmp_path / 'res')]
    run_test(monkeypatch, targs)
    images = tmp_path / 'res' / 'sgan_cgan' / 'test_latest' / 'images'
    assert sorted(images.glob('*.png')), 'cgan test.py saved no images'


DSGAN_SMALL = dict(
    FAST, loadSize=256, fineSize=128,
    n_layers_G1=3, ngf1=4, noiseSize1=4, noise_nc1=4,
    ndf1=4, n_layers_D1=[2, 2],
    ngf2=8, nff2=4, ndf2=4, n_layers_D2=[2, 2, 2, 2],
    noiseSize2=2, noise_nc2=4)


def _make_pretrained(d):
    """seq-label stage-1 checkpoints for --sequential_train
    --which_model_to_load G1 D1 (reference twostage_cycle_model.py:95-107)."""
    import jax
    from supervised_gan_tpu import nn
    from supervised_gan_tpu.utils import pth as pthio
    d.mkdir(parents=True, exist_ok=True)
    g1 = nn.define_G(2, 0, 4, 'fcgan', 'instance', False, n_layers_G=3,
                     use_fcn=True, noise_nc=4)
    pthio.save_pth(str(d / 'seq_net_G1.pth'), g1,
                   g1.init(jax.random.PRNGKey(0)))
    for i, scale in enumerate((1, 2)):
        di = nn.define_D(2, 4, 'n_layers', n_layers_D=2, norm='instance',
                         use_sigmoid=True, scale_factor=scale)
        pthio.save_pth(str(d / ('seq_net_D1_%d.pth' % i)), di,
                       di.init(jax.random.PRNGKey(i + 1)))


def test_exec_readme_dsgan_train_then_test(tmp_path, monkeypatch):
    """The flagship: DSGAN train (with sequential stage-1 loading) then the
    README test command against the produced checkpoints."""
    _mkdata(tmp_path / 'data', size=256)
    _make_pretrained(tmp_path / 'pre')
    args = rewrite(DSGAN_TRAIN, dict(
        DSGAN_SMALL, dataroot=str(tmp_path / 'data'),
        checkpoints_dir=str(tmp_path / 'ck'),
        pretrained_model_dir=str(tmp_path / 'pre')))
    run_train(monkeypatch, args)
    ck = tmp_path / 'ck' / 'dsgan_model'
    for net in ('G1', 'G2', 'F2', 'D1_0', 'D1_1',
                'D2_0', 'D2_1', 'D2_2', 'D2_3'):
        assert (ck / ('latest_net_%s.pth' % net)).exists(), net

    targs = rewrite(DSGAN_TEST, dict(
        dataroot=str(tmp_path / 'data'),
        checkpoints_dir=str(tmp_path / 'ck'),
        results_dir=str(tmp_path / 'res'), display_id=0, nThreads=1,
        loadSize=128, fineSize=128,
        n_layers_G1=3, ngf1=4, noiseSize1=4, noise_nc1=4,
        ndf1=4, n_layers_D1=[2, 2],
        ngf2=8, nff2=4, ndf2=4, n_layers_D2=[2, 2, 2, 2],
        noiseSize2=2, noise_nc2=4, how_many=2))
    run_test(monkeypatch, targs)
    images = tmp_path / 'res' / 'dsgan_model' / 'test_latest' / 'images'
    pngs = sorted(p.name for p in images.glob('*.png'))
    assert pngs, 'no test outputs written'
