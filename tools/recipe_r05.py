"""RECIPE_r05: the full-dress README DSGAN workflow, end-to-end on the chip.

Round-5 verdict item 1: every prior artifact measured pieces (step rate,
reduced-scale quality) — this drives the reference's HEADLINE JOB exactly as
published, at full width, on real hardware:

  0. synthetic hard VNC-scale dataset: 1024px train images (20/4/8), the
     harder generator from tools/quality_eval.py (thin membranes, faint
     mitochondria, texture + sensor noise, unlabeled distractors);
  1. stage 1 — the README's SGAN step-1 label-GAN command
     (/root/reference/README.md:33: fcgan 'rg', 512px, ngf 32, 3-scale D
     bank, --niter 100 --niter_decay 100);
  2. export its G/D_0/D_1 as sequential checkpoints
     pretrained/twostage/seq_net_{G1,D1_0,D1_1}.pth — the published
     twostage_D1G1 handoff (README.md:13, twostage_cycle_model.py:95-107);
  3. stage 2 — the EXACT README.md:18 DSGAN command (ngf1 32 / ngf2 64 /
     ndf2 64, 2-scale D1 + 4-scale D2, --sequential_train
     --which_model_to_load G1 D1, --niter 150 --niter_decay 50, lr 2e-4),
     with a deliberate SIGKILL mid-run right after a latest-checkpoint
     save, then an exact resume (--continue_train --which_epoch latest,
     remaining epoch budget) through the full lr-decay phase;
  4. the README.md:23 test command verbatim (its published noise sizes
     sample at 256px; how_many 100; 'Random check' determinism probes),
     plus a train-geometry 512px sampling pass feeding the gate;
  5. the downstream gate (reference test_ss.py:46-51): train_ss on the
     512px generated pairs vs the real-pairs bound vs a label-shuffled
     negative control, all evaluated on the held-out real test split.

Writes RECIPE_r05.json.  ``--scale smoke`` runs the identical plumbing
(kill, resume, export, gate) at 128px on CPU in a few minutes.

Usage:  python tools/recipe_r05.py [--scale full|smoke] [--platform tpu|cpu]
"""

import argparse
import glob
import json
import os
import re
import shutil
import signal
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'tools'))

from quality_eval import (make_dataset_hard, make_label_shuffled,
                          parse_ss_metrics, build_args)

WORK = '/tmp/recipe_r05'
REAL = os.path.join(WORK, 'real')
GEN = os.path.join(WORK, 'gen')
CKPT = os.path.join(WORK, 'ckpt')
PRETRAINED = os.path.join(WORK, 'pretrained', 'twostage')
RESULTS = os.path.join(WORK, 'results')


# ----------------------------------------------------------------- args -- #

def full_cfg():
    """The README commands verbatim (geometry untouched); only paths,
    display_id 0, cadence (print every epoch, save latest every epoch so
    the mid-run kill has a recovery point), --cache_data (bit-identical
    loader RAM cache) and --abort_on_nan are ours."""
    n_train = 20                      # VNC has 20 annotated 1024px sections
    stage1 = [
        'train.py', '--dataroot', REAL, '--name', 'sgan_gan',
        '--model', 'fcgan', '--which_direction', 'A',
        '--dataset_mode', 'single', '--loadSize', '512', '--fineSize', '512',
        '--batchSize', '1', '--input_nc', '2',
        '--which_model_netG', 'deconv', '--n_layers_G', '5', '--ngf', '32',
        '--which_model_netD', 'n_layers', '--n_layers_D', '3', '3', '3',
        '--ndf', '32', '--scale_factor', '1', '2', '4',
        '--lambda_D', '0.5', '0.4', '0.1', '--noise_nc', '8',
        '--noiseSize', '8', '--norm', 'instance', '--no_dropout',
        '--n_update_G', '2', '--niter', '100', '--niter_decay', '100',
        '--display_freq', '40', '--save_epoch_freq', '200', '--no_lsgan',
        '--which_channel', 'rg', '--manualSeed', '0',
    ]
    stage2_net = [
        '--model', 'twostage_cycle', '--which_direction', 'AtoB',
        '--dataset_mode', 'single',
        '--transform_1to2', 'bilinear_2', '--batchSize', '1',
        '--input_nc', '2', '--output_nc', '1', '--which_channel', 'rg_b',
        '--which_model_netG1', 'fcgan', '--n_layers_G1', '5', '--ngf1', '32',
        '--which_model_netD1', 'n_layers', '--n_layers_D1', '3', '3',
        '--ndf1', '32', '--scale_factor1', '1', '2',
        '--which_model_netG2', 'crn', '--ngf2', '64',
        '--upsample_mode2', 'bilinear', '--n_layers_CRN_block2', '2',
        '--which_model_netF2', 'unet_128', '--nff2', '32',
        '--which_model_netD2', 'n_layers',
        '--n_layers_D2', '3', '4', '3', '4', '--ndf2', '64',
        '--scale_factor2', '1', '1', '2', '2',
        '--noise_nc1', '8', '--norm', 'instance', '--no_dropout1',
        '--noise_nc2', '8',
    ]
    stage2_train = [
        'train.py', '--dataroot', REAL, '--name', 'dsgan_model',
        '--loadSize', '1024', '--fineSize', '512',
        '--noiseSize1', '4', '--noiseSize2', '8',
        '--lambda_D1', '0.5', '0.4', '--lambda_D2', '0.3', '0.3', '0.2',
        '0.2', '--lambda_A', '10', '--lambda_B', '10',
        '--lambda_A_cycle', '5', '--lambda_fake_cycle', '1',
        '--n_update_G', '1', '--niter', '150', '--niter_decay', '50',
        '--display_freq', '40', '--save_epoch_freq', '200',
        '--no_lsgan1', '--no_lsgan2', '--sequential_train',
        '--manualSeed', '0', '--GAN_losses_D2', 'real_fake',
        '--GAN_losses_G2', 'real_fake', '--which_epoch_sequential', 'seq',
        '--which_model_to_load', 'G1', 'D1',
        '--pretrained_model_dir', PRETRAINED,
        '--lr1', '0.0002', '--lr2', '0.0002',
    ] + stage2_net
    # README.md:23 test command: published noise sizes halve the sampling
    # resolution (noiseSize1 2 -> 128px G1 label -> 256px image)
    test_readme = [
        'test.py', '--dataroot', os.path.join(WORK, 'null'),
        '--name', 'dsgan_model', '--loadSize', '512', '--fineSize', '512',
        '--noiseSize1', '2', '--noiseSize2', '4', '--manualSeed', '0',
        '--serial_batches', '--no_flip', '--no_rotate', '--how_many', '100',
        '--results_dir', os.path.join(WORK, 'results_readme'),
    ] + stage2_net
    # train-geometry sampling (512px pairs) feeding the downstream gate
    test_gate = [
        'test.py', '--dataroot', os.path.join(WORK, 'null'),
        '--name', 'dsgan_model', '--loadSize', '512', '--fineSize', '512',
        '--noiseSize1', '4', '--noiseSize2', '8', '--manualSeed', '0',
        '--serial_batches', '--no_flip', '--no_rotate', '--how_many', '100',
        '--save_as_single_image', '--results_dir', RESULTS,
    ] + stage2_net
    # save cadence: every 5 epochs (a full-state device->host fetch through
    # the relay costs seconds; every-epoch saving dominated wall-clock in
    # the first attempt).  The kill point must land on a save boundary.
    return dict(px_data=1024, px_fine=512, counts=(n_train, 4, 8),
                stage1=stage1, stage2_train=stage2_train,
                stage2_niter=150, stage2_decay=50, kill_epoch=85,
                test_readme=test_readme, test_gate=test_gate,
                ss_ngf=16, ss_epochs=20, dataset_size=n_train,
                save_freq=5 * n_train)


def smoke_cfg():
    """Same plumbing at 128px fineSize / 256px data on CPU."""
    n_train = 6
    stage1 = [
        'train.py', '--dataroot', REAL, '--name', 'sgan_gan',
        '--model', 'fcgan', '--which_direction', 'A',
        '--dataset_mode', 'single', '--loadSize', '128', '--fineSize', '128',
        '--batchSize', '1', '--input_nc', '2',
        '--which_model_netG', 'deconv', '--n_layers_G', '4', '--ngf', '8',
        '--which_model_netD', 'n_layers', '--n_layers_D', '2', '2', '2',
        '--ndf', '8', '--scale_factor', '1', '2', '4',
        '--lambda_D', '0.5', '0.4', '0.1', '--noise_nc', '8',
        '--noiseSize', '4', '--norm', 'instance', '--no_dropout',
        '--n_update_G', '2', '--niter', '1', '--niter_decay', '1',
        '--display_freq', '40', '--save_epoch_freq', '200', '--no_lsgan',
        '--which_channel', 'rg', '--manualSeed', '0',
    ]
    stage2_net = [
        '--model', 'twostage_cycle', '--which_direction', 'AtoB',
        '--dataset_mode', 'single',
        '--transform_1to2', 'bilinear_2', '--batchSize', '1',
        '--input_nc', '2', '--output_nc', '1', '--which_channel', 'rg_b',
        '--which_model_netG1', 'fcgan', '--n_layers_G1', '4', '--ngf1', '8',
        '--which_model_netD1', 'n_layers', '--n_layers_D1', '2', '2',
        '--ndf1', '8', '--scale_factor1', '1', '2',
        '--which_model_netG2', 'crn', '--ngf2', '8',
        '--upsample_mode2', 'bilinear', '--n_layers_CRN_block2', '2',
        '--which_model_netF2', 'unet_128', '--nff2', '8',
        '--which_model_netD2', 'n_layers',
        '--n_layers_D2', '2', '2', '2', '2', '--ndf2', '8',
        '--scale_factor2', '1', '1', '2', '2',
        '--noise_nc1', '8', '--norm', 'instance', '--no_dropout1',
        '--noise_nc2', '8',
    ]
    stage2_train = [
        'train.py', '--dataroot', REAL, '--name', 'dsgan_model',
        '--loadSize', '256', '--fineSize', '128',
        '--noiseSize1', '2', '--noiseSize2', '2',
        '--lambda_D1', '0.5', '0.4', '--lambda_D2', '0.3', '0.3', '0.2',
        '0.2', '--lambda_A', '10', '--lambda_B', '10',
        '--lambda_A_cycle', '5', '--lambda_fake_cycle', '1',
        '--n_update_G', '1', '--niter', '3', '--niter_decay', '2',
        '--display_freq', '40', '--save_epoch_freq', '200',
        '--no_lsgan1', '--no_lsgan2', '--sequential_train',
        '--manualSeed', '0', '--GAN_losses_D2', 'real_fake',
        '--GAN_losses_G2', 'real_fake', '--which_epoch_sequential', 'seq',
        '--which_model_to_load', 'G1', 'D1',
        '--pretrained_model_dir', PRETRAINED,
        '--lr1', '0.0002', '--lr2', '0.0002',
    ] + stage2_net
    test_readme = [
        'test.py', '--dataroot', os.path.join(WORK, 'null'),
        '--name', 'dsgan_model', '--loadSize', '128', '--fineSize', '128',
        '--noiseSize1', '2', '--noiseSize2', '2', '--manualSeed', '0',
        '--serial_batches', '--no_flip', '--no_rotate', '--how_many', '4',
        '--results_dir', os.path.join(WORK, 'results_readme'),
    ] + stage2_net
    test_gate = [
        'test.py', '--dataroot', os.path.join(WORK, 'null'),
        '--name', 'dsgan_model', '--loadSize', '128', '--fineSize', '128',
        '--noiseSize1', '2', '--noiseSize2', '2', '--manualSeed', '0',
        '--serial_batches', '--no_flip', '--no_rotate', '--how_many', '8',
        '--save_as_single_image', '--results_dir', RESULTS,
    ] + stage2_net
    return dict(px_data=256, px_fine=128, counts=(n_train, 2, 4),
                stage1=stage1, stage2_train=stage2_train,
                stage2_niter=3, stage2_decay=2, kill_epoch=2,
                test_readme=test_readme, test_gate=test_gate,
                ss_ngf=8, ss_epochs=2, dataset_size=n_train)


COMMON_TRAIN = ['--checkpoints_dir', CKPT, '--display_id', '0',
                '--cache_data', '--abort_on_nan',
                '--compute_dtype', 'bfloat16']
COMMON_TEST = ['--checkpoints_dir', CKPT, '--display_id', '0',
               '--compute_dtype', 'bfloat16']


# ------------------------------------------------------------- helpers -- #

def run(args, tag, platform, timeout=None):
    env = dict(os.environ)
    if platform != 'tpu':
        env['SGAN_TPU_PLATFORM'] = platform
    log = os.path.join(WORK, tag + '.log')
    t0 = time.time()
    with open(log, 'w') as f:
        rc = subprocess.call([sys.executable, '-u'] + args, cwd=ROOT,
                             env=env, stdout=f, stderr=subprocess.STDOUT,
                             timeout=timeout)
    dt = time.time() - t0
    out = open(log).read()
    print('[%s] rc=%d  %.0fs  (%s)' % (tag, rc, dt, log), flush=True)
    if rc != 0:
        print(out[-3000:])
        raise RuntimeError('%s failed' % tag)
    return out, dt


def run_until_kill(args, tag, platform, kill_pattern):
    """Launch a training run, SIGKILL it shortly after ``kill_pattern``
    appears in its log (a 'saving the latest model (epoch K' line), i.e. a
    hard mid-run failure with a known recovery point."""
    env = dict(os.environ)
    if platform != 'tpu':
        env['SGAN_TPU_PLATFORM'] = platform
    log = os.path.join(WORK, tag + '.log')
    t0 = time.time()
    with open(log, 'w') as f:
        proc = subprocess.Popen([sys.executable, '-u'] + args, cwd=ROOT,
                                env=env, stdout=f, stderr=subprocess.STDOUT)
        try:
            while proc.poll() is None:
                time.sleep(2)
                txt = open(log).read()
                if kill_pattern in txt:
                    time.sleep(4)      # let the async checkpoint write land
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    break
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
    dt = time.time() - t0
    out = open(log).read()
    killed = kill_pattern in out
    print('[%s] killed=%s rc=%s  %.0fs  (%s)'
          % (tag, killed, proc.returncode, dt, log), flush=True)
    if not killed:
        print(out[-3000:])
        raise RuntimeError('%s exited before the kill point' % tag)
    return out, dt


def export_seq(src_name, dst_dir):
    """Stage-1 fcgan checkpoints -> sequential twostage checkpoints.
    The DSGAN D1 bank has 2 scales (1,2); stage 1 trained 3 (1,2,4) — the
    first two are shape-identical (same ndf/n_layers/input_nc), the third
    is dropped, mirroring the published twostage_D1G1 layout."""
    os.makedirs(dst_dir, exist_ok=True)
    src = os.path.join(CKPT, src_name)
    pairs = [('latest_net_G.pth', 'seq_net_G1.pth'),
             ('latest_net_D_0.pth', 'seq_net_D1_0.pth'),
             ('latest_net_D_1.pth', 'seq_net_D1_1.pth')]
    for a, b in pairs:
        shutil.copy(os.path.join(src, a), os.path.join(dst_dir, b))
    return [b for _, b in pairs]


FLOAT = r'[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?'


def parse_loss_tail(out, n=3):
    """Last n printed loss lines as {name: value} dicts + finiteness."""
    lines = [l for l in out.splitlines()
             if l.startswith('(epoch:') and 'G2_GAN' in l]
    tail = []
    for l in lines[-n:]:
        vals = dict(re.findall(r'(\w+): (%s|nan|inf|-inf)' % FLOAT,
                               l.split(')', 1)[1]))
        tail.append({k: float(v) for k, v in vals.items()})
    finite = all(np.isfinite(list(d.values())).all() for d in tail) \
        and bool(tail)
    return tail, finite


def parse_decay(out):
    """All 'update learning rate: a -> b, c -> d' lines -> (count, last)."""
    hits = re.findall(r'update learning rate: (%s) -> (%s), (%s) -> (%s)'
                      % (FLOAT, FLOAT, FLOAT, FLOAT), out)
    if not hits:
        return 0, None
    last = hits[-1]
    return len(hits), {'lr1': float(last[1]), 'lr2': float(last[3])}


def ss_gate(cfg, platform, phases):
    """Reference test_ss.py:46-51 gate: train_ss on generated 512px pairs /
    real train split / label-shuffled pairs; test_ss on the real test
    split.  All rows share geometry: real images enter at their native
    scale (loadSize=px_data, random fineSize crop), generated pairs are
    already at crop scale (loadSize=px_fine)."""
    px, ngf, ep = cfg['px_fine'], cfg['ss_ngf'], cfg['ss_epochs']
    _, _, ss_net, ss_train = build_args(px, ngf)
    rows = {}
    for tag, root, load in phases:
        name = 'r05_ss_' + tag
        train_args = (['train_ss.py', '--dataroot', root, '--name', name,
                       '--checkpoints_dir', CKPT, '--niter', str(ep),
                       '--niter_decay', str(ep),
                       '--save_epoch_freq', str(2 * ep)]
                      + ss_train + ['--loadSize', str(load)])
        run(train_args, 'ss_train_' + tag, platform)
        out, _ = run(['test_ss.py', '--dataroot', REAL, '--name', name,
                      '--checkpoints_dir', CKPT, '--results_dir', RESULTS,
                      '--how_many', '999', '--which_epoch', 'latest',
                      '--phase', 'test'] + ss_net
                     + ['--loadSize', str(cfg['px_data'])],
                     'ss_test_' + tag, platform)
        rows[tag] = parse_ss_metrics(out)
        print('gate[%s]: %s' % (tag, rows[tag]), flush=True)
    return rows


# ---------------------------------------------------------------- main -- #

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scale', choices=('full', 'smoke'), default='full')
    ap.add_argument('--platform', default='tpu')
    ap.add_argument('--out', default='RECIPE_r05.json')
    ap.add_argument('--keep_work', action='store_true')
    args = ap.parse_args()
    cfg = (full_cfg if args.scale == 'full' else smoke_cfg)()

    if not args.keep_work:
        shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    # unconditional-sampling test.py still builds a loader; give it one
    # dummy image so the dataset is non-empty (reference uses datasets/null)
    null_dir = os.path.join(WORK, 'null', 'test')
    os.makedirs(null_dir, exist_ok=True)
    from PIL import Image
    Image.fromarray(np.zeros((cfg['px_fine'], cfg['px_fine'], 3),
                             np.uint8)).save(
        os.path.join(null_dir, '000.png'))
    t_all = time.time()

    print('=== phase 0: hard synthetic VNC-scale dataset (%dpx, %s)'
          % (cfg['px_data'], cfg['counts']), flush=True)
    make_dataset_hard(REAL, px=cfg['px_data'], counts=cfg['counts'])

    print('=== phase 1: stage-1 label GAN (README SGAN step 1)', flush=True)
    save_freq = cfg.get('save_freq', cfg['dataset_size'])
    out1, t1 = run(cfg['stage1'] + COMMON_TRAIN
                   + ['--save_latest_freq', str(save_freq),
                      '--print_freq', str(cfg['dataset_size'])],
                   'stage1_fcgan', args.platform)
    # stage-1 fcgan prints D/G losses (no G2_GAN) — check the printed tail
    lines1 = [l for l in out1.splitlines() if l.startswith('(epoch:')]
    finite1 = bool(lines1) and not any(
        re.search(r'\b(nan|inf)\b', l) for l in lines1[-3:])

    print('=== phase 2: export seq checkpoints', flush=True)
    exported = export_seq('sgan_gan', PRETRAINED)

    print('=== phase 3: stage-2 DSGAN (README.md:18) with mid-run kill',
          flush=True)
    extra = COMMON_TRAIN + ['--save_latest_freq', str(save_freq),
                            '--print_freq', str(cfg['dataset_size'])]
    kill_pat = 'saving the latest model (epoch %d,' % cfg['kill_epoch']
    out2a, t2a = run_until_kill(cfg['stage2_train'] + extra,
                                'stage2_train_killed', args.platform,
                                kill_pat)
    remaining = cfg['stage2_niter'] - cfg['kill_epoch']
    resume_args = [a for a in cfg['stage2_train']]
    resume_args[resume_args.index('--niter') + 1] = str(remaining)
    out2b, t2b = run(resume_args + extra
                     + ['--continue_train', '--which_epoch', 'latest'],
                     'stage2_train_resumed', args.platform)
    assert 'loading' in out2b, 'resume did not load checkpoints'
    tail2, finite2 = parse_loss_tail(out2b)
    n_decay, last_lr = parse_decay(out2b)

    print('=== phase 4: README test command (100 samples) + gate sampling',
          flush=True)
    out4, t4 = run(cfg['test_readme'] + COMMON_TEST, 'test_readme',
                   args.platform)
    rand_checks = re.findall(r'Random check: (%s)' % FLOAT, out4)
    n_png = len(glob.glob(os.path.join(
        WORK, 'results_readme', 'dsgan_model', 'test_latest', 'images',
        '*.png')))
    out4b, t4b = run(cfg['test_gate'] + COMMON_TEST, 'test_gate',
                     args.platform)

    os.makedirs(os.path.join(GEN, 'train'), exist_ok=True)
    imgs = sorted(glob.glob(os.path.join(
        RESULTS, 'dsgan_model', 'test_latest', 'images', '*AB*.png')))
    assert imgs, 'no generated AB pairs found'
    for p in imgs:
        shutil.copy(p, os.path.join(GEN, 'train', os.path.basename(p)))
    shutil.copytree(os.path.join(REAL, 'val'), os.path.join(GEN, 'val'),
                    dirs_exist_ok=True)
    neg = GEN + '_neg'
    make_label_shuffled(os.path.join(GEN, 'train'),
                        os.path.join(neg, 'train'))
    shutil.copytree(os.path.join(REAL, 'val'), os.path.join(neg, 'val'),
                    dirs_exist_ok=True)

    print('=== phase 5: downstream gate (3 rows)', flush=True)
    rows = ss_gate(cfg, args.platform, [
        ('gan', GEN, cfg['px_fine']),
        ('real_bound', REAL, cfg['px_data']),
        ('neg_control', neg, cfg['px_fine']),
    ])

    rec = {
        'pipeline': 'README.md:33 stage-1 fcgan rg -> seq export -> '
                    'README.md:18 DSGAN (kill + exact resume, 150+50 '
                    'epochs with lr decay) -> README.md:23 test 100 '
                    'samples -> downstream gate (test_ss.py:46-51) with '
                    'negative control',
        'scale': args.scale, 'platform': args.platform,
        'dataset': {'generator': 'make_dataset_hard', 'px': cfg['px_data'],
                    'fineSize': cfg['px_fine'],
                    'train/val/test': list(cfg['counts'])},
        'stage1': {'wall_sec': round(t1, 1), 'finite_tail': finite1,
                   'epochs': '100+100'},
        'seq_export': exported,
        'stage2': {
            'wall_sec_before_kill': round(t2a, 1),
            'wall_sec_resumed': round(t2b, 1),
            'killed_after_epoch': cfg['kill_epoch'],
            'kill_mode': 'SIGKILL after latest-checkpoint save',
            'resumed_with': '--continue_train --which_epoch latest '
                            '--niter %d --niter_decay %d'
                            % (remaining, cfg['stage2_decay']),
            'loss_tail': tail2, 'finite_tail': finite2,
            'decay_epochs_run': n_decay, 'final_lr': last_lr,
        },
        'test_readme': {'wall_sec': round(t4, 1),
                        'random_checks': rand_checks[:5],
                        'images_written': n_png},
        'gate': rows,
        'gate_monotone': bool(
            rows['real_bound'].get('meanIU', 0)
            >= rows['gan'].get('meanIU', 0) - 0.02
            and rows['gan'].get('meanIU', 0)
            > rows['neg_control'].get('meanIU', 1) + 0.05),
        'total_wall_sec': round(time.time() - t_all, 1),
    }
    with open(os.path.join(ROOT, args.out), 'w') as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
