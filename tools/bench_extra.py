"""Bench the non-DSGAN gating configs (round-3 verdict item 3).

BASELINE.md lists five gating configs; bench.py measures only the DSGAN
flagship, and every default-ON perf gate was tuned on DSGAN traces.  This
tool applies bench.py's methodology (median-of-3 wall windows, profiler
device-step probe, value-fetch barriers) to the other two published
512px train recipes:

  * fcgan UnsupervisedGAN 512px (reference README.md "Train a
    UnsupervisedGAN model": deconv G n5 ngf32, 3-scale D bank, b channel)
  * cgan pix2pix unet_256 512px (reference README.md "Step 2, training a
    CGAN model": unet_256 ngf64, 2-scale D, weighted L1)

Because kernel gates are read at import time, each (config, env) arm runs
as a fresh child process; the parent aggregates one JSON object per arm
into BENCH_EXTRA_r04.json.

  python tools/bench_extra.py                 # both configs, default gates
  python tools/bench_extra.py --configs fcgan --env SGAN_TPU_S2D=6d  # A/B
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WINDOW_STEPS = 30
N_WINDOWS = 3
TRACE_STEPS = 12

# reference README.md "Train a UnsupervisedGAN model" (training-cadence
# flags dropped; lr is a traced scalar so throughput is lr-independent)
FCGAN_ARGS = [
    '--dataroot', '/tmp/bench_unused', '--name', 'bench_fcgan_unsup',
    '--model', 'fcgan', '--which_direction', 'A',
    '--dataset_mode', 'single', '--loadSize', '512', '--fineSize', '512',
    '--batchSize', '1', '--input_nc', '2',
    '--which_model_netG', 'deconv', '--n_layers_G', '5', '--ngf', '32',
    '--which_model_netD', 'n_layers', '--n_layers_D', '3', '3', '3',
    '--ndf', '32', '--scale_factor', '1', '2', '4',
    '--lambda_D', '0.5', '0.4', '0.1',
    '--noise_nc', '8', '--noiseSize', '8', '--norm', 'instance',
    '--no_dropout', '--n_update_G', '2', '--no_lsgan',
    '--which_channel', 'b', '--manualSeed', '0', '--lr', '0.00002',
    '--checkpoints_dir', '/tmp/bench_ckpt', '--display_id', '0',
    '--compute_dtype', 'bfloat16',
]

# reference README.md "Step 2, training a CGAN model" (pix2pix unet_256)
CGAN_ARGS = [
    '--dataroot', '/tmp/bench_unused', '--name', 'bench_cgan_pix2pix',
    '--model', 'cgan', '--which_direction', 'AtoB',
    '--dataset_mode', 'single', '--loadSize', '1024', '--fineSize', '512',
    '--batchSize', '1', '--input_nc', '2', '--output_nc', '1',
    '--which_model_netG', 'unet_256', '--ngf', '64',
    '--which_model_netD', 'n_layers', '--n_layers_D', '3', '4',
    '--ndf', '64', '--scale_factor', '1', '1', '--lambda_D', '0.5', '0.5',
    '--lambda_A', '10', '--noise_nc', '8', '--noiseSize', '4',
    '--norm', 'instance', '--n_update_G', '2', '--weight_L1', '2', '4',
    '--no_lsgan', '--manualSeed', '0', '--add_gaussian_noise',
    '--which_channel', 'rg_b', '--lr', '0.00002',
    '--checkpoints_dir', '/tmp/bench_ckpt', '--display_id', '0',
    '--compute_dtype', 'bfloat16',
]

# reference README.md "Train a JointGAN model": identical to the
# UnsupervisedGAN command except --which_channel rg_b (G models the
# joint (label, image) distribution -> 3-channel pipeline).  Replace
# positionally so another bare 'b' value can never be rewritten.
JOINTGAN_ARGS = list(FCGAN_ARGS)
JOINTGAN_ARGS[JOINTGAN_ARGS.index('--which_channel') + 1] = 'rg_b'
JOINTGAN_ARGS[JOINTGAN_ARGS.index('bench_fcgan_unsup')] = 'bench_jointgan'

CONFIGS = {'fcgan_unsup_512': FCGAN_ARGS, 'cgan_pix2pix_512': CGAN_ARGS,
           'fcgan_joint_512': JOINTGAN_ARGS}


def _dsgan_args():
    # the bench.py flagship config (README.md:18 geometry), importable so
    # --batch sweeps can cover DSGAN too (round-5 verdict item 7)
    from bench import DSGAN_ARGS
    return list(DSGAN_ARGS)


CONFIGS['dsgan_512'] = _dsgan_args


def measure(config, batch_size=None):
    """Child: run one config on the attached chip, print one JSON line."""
    import jax
    import numpy as np
    from supervised_gan_tpu.runtime import enable_compilation_cache
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model
    from bench import _module_lane

    enable_compilation_cache()
    argv = CONFIGS[config]
    argv = argv() if callable(argv) else list(argv)
    if batch_size:
        argv[argv.index('--batchSize') + 1] = str(batch_size)
    opt = TrainOptions().parse(argv)
    model = create_model(opt)
    rng = np.random.RandomState(0)
    batch = {'A': rng.uniform(-1, 1, (opt.batchSize, opt.fineSize,
                                      opt.fineSize, 3)).astype(np.float32),
             'A_paths': ['bench.png'] * opt.batchSize}
    model.set_input(batch)

    t0 = time.perf_counter()
    for _ in range(5):
        model.optimize_parameters()
    model.get_current_errors()           # value fetch = true barrier
    warm_s = time.perf_counter() - t0

    windows = []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(WINDOW_STEPS):
            model.optimize_parameters()
        model.get_current_errors()
        dt = time.perf_counter() - t0
        windows.append(WINDOW_STEPS * opt.batchSize / dt)
    img_per_sec = statistics.median(windows)

    device_ms = cadence_ms = None
    try:
        trace_dir = '/tmp/bench_extra_trace_%s' % config
        jax.profiler.start_trace(trace_dir)
        for _ in range(TRACE_STEPS):
            model.optimize_parameters()
        model.get_current_errors()
        jax.profiler.stop_trace()
        device_ms, cadence_ms = _module_lane(trace_dir)
    except Exception:
        pass

    errors = model.get_current_errors()
    wall_ms = 1e3 * opt.batchSize / img_per_sec
    rec = {
        'config': config,
        'batchSize': opt.batchSize,
        'value': round(img_per_sec, 3),
        'unit': 'images/sec',
        'finite': bool(np.all(np.isfinite(list(errors.values())))),
        'windows_img_s': [round(w, 3) for w in windows],
        'wall_ms_per_step': round(wall_ms, 2),
        'device_ms_per_step': device_ms,
        'device_cadence_ms': cadence_ms,
        'host_gap_ms': (round(wall_ms - cadence_ms, 2)
                        if cadence_ms else None),
        'warmup_compile_s': round(warm_s, 1),
        'backend': jax.default_backend(),
        'env_overrides': {k: v for k, v in os.environ.items()
                          if k.startswith('SGAN_TPU_')
                          and k not in ('SGAN_TPU_XLA_CACHE',)},
    }
    print('BENCH_EXTRA_JSON ' + json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--configs', nargs='+', default=list(CONFIGS),
                    choices=list(CONFIGS))
    ap.add_argument('--env', nargs='*', default=[],
                    help='KEY=VAL gate overrides for an A/B arm')
    ap.add_argument('--child', default=None, help=argparse.SUPPRESS)
    ap.add_argument('--batch', type=int, default=None,
                    help='override --batchSize (batch-scaling sweeps)')
    ap.add_argument('--out', default=os.path.join(ROOT,
                                                  'BENCH_EXTRA_r04.json'))
    args = ap.parse_args()

    if args.child:
        measure(args.child, args.batch)
        return

    results = []
    for cfg in args.configs:
        env = dict(os.environ)
        for kv in args.env:
            k, v = kv.split('=', 1)
            env[k] = v
        print('[bench_extra] %s %s' % (cfg, args.env or '(default gates)'),
              flush=True)
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            '--child', cfg]
                           + (['--batch', str(args.batch)] if args.batch
                              else []), env=env, cwd=ROOT,
                           capture_output=True, text=True)
        sys.stderr.write(p.stderr[-2000:])
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith('BENCH_EXTRA_JSON '):
                rec = json.loads(line[len('BENCH_EXTRA_JSON '):])
        if rec is None:
            print(p.stdout[-3000:])
            raise RuntimeError('%s child failed rc=%d' % (cfg, p.returncode))
        print(json.dumps(rec), flush=True)
        results.append(rec)

    payload = {'note': 'non-DSGAN gating configs, bench.py methodology '
                       '(windows + device probe); see BENCH_r04.json for '
                       'the DSGAN flagship', 'runs': results}
    out = args.out
    if args.batch and out.endswith('BENCH_EXTRA_r04.json'):
        # batch sweeps never clobber the default-gates artifact
        out = os.path.join(ROOT, 'BENCH_BATCH%d_r05.json' % args.batch)
    # only a default-gates run covering the full default config set owns
    # the artifact file; partial/A-B runs just print their JSON lines
    full_set = set(args.configs) >= {'fcgan_unsup_512', 'cgan_pix2pix_512',
                                     'fcgan_joint_512'}
    if not args.env and (full_set or out != os.path.join(
            ROOT, 'BENCH_EXTRA_r04.json')):
        with open(out, 'w') as f:
            json.dump(payload, f, indent=1)
        print('wrote %s' % out)


if __name__ == '__main__':
    main()
