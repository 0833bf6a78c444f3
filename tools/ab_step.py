"""A/B lab for the full DSGAN bench step under env-flag gates.

Runs the bench.py recipe (warm start from the persistent compile cache),
measures per-step wall windows and a profiler device trace, and prints one
compact JSON line.  Because kernel gates are read at import time, each arm
is a fresh process:

    SGAN_TPU_CONV3_IN=0 python tools/ab_step.py --tag conv3in_off
    python tools/ab_step.py --tag conv3in_on

Optionally dumps the per-op device table (tools/trace_top.py) with
--top N.
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

WINDOW_STEPS = 30
N_WINDOWS = 3
TRACE_STEPS = 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tag', default='ab')
    ap.add_argument('--top', type=int, default=0)
    ap.add_argument('--windows', type=int, default=N_WINDOWS)
    ap.add_argument('--trace_dir', default=None)
    args = ap.parse_args()

    import jax
    import numpy as np
    from supervised_gan_tpu.runtime import enable_compilation_cache
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model
    from bench import DSGAN_ARGS, _module_lane

    enable_compilation_cache()
    opt = TrainOptions().parse(DSGAN_ARGS)
    model = create_model(opt)

    rng = np.random.RandomState(0)
    batch = {'A': rng.uniform(-1, 1, (opt.batchSize, opt.fineSize,
                                      opt.fineSize, 3)).astype(np.float32),
             'A_paths': ['bench.png'] * opt.batchSize}
    model.set_input(batch)
    t0 = time.perf_counter()
    for _ in range(5):
        model.optimize_parameters()
    model.get_current_errors()
    warm_s = time.perf_counter() - t0

    windows = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(WINDOW_STEPS):
            model.optimize_parameters()
        model.get_current_errors()
        dt = time.perf_counter() - t0
        windows.append(WINDOW_STEPS * opt.batchSize / dt)
    img_s = statistics.median(windows)

    trace_dir = args.trace_dir or ('/tmp/ab_trace_%s' % args.tag)
    device_ms = cadence_ms = None
    try:
        jax.profiler.start_trace(trace_dir)
        for _ in range(TRACE_STEPS):
            model.optimize_parameters()
        model.get_current_errors()
        jax.profiler.stop_trace()
        device_ms, cadence_ms = _module_lane(trace_dir)
    except Exception as e:
        print('trace failed: %r' % e, file=sys.stderr)

    rec = {'tag': args.tag, 'img_s': round(img_s, 3),
           'windows': [round(w, 3) for w in windows],
           'wall_ms': round(1e3 / img_s, 2),
           'device_ms': device_ms, 'cadence_ms': cadence_ms,
           'warm_s': round(warm_s, 1),
           'gates': {k: v for k, v in os.environ.items()
                     if k.startswith('SGAN_TPU')}}
    print(json.dumps(rec))

    if args.top:
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     'trace_top.py'),
                        trace_dir, str(args.top)])


if __name__ == '__main__':
    main()
