"""Loader-vs-chip throughput for every gating geometry (round-5 item 3).

Round 4 proved the 1-core loader was the real-data bottleneck for the
DSGAN geometry (33.5 img/s vs the chip's 36) and fixed it (48.9 streaming
/ 117 cached).  But BENCH_EXTRA shows the fcgan family runs at 133-162
img/s on device — this tool measures CreateDataLoader throughput at each
recipe's exact data geometry (README commands) over a synthetic 1024px
VNC-scale set, streaming and with --cache_data, and reports the margin
against the recorded device rates.

Run:  python tools/bench_loader.py [--n 20] [--epochs 3] [--out BENCH_LOADER_r05.json]
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = '/tmp/bench_loader_data'

# (tag, loadSize, device img/s from BENCH_r04/BENCH_EXTRA_r04) — fineSize
# 512 everywhere; transforms follow the README commands: DSGAN/cgan crop
# 512 from native 1024, fcgan/jointgan resize 1024->512 (no crop).
GEOMETRIES = [
    ('dsgan_512', 1024, 35.9),      # device rates: BENCH_EXTRA_r05.json
    ('cgan_512', 1024, 43.1),
    ('fcgan_512', 512, 161.5),
    ('jointgan_512', 512, 152.9),
]


def make_data(n):
    """VNC-like content (quality_eval.make_dataset_hard), NOT noise —
    noise PNGs don't deflate (~3 MB/file vs ~0.5 MB structured) and
    overstate decode cost ~2x vs representative data."""
    shutil.rmtree(DATA, ignore_errors=True)
    sys.path.insert(0, os.path.join(ROOT, 'tools'))
    from quality_eval import make_dataset_hard
    make_dataset_hard(DATA, px=1024, counts=(n, 0, 0))


def measure(load_size, cache, epochs, warm_epochs=1):
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.data import CreateDataLoader
    args = ['--dataroot', DATA, '--name', 'bl', '--model', 'fcgan',
            '--dataset_mode', 'single', '--loadSize', str(load_size),
            '--fineSize', '512', '--batchSize', '1', '--which_channel',
            'rg_b', '--which_model_netG', 'deconv', '--manualSeed', '0',
            '--checkpoints_dir', '/tmp/bl_ckpt', '--display_id', '0'] \
        + (['--cache_data'] if cache else [])
    opt = TrainOptions().parse(args)
    loader = CreateDataLoader(opt)
    data = loader.load_data()
    n = 0
    for _ in range(warm_epochs):          # fill the cache / page the files
        for _ in data:
            pass
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in data:
            n += batch['A'].shape[0] if hasattr(batch['A'], 'shape') else 1
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=20)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--out', default='BENCH_LOADER_r05.json')
    args = ap.parse_args()
    make_data(args.n)

    rows = {}
    for tag, load_size, device_img_s in GEOMETRIES:
        stream = measure(load_size, False, args.epochs)
        cached = measure(load_size, True, args.epochs)
        rows[tag] = {
            'loadSize': load_size, 'fineSize': 512,
            'loader_stream_img_s': round(stream, 1),
            'loader_cached_img_s': round(cached, 1),
            'device_img_s': device_img_s,
            'stream_margin': round(stream / device_img_s, 2),
            'cached_margin': round(cached / device_img_s, 2),
        }
        print(tag, rows[tag], flush=True)

    rec = {'metric': 'loader_vs_device_img_s_by_geometry',
           'host': '1 CPU core', 'dataset': '%d x 1024px PNG' % args.n,
           'rows': rows,
           'note': 'margin >= 1.0 means the loader outruns the chip; '
                   'cached = --cache_data (bit-identical, round 4)'}
    with open(os.path.join(ROOT, args.out), 'w') as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
