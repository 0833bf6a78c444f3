"""Aggregate a jax.profiler perfetto trace into a per-op cost table.

Usage: python tools/trace_top.py /tmp/prof_dsgan [N]

Finds the newest *.trace.json.gz under the directory, sums device-side
"XLA Ops" lane durations by op name, and prints the top N with bandwidth
(from the profiler's bytes_accessed) so compute-bound and bandwidth-bound
ops are distinguishable at a glance.  Works through the axon relay —
device tracing is supported even though executable serialization is not.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(root):
    paths = sorted(glob.glob(os.path.join(root, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f'no trace under {root}')
    with gzip.open(paths[-1]) as f:
        return json.load(f)['traceEvents'], paths[-1]


def device_op_events(ev):
    dev_pids = {e['pid'] for e in ev
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and 'TPU' in e['args'].get('name', '')}
    op_tids = {(e['pid'], e['tid']) for e in ev
               if e.get('ph') == 'M' and e.get('name') == 'thread_name'
               and e['pid'] in dev_pids
               and e['args'].get('name') == 'XLA Ops'}
    return [e for e in ev if e.get('ph') == 'X'
            and (e.get('pid'), e.get('tid')) in op_tids]


def base_name(name):
    """fusion.822 -> fusion; convolution.17 -> convolution (family key)."""
    return re.sub(r'\.\d+$', '', name)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/prof_dsgan'
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    ev, path = load_events(root)
    ops = device_op_events(ev)
    dur = collections.Counter()      # us, by individual op
    byt = collections.Counter()
    cnt = collections.Counter()
    for e in ops:
        dur[e['name']] += e['dur']
        cnt[e['name']] += 1
        byt[e['name']] += int((e.get('args') or {}).get('bytes_accessed', 0))
    total = sum(dur.values())
    print(f'{path}\ntotal device op time: {total/1e3:.2f} ms '
          f'({len(ops)} events)\n')
    print(f'{"ms":>9} {"%":>5} {"n":>4} {"GB/s":>6}  op')
    for name, d in dur.most_common(topn):
        bw = byt[name] / (d * 1e-6) / 1e9 if d else 0
        print(f'{d/1e3:9.3f} {100*d/total:5.1f} {cnt[name]:4d} {bw:6.0f}  '
              f'{name[:85]}')
    fam = collections.Counter()
    for name, d in dur.items():
        fam[base_name(name)] += d
    print('\nby family:')
    for name, d in fam.most_common(25):
        print(f'{d/1e3:9.3f} {100*d/total:5.1f}  {name[:85]}')


if __name__ == '__main__':
    main()
