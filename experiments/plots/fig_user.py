"""User-study result bars from the saved per-subject .mat files.

Port of the reference's experiments/plots/fig_user{,_2..5}.m — all five
are one computation over ``<src>/<dataset>/<mode>/*.mat`` study records
with different groupings, so they are flags here:

  fig_user.m    one dataset+mode, Expert vs Non-Expert accuracy bars
                -> --datasets sgan --modes x --split-expert
  fig_user_2.m  dataset sgan over modes x/y/xy, expert accuracy
                -> --datasets sgan --modes x y xy --who expert
  fig_user_3.m  datasets over mode y, expert accuracy
                -> --datasets sgan_single param_single --modes y --who expert
  fig_user_4.m  *_single datasets, mode y, FOOLED metric
                -> ... --metric fooled
  fig_user_5.m  datasets over mode x, fooled metric, reordered tags
                -> --datasets dsgan sgan joint unsup --modes x --metric fooled

Metrics (per subject): ``accuracy`` = num_correct/num_total
(fig_user.m:14); ``fooled`` = fraction of fake panels (gt==1) the
subject marked real (gs==0) (fig_user_5.m:17-19) — higher is better for
the generator.
"""

import argparse
import glob
import os

import numpy as np


def load_records(src, dataset, mode):
    """Per-subject (metric inputs, expert flag) from a study dir."""
    from scipy.io import loadmat
    recs = []
    for path in sorted(glob.glob(os.path.join(src, dataset, mode,
                                              '*.mat'))):
        s = loadmat(path, squeeze_me=True)
        recs.append({
            'num_correct': float(np.asarray(s['num_correct']).ravel()[0]),
            'num_total': float(np.asarray(s['num_total']).ravel()[0]),
            'vector_gt': np.asarray(s['vector_gt']).ravel(),
            'vector_gs': np.asarray(s['vector_gs']).ravel(),
            'expert': bool(np.asarray(s['expert']).ravel()[0]),
        })
    return recs


def subject_metric(rec, metric):
    if metric == 'accuracy':
        return rec['num_correct'] / max(rec['num_total'], 1.0)
    fake = rec['vector_gt'] == 1
    n = fake.sum()
    return float((rec['vector_gs'][fake] == 0).sum()) / max(n, 1)


def collect(src, datasets, modes, metric, who):
    """(labels, means, stds) — one bar per dataset×mode cell."""
    labels, means, stds = [], [], []
    for ds in datasets:
        for mode in modes:
            recs = load_records(src, ds, mode)
            if who == 'expert':
                recs = [r for r in recs if r['expert']]
            elif who == 'nonexpert':
                recs = [r for r in recs if not r['expert']]
            vals = np.array([subject_metric(r, metric) for r in recs])
            labels.append(ds if len(modes) == 1 else
                          (mode if len(datasets) == 1 else
                           '%s/%s' % (ds, mode)))
            means.append(vals.mean() if len(vals) else np.nan)
            stds.append(vals.std(ddof=1) if len(vals) > 1 else 0.0)
    return labels, np.array(means), np.array(stds)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--src', default='experiments/user_study/data/user')
    ap.add_argument('--datasets', nargs='+', default=['sgan'])
    ap.add_argument('--modes', nargs='+', default=['x'])
    ap.add_argument('--metric', choices=['accuracy', 'fooled'],
                    default='accuracy')
    ap.add_argument('--who', choices=['expert', 'nonexpert', 'all'],
                    default='expert')
    ap.add_argument('--split-expert', action='store_true',
                    help='fig_user.m: two bars, Expert vs Non-Expert, '
                    'for a single dataset+mode')
    ap.add_argument('--tags', nargs='+', default=None)
    ap.add_argument('--ylim', nargs=2, type=float, default=None)
    ap.add_argument('--out', default='fig_user.png')
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    if args.split_expert:
        labels, means, stds = [], [], []
        for who, tag in (('expert', 'Expert'), ('nonexpert', 'Non-Expert')):
            _, m, s = collect(args.src, args.datasets[:1], args.modes[:1],
                              args.metric, who)
            labels.append(tag)
            means.append(m[0])
            stds.append(s[0])
        means, stds = np.array(means), np.array(stds)
    else:
        labels, means, stds = collect(args.src, args.datasets, args.modes,
                                      args.metric, args.who)
    if args.tags:
        labels = args.tags

    fig, ax = plt.subplots(figsize=(2.6, 2.8))
    xs = np.arange(1, len(labels) + 1)
    ax.bar(xs, means)
    ax.errorbar(xs, means, yerr=stds, fmt='r.')
    for x, m, s in zip(xs, means, stds):
        if not np.isfinite(m):
            continue
        dy = -s - 0.04 if m > 0.7 else s + 0.04  # fig_user.m:29-34
        ax.text(x, m + dy, '%.0f%%' % (m * 100), ha='center', fontsize=10)
    ax.set_xticks(xs)
    ax.set_xticklabels(labels, rotation=37.5)
    if args.ylim:
        ax.set_ylim(args.ylim)
    ax.set_ylabel('Accuracy' if args.metric == 'accuracy'
                  else 'Realisticness')
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150, facecolor='white')
    for lbl, m, s in zip(labels, means, stds):
        print('[%s] %.3f +/- %.3f' % (lbl, m, s))
    print('wrote %s' % args.out)


if __name__ == '__main__':
    main()
