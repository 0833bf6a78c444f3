"""t-SNE scatter of shape features, one color per image group.

Port of the reference's experiments/plots/plot_tsne.m / plot_tsne_2.m /
*_new.m family (all four are the same computation with different tags,
group subsets and axis limits — here those are flags):

  features are z-scored by the REAL(train) group's mean/std
  (plot_tsne.m:9-12, std with MATLAB's default N-1 normalization),
  rows shuffled, embedded with 2-D t-SNE at seed 0 (:19-20), and up to
  100 points per group scattered — group 1 red, group 2 blue, the rest
  on the default color cycle (:28-34), legend lower-left (:38).

  python experiments/plots/plot_tsne.py --feat feat.mat --out tsne.png
  python experiments/plots/plot_tsne.py --feat feat_2.mat \
      --tags 'real (train)' 'real (val)' joint SGAN DSGAN unsup param \
      --xlim -50 50 --ylim -40 40           # = plot_tsne_2.m
  python experiments/plots/plot_tsne.py --skip-groups 2 ...  # = *_new.m
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TAGS = ['real (train)', 'real (val)', 'FCGAN', 'non-MS', 'non-FC']


def load_feat(path):
    """feat.mat -> (X rows, 1-based label per row, tags or None)."""
    from scipy.io import loadmat
    d = loadmat(path, squeeze_me=False)
    cells = d['feat'].ravel()
    X = np.concatenate([np.atleast_2d(c) for c in cells], axis=0)
    label = np.asarray(d['label']).ravel().astype(int)
    tags = None
    if 'tags' in d:
        tags = [str(np.asarray(t).ravel()[0]) for t in
                np.asarray(d['tags']).ravel()]
    return X, label, tags


def zscore_by_real(X, label):
    """z-score every row by the group-1 (real train) statistics
    (plot_tsne.m:9-12; ddof=1 = MATLAB std(X,0,1))."""
    xr = X[label == 1]
    mu = xr.mean(0)
    sigma = xr.std(0, ddof=1)
    sigma = np.where(sigma == 0, 1.0, sigma)
    return (X - mu) / sigma


def tsne_embed(X, seed=0, perplexity=30.0):
    from sklearn.manifold import TSNE
    perplexity = min(perplexity, max(2.0, (X.shape[0] - 1) / 3.0))
    return TSNE(n_components=2, random_state=seed,
                perplexity=perplexity, init='pca').fit_transform(X)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--feat', default='feat.mat')
    ap.add_argument('--tags', nargs='+', default=None)
    ap.add_argument('--skip-groups', nargs='*', type=int, default=[],
                    help='1-based group ids to leave off the plot '
                    '(plot_tsne_new.m drops group 2)')
    ap.add_argument('--max-per-group', type=int, default=100)
    ap.add_argument('--xlim', nargs=2, type=float, default=[-50, 50])
    ap.add_argument('--ylim', nargs=2, type=float, default=[-25, 25])
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--out', default='tsne.png')
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    X, label, tags_in_file = load_feat(args.feat)
    tags = args.tags or tags_in_file or DEFAULT_TAGS
    n_group = int(label.max())

    X = zscore_by_real(X, label)
    rng = np.random.RandomState(args.seed)
    perm = rng.permutation(X.shape[0])  # plot_tsne.m:15-17
    X, label = X[perm], label[perm]
    Y = tsne_embed(X, seed=args.seed)

    fig, ax = plt.subplots(figsize=(4.5, 4.25))
    for i in range(1, n_group + 1):
        if i in args.skip_groups:
            continue
        idx = np.flatnonzero(label == i)
        idx = idx[rng.permutation(len(idx))[:args.max_per_group]]
        color = {1: 'r', 2: 'b'}.get(i)
        ax.scatter(Y[idx, 0], Y[idx, 1], c=color, alpha=0.8, s=24,
                   label=tags[i - 1] if i - 1 < len(tags) else str(i))
    ax.legend(loc='lower left', fontsize=8)
    ax.grid(True)
    ax.set_xlim(args.xlim)
    ax.set_ylim(args.ylim)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150, facecolor='white')
    print('wrote %s' % args.out)


if __name__ == '__main__':
    main()
