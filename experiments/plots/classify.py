"""Real-vs-fake linear-SVM "realisticness" bars from shape features.

Port of the reference's experiments/plots/classify_script.m /
classify_script_2.m / *_new.m (one computation; the label→class mapping
and tags are flags):

  Groups are collapsed to classes by ``--label-mapping`` (both real
  splits map to class 1, classify_script.m:9).  Features are z-scored
  by the real(train) group (:14-17).  For 100 seeds (:24): per class
  take n_train = 100 (or 60% when the class has <200 rows, :32-34) —
  the real class deterministic-first, fakes sampled without
  replacement (:37-41); train a linear SVM real-vs-class-j on the
  train split (fitcsvm default = linear kernel, C=1, :63); test on up
  to 100 held-out class-j rows; the score is the fraction predicted
  REAL (:82) — how often the classifier is fooled.  Bars show
  mean±std over seeds (:87-99).

  python experiments/plots/classify.py --feat feat.mat --out bars.png
  python experiments/plots/classify.py --feat feat_2.mat \
      --label-mapping 1 1 2 3 4 5 6 \
      --tags Trivial Joint SGAN DSGAN Unsup Param   # = classify_script_2.m
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from plot_tsne import load_feat, zscore_by_real  # noqa: E402


def realisticness(X, y, n_seeds=100, n_train_cap=100, n_test_cap=100):
    """Per-class arrays of fooled-fractions over seeds.  ``y`` holds
    1-based class ids after label mapping; class 1 is real."""
    classes = np.unique(y)
    accs = {int(j): [] for j in classes if j != 1}
    for seed in range(n_seeds):  # rng(ii-1), classify_script.m:25
        rng = np.random.RandomState(seed)
        tr_idx, te_idx = [], []
        for j in classes:
            idx = np.flatnonzero(y == j)
            n = len(idx)
            n_train = n_train_cap if n >= 200 else int(np.ceil(n * 0.6))
            if j == 1:
                chosen = idx[:n_train]  # real split deterministic, :37-38
            else:
                chosen = rng.choice(idx, n_train, replace=False)
            mask = np.isin(idx, chosen)
            tr_idx.append(idx[mask])
            te_idx.append(idx[~mask])
        tr = np.concatenate(tr_idx)
        te = np.concatenate(te_idx)
        for j in classes:
            if j == 1:
                continue
            from sklearn.svm import SVC
            fit = (y[tr] == 1) | (y[tr] == j)
            clf = SVC(kernel='linear', C=1.0)  # fitcsvm '-s 0 -c 1'
            clf.fit(X[tr][fit], y[tr][fit])
            cand = te[y[te] == j]
            n_test = min(n_test_cap, len(cand))
            if n_test == 0:
                continue
            pick = rng.choice(cand, n_test, replace=False)
            pred = clf.predict(X[pick])
            accs[int(j)].append(np.mean(pred == 1))  # fooled, :82
    return {j: np.array(v) for j, v in accs.items()}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--feat', default='feat.mat')
    ap.add_argument('--label-mapping', nargs='+', type=int,
                    default=[1, 1, 2, 3, 4],
                    help='1-based class per feat group '
                    '(classify_script.m:9)')
    ap.add_argument('--tags', nargs='+',
                    default=['Real', 'FCGAN', 'Non-MS', 'Non-FC'])
    ap.add_argument('--seeds', type=int, default=100)
    ap.add_argument('--ylim', nargs=2, type=float, default=[0, 0.4])
    ap.add_argument('--out', default='classify.png')
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    X, label, _ = load_feat(args.feat)
    X = zscore_by_real(X, label)
    mapping = np.array(args.label_mapping)
    y = mapping[label - 1]

    accs = realisticness(X, y, n_seeds=args.seeds)
    ks = sorted(accs)
    means = np.array([accs[j].mean() for j in ks])
    errs = np.array([accs[j].std() for j in ks])
    for j, m in zip(ks, means):
        tag = args.tags[j - 1] if j - 1 < len(args.tags) else str(j)
        print('[%s] %.2f' % (tag, m * 100))

    fig, ax = plt.subplots(figsize=(2.6, 2.6))
    xs = np.arange(1, len(ks) + 1)
    ax.bar(xs, means)
    ax.errorbar(xs, means, yerr=errs, fmt='r.')
    for x, m, e in zip(xs, means, errs):
        dy = -e - 0.02 if m > 0.2 else e + 0.02  # classify_script.m:94-99
        ax.text(x, m + dy, '%.0f%%' % (m * 100),
                ha='center', fontsize=10)
    ax.set_xticks(xs)
    ax.set_xticklabels([args.tags[j - 1] if j - 1 < len(args.tags)
                        else str(j) for j in ks], rotation=37.5)
    ax.set_ylim(args.ylim)
    ax.set_ylabel('Realisticness')
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150, facecolor='white')
    print('wrote %s' % args.out)


if __name__ == '__main__':
    main()
