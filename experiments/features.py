"""Shape-feature extraction for the evaluation plots.

The reference's plot scripts (experiments/plots/plot_tsne*.m,
classify_script*.m) consume a precomputed ``feat.mat`` holding a cell
array ``feat`` (one (n_images, D) matrix per image group) and a row
vector ``label`` (group id per row of cat(1, feat{:})); the extraction
itself is not in the reference repo (its README.md:89-92 points at
released feature files).  This module provides the missing producer so
the ported tower is runnable end to end, and writes the same .mat
schema so the original MATLAB consumers accept its output too.

Feature vector (per image, D=16), computed on label PNGs in the
framework's output layout (``<stem>_label.png``; membrane = channel 0,
mitochondria = channel 1, matching the user-study utilities):

  0 log1p(object count)          8  eccentricity mean
  1 mito area fraction           9  eccentricity std
  2 object area mean (px)       10  extent mean (area/bbox)
  3 object area std             11  extent std
  4 perimeter mean (px)         12  equivalent-diameter mean
  5 perimeter std               13  equivalent-diameter std
  6 circularity mean (4·pi·A/P^2)  14 membrane density
  7 circularity std             15  membrane edge density

Usage:
  python experiments/features.py --out feat.mat \
      --group 'real (train)=/path/to/train_labels' \
      --group 'FCGAN=results/exp/test_latest/images'
"""

import argparse
import glob
import os
import sys

import numpy as np
from scipy import ndimage
from scipy.io import savemat

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from user_study.utils import binary_edge  # noqa: E402

MIN_OBJECT_PX = 16
FEATURE_DIM = 16


def _imread(path):
    from PIL import Image
    return np.array(Image.open(path).convert('RGB'))


def _object_stats(mask):
    """Per-object (area, perimeter, circularity, eccentricity, extent,
    eqdiam) arrays for the 8-connected components of a boolean mask."""
    lab, n = ndimage.label(mask, structure=np.ones((3, 3), bool))
    out = []
    for sl, idx in zip(ndimage.find_objects(lab), range(1, n + 1)):
        obj = lab[sl] == idx
        area = float(obj.sum())
        if area < MIN_OBJECT_PX:
            continue
        perim = float(binary_edge(obj).sum())
        circ = 4.0 * np.pi * area / max(perim, 1.0) ** 2
        ys, xs = np.nonzero(obj)
        yc, xc = ys.mean(), xs.mean()
        mu20 = ((xs - xc) ** 2).mean()
        mu02 = ((ys - yc) ** 2).mean()
        mu11 = ((xs - xc) * (ys - yc)).mean()
        tr, det = mu20 + mu02, mu20 * mu02 - mu11 ** 2
        disc = max(tr * tr / 4.0 - det, 0.0) ** 0.5
        l1, l2 = tr / 2.0 + disc, tr / 2.0 - disc
        ecc = (1.0 - max(l2, 1e-12) / max(l1, 1e-12)) ** 0.5
        extent = area / float(obj.size)
        eqd = 2.0 * (area / np.pi) ** 0.5
        out.append((area, perim, circ, ecc, extent, eqd))
    return np.array(out, np.float64).reshape(-1, 6)


def image_features(arr):
    """FEATURE_DIM-vector for one (H, W, 3) uint8 label image."""
    mito = arr[:, :, 1] > 127
    memb = arr[:, :, 0] > 127
    st = _object_stats(mito)
    f = np.zeros(FEATURE_DIM, np.float64)
    f[0] = np.log1p(st.shape[0])
    f[1] = mito.mean()
    if st.shape[0]:
        for k in range(5):  # area, perim, circ, ecc, extent
            f[2 + 2 * k] = st[:, k].mean()
            f[3 + 2 * k] = st[:, k].std()
        f[12] = st[:, 5].mean()
        f[13] = st[:, 5].std()
    f[14] = memb.mean()
    f[15] = binary_edge(memb).mean()
    return f


def group_features(directory, pattern='*_label.png', limit=None):
    """(n_images, FEATURE_DIM) matrix for every matching PNG in a
    directory (falls back to *.png when no *_label.png exist, so plain
    label dumps work too)."""
    paths = sorted(glob.glob(os.path.join(directory, pattern)))
    if not paths:
        paths = sorted(glob.glob(os.path.join(directory, '*.png')))
    if limit:
        paths = paths[:limit]
    return np.stack([image_features(_imread(p)) for p in paths]) \
        if paths else np.zeros((0, FEATURE_DIM))


def save_feat_mat(path, groups):
    """Write the reference schema: ``feat`` 1xN cell of per-group
    matrices, ``label`` 1xtotal row of 1-based group ids, ``tags`` the
    group names (extra, harmless to the MATLAB consumers)."""
    cell = np.empty((1, len(groups)), dtype=object)
    labels = []
    for i, (_, mat) in enumerate(groups):
        cell[0, i] = mat
        labels.extend([i + 1] * mat.shape[0])
    savemat(path, {
        'feat': cell,
        'label': np.array(labels, np.float64).reshape(1, -1),
        'tags': np.array([t for t, _ in groups], dtype=object),
    })


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--group', action='append', required=True,
                    metavar='TAG=DIR', help='image group, repeatable; '
                    'order defines the 1-based label ids')
    ap.add_argument('--out', default='feat.mat')
    ap.add_argument('--pattern', default='*_label.png')
    ap.add_argument('--limit', type=int, default=None,
                    help='max images per group')
    args = ap.parse_args(argv)

    groups = []
    for spec in args.group:
        tag, _, d = spec.partition('=')
        if not d:
            ap.error('--group must be TAG=DIR, got %r' % spec)
        mat = group_features(d, args.pattern, args.limit)
        print('[%s] %d images from %s' % (tag, mat.shape[0], d))
        groups.append((tag, mat))
    save_feat_mat(args.out, groups)
    print('wrote %s' % args.out)


if __name__ == '__main__':
    main()
