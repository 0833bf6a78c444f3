"""End-to-end tests for the ported evaluation tower (experiments/).

Covers the reference's offline MATLAB assets (SURVEY.md 2.14): shape
features -> feat.mat -> t-SNE/classifier plots, the forced-choice user
study (headless) -> per-subject .mat -> fig_user bars, and the
dataset-prep morphology utilities.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'experiments'))
sys.path.insert(0, os.path.join(REPO, 'experiments', 'plots'))
sys.path.insert(0, os.path.join(REPO, 'experiments', 'user_study'))

import features as F  # noqa: E402
import fig_user  # noqa: E402
import plot_tsne  # noqa: E402
from main import NUM_TRAIN, StudySession, run_headless  # noqa: E402
from utils import (binary_edge, bwselect, close_memb, disk,  # noqa: E402
                   remove_small_mito)


def _save(arr, path):
    from PIL import Image
    Image.fromarray(arr).save(path)


def _synth_pair(rng, size=64, n_blobs=3, blob_r=5):
    """(label, image) uint8 RGB pair: green mito discs + red membrane."""
    label = np.zeros((size, size, 3), np.uint8)
    yy, xx = np.ogrid[:size, :size]
    for _ in range(n_blobs):
        cy, cx = rng.randint(blob_r, size - blob_r, 2)
        r = blob_r + rng.randint(-2, 3)
        label[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r, 1] = 255
    label[::16, :, 0] = 255
    image = rng.randint(0, 255, (size, size, 3)).astype(np.uint8)
    return label, image


def _write_group(d, n, rng, **kw):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        label, image = _synth_pair(rng, **kw)
        _save(label, os.path.join(d, '%04d_label.png' % i))
        _save(image, os.path.join(d, '%04d_image.png' % i))


@pytest.fixture(scope='module')
def study_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('study')
    rng = np.random.RandomState(0)
    _write_group(str(root / 'data' / 'real' / 'real'), NUM_TRAIN + 4, rng)
    _write_group(str(root / 'data' / 'sgan' / 'fake'), NUM_TRAIN + 4, rng,
                 n_blobs=6, blob_r=3)
    return str(root)


# ---------------------------------------------------------------- utils

def test_disk_and_edge():
    d = disk(3)
    assert d.shape == (7, 7) and d[3, 3] and not d[0, 0]
    m = np.zeros((9, 9), bool)
    m[2:7, 2:7] = True
    e = binary_edge(m)
    assert e[2, 2] and not e[4, 4] and e.sum() == 16


def test_bwselect_picks_seed_component():
    m = np.zeros((10, 10), bool)
    m[1:4, 1:4] = True
    m[6:9, 6:9] = True
    sel = bwselect(m, x=2, y=2)
    assert sel[2, 2] and not sel[7, 7]
    assert not bwselect(m, x=5, y=5).any()


def test_close_memb_draws_central_ring(tmp_path):
    a = np.zeros((64, 64, 3), np.uint8)
    # membrane square ring around the center
    a[20, 20:45, 0] = 255
    a[44, 20:45, 0] = 255
    a[20:45, 20, 0] = 255
    a[20:45, 44, 0] = 255
    a[:, :, 1] = 7
    _save(a, str(tmp_path / 'x.png'))
    close_memb(str(tmp_path), gap=2, width=1, center=(32, 32),
               verbose=False)
    from PIL import Image
    out = np.array(Image.open(str(tmp_path / 'x.png')))
    red = out[:, :, 0] > 0
    assert red.any()
    assert red[20:26, 32].any() and not red[2, 2]  # ring near the wall,
    assert not red[32, 32]                         # hollow center
    assert (out[:, :, 1] == 7).all()               # other channels intact


def test_remove_small_mito(tmp_path):
    big = np.zeros((32, 32, 3), np.uint8)
    big[:16, :16, 1] = 255
    small = np.zeros((32, 32, 3), np.uint8)
    small[0, :8, 1] = 255
    _save(big, str(tmp_path / 'big.png'))
    _save(small, str(tmp_path / 'small.png'))
    removed = remove_small_mito(str(tmp_path), min_px=64, verbose=False)
    assert [os.path.basename(p) for p in removed] == ['small.png']
    assert os.path.exists(str(tmp_path / 'big.png'))


# ------------------------------------------------------------- features

def test_image_features_shape_and_sanity():
    rng = np.random.RandomState(1)
    label, _ = _synth_pair(rng, n_blobs=4)
    f = F.image_features(label)
    assert f.shape == (F.FEATURE_DIM,)
    assert f[0] > 0 and 0 < f[1] < 1        # count, area fraction
    assert f[6] > 0.5                       # discs are near-circular
    blank = F.image_features(np.zeros((32, 32, 3), np.uint8))
    assert blank[0] == 0 and np.isfinite(blank).all()


def test_feat_mat_roundtrip(study_root, tmp_path):
    g1 = F.group_features(os.path.join(study_root, 'data/real/real'))
    g2 = F.group_features(os.path.join(study_root, 'data/sgan/fake'))
    assert g1.shape[1] == F.FEATURE_DIM and g1.shape[0] == NUM_TRAIN + 4
    path = str(tmp_path / 'feat.mat')
    F.save_feat_mat(path, [('real (train)', g1), ('FCGAN', g2)])
    X, label, tags = plot_tsne.load_feat(path)
    assert X.shape == (2 * (NUM_TRAIN + 4), F.FEATURE_DIM)
    assert (np.unique(label) == [1, 2]).all()
    assert tags == ['real (train)', 'FCGAN']
    Xz = plot_tsne.zscore_by_real(X, label)
    xr = Xz[label == 1]
    assert np.allclose(xr.mean(0), 0, atol=1e-9)
    live = xr.std(0, ddof=1) > 0
    assert np.allclose(xr.std(0, ddof=1)[live], 1, atol=1e-9)


def test_features_cli(study_root, tmp_path, capsys):
    out = str(tmp_path / 'feat.mat')
    F.main(['--group', 'real (train)=%s' % os.path.join(
                study_root, 'data/real/real'),
            '--group', 'FCGAN=%s' % os.path.join(
                study_root, 'data/sgan/fake'),
            '--limit', '6', '--out', out])
    X, label, _ = plot_tsne.load_feat(out)
    assert X.shape[0] == 12
    assert 'wrote' in capsys.readouterr().out


# ---------------------------------------------------------------- plots

def test_plot_tsne_cli(study_root, tmp_path):
    feat = str(tmp_path / 'feat.mat')
    F.main(['--group', 'real (train)=%s' % os.path.join(
                study_root, 'data/real/real'),
            '--group', 'real (val)=%s' % os.path.join(
                study_root, 'data/real/real'),
            '--group', 'FCGAN=%s' % os.path.join(
                study_root, 'data/sgan/fake'),
            '--out', feat])
    out = str(tmp_path / 'tsne.png')
    plot_tsne.main(['--feat', feat, '--out', out,
                    '--max-per-group', '10'])
    assert os.path.getsize(out) > 1000
    # the *_new.m variant: skip group 2
    out2 = str(tmp_path / 'tsne2.png')
    plot_tsne.main(['--feat', feat, '--out', out2, '--skip-groups', '2'])
    assert os.path.getsize(out2) > 1000


def test_classify_realisticness_separable(tmp_path):
    import classify
    rng = np.random.RandomState(0)
    real = rng.randn(60, 4)
    far = rng.randn(30, 4) + 8.0        # trivially separable -> ~0 fooled
    near = rng.randn(30, 4) * 1e-3      # ~indistinguishable -> high fooled
    X = np.concatenate([real[:30], real[30:], far, near])
    y = np.array([1] * 30 + [1] * 30 + [2] * 30 + [3] * 30)
    Xz = plot_tsne.zscore_by_real(X, y)
    accs = classify.realisticness(Xz, y, n_seeds=5)
    assert set(accs) == {2, 3}
    assert accs[2].mean() < 0.1
    assert accs[3].mean() > 0.3

    feat = np.empty((1, 4), dtype=object)
    from scipy.io import savemat
    for i, m in enumerate([real[:30], real[30:], far, near]):
        feat[0, i] = m
    path = str(tmp_path / 'feat.mat')
    savemat(path, {'feat': feat, 'label': np.array(
        [1] * 30 + [2] * 30 + [3] * 30 + [4] * 30, float).reshape(1, -1)})
    out = str(tmp_path / 'bars.png')
    classify.main(['--feat', path, '--label-mapping', '1', '1', '2', '3',
                   '--tags', 'Real', 'Far', 'Near', '--seeds', '3',
                   '--out', out])
    assert os.path.getsize(out) > 1000


# ------------------------------------------------------------ user study

def test_headless_study_and_fig_user(study_root, tmp_path):
    for subject, expert, acc in (('alice', 1, 1.0), ('bob', 0, 0.0)):
        s = StudySession(study_root, mode='x', dataset='sgan',
                         seed=3, subject=subject, expert=expert,
                         sz=(48, 48))
        run_headless(s, rounds=3, oracle_acc=acc,
                     rng=np.random.RandomState(7))
        assert s.record['num_total'] == 27
        assert s.accuracy() == acc
    recs = fig_user.load_records(os.path.join(study_root, 'data', 'user'),
                                 'sgan', 'x')
    assert len(recs) == 2
    by_id = {r['expert']: r for r in recs}
    assert by_id[True]['num_correct'] == 27
    assert fig_user.subject_metric(by_id[True], 'fooled') == 0.0
    assert fig_user.subject_metric(by_id[False], 'fooled') == 1.0

    labels, means, stds = fig_user.collect(
        os.path.join(study_root, 'data', 'user'), ['sgan'], ['x'],
        'accuracy', 'expert')
    assert labels == ['x'] or labels == ['sgan']
    assert means[0] == 1.0

    out = str(tmp_path / 'fig_user.png')
    fig_user.main(['--src', os.path.join(study_root, 'data', 'user'),
                   '--datasets', 'sgan', '--modes', 'x',
                   '--split-expert', '--out', out])
    assert os.path.getsize(out) > 1000


def test_study_modes_and_training_strips(study_root):
    for mode, width in (('x', 48), ('y', 48), ('xy', 96)):
        s = StudySession(study_root, mode=mode, dataset='sgan', seed=1,
                         sz=(48, 48))
        panels = s.next_round()
        assert len(panels) == 9
        assert all(p.shape == (48, width, 3) for p in panels)
        r, f = s.training_strips()
        ns = 3 if mode == 'xy' else 4
        assert r.shape == (52, ns * (width + 4), 3)
        assert (r[0] == 255).all()  # white border rows
        assert f.shape == r.shape


def test_study_sampler_pools(study_root):
    s = StudySession(study_root, mode='x', dataset='sgan', seed=2,
                     sz=(48, 48))
    assert s.real._pool('train') == s.real.stems[:NUM_TRAIN]
    assert s.real._pool('test') == s.real.stems[NUM_TRAIN:]
    assert len(s.real._pool('test')) == 4
