"""Forced-choice real-vs-fake user study.

Port of the reference's MATLAB GUI (experiments/user_study/main.m) to
matplotlib widgets, with the study logic factored into ``StudySession``
so it also runs headless (``--headless N`` answers N rounds with a
simulated subject — used by the tests and for smoke-checking a data
directory without a display).

Behavior mirrored from main.m:
 - data layout (:99-103): real images under ``data/real/real<celltype>``,
   fakes under ``data/<dataset>/fake<celltype>``, files named
   ``<stem>_image.png`` / ``<stem>_label.png`` with 4-char stems (:114);
 - the first ``num_train``=10 stems are the always-visible labeled
   training strips, the rest are the test pool (:5, :107-111), sampled
   WITH replacement (MATLAB datasample default, :112);
 - panel content by mode (:117-168): 'x' image, 'y' label,
   'xy' label|image side by side; random flip (p=.5), rot90 (0-3,
   coupled across the pair in 'xy'), random crop to ``sz`` (512, or
   1024 for the '_single' celltype, :14-16), 2px white border on the
   training strips only;
 - each round shows 9 panels with independent uniform real/fake ground
   truth (:209); the subject checks the ones they think are FAKE (:89);
 - results accumulate num_total/num_correct and the gt/guess vectors,
   and auto-save after every round (:234-248) to
   ``data/user/<dataset><celltype>/<mode>/<id>.mat``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_TRAIN = 10
PANELS = 9


def _imread(path):
    from PIL import Image
    return np.array(Image.open(path).convert('RGB'))


class PatchSampler:
    """Random patch source for one label ('real'/'fake'), main.m:96-170."""

    def __init__(self, root, label, dataset='sgan', celltype='',
                 mode='x', sz=(512, 512), rng=None):
        import glob
        self.mode = mode
        self.sz = tuple(sz)
        self.rng = rng if rng is not None else np.random.RandomState(0)
        if label == 'real':
            src = os.path.join(root, 'data', 'real', 'real' + celltype)
        else:
            src = os.path.join(root, 'data', dataset, 'fake' + celltype)
        self.src = src
        names = sorted(os.path.basename(p) for p in
                       glob.glob(os.path.join(src, '*_label.png')))
        self.stems = [n[:4] for n in names]  # main.m:114
        if not self.stems:
            raise FileNotFoundError('no *_label.png under %s' % src)

    def _pool(self, which):
        if which == 'train':
            return self.stems[:NUM_TRAIN] or self.stems
        return self.stems[NUM_TRAIN:] or self.stems

    def _load(self, stem, kind):
        return _imread(os.path.join(self.src, '%s_%s.png' % (stem, kind)))

    def sample(self, n, which='test', border=False):
        """n random patches; with replacement like MATLAB datasample."""
        rng = self.rng
        out = []
        for stem in rng.choice(self._pool(which), n, replace=True):
            if self.mode == 'x':
                imgs = [self._load(stem, 'image')]
            elif self.mode == 'y':
                imgs = [self._load(stem, 'label')]
            else:  # 'xy': label left, image right (main.m:148-167)
                imgs = [self._load(stem, 'label'),
                        self._load(stem, 'image')]
            flip = rng.rand() < 0.5
            rot = rng.randint(0, 4)
            h, w = self.sz
            y = rng.randint(0, imgs[0].shape[0] - h + 1)
            x = rng.randint(0, imgs[0].shape[1] - w + 1)
            crops = []
            for a in imgs:
                if flip:
                    a = a[:, ::-1]
                a = np.rot90(a, rot)
                crops.append(a[y:y + h, x:x + w])
            patch = np.concatenate(crops, axis=1)
            if border:
                patch = np.pad(patch, ((2, 2), (2, 2), (0, 0)),
                               constant_values=255)
            out.append(patch)
        return out


class StudySession:
    """One subject's run: rounds of 9 panels + accumulated record."""

    def __init__(self, root='.', mode='x', celltype='', dataset='sgan',
                 seed=0, subject='outlier', expert=1, sz=None):
        if celltype and not celltype.startswith('_'):
            celltype = '_' + celltype
        if sz is None:  # main.m:3,14-16
            sz = (1024, 1024) if celltype.lower() == '_single' \
                else (512, 512)
        self.rng = np.random.RandomState(seed)
        self.real = PatchSampler(root, 'real', dataset, celltype, mode,
                                 sz, self.rng)
        self.fake = PatchSampler(root, 'fake', dataset, celltype, mode,
                                 sz, self.rng)
        self.out_dir = os.path.join(root, 'data', 'user',
                                    dataset + celltype, mode)
        os.makedirs(self.out_dir, exist_ok=True)
        self.record = {'id': subject, 'expert': int(expert),
                       'num_total': 0, 'num_correct': 0,
                       'vector_gt': [], 'vector_gs': []}
        self.curr_gt = None

    def training_strips(self):
        """(real strip, fake strip) of bordered training patches."""
        ns = 3 if self.real.mode == 'xy' else 4  # main.m:188-192
        r = np.concatenate(self.real.sample(ns, 'train', border=True), 1)
        f = np.concatenate(self.fake.sample(ns, 'train', border=True), 1)
        return r, f

    def next_round(self):
        """Sample a fresh 9-panel round; returns the panel images."""
        self.curr_gt = self.rng.randint(0, 2, PANELS)  # main.m:209
        return [(self.fake if gt else self.real).sample(1, 'test')[0]
                for gt in self.curr_gt]

    def answer(self, checked):
        """Record a round's guesses (checked[i]=True = 'fake')."""
        pred = np.asarray(checked, int)
        rec = self.record
        rec['num_total'] += PANELS
        rec['num_correct'] += int((pred == self.curr_gt).sum())
        rec['vector_gt'].extend(int(v) for v in self.curr_gt)
        rec['vector_gs'].extend(int(v) for v in pred)
        self.save()

    def accuracy(self):
        return self.record['num_correct'] / max(self.record['num_total'], 1)

    def save(self):
        from scipy.io import savemat
        rec = dict(self.record)
        rec['vector_gt'] = np.array(rec['vector_gt'], np.float64
                                    ).reshape(1, -1)
        rec['vector_gs'] = np.array(rec['vector_gs'], np.float64
                                    ).reshape(1, -1)
        path = os.path.join(self.out_dir, '%s.mat' % self.record['id'])
        savemat(path, rec)
        return path


def run_gui(session):
    """The interactive study (matplotlib stand-in for main.m's figure)."""
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Button, CheckButtons

    fig = plt.figure('user study', figsize=(10, 6))
    ax_r = fig.add_axes([0.05, 0.8, 0.4, 0.18])
    ax_f = fig.add_axes([0.55, 0.8, 0.4, 0.18])
    for ax, title in ((ax_r, 'real samples'), (ax_f, 'fake samples')):
        ax.set_title(title, fontsize=9)
        ax.axis('off')
    panel_axes, checks, images = [], [], []
    pos = [(0.15 + 0.25 * (i // 3), 0.55 - 0.25 * (i % 3))
           for i in range(PANELS)]
    for i in range(PANELS):
        ax = fig.add_axes([pos[i][0], pos[i][1], 0.2, 0.2])
        ax.axis('off')
        panel_axes.append(ax)
        cax = fig.add_axes([pos[i][0] - 0.04, pos[i][1] + 0.08, 0.035, 0.05])
        checks.append(CheckButtons(cax, ['fake'], [False]))
        images.append(None)
    status = fig.text(0.05, 0.38, 'finished: 0')
    state = {'rounds': 0, 'started': False}

    def refresh():
        r, f = session.training_strips()
        ax_r.imshow(r)
        ax_f.imshow(f)
        for ax, img in zip(panel_axes, session.next_round()):
            ax.imshow(img)
        for cb in checks:
            if cb.get_status()[0]:
                cb.set_active(0)
        fig.canvas.draw_idle()

    def on_start(_):
        if state['started']:
            return
        state['started'] = True
        refresh()

    def on_next(_):
        if not state['started']:
            return
        session.answer([cb.get_status()[0] for cb in checks])
        state['rounds'] += 1
        status.set_text('finished: %d' % state['rounds'])
        print('finished %d' % state['rounds'])
        refresh()

    def on_save(_):
        path = session.save()
        rec = session.record
        print('Your accuracy is: %d/%d %.2f%%  (%s)'
              % (rec['num_correct'], rec['num_total'],
                 session.accuracy() * 100, path))

    b1 = Button(fig.add_axes([0.05, 0.05, 0.06, 0.05]), 'Start')
    b2 = Button(fig.add_axes([0.05, 0.15, 0.06, 0.05]), 'Next')
    b3 = Button(fig.add_axes([0.05, 0.25, 0.06, 0.05]), 'Save')
    b1.on_clicked(on_start)
    b2.on_clicked(on_next)
    b3.on_clicked(on_save)
    print('check the ones you think are FAKE.')
    plt.show()


def run_headless(session, rounds, oracle_acc, rng):
    """Simulated subject: answers each panel correctly with prob
    ``oracle_acc``.  Returns the saved .mat path."""
    for _ in range(rounds):
        session.next_round()
        correct = rng.rand(PANELS) < oracle_acc
        guess = np.where(correct, session.curr_gt, 1 - session.curr_gt)
        session.answer(guess)
    path = session.save()
    rec = session.record
    print('Your accuracy is: %d/%d %.2f%%'
          % (rec['num_correct'], rec['num_total'],
             session.accuracy() * 100))
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--mode', choices=['x', 'y', 'xy'], default='x')
    ap.add_argument('--celltype', default='')
    ap.add_argument('--dataset', default='sgan')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--root', default=os.path.dirname(
        os.path.abspath(__file__)))
    ap.add_argument('--subject', default='outlier')
    ap.add_argument('--expert', type=int, default=1)
    ap.add_argument('--headless', type=int, default=0, metavar='N',
                    help='run N simulated rounds instead of the GUI')
    ap.add_argument('--oracle-acc', type=float, default=0.75)
    args = ap.parse_args(argv)

    session = StudySession(args.root, args.mode, args.celltype,
                           args.dataset, args.seed, args.subject,
                           args.expert)
    if args.headless:
        run_headless(session, args.headless, args.oracle_acc,
                     np.random.RandomState(args.seed + 1))
    else:
        run_gui(session)


if __name__ == '__main__':
    main()
