"""Training observability: console/loss-log printing, HTML image report,
optional visdom panes and .mat loss-series dumps.

Reproduces the reference's three sinks (util/visualizer.py:9-154):
stdout + append-only ``checkpoints/<name>/loss_log.txt``, the self-
regenerating HTML report under ``web/``, and visdom when a server is
reachable (guarded import — never a hard dependency).
"""

import os
import time

import numpy as np

from . import html
from .images import save_image, mkdirs


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.display_id = opt.display_id
        self.use_html = opt.isTrain and not getattr(opt, 'no_html', False)
        self.win_size = opt.display_winsize
        self.name = opt.name
        self.plot_data = None
        self.vis = None
        if self.display_id > 0:
            try:
                import visdom
                self.vis = visdom.Visdom(port=opt.display_port,
                                         raise_exceptions=True)
            except Exception:
                self.vis = None  # no visdom server: fall back to files only

        if self.use_html:
            self.web_dir = os.path.join(opt.checkpoints_dir, opt.name, 'web')
            self.img_dir = os.path.join(self.web_dir, 'images')
            print('create web directory %s...' % self.web_dir)
            mkdirs([self.web_dir, self.img_dir])
        self.log_name = os.path.join(opt.checkpoints_dir, opt.name,
                                     'loss_log.txt')
        with open(self.log_name, "a") as log_file:
            now = time.strftime("%c")
            log_file.write(
                '================ Training Loss (%s) ================\n' % now)

    def display_current_results(self, visuals, epoch):
        if self.vis is not None:
            ncols = getattr(self.opt, 'display_single_pane_ncols', 0)
            try:
                if ncols > 0:
                    self._display_single_pane(visuals, ncols)
                else:
                    idx = 1
                    for label, image_numpy in visuals.items():
                        self.vis.image(image_numpy.transpose([2, 0, 1]),
                                       opts=dict(title=label),
                                       win=self.display_id + idx)
                        idx += 1
            except Exception:
                self.vis = None
        if self.use_html:
            for label, image_numpy in visuals.items():
                img_path = os.path.join(self.img_dir,
                                        'epoch%.3d_%s.png' % (epoch, label))
                save_image(image_numpy, img_path)
            webpage = html.HTML(self.web_dir,
                                'Experiment name = %s' % self.name, reflesh=1)
            for n in range(epoch, 0, -1):
                webpage.add_header('epoch [%d]' % n)
                ims, txts, links = [], [], []
                for label, _ in visuals.items():
                    img_path = 'epoch%.3d_%s.png' % (n, label)
                    ims.append(img_path)
                    txts.append(label)
                    links.append(img_path)
                webpage.add_images(ims, txts, links, width=self.win_size)
            webpage.save()

    def _display_single_pane(self, visuals, ncols):
        """One visdom grid pane of all visuals + a label-table text pane
        (reference util/visualizer.py:33-73, --display_single_pane_ncols)."""
        first = next(iter(visuals.values()))
        h, w = first.shape[:2]
        table_css = (
            '<style>table {border-collapse: separate; border-spacing:4px; '
            'white-space:nowrap; text-align:center} table td {width: %dpx; '
            'height: %dpx; padding: 4px; outline: 4px solid black}</style>'
            % (w, h))
        images, cells = [], []
        for label, image_numpy in visuals.items():
            images.append(image_numpy.transpose([2, 0, 1]))
            cells.append('<td>%s</td>' % label)
        while len(images) % ncols:
            images.append(np.full_like(images[0], 255))
            cells.append('<td></td>')
        rows = ['<tr>%s</tr>' % ''.join(cells[r:r + ncols])
                for r in range(0, len(cells), ncols)]
        self.vis.images(images, nrow=ncols, win=self.display_id + 1,
                        padding=2, opts=dict(title=self.name + ' images'))
        self.vis.text(table_css + '<table>%s</table>' % ''.join(rows),
                      win=self.display_id + 2,
                      opts=dict(title=self.name + ' labels'))

    def plot_current_errors(self, epoch, counter_ratio, opt, errors):
        if self.plot_data is None:
            self.plot_data = {'X': [], 'Y': [], 'legend': list(errors.keys())}
        self.plot_data['X'].append(epoch + counter_ratio)
        self.plot_data['Y'].append(
            [errors[k] for k in self.plot_data['legend']])
        if self.vis is not None:
            try:
                X = np.stack([np.array(self.plot_data['X'])] *
                             len(self.plot_data['legend']), 1)
                self.vis.line(X=X, Y=np.array(self.plot_data['Y']),
                              opts={'title': self.name + ' loss over time',
                                    'legend': self.plot_data['legend'],
                                    'xlabel': 'epoch', 'ylabel': 'loss'},
                              win=self.display_id)
            except Exception:
                self.vis = None
        # .mat dump of the loss series (reference util/visualizer.py:96-123)
        try:
            import scipy.io
            scipy.io.savemat(
                os.path.join(self.opt.checkpoints_dir, self.opt.name,
                             'plot_data.mat'),
                {'X': np.array(self.plot_data['X']),
                 'Y': np.array(self.plot_data['Y']),
                 'legend': self.plot_data['legend']})
        except Exception:
            pass

    def print_current_errors(self, epoch, i, errors, t):
        message = '(epoch: %d, iters: %d, time: %.3f) ' % (epoch, i, t)
        for k, v in errors.items():
            message += '%s: %.3f ' % (k, v)
        print(message)
        with open(self.log_name, "a") as log_file:
            log_file.write('%s\n' % message)

    def save_images(self, webpage, visuals, image_path):
        image_dir = webpage.get_image_dir()
        short_path = os.path.basename(image_path[0])
        name = os.path.splitext(short_path)[0]

        webpage.add_header(name)
        ims, txts, links = [], [], []
        for label, image_numpy in visuals.items():
            image_name = '%s_%s.png' % (name, label)
            save_image(image_numpy, os.path.join(image_dir, image_name))
            ims.append(image_name)
            txts.append(label)
            links.append(image_name)
        webpage.add_images(ims, txts, links, width=self.win_size)
