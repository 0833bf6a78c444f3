"""Sampling / inference driver — reference test.py.

Two branches: conditional models (cgan*) iterate the dataset because
generation needs labels; unconditional models (fcgan, twostage*) draw
--how_many samples with synthetic %04d.png paths.  Results land in
results/<name>/<phase>_<which_epoch>/ as an HTML report + images — the
directory layout the MATLAB evaluation tower consumes.
"""

import os

from supervised_gan_tpu.runtime import enable_compilation_cache
from supervised_gan_tpu.options import TestOptions
from supervised_gan_tpu.data import CreateDataLoader
from supervised_gan_tpu.models import create_model
from supervised_gan_tpu.utils.visualizer import Visualizer
from supervised_gan_tpu.utils import html


def main():
    enable_compilation_cache()
    opt = TestOptions().parse()
    opt.nThreads = 1
    opt.batchSize = 1
    opt.serial_batches = True
    opt.no_flip = True
    opt.no_rotate = True

    model = create_model(opt)
    visualizer = Visualizer(opt)

    web_dir = os.path.join(opt.results_dir, opt.name,
                           '%s_%s' % (opt.phase, opt.which_epoch))
    webpage = html.HTML(web_dir, 'Experiment = %s, Phase = %s, Epoch = %s'
                        % (opt.name, opt.phase, opt.which_epoch))

    if opt.model.startswith('cgan'):
        data_loader = CreateDataLoader(opt)
        dataset = data_loader.load_data()
        for i, data in enumerate(dataset):
            if i >= opt.how_many:
                break
            model.set_input(data)
            model.test()
            visuals = model.get_current_visuals(
                save_as_single_image=opt.save_as_single_image)
            img_path = model.get_image_paths()
            print('process image... %s' % img_path)
            visualizer.save_images(webpage, visuals, img_path)
    else:
        for i in range(opt.how_many):
            model.test()
            visuals = model.get_current_visuals(
                save_as_single_image=opt.save_as_single_image)
            img_path = ['%04d.png' % (i + 1)]
            print('produce image... %s' % img_path)
            visualizer.save_images(webpage, visuals, img_path)

    webpage.save()


if __name__ == '__main__':
    main()
