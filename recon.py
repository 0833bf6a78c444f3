"""Latent reconstruction driver (reference recon.py): LBFGS inversion of the
fcgan generator per test image; reports BCE distance and N(0,I) noise
negative log-likelihood statistics."""

import os

import numpy as np

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

    data_loader = CreateDataLoader(opt)
    dataset = data_loader.load_data()
    model = create_model(opt)
    visualizer = Visualizer(opt)
    web_dir = os.path.join(opt.results_dir, opt.name,
                           '%s_%s' % (opt.phase, opt.which_epoch))
    webpage = html.HTML(web_dir, 'Experiment = %s, Phase = %s, Epoch = %s'
                        % (opt.name, opt.phase, opt.which_epoch))

    l2_dist, ll_noise, ll_noise_init = [], [], []
    for i, data in enumerate(dataset):
        if i >= opt.how_many:
            break
        model.set_input(data)
        print('reconstruct image {}...'.format(i))
        d, ll, ll0 = model.reconstruction()
        l2_dist.append(d)
        ll_noise.append(ll)
        ll_noise_init.append(ll0)
        visuals = model.get_current_visuals(True)
        img_path = model.get_image_paths()
        visualizer.save_images(webpage, visuals, img_path)

    webpage.save()
    l2_dist = np.array(l2_dist).squeeze()
    ll_noise = np.array(ll_noise).squeeze()
    ll_noise_init = np.array(ll_noise_init).squeeze()
    print('BCE: mean {0:0.4f} std {1:0.4f}; noise: mean {2:0.4f} std {3:0.4f};'
          ' noise init: mean {4:0.4f} std {5:0.4f}'.format(
              np.mean(l2_dist), np.std(l2_dist), np.mean(ll_noise),
              np.std(ll_noise), np.mean(ll_noise_init),
              np.std(ll_noise_init)))


if __name__ == '__main__':
    main()
