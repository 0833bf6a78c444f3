"""Shared base for the two-group (label<->image) recipes.

Handles the family idioms every conditional/two-stage recipe repeats
(reference models/cgan_model.py:33-57, twostage_cycle_model.py:22-70):
which_channel parsing into (A, B) groups, aligned/single set_input with
direction, the transform_1to2 pair, define_G/define_D config plumbing from
suffixed option blocks, and the clamped (lr, lr1, lr2) linear decay.
"""

import jax

from .base import BaseModel, parse_which_channel
from .common import make_transform
from .. import nn


class TwoGroupModel(BaseModel):
    def initialize(self, opt):
        BaseModel.initialize(self, opt)
        groups = parse_which_channel(opt.which_channel)
        assert len(groups) == 2
        self.groups = groups
        opt.input_nc = len(groups[0])
        opt.output_nc = len(groups[1])
        self.transform, self.transform_inverse = make_transform(
            opt.transform_1to2)
        if opt.isTrain:
            self.old_lr = opt.lr
            self.old_lr1 = getattr(opt, 'lr1', opt.lr)
            self.old_lr2 = getattr(opt, 'lr2', opt.lr)

    # ----------------------------------------------------------- inputs -- #
    def set_input(self, input):
        AtoB = self.opt.which_direction == 'AtoB'
        g0, g1 = self.groups
        if self.opt.dataset_mode == 'aligned':
            input_A = input['A' if AtoB else 'B'][..., g0]
            input_B = input['B' if AtoB else 'A'][..., g1]
        elif self.opt.dataset_mode == 'single':
            input_A = input['A'][..., g0]
            input_B = input['A'][..., g1]
        else:
            raise NotImplementedError(
                'Dataset mode [%s] is not recognized' % self.opt.dataset_mode)
        self.input_A = self.to_device_batch(input_A)
        self.input_B = self.to_device_batch(input_B)
        self.image_paths = input['A_paths' if AtoB else 'B_paths']

    # ------------------------------------------------------ net builders -- #
    def build_G(self, in_nc, out_nc, suffix=''):
        """define_G from the (optionally suffixed) architecture options."""
        o = self.opt

        def g(name, default=None):
            return getattr(o, name + suffix, default)

        return nn.define_G(
            in_nc, out_nc, g('ngf'), g('which_model_netG'), o.norm,
            not g('no_dropout'), n_layers_G=g('n_layers_G'),
            use_residual=bool(g('use_residual')),
            use_fcn=g('noiseSize') != 1, noise_nc=g('noise_nc'),
            add_gaussian_noise=o.add_gaussian_noise,
            gaussian_sigma=o.gaussian_sigma,
            upsample_mode=g('upsample_mode'),
            n_layers_CRN_block=g('n_layers_CRN_block'),
            share_label_weights=not g('no_share_label_block_weights'),
            n_layers_G_skip=g('n_layers_G_skip', -1))

    def build_F(self, in_nc, out_nc, suffix='2'):
        """The F reconstructor uses nff/which_model_netF/n_layers_F with the
        stage-2 dropout/upsample options (reference twostage_cycle:58-63)."""
        o = self.opt
        return nn.define_G(
            in_nc, out_nc, getattr(o, 'nff' + suffix),
            getattr(o, 'which_model_netF' + suffix), o.norm,
            not getattr(o, 'no_dropout' + suffix),
            n_layers_G=getattr(o, 'n_layers_F' + suffix),
            use_residual=bool(getattr(o, 'use_residual' + suffix)),
            use_fcn=False, noise_nc=getattr(o, 'noise_nc' + suffix),
            add_gaussian_noise=o.add_gaussian_noise,
            gaussian_sigma=o.gaussian_sigma,
            upsample_mode=getattr(o, 'upsample_mode' + suffix),
            n_layers_CRN_block=getattr(o, 'n_layers_CRN_block' + suffix),
            share_label_weights=not getattr(
                o, 'no_share_label_block_weights' + suffix))

    def build_D_bank(self, input_nc, suffix='', num_classes=2):
        """Multi-scale discriminator bank from the suffixed option block;
        asserts the scale/lambda/layers lists agree (reference
        fcgan_model.py:78)."""
        o = self.opt

        def g(name):
            return getattr(o, name + suffix)

        if o.isTrain:
            assert (len(g('scale_factor')) == len(g('lambda_D'))
                    == len(g('n_layers_D')))
        use_sigmoid = g('no_lsgan') if o.isTrain else False
        bank = []
        for scale, n_layers in zip(g('scale_factor'), g('n_layers_D')):
            bank.append(nn.define_D(
                input_nc, g('ndf'), g('which_model_netD'),
                n_layers_D=n_layers, norm=o.norm, use_sigmoid=use_sigmoid,
                scale_factor=scale, num_classes=num_classes))
        return bank

    def init_bank(self, bank, key):
        keys = jax.random.split(key, max(len(bank), 1))
        return {str(i): nn.jit_init(d, keys[i])
                for i, d in enumerate(bank)}

    def load_bank(self, bank, label_fmt, epoch, model_dir=''):
        return {str(i): self.load_network(d, label_fmt % i, epoch, model_dir)
                for i, d in enumerate(bank)}

    def save_bank(self, bank, params, label_fmt, epoch_label):
        for i, d in enumerate(bank):
            self.save_network(d, params[str(i)], label_fmt % i, epoch_label)

    # --------------------------------------------------------------- lr -- #
    def update_learning_rate(self):
        """Clamped three-rate linear decay (reference
        twostage_cycle_model.py:480-503)."""
        o = self.opt
        lr = max(0, self.old_lr - o.lr / o.niter_decay)
        lr1 = max(0, self.old_lr1 - o.lr1 / o.niter_decay)
        lr2 = max(0, self.old_lr2 - o.lr2 / o.niter_decay)
        print('update learning rate: %f -> %f, %f -> %f'
              % (self.old_lr1, lr1, self.old_lr2, lr2))
        self.old_lr, self.old_lr1, self.old_lr2 = lr, lr1, lr2

    def lrs(self):
        return {'lr': self.old_lr, 'lr1': self.old_lr1, 'lr2': self.old_lr2}
