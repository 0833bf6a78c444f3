"""SegmentationCycle — supervised CE on G1 (image->label) plus GAN/L1 on G2
(label->image) and an L1 cycle G2(G1(A)) ~ A (reference
models/segm_cycle_model.py).

G loss (reference :224-259):
  lambda_A * CE(G1(A) ~ B) + GAN(D2 on (B, G2(B))) + lambda_B * L1(G2-hat)
  ... exactly: loss_G1_CE*lambda_A + G2_GAN + L1(fake_B, real_B)*lambda_B
  + L1(recon_A, real_A)*lambda_A_cycle
(the L1 between fake_B and real_B is on the *label* side, reference :257).
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp

from .base import adam_transform
from .common import build_gan_train_step, bank_apply, g_apply, cat_channels
from .pools import init_pool, pool_query
from .segmentation import SegmentationModel
from .. import nn
from ..nn.losses import gan_loss, weighted_l1_loss
from ..utils.images import tensor2im


class SegmentationCycleModel(SegmentationModel):
    def name(self):
        return 'SegmentationCycleModel'

    def initialize(self, opt):
        # bypass SegmentationModel.initialize; reuse its helpers
        from .base import BaseModel, parse_which_channel
        BaseModel.initialize(self, opt)
        groups = parse_which_channel(opt.which_channel)
        assert len(groups) == 2
        self.groups = groups
        opt.input_nc = len(groups[0])
        opt.output_nc = len(groups[1])
        self.num_classes = opt.output_nc + 1 if opt.add_background_onehot \
            else opt.output_nc
        self.use_sigmoid_ss = opt.use_sigmoid_ss
        self.class_weights = opt.weights
        self.use_D = False  # D2 is managed explicitly below
        self.old_lr = getattr(opt, 'lr', 0.0)
        self.old_lr1 = getattr(opt, 'lr1', 0.0)
        self.old_lr2 = getattr(opt, 'lr2', 0.0)

        def build_g(in_nc, out_nc, sfx):
            o = opt
            return nn.define_G(
                in_nc, out_nc, getattr(o, 'ngf' + sfx),
                getattr(o, 'which_model_netG' + sfx), o.norm,
                not getattr(o, 'no_dropout' + sfx),
                n_layers_G=getattr(o, 'n_layers_G' + sfx),
                use_residual=False,
                use_fcn=getattr(o, 'noiseSize' + sfx) != 1,
                noise_nc=getattr(o, 'noise_nc' + sfx),
                add_gaussian_noise=o.add_gaussian_noise,
                gaussian_sigma=o.gaussian_sigma,
                upsample_mode=getattr(o, 'upsample_mode' + sfx),
                n_layers_CRN_block=getattr(o, 'n_layers_CRN_block' + sfx),
                share_label_weights=not getattr(
                    o, 'no_share_label_block_weights' + sfx),
                n_layers_G_skip=getattr(o, 'n_layers_G' + sfx + '_skip'))

        self.netG1 = build_g(opt.input_nc, self.num_classes, '1')
        self.netG2 = build_g(self.num_classes, opt.input_nc, '2')
        keys = jax.random.split(self.init_key, 8)
        params = {'G1': nn.jit_init(self.netG1, keys[0]),
                  'G2': nn.jit_init(self.netG2, keys[1])}

        if self.isTrain:
            assert (len(opt.scale_factor2) == len(opt.lambda_D2)
                    == len(opt.n_layers_D2))
            d_in = opt.input_nc if opt.no_cgan \
                else opt.input_nc + self.num_classes
            self.netD2 = []
            for scale, n_layers in zip(opt.scale_factor2, opt.n_layers_D2):
                self.netD2.append(nn.define_D(
                    d_in, opt.ndf2, opt.which_model_netD2,
                    n_layers_D=n_layers, norm=opt.norm,
                    use_sigmoid=opt.no_lsgan2, scale_factor=scale))
            params['D2'] = {str(i): nn.jit_init(d, jax.random.fold_in(keys[2], i))
                            for i, d in enumerate(self.netD2)}

        if self.isTrain and opt.sequential_train and not opt.continue_train:
            mdir = opt.pretrained_model_dir
            ep = opt.which_epoch_sequential
            if 'G1' in opt.which_model_to_load:
                params['G1'] = self.load_network(self.netG1, 'G1', ep, mdir)
            if 'G2' in opt.which_model_to_load:
                params['G2'] = self.load_network(self.netG2, 'G2', ep, mdir)
            if 'D2' in opt.which_model_to_load:
                for i, d in enumerate(self.netD2):
                    params['D2'][str(i)] = self.load_network(
                        d, 'D2_%d' % i, ep, mdir)
        if not self.isTrain or opt.continue_train:
            params['G1'] = self.load_network(self.netG1, 'G1', opt.which_epoch)
            params['G2'] = self.load_network(self.netG2, 'G2', opt.which_epoch)
            if self.isTrain:
                for i, d in enumerate(self.netD2):
                    params['D2'][str(i)] = self.load_network(
                        d, 'D2_%d' % i, opt.which_epoch)

        state = {'params': params, 'opt': {}, 'pools': {}}
        if self.isTrain:
            self.txG = adam_transform(opt.beta1)
            self.txD2 = adam_transform(opt.beta1)
            state['opt'] = {
                'G': self.txG.init({'G1': params['G1'], 'G2': params['G2']}),
                'D2': self.txD2.init(params['D2'])}
            pool_nc = opt.input_nc if opt.no_cgan \
                else self.num_classes + opt.input_nc
            state['pools'] = {'pool2': init_pool(
                opt.pool_size, (opt.fineSize, opt.fineSize, pool_nc))}
            self._train_step = self.jit_train_step(
                self._build_train_step(), state)
        self.state = self.put_state(state)

        cd = self.compute_dtype
        self._logit_jit = jax.jit(lambda p, x, noise, fk: g_apply(
            self.netG1, p, nn.Ctx(fk, compute_dtype=cd), x=x, noise=noise,
            activation='none'))

        print('------------ Networks initialized -------------')
        nn.print_network(self.netG1, params['G1'], 'G1')
        nn.print_network(self.netG2, params['G2'], 'G2')
        if self.isTrain:
            for i, d in enumerate(self.netD2):
                nn.print_network(d, params['D2'][str(i)], 'D2_%d' % i)
        print('-----------------------------------------------')

    def _noise_shapes(self):
        o = self.opt
        return {'noise1': (o.batchSize, o.noiseSize1, o.noiseSize1,
                           o.noise_nc1),
                'noise2': (o.batchSize, o.noiseSize2, o.noiseSize2,
                           o.noise_nc2)}

    def _noise_shape(self, val=False):
        o = self.opt
        s = o.noiseSizeVal if val else o.noiseSize1
        nc = o.noise_nc if val else o.noise_nc1
        return (o.batchSize, s, s, nc)

    def _build_train_step(self):
        opt = self.opt
        netG1, netG2, netD2 = self.netG1, self.netG2, self.netD2
        lsgan2 = not opt.no_lsgan2
        lambda_D2 = tuple(opt.lambda_D2)
        cd = self.compute_dtype

        def ctx(fkey=None):
            return nn.Ctx(fkey, compute_dtype=cd)

        def forward(params, inputs, noises, fkey):
            fk = [jax.random.fold_in(fkey, i) for i in range(3)]
            logit = g_apply(netG1, params['G1'], ctx(fk[0]), x=inputs['A'],
                            noise=noises['noise1'], activation='none')
            fake_B = self._activate(logit)
            fake_A = g_apply(netG2, params['G2'], ctx(fk[1]), x=inputs['B'],
                             noise=noises['noise2'])
            recon_A = g_apply(netG2, params['G2'], ctx(fk[2]), x=fake_B,
                              noise=noises['noise2'])
            return {'logit': logit, 'fake_B': fake_B, 'fake_A': fake_A,
                    'recon_A': recon_A}

        def cat_pair(a, b):
            return b if opt.no_cgan else cat_channels(a, b)

        def d2_pairs(taps, pools, key, inputs):
            fake, p2 = pool_query(pools['pool2'],
                                  cat_pair(inputs['B'], taps['fake_A']), key)
            return {'fake': fake}, {**pools, 'pool2': p2}

        def d2_loss(pD, pairs, inputs, all_params):
            real = cat_pair(inputs['B'], inputs['A'])
            lf = sum(gan_loss(o_, False, lsgan2)
                     for o_ in bank_apply(netD2, pD, pairs['fake'], ctx))
            lr_ = sum(gan_loss(o_, True, lsgan2)
                      for o_ in bank_apply(netD2, pD, real, ctx))
            total = (lf + lr_) * 0.5
            return total, {}

        def g_loss(taps, all_params, inputs, noises, fkey):
            fake = cat_pair(inputs['B'], taps['fake_A'])
            gan = 0.0
            for o_, lam in zip(bank_apply(netD2, all_params['D2'], fake, ctx),
                               lambda_D2):
                gan += gan_loss(o_, True, lsgan2) * lam
            ce = self._ce(taps['logit'], taps['fake_B'], inputs['B'],
                          inputs['label'], weighted=True)
            l1 = weighted_l1_loss(taps['fake_B'], inputs['B'])
            cyc = weighted_l1_loss(taps['recon_A'], inputs['A'])
            total = (ce * opt.lambda_A + gan + l1 * opt.lambda_B
                     + cyc * opt.lambda_A_cycle)
            return total, {'G_CE': ce, 'G_GAN': gan}

        return build_gan_train_step(
            noise_shapes=self._noise_shapes(),
            forward=forward,
            d_specs=[dict(key='D2', tx=self.txD2, n_update=opt.n_update_D2,
                          lr='lr2', make_pairs=d2_pairs, loss=d2_loss)],
            g_spec=dict(keys=['G1', 'G2'], tx=self.txG,
                        n_update=opt.n_update_G,
                        lrs={'G1': 'lr1', 'G2': 'lr2'}, loss=g_loss),
            metrics_order=['G_CE', 'G_GAN'])

    # ------------------------------------------------------------------- #
    def optimize_parameters(self):
        self.state, self._metrics, taps = self._train_step(
            self.state, self._step_inputs(), self.next_step_key(),
            self._step_lrs())
        self._after_chunk(taps)

    def _step_inputs(self):
        return {'A': self.input_A, 'B': self.input_B, 'label': self.label}

    def _step_lrs(self):
        return {'lr': self.old_lr, 'lr1': self.old_lr1, 'lr2': self.old_lr2}

    def _after_chunk(self, taps):
        self.real_A, self.real_B = self.input_A, self.input_B
        self.logit, self.fake_B = taps['logit'], taps['fake_B']
        self.recon_A = taps['recon_A']

    def forward(self, val_mode=False):
        key = self.next_test_key()
        noise = jax.random.normal(jax.random.fold_in(key, 0),
                                  self._noise_shape(val=val_mode))
        self.real_A, self.real_B = self.input_A, self.input_B
        self.logit = self._logit_jit(self.state['params']['G1'],
                                     self.input_A, noise,
                                     jax.random.fold_in(key, 1))
        self.fake_B = self._activate(self.logit)

    def test(self):
        self.forward(val_mode=False)

    def get_current_visuals(self):
        out = [('image', tensor2im(self.real_A)),
               ('label', tensor2im(self.real_B * 2 - 1)),
               ('prediction', tensor2im(self.fake_B * 2 - 1))]
        if self.isTrain and hasattr(self, 'recon_A'):
            out.append(('recon', tensor2im(self.recon_A)))
        return OrderedDict(out)

    def save(self, label):
        params = jax.device_get(self.state['params'])
        self.save_network(self.netG1, params['G1'], 'G1', label)
        self.save_network(self.netG2, params['G2'], 'G2', label)
        for i, d in enumerate(self.netD2):
            self.save_network(d, params['D2'][str(i)], 'D2_%d' % i, label)
        self.save_full_state(self.state, label,
                             extra={'lr': self.old_lr, 'lr1': self.old_lr1,
                                    'lr2': self.old_lr2})

    def update_learning_rate(self):
        o = self.opt
        lr = max(0, self.old_lr - o.lr / o.niter_decay)
        lr1 = max(0, self.old_lr1 - o.lr1 / o.niter_decay)
        lr2 = max(0, self.old_lr2 - o.lr2 / o.niter_decay)
        print('update learning rate: %f -> %f, %f -> %f'
              % (self.old_lr1, lr1, self.old_lr2, lr2))
        self.old_lr, self.old_lr1, self.old_lr2 = lr, lr1, lr2
