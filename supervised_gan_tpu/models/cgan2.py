"""CGAN2 — conditional GAN fed by the unaligned dataset, where the B side
supplies pre-generated fake labels dumped to disk by a stage-1 GAN
(reference models/cgan2_model.py; asserts dataset_mode == 'unaligned').

Computes fake_B from BOTH the real and the fake label with the same noise;
--train_D_on_fake_fake_pair / --train_G_on_fake_fake_pair select which pair
feeds the D / G losses (reference :169-233).  The pool uses
--pool_reject_prob (reference :79).
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp

from .two_group import TwoGroupModel
from .base import adam_transform
from .common import (build_gan_train_step, bank_apply, g_apply,
                     l1_weight_map, cat_channels)
from .pools import init_pool, pool_query
from .. import nn
from ..nn.losses import gan_loss, weighted_l1_loss
from ..utils.images import tensor2im


class CGAN2Model(TwoGroupModel):
    def name(self):
        return 'cGANModel'

    def initialize(self, opt):
        assert opt.dataset_mode == 'unaligned'
        TwoGroupModel.initialize(self, opt)
        self.netG = self.build_G(opt.input_nc, opt.output_nc)
        keys = jax.random.split(self.init_key, 16)
        params = {'G': nn.jit_init(self.netG, keys[0])}

        if self.isTrain:
            d_in = opt.output_nc if opt.no_cgan \
                else opt.output_nc + opt.input_nc
            self.netD = self.build_D_bank(d_in)
            params['D'] = self.init_bank(self.netD, keys[1])

        if not self.isTrain or opt.continue_train:
            params['G'] = self.load_network(self.netG, 'G', opt.which_epoch)
            if self.isTrain:
                params['D'] = self.load_bank(self.netD, 'D_%d',
                                             opt.which_epoch)

        state = {'params': params, 'opt': {}, 'pools': {}}
        if self.isTrain:
            self.txG = adam_transform(opt.beta1)
            self.txD = adam_transform(opt.beta1)
            state['opt'] = {'G': self.txG.init({'G': params['G']}),
                            'D': self.txD.init(params['D'])}
            pool_nc = opt.output_nc if opt.no_cgan \
                else opt.input_nc + opt.output_nc
            state['pools'] = {'fake': init_pool(
                opt.pool_size, (opt.fineSize, opt.fineSize, pool_nc))}
            if opt.continue_train:
                restored = self.load_full_state(opt.which_epoch)
                if restored is not None:
                    state = restored['state']
                    self.old_lr = restored['extra'].get('lr', opt.lr)
            self._train_step = self.jit_train_step(
                self._build_train_step(), state)
        self.state = self.put_state(state)

        cd = self.compute_dtype
        self._g_jit = jax.jit(lambda p, x, n, fk: g_apply(
            self.netG, p, nn.Ctx(fk, compute_dtype=cd), x=x, noise=n))

        print('------------ Networks initialized -------------')
        nn.print_network(self.netG, params['G'], 'G')
        if self.isTrain:
            for i, d in enumerate(self.netD):
                nn.print_network(d, params['D'][str(i)], 'D_%d' % i)
        print('-----------------------------------------------')

    # unaligned input: A carries (real_A, real_B) channels, B the fake label
    # (reference cgan2_model.py:115-126)
    def set_input(self, input):
        g0, g1 = self.groups
        self.input_A = self.to_device_batch(input['A'][..., g0])
        self.input_B = self.to_device_batch(input['A'][..., g1])
        self.input_fake_A = self.to_device_batch(input['B'][..., g0])
        self.image_paths = input['A_paths']

    def _noise_shape(self):
        o = self.opt
        return (o.batchSize, o.noiseSize, o.noiseSize, o.noise_nc)

    def _build_train_step(self):
        opt = self.opt
        netG, netD = self.netG, self.netD
        lsgan = not opt.no_lsgan
        lambda_D = tuple(opt.lambda_D)
        cd = self.compute_dtype

        def ctx(fkey=None):
            return nn.Ctx(fkey, compute_dtype=cd)

        def forward(params, inputs, noises, fkey):
            fk = [jax.random.fold_in(fkey, i) for i in range(2)]
            f_real = g_apply(netG, params['G'], ctx(fk[0]), x=inputs['A'],
                             noise=noises['noise'])
            f_fake = g_apply(netG, params['G'], ctx(fk[1]),
                             x=inputs['fake_A'], noise=noises['noise'])
            return {'fake_B_from_real_A': f_real, 'fake_B_from_fake_A': f_fake}

        def cat_pair(a, b):
            return b if opt.no_cgan else cat_channels(a, b)

        def make_pairs(taps, pools, key, inputs):
            if not opt.train_D_on_fake_fake_pair:
                fake_in = cat_pair(inputs['A'], taps['fake_B_from_real_A'])
            else:
                fake_in = cat_pair(inputs['fake_A'],
                                   taps['fake_B_from_fake_A'])
            fake, pool = pool_query(pools['fake'], fake_in, key,
                                    reject=opt.pool_reject_prob)
            return {'fake': fake}, {**pools, 'fake': pool}

        def d_loss(pD, pairs, inputs, all_params):
            real = cat_pair(inputs['A'], inputs['B'])
            lf = sum(gan_loss(o_, False, lsgan)
                     for o_ in bank_apply(netD, pD, pairs['fake'], ctx))
            lr_ = sum(gan_loss(o_, True, lsgan)
                      for o_ in bank_apply(netD, pD, real, ctx))
            return (lf + lr_) * 0.5, {'D_real': lr_, 'D_fake': lf}

        def g_loss(taps, all_params, inputs, noises, fkey):
            if not opt.train_G_on_fake_fake_pair:
                fake = cat_pair(inputs['A'], taps['fake_B_from_real_A'])
            else:
                fake = cat_pair(inputs['fake_A'], taps['fake_B_from_fake_A'])
            gan = 0.0
            for o_, lam in zip(bank_apply(netD, all_params['D'], fake, ctx),
                               lambda_D):
                if not opt.no_logD_trick:
                    gan += gan_loss(o_, True, lsgan) * lam
                else:
                    gan += -gan_loss(o_, False, lsgan) * lam
            if not opt.train_G_on_fake_fake_pair:
                w = l1_weight_map(inputs['A'], opt.weights, opt.fineSize,
                                  opt.batchSize)
                l1 = weighted_l1_loss(taps['fake_B_from_real_A'],
                                      inputs['B'], w)
            else:
                l1 = 0.0
            total = gan + l1 * opt.lambda_A
            return total, {'G_GAN': total}

        return build_gan_train_step(
            noise_shapes={'noise': self._noise_shape()},
            forward=forward,
            d_specs=[dict(key='D', tx=self.txD, n_update=opt.n_update_D,
                          lr='lr', make_pairs=make_pairs, loss=d_loss)],
            g_spec=dict(keys=['G'], tx=self.txG, n_update=opt.n_update_G,
                        lrs={'G': 'lr'}, loss=g_loss),
            metrics_order=['G_GAN', 'D_real', 'D_fake'])

    # ------------------------------------------------------------------- #
    def optimize_parameters(self):
        self.state, self._metrics, taps = self._train_step(
            self.state, self._step_inputs(), self.next_step_key(),
            self.lrs())
        self._after_chunk(taps)

    def _step_inputs(self):
        return {'A': self.input_A, 'B': self.input_B,
                'fake_A': self.input_fake_A}

    def _after_chunk(self, taps):
        self.real_A, self.real_B = self.input_A, self.input_B
        self.fake_A = self.input_fake_A
        self._taps = taps

    def test(self):
        key = self.next_test_key()
        self.noise = jax.random.normal(jax.random.fold_in(key, 0),
                                       self._noise_shape())
        self.real_A = self.transform(self.input_A)
        self.fake_B = self._g_jit(self.state['params']['G'], self.real_A,
                                  self.noise, jax.random.fold_in(key, 1))
        print('Random check: {}'.format(float(self.noise[0, 0, 0, 0])))

    def get_current_errors(self):
        return self._fetch_metrics()

    def get_current_visuals(self, save_as_single_image=False):
        if self.isTrain:
            t = self._taps
            return OrderedDict([
                ('real_A', tensor2im(self.real_A)),
                ('fake_B_real_A', tensor2im(t['fake_B_from_real_A'])),
                ('fake_A', tensor2im(self.fake_A)),
                ('fake_B_fake_A', tensor2im(t['fake_B_from_fake_A'])),
                ('real_B', tensor2im(self.real_B))])
        if save_as_single_image:
            ab = jnp.concatenate([self.real_A, self.fake_B], -1)
            return OrderedDict([('AB', tensor2im(ab))])
        return OrderedDict([('real_A', tensor2im(self.real_A)),
                            ('fake_B', tensor2im(self.fake_B))])

    def save(self, label):
        params = jax.device_get(self.state['params'])
        self.save_network(self.netG, params['G'], 'G', label)
        self.save_bank(self.netD, params['D'], 'D_%d', label)
        self.save_full_state(self.state, label, extra={'lr': self.old_lr})

    def update_learning_rate(self):
        lr = self.old_lr - self.opt.lr / self.opt.niter_decay
        print('update learning rate: %f -> %f' % (self.old_lr, lr))
        self.old_lr = lr
        self.old_lr1 = self.old_lr2 = lr
