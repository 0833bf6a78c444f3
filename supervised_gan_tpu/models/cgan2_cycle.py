"""CGAN2Cycle — cgan_cycle x cgan2: conditional cycle GAN fed by the
unaligned dataset whose B side carries stage-1 fake labels
(reference models/cgan2_cycle_model.py).

G loss (reference :202-245):
  GAN(D1 on selected pair) + lambda_A * WeightedL1(fakeB|realA, B)
  + lambda_B * BCE(G2(B) ~ A)
  + lambda_A_cycle * (BCE(G2(G1(A)) ~ A)
                      + lambda_fake_cycle * BCE(G2(G1(fakeA)) ~ fakeA))
"""

from collections import OrderedDict

import os

import jax
import jax.numpy as jnp

from .two_group import TwoGroupModel
from .base import adam_transform
from .common import (build_gan_train_step, bank_apply, g_apply,
                     l1_weight_map, cat_channels)
from .pools import init_pool, pool_query
from .. import nn
from ..nn.losses import gan_loss, weighted_l1_loss, bce_loss
from ..ops.edge_conv import space_to_phase, phase_to_space
from ..utils.images import tensor2im

# Same trick as models/twostage_cycle.py: the reconstructor (G2) outputs
# feed only elementwise BCE losses, so they stay phase-major and the
# gradient-free targets are space_to_phase'd instead.  Measured device
# NEGATIVE (see twostage_cycle.py / BENCH_NOTES round 3) — default OFF.
_PHASE_F2 = os.environ.get('SGAN_TPU_PHASE_F2', '0') == '1'


class CGAN2CycleModel(TwoGroupModel):
    def name(self):
        return 'cGANCycleModel'

    def initialize(self, opt):
        TwoGroupModel.initialize(self, opt)
        self.netG1 = self.build_G(opt.input_nc, opt.output_nc, suffix='1')
        self.netG2 = self.build_G(opt.output_nc, opt.input_nc, suffix='2')
        keys = jax.random.split(self.init_key, 16)
        params = {'G1': nn.jit_init(self.netG1, keys[0]),
                  'G2': nn.jit_init(self.netG2, keys[1])}

        if self.isTrain:
            d_in = opt.output_nc if opt.no_cgan \
                else opt.output_nc + opt.input_nc
            self.netD1 = self.build_D_bank(d_in, suffix='1')
            params['D1'] = self.init_bank(self.netD1, keys[2])

        if self.isTrain and opt.sequential_train:
            mdir = opt.pretrained_model_dir
            ep = opt.which_epoch_sequential
            if 'G1' in opt.which_model_to_load:
                params['G1'] = self.load_network(self.netG1, 'G1', ep, mdir)
            if 'G2' in opt.which_model_to_load:
                params['G2'] = self.load_network(self.netG2, 'G2', ep, mdir)
            if 'D1' in opt.which_model_to_load:
                params['D1'] = self.load_bank(self.netD1, 'D1_%d', ep, mdir)
        if not self.isTrain or opt.continue_train:
            params['G1'] = self.load_network(self.netG1, 'G1', opt.which_epoch)
            params['G2'] = self.load_network(self.netG2, 'G2', opt.which_epoch)
            if self.isTrain:
                params['D1'] = self.load_bank(self.netD1, 'D1_%d',
                                              opt.which_epoch)

        state = {'params': params, 'opt': {}, 'pools': {}}
        if self.isTrain:
            self.txG = adam_transform(opt.beta1)
            self.txD1 = adam_transform(opt.beta1)
            state['opt'] = {
                'G': self.txG.init({'G1': params['G1'], 'G2': params['G2']}),
                'D1': self.txD1.init(params['D1'])}
            pool_nc = opt.output_nc if opt.no_cgan \
                else opt.input_nc + opt.output_nc
            state['pools'] = {'pool1': init_pool(
                opt.pool_size, (opt.fineSize, opt.fineSize, pool_nc))}
            if opt.continue_train:
                restored = self.load_full_state(opt.which_epoch)
                if restored is not None:
                    state = restored['state']
                    extra = restored['extra']
                    self.old_lr = extra.get('lr', opt.lr)
                    self.old_lr1 = extra.get('lr1', opt.lr1)
                    self.old_lr2 = extra.get('lr2', opt.lr2)
            self._train_step = self.jit_train_step(
                self._build_train_step(), state)
        self.state = self.put_state(state)

        cd = self.compute_dtype
        self._g1_jit = jax.jit(lambda p, x, n, fk: g_apply(
            self.netG1, p, nn.Ctx(fk, compute_dtype=cd), x=x, noise=n))

        print('------------ Networks initialized -------------')
        nn.print_network(self.netG1, params['G1'], 'G1')
        nn.print_network(self.netG2, params['G2'], 'G2')
        if self.isTrain:
            for i, d in enumerate(self.netD1):
                nn.print_network(d, params['D1'][str(i)], 'D1_%d' % i)
        print('-----------------------------------------------')

    def set_input(self, input):
        g0, g1 = self.groups
        self.input_A = self.to_device_batch(input['A'][..., g0])
        self.input_B = self.to_device_batch(input['A'][..., g1])
        self.input_fake_A = self.to_device_batch(input['B'][..., g0])
        self.image_paths = input['A_paths']

    def _noise_shapes(self):
        o = self.opt
        return {'noise1': (o.batchSize, o.noiseSize1, o.noiseSize1,
                           o.noise_nc1),
                'noise2': (o.batchSize, o.noiseSize2, o.noiseSize2,
                           o.noise_nc2)}

    def _build_train_step(self):
        opt = self.opt
        netG1, netG2, netD1 = self.netG1, self.netG2, self.netD1
        lsgan1 = not opt.no_lsgan1
        lambda_D1 = tuple(opt.lambda_D1)
        cd = self.compute_dtype

        def ctx(fkey=None):
            return nn.Ctx(fkey, compute_dtype=cd)

        from ..nn.generators import UnetGenerator
        phase = _PHASE_F2 and isinstance(netG2, UnetGenerator)
        self._phase_f2 = phase

        def forward(params, inputs, noises, fkey):
            fk = [jax.random.fold_in(fkey, i) for i in range(5)]
            f_real = g_apply(netG1, params['G1'], ctx(fk[0]), x=inputs['A'],
                             noise=noises['noise1'])
            f_fake = g_apply(netG1, params['G1'], ctx(fk[1]),
                             x=inputs['fake_A'], noise=noises['noise1'])
            a_from_b = g_apply(netG2, params['G2'], ctx(fk[2]),
                               x=inputs['B'], noise=noises['noise2'],
                               phase_out=phase)
            recon_real = g_apply(netG2, params['G2'], ctx(fk[3]), x=f_real,
                                 noise=noises['noise2'], phase_out=phase)
            recon_fake = g_apply(netG2, params['G2'], ctx(fk[4]), x=f_fake,
                                 noise=noises['noise2'], phase_out=phase)
            return {'fake_B_from_real_A': f_real,
                    'fake_B_from_fake_A': f_fake,
                    'fake_A_from_real_B': a_from_b,
                    'recon_real_A': recon_real,
                    'recon_fake_A': recon_fake}

        def cat_pair(a, b):
            return b if opt.no_cgan else cat_channels(a, b)

        def d1_pairs(taps, pools, key, inputs):
            if not opt.train_D_on_fake_fake_pair:
                fake_in = cat_pair(inputs['A'], taps['fake_B_from_real_A'])
            else:
                fake_in = cat_pair(inputs['fake_A'],
                                   taps['fake_B_from_fake_A'])
            fake, p1 = pool_query(pools['pool1'], fake_in, key)
            return {'fake': fake}, {**pools, 'pool1': p1}

        def d1_loss(pD, pairs, inputs, all_params):
            real = cat_pair(inputs['A'], inputs['B'])
            lf = sum(gan_loss(o_, False, lsgan1)
                     for o_ in bank_apply(netD1, pD, pairs['fake'], ctx))
            lr_ = sum(gan_loss(o_, True, lsgan1)
                      for o_ in bank_apply(netD1, pD, real, ctx))
            total = (lf + lr_) * 0.5
            return total, {'D1': total}

        def g_loss(taps, all_params, inputs, noises, fkey):
            real_A, real_B = inputs['A'], inputs['B']
            if not opt.train_G_on_fake_fake_pair:
                fake = cat_pair(real_A, taps['fake_B_from_real_A'])
            else:
                fake = cat_pair(inputs['fake_A'], taps['fake_B_from_fake_A'])
            gan = 0.0
            for o_, lam in zip(bank_apply(netD1, all_params['D1'], fake, ctx),
                               lambda_D1):
                if not opt.no_logD_trick:
                    gan += gan_loss(o_, True, lsgan1) * lam
                else:
                    gan += -gan_loss(o_, False, lsgan1) * lam
            if not opt.train_G_on_fake_fake_pair:
                w = l1_weight_map(real_A, opt.weights, opt.fineSize,
                                  opt.batchSize)
                l1 = weighted_l1_loss(taps['fake_B_from_real_A'], real_B, w)
            else:
                l1 = 0.0
            ra = space_to_phase(real_A, 2) if phase else real_A
            fa = (space_to_phase(inputs['fake_A'], 2) if phase
                  else inputs['fake_A'])
            ce = bce_loss((taps['fake_A_from_real_B'] + 1) / 2,
                          (ra + 1) / 2)
            real_cycle = bce_loss((taps['recon_real_A'] + 1) / 2,
                                  (ra + 1) / 2)
            fake_cycle = bce_loss((taps['recon_fake_A'] + 1) / 2,
                                  (fa + 1) / 2)
            total = (gan + l1 * opt.lambda_A + ce * opt.lambda_B
                     + real_cycle * opt.lambda_A_cycle
                     + fake_cycle * opt.lambda_A_cycle * opt.lambda_fake_cycle)
            return total, {'G1': total, 'real_cycle': real_cycle,
                           'fake_cycle': fake_cycle}

        return build_gan_train_step(
            noise_shapes=self._noise_shapes(),
            forward=forward,
            d_specs=[dict(key='D1', tx=self.txD1, n_update=opt.n_update_D1,
                          lr='lr1', make_pairs=d1_pairs, loss=d1_loss)],
            g_spec=dict(keys=['G1', 'G2'], tx=self.txG,
                        n_update=opt.n_update_G,
                        lrs={'G1': 'lr1', 'G2': 'lr2'}, loss=g_loss),
            metrics_order=['G1', 'real_cycle', 'fake_cycle', 'D1'])

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
        shapes = self._noise_shapes()
        self.noise1 = jax.random.normal(jax.random.fold_in(key, 0),
                                        shapes['noise1'])
        self.noise2 = jax.random.normal(jax.random.fold_in(key, 1),
                                        shapes['noise2'])
        self.real_A = self.input_A
        self.fake_B_from_real_A = self._g1_jit(
            self.state['params']['G1'], self.real_A, self.noise1,
            jax.random.fold_in(key, 2))
        print('Random check: {}, {}'.format(
            float(self.noise1[0, 0, 0, 0]), float(self.noise2[0, 0, 0, 0])))

    def get_current_errors(self):
        return self._fetch_metrics()

    def get_current_visuals(self, save_as_single_image=False):
        if self.isTrain:
            t = self._taps
            f2 = ((lambda y: phase_to_space(y, 2))
                  if getattr(self, '_phase_f2', False) else (lambda y: y))
            return OrderedDict([
                ('real_A', tensor2im(self.real_A)),
                ('fake_B_real_A', tensor2im(t['fake_B_from_real_A'])),
                ('fake_A', tensor2im(self.fake_A)),
                ('fake_B_fake_A', tensor2im(t['fake_B_from_fake_A'])),
                ('fake_A_real_B', tensor2im(f2(t['fake_A_from_real_B']))),
                ('real_B', tensor2im(self.real_B)),
                ('recon_real_A', tensor2im(f2(t['recon_real_A']))),
                ('recon_fake_A', tensor2im(f2(t['recon_fake_A'])))])
        if save_as_single_image:
            ab = jnp.concatenate([self.real_A, self.fake_B_from_real_A], -1)
            return OrderedDict([('AB', tensor2im(ab))])
        return OrderedDict([
            ('real_A', tensor2im(self.real_A)),
            ('fake_B', tensor2im(self.fake_B_from_real_A))])

    def save(self, label):
        params = jax.device_get(self.state['params'])
        self.save_network(self.netG1, params['G1'], 'G1', label)
        self.save_network(self.netG2, params['G2'], 'G2', label)
        self.save_bank(self.netD1, params['D1'], 'D1_%d', label)
        self.save_full_state(self.state, label,
                             extra={'lr': self.old_lr, 'lr1': self.old_lr1,
                                    'lr2': self.old_lr2})
