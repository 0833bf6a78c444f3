"""TwoStage — DSGAN without the F2 reconstructor/cycle losses
(reference models/twostage_model.py).

Differences from twostage_cycle: no F2/cycle/BCE terms; the G loss is
lambda_G1 * G1_GAN + lambda_G2 * (G2_GAN/num_pairs + lambda_A * L1) with an
*unweighted* L1 (reference :371-377); exactly one D1/D2/G update per
iteration with no noise resampling (reference :379-395); sequential loading
always pulls G1+D1 (reference :99-102).
"""

from collections import OrderedDict

import os

import jax
import jax.numpy as jnp
from jax import lax

from .two_group import TwoGroupModel
from .base import adam_transform
from .common import (build_gan_train_step, bank_apply, g_apply,
                     cat_channels, phase_label_gate)
from .pools import init_pool, pool_query
from .. import nn
from ..nn.losses import gan_loss, gan_loss_multiclass, weighted_l1_loss
from ..ops.edge_conv import space_to_phase, phase_to_space
from ..utils.images import tensor2im

# Phase-major label pipeline (see models/twostage_cycle.py _PHASE_G1);
# default ON (BENCH_NOTES round 3 A/B).
_PHASE_G1 = os.environ.get('SGAN_TPU_PHASE_G1', '1') == '1'


class TwoStageModel(TwoGroupModel):
    # subclasses whose train step consumes pixel-space labels (factd's
    # paired D1xD2 products) opt out of the phase-major pipeline
    _phase_pipeline_ok = True

    def name(self):
        return 'TwoStageModel'

    def initialize(self, opt):
        TwoGroupModel.initialize(self, opt)
        self.netG1 = self.build_G(opt.input_nc, 0, suffix='1')
        self.netG2 = self._build_G2()
        keys = jax.random.split(self.init_key, 16)
        params = {'G1': nn.jit_init(self.netG1, keys[0]),
                  'G2': nn.jit_init(self.netG2, keys[1])}

        if self.isTrain:
            self.netD1 = self.build_D_bank(opt.input_nc, suffix='1')
            self._phase_g1, self._g1_s = phase_label_gate(
                self.netG1, self.netD1, self._label_space_size(),
                _PHASE_G1 and self._phase_pipeline_ok)
            num_classes = 3 if opt.use_multi_class_GAN else 2
            d2_in = opt.output_nc if opt.no_cgan \
                else opt.output_nc + opt.input_nc
            self.netD2 = self.build_D_bank(d2_in, suffix='2',
                                           num_classes=num_classes)
            params['D1'] = self.init_bank(self.netD1, keys[2])
            params['D2'] = self.init_bank(self.netD2, keys[3])

        if self.isTrain and opt.sequential_train:
            mdir = opt.pretrained_model_dir
            ep = opt.which_epoch_sequential
            params['G1'] = self.load_network(self.netG1, 'G1', ep, mdir)
            params['D1'] = self.load_bank(self.netD1, 'D1_%d', ep, mdir)
        if not self.isTrain or opt.continue_train:
            params['G1'] = self.load_network(self.netG1, 'G1', opt.which_epoch)
            params['G2'] = self.load_network(self.netG2, 'G2', opt.which_epoch)
            if self.isTrain:
                params['D1'] = self.load_bank(self.netD1, 'D1_%d',
                                              opt.which_epoch)
                params['D2'] = self.load_bank(self.netD2, 'D2_%d',
                                              opt.which_epoch)

        state = {'params': params, 'opt': {}, 'pools': {}}
        if self.isTrain:
            self.txG = adam_transform(opt.beta1)
            self.txD1 = adam_transform(opt.beta1)
            self.txD2 = adam_transform(opt.beta1)
            state['opt'] = {
                'G': self.txG.init({'G1': params['G1'], 'G2': params['G2']}),
                'D1': self.txD1.init(params['D1']),
                'D2': self.txD2.init(params['D2'])}
            fs = opt.fineSize
            a_small = self._label_space_size()
            if self._phase_g1:
                s1 = self._g1_s
                p1_shape = (a_small // s1, a_small // s1,
                            opt.input_nc * s1 * s1)
            else:
                p1_shape = (a_small, a_small, opt.input_nc)
            pools = {'pool1': init_pool(opt.pool_size, p1_shape)}
            d2_nc = opt.output_nc if opt.no_cgan \
                else opt.input_nc + opt.output_nc
            if not opt.use_multi_class_GAN:
                pools['pool2'] = init_pool(opt.pool_size, (fs, fs, d2_nc))
            else:
                pools['pool2_1'] = init_pool(opt.pool_size, (fs, fs, d2_nc))
                pools['pool2_2'] = init_pool(opt.pool_size, (fs, fs, d2_nc))
            state['pools'] = pools
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
        self._g1_jit = jax.jit(lambda p, n, fk: g_apply(
            self.netG1, p, nn.Ctx(fk, compute_dtype=cd), noise=n))
        self._g2_jit = jax.jit(lambda p, x, n, fk: g_apply(
            self.netG2, p, nn.Ctx(fk, compute_dtype=cd), x=x, noise=n))

        print('------------ Networks initialized -------------')
        nn.print_network(self.netG1, params['G1'], 'G1')
        nn.print_network(self.netG2, params['G2'], 'G2')
        if self.isTrain:
            for i, d in enumerate(self.netD1):
                nn.print_network(d, params['D1'][str(i)], 'D1_%d' % i)
            for i, d in enumerate(self.netD2):
                nn.print_network(d, params['D2'][str(i)], 'D2_%d' % i)
        print('-----------------------------------------------')

    def _build_G2(self):
        o = self.opt
        return nn.define_G(
            o.input_nc, o.output_nc, o.ngf2, o.which_model_netG2, o.norm,
            not o.no_dropout2, n_layers_G=o.n_layers_G2,
            use_residual=o.use_residual2, use_fcn=False, noise_nc=o.noise_nc2,
            add_gaussian_noise=o.add_gaussian_noise,
            gaussian_sigma=o.gaussian_sigma, upsample_mode=o.upsample_mode2,
            n_layers_CRN_block=o.n_layers_CRN_block2,
            share_label_weights=not o.no_share_label_block_weights2)

    def _label_space_size(self):
        if 'bilinear' in self.opt.transform_1to2:
            return self.opt.fineSize // int(self.opt.transform_1to2.split('_')[1])
        return self.opt.fineSize

    def _noise_shapes(self):
        o = self.opt
        return {'noise1': (o.batchSize, o.noiseSize1, o.noiseSize1,
                           o.noise_nc1),
                'noise2': (o.batchSize, o.noiseSize2, o.noiseSize2,
                           o.noise_nc2)}

    def _build_train_step(self):
        opt = self.opt
        netG1, netG2 = self.netG1, self.netG2
        netD1, netD2 = self.netD1, self.netD2
        lsgan1, lsgan2 = not opt.no_lsgan1, not opt.no_lsgan2
        lambda_D1, lambda_D2 = tuple(opt.lambda_D1), tuple(opt.lambda_D2)
        multiclass = opt.use_multi_class_GAN
        cd = self.compute_dtype
        transform, transform_inverse = self.transform, self.transform_inverse

        def ctx(fkey=None):
            return nn.Ctx(fkey, compute_dtype=cd)

        # phase-major label pipeline (see twostage_cycle._build_train_step)
        phase_g1 = getattr(self, '_phase_g1', False)
        s1 = getattr(self, '_g1_s', 1)
        d1_phase = s1 if phase_g1 else 0

        def fa_pix(taps):
            return (phase_to_space(taps['fake_A'], s1) if phase_g1
                    else taps['fake_A'])

        def forward(params, inputs, noises, fkey):
            fk = [jax.random.fold_in(fkey, i) for i in range(4)]
            fake_A = g_apply(netG1, params['G1'], ctx(fk[0]),
                             noise=noises['noise1'], phase_out=phase_g1)
            fake_B_from_real_A = g_apply(netG2, params['G2'], ctx(fk[1]),
                                         x=inputs['A'], noise=noises['noise2'])
            x_in = transform(phase_to_space(fake_A, s1) if phase_g1
                             else fake_A)
            if opt.detach_G1_from_G2_x:
                x_in = lax.stop_gradient(x_in)
            fake_B_from_fake_A = g_apply(netG2, params['G2'], ctx(fk[2]),
                                         x=x_in, noise=noises['noise2'])
            return {'fake_A': fake_A,
                    'fake_B_from_real_A': fake_B_from_real_A,
                    'fake_B_from_fake_A': fake_B_from_fake_A}

        def cat_pair(a, b):
            return b if opt.no_cgan else cat_channels(a, b)

        def d1_pairs(taps, pools, key, inputs):
            fake, p1 = pool_query(pools['pool1'], taps['fake_A'], key)
            return {'fake': fake}, {**pools, 'pool1': p1}

        def d1_loss(pD, pairs, inputs, all_params):
            real = transform_inverse(inputs['A'])
            if phase_g1:
                real = space_to_phase(real, s1)
            lf = sum(gan_loss(o_, False, lsgan1)
                     for o_ in bank_apply(netD1, pD, pairs['fake'], ctx,
                                          phase_in=d1_phase))
            lr_ = sum(gan_loss(o_, True, lsgan1)
                      for o_ in bank_apply(netD1, pD, real, ctx,
                                           phase_in=d1_phase))
            total = (lf + lr_) * 0.5
            return total, {'D1': total}

        def d2_pairs(taps, pools, key, inputs):
            out = {}
            new_pools = dict(pools)
            k1, k2 = jax.random.split(key)
            if not multiclass:
                if 'real_fake' in opt.GAN_losses_D2:
                    out['real_fake'], new_pools['pool2'] = pool_query(
                        new_pools['pool2'],
                        cat_pair(inputs['A'], taps['fake_B_from_real_A']), k1)
                if 'fake_fake' in opt.GAN_losses_D2:
                    out['fake_fake'], new_pools['pool2'] = pool_query(
                        new_pools['pool2'],
                        cat_pair(transform(fa_pix(taps)),
                                 taps['fake_B_from_fake_A']), k2)
            else:
                out['c1'], new_pools['pool2_1'] = pool_query(
                    new_pools['pool2_1'],
                    cat_pair(inputs['A'], taps['fake_B_from_real_A']), k1)
                out['c2'], new_pools['pool2_2'] = pool_query(
                    new_pools['pool2_2'],
                    cat_pair(transform(fa_pix(taps)),
                             taps['fake_B_from_fake_A']), k2)
            return out, new_pools

        def d2_loss(pD, pairs, inputs, all_params):
            real = cat_pair(inputs['A'], inputs['B'])
            if not multiclass:
                loss_fake = 0.0
                for fake in pairs.values():
                    loss_fake += sum(gan_loss(o_, False, lsgan2)
                                     for o_ in bank_apply(netD2, pD, fake, ctx))
                loss_fake = loss_fake / len(pairs)
                loss_real = sum(gan_loss(o_, True, lsgan2)
                                for o_ in bank_apply(netD2, pD, real, ctx))
                total = (loss_fake + loss_real) * 0.5
            else:
                l0 = sum(gan_loss_multiclass(o_, 0)
                         for o_ in bank_apply(netD2, pD, real, ctx))
                l1 = sum(gan_loss_multiclass(o_, 1)
                         for o_ in bank_apply(netD2, pD, pairs['c1'], ctx))
                l2 = sum(gan_loss_multiclass(o_, 2)
                         for o_ in bank_apply(netD2, pD, pairs['c2'], ctx))
                total = (l0 + l1 + l2) / 3
            return total, {'D2': total}

        def g_loss(taps, all_params, inputs, noises, fkey):
            pD1, pD2 = all_params['D1'], all_params['D2']
            real_A, real_B = inputs['A'], inputs['B']
            g1 = 0.0
            for o_, lam in zip(bank_apply(netD1, pD1, taps['fake_A'], ctx,
                                          phase_in=d1_phase),
                               lambda_D1):
                if not opt.no_logD_trick:
                    g1 += gan_loss(o_, True, lsgan1) * lam
                else:
                    g1 += -gan_loss(o_, False, lsgan1) * lam

            flipped = 0 if multiclass else True
            g2 = 0.0
            num_pairs = 0

            def d2_term(fake):
                t = 0.0
                for o_, lam in zip(bank_apply(netD2, pD2, fake, ctx),
                                   lambda_D2):
                    if multiclass:
                        # reference passes False -> class 0 under the trick-off
                        # path, i.e. the same class but NEGATED
                        # (twostage_cycle_model.py:363-366)
                        if not opt.no_logD_trick:
                            t += gan_loss_multiclass(o_, flipped) * lam
                        else:
                            t += -gan_loss_multiclass(o_, 0) * lam
                    elif not opt.no_logD_trick:
                        t += gan_loss(o_, True, lsgan2) * lam
                    else:
                        t += -gan_loss(o_, False, lsgan2) * lam
                return t

            if 'real_fake' in opt.GAN_losses_G2:
                g2 += d2_term(cat_pair(real_A, taps['fake_B_from_real_A']))
                num_pairs += 1
            if 'fake_fake' in opt.GAN_losses_G2:
                label_part = transform(fa_pix(taps))
                if opt.detach_G1_from_G2_y:
                    label_part = lax.stop_gradient(label_part)
                g2 += d2_term(cat_pair(label_part,
                                       taps['fake_B_from_fake_A']))
                num_pairs += 1

            l1 = weighted_l1_loss(taps['fake_B_from_real_A'], real_B) \
                if 'real_fake' in opt.GAN_losses_G2 else 0.0

            total = (g1 * opt.lambda_G1
                     + g2 / max(num_pairs, 1) * opt.lambda_G2
                     + l1 * opt.lambda_G2 * opt.lambda_A)
            return total, {'G2_GAN': g2, 'G1_GAN': g1}

        # exactly one update per net, no resampling (reference :379-395)
        return build_gan_train_step(
            noise_shapes=self._noise_shapes(),
            forward=forward,
            d_specs=[
                dict(key='D1', tx=self.txD1, n_update=1, lr='lr1',
                     make_pairs=d1_pairs, loss=d1_loss),
                dict(key='D2', tx=self.txD2, n_update=1, lr='lr2',
                     make_pairs=d2_pairs, loss=d2_loss),
            ],
            g_spec=dict(keys=['G1', 'G2'], tx=self.txG, n_update=1,
                        lrs={'G1': 'lr1', 'G2': 'lr2'}, loss=g_loss),
            metrics_order=['G2_GAN', 'D2', 'G1_GAN', 'D1'])

    # ------------------------------------------------------------------- #
    def optimize_parameters(self):
        self.state, self._metrics, taps = self._train_step(
            self.state, self._step_inputs(), self.next_step_key(),
            self.lrs())
        self._after_chunk(taps)

    def _step_inputs(self):
        return {'A': self.input_A, 'B': self.input_B}

    def _after_chunk(self, taps):
        self.real_A, self.real_B = self.input_A, self.input_B
        self._taps = taps

    def test(self):
        key = self.next_test_key()
        shapes = self._noise_shapes()
        self.noise1 = jax.random.normal(jax.random.fold_in(key, 0),
                                        shapes['noise1'])
        self.noise2 = jax.random.normal(jax.random.fold_in(key, 1),
                                        shapes['noise2'])
        p = self.state['params']
        self.fake_A = self._g1_jit(p['G1'], self.noise1,
                                   jax.random.fold_in(key, 2))
        self.fake_B_from_fake_A = self._g2_jit(
            p['G2'], self.transform(self.fake_A), self.noise2,
            jax.random.fold_in(key, 3))
        print('Random check: {}, {}'.format(
            float(self.noise1[0, 0, 0, 0]), float(self.noise2[0, 0, 0, 0])))

    def get_current_errors(self):
        return self._fetch_metrics()

    def get_current_visuals(self, save_as_single_image=False):
        if self.isTrain:
            t = self._taps
            fa = (phase_to_space(t['fake_A'], self._g1_s)
                  if getattr(self, '_phase_g1', False) else t['fake_A'])
            img_list = [
                ('fake_A', tensor2im(fa)),
                ('fake_B_fake_A', tensor2im(t['fake_B_from_fake_A'])),
                ('real_A', tensor2im(self.real_A)),
                ('real_B', tensor2im(self.real_B)),
                ('fake_B_real_A', tensor2im(t['fake_B_from_real_A']))]
        else:
            img_list = [
                ('fake_A', tensor2im(self.fake_A)),
                ('fake_B_fake_A', tensor2im(self.fake_B_from_fake_A))]
        return OrderedDict(img_list)

    def save(self, label):
        params = jax.device_get(self.state['params'])
        self.save_network(self.netG1, params['G1'], 'G1', label)
        self.save_network(self.netG2, params['G2'], 'G2', label)
        self.save_bank(self.netD1, params['D1'], 'D1_%d', label)
        self.save_bank(self.netD2, params['D2'], 'D2_%d', label)
        self.save_full_state(self.state, label,
                             extra={'lr': self.old_lr, 'lr1': self.old_lr1,
                                    'lr2': self.old_lr2})
