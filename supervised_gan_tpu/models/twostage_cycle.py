"""TwoStageCycle — the DSGAN flagship (reference models/twostage_cycle_model.py,
README.md:15-24).

Stage 1: G1 synthesizes labels from noise (fcgan), judged by the D1 bank in
label space against AvgPool-downsampled real labels.  Stage 2: G2 (CRN)
refines transform(fake label) or the real label into an image, judged by the
D2 bank on conditional pairs; F2 (unet) reconstructs labels from images,
closing the cycle.  Six G-loss terms (reference :337-410):

  G1_GAN + G2_GAN/num_pairs + lambda_A * WeightedL1(fakeB|realA, realB)
  + lambda_B * BCE(F2(realB) ~ realA)
  + lambda_A_cycle * BCE(F2(G2(realA)) ~ realA)
  + lambda_A_cycle * lambda_fake_cycle * BCE(F2(G2(fakeA)) ~ sg(transform(fakeA)))

Whole iteration (D1^n, D2^n, G^n with resampling, three pools, three Adams)
is one jitted donated-state XLA program.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
from jax import lax

import os

from .two_group import TwoGroupModel
from .base import adam_transform
from .common import (build_gan_train_step, bank_apply, bank_apply_multi,
                     g_apply, g_apply_multi, l1_weight_map, cat_channels,
                     bank_phase_gate)
from .pools import init_pool, pool_query, pool_sample, pool_fill
from .. import nn
from ..nn.losses import gan_loss, gan_loss_multiclass, weighted_l1_loss, bce_loss
from ..ops.edge_conv import space_to_phase, phase_to_space
from ..utils.images import tensor2im

# Keep the F2 cycle outputs phase-major inside the train step: their only
# consumers are elementwise BCE losses, so the co=2 pixel interleave (fwd)
# and cotangent space-to-depth (bwd) are pure formatting — the gradient-free
# loss TARGETS are space_to_phase'd instead.  Measured NEGATIVE (BENCH_NOTES
# round 3): the phase-major (q,r,co) loss/dw consumers become cross-layout
# {4,3,2,1,5,0}->{4,2,3,1,5,0} kLoop fusions at ~5 GB/s (fusion.142 alone
# 2.2 ms/step) — +3.5 ms device vs the pixel interleave.  Default OFF.
_PHASE_F2 = os.environ.get('SGAN_TPU_PHASE_F2', '0') == '1'

# Phase-major label-space pipeline: G1's convT head emits its dense dot's
# natural phase-major tensor, pool1 stores it, and the D1 bank consumes it
# in place (stem_conv_phase / blur_downsample_phase) — the G1-head pixel
# interleave survives only for the transform() consumers, and the D1-side
# space-to-depth packs disappear entirely.  Measured +0.2 ms device
# (BENCH_NOTES round 3 A/B, arms h/i) — default ON; SGAN_TPU_PHASE_G1=0
# reverts (correctness held by the equivalence test either way).
_PHASE_G1 = os.environ.get('SGAN_TPU_PHASE_G1', '1') == '1'

# Pack the (pixel) D2 pair input ONCE per bank apply and let every D2
# member consume it phase-major — one relayout replaces one s2d per
# scale-1 stem plus the scale>1 blurs' pixel reads.  Measured NEGATIVE
# (+1.55 ms device, BENCH_NOTES round 3 A/B arm d): the shared pack
# de-fuses the per-stem s2d from its conv.  Default OFF.
_PHASE_D2 = os.environ.get('SGAN_TPU_PHASE_D2', '0') == '1'


class TwoStageCycleModel(TwoGroupModel):
    def name(self):
        return 'TwoStageCycleModel'

    def initialize(self, opt):
        TwoGroupModel.initialize(self, opt)
        self.netG1 = self.build_G(opt.input_nc, 0, suffix='1')
        self.netG2 = self.build_G2()
        self.netF2 = self.build_F(opt.output_nc, opt.input_nc, suffix='2')

        keys = jax.random.split(self.init_key, 16)
        params = {'G1': nn.jit_init(self.netG1, keys[0]),
                  'G2': nn.jit_init(self.netG2, keys[1]),
                  'F2': nn.jit_init(self.netF2, keys[2])}

        if self.isTrain:
            self.netD1 = self.build_D_bank(opt.input_nc, suffix='1')
            self._phase_g1, self._g1_s = self._phase_g1_gate()
            num_classes = 3 if opt.use_multi_class_GAN else 2
            d2_in = opt.output_nc if opt.no_cgan \
                else opt.output_nc + opt.input_nc
            self.netD2 = self.build_D_bank(d2_in, suffix='2',
                                           num_classes=num_classes)
            params['D1'] = self.init_bank(self.netD1, keys[3])
            params['D2'] = self.init_bank(self.netD2, keys[4])

        if self.isTrain and opt.sequential_train:
            mdir = opt.pretrained_model_dir
            ep = opt.which_epoch_sequential
            if 'G1' in opt.which_model_to_load:
                params['G1'] = self.load_network(self.netG1, 'G1', ep, mdir)
            if 'G2' in opt.which_model_to_load:
                params['G2'] = self.load_network(self.netG2, 'G2', ep, mdir)
            if 'F2' in opt.which_model_to_load:
                params['F2'] = self.load_network(self.netF2, 'F2', ep, mdir)
            if 'D1' in opt.which_model_to_load:
                params['D1'] = self.load_bank(self.netD1, 'D1_%d', ep, mdir)
            if 'D2' in opt.which_model_to_load:
                params['D2'] = self.load_bank(self.netD2, 'D2_%d', ep, mdir)
        if not self.isTrain or opt.continue_train:
            params['G1'] = self.load_network(self.netG1, 'G1', opt.which_epoch)
            params['G2'] = self.load_network(self.netG2, 'G2', opt.which_epoch)
            params['F2'] = self.load_network(self.netF2, 'F2', opt.which_epoch)
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
                'G': self.txG.init({'G1': params['G1'], 'G2': params['G2'],
                                    'F2': params['F2']}),
                'D1': self.txD1.init(params['D1']),
                'D2': self.txD2.init(params['D2'])}
            fs = opt.fineSize
            # D1 judges in transform_inverse space; with the phase-major
            # label pipeline the pool stores the phase tensor itself
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
            if opt.use_fixed_noise1:
                npool = init_pool(opt.noise_pool_size,
                                  (opt.noiseSize1, opt.noiseSize1,
                                   opt.noise_nc1))
                fixed = jax.random.normal(
                    keys[5], (opt.noise_pool_size, opt.noiseSize1,
                              opt.noiseSize1, opt.noise_nc1))
                pools['noise1'] = pool_fill(npool, fixed)
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
        nn.print_network(self.netF2, params['F2'], 'F2')
        if self.isTrain:
            for i, d in enumerate(self.netD1):
                nn.print_network(d, params['D1'][str(i)], 'D1_%d' % i)
            for i, d in enumerate(self.netD2):
                nn.print_network(d, params['D2'][str(i)], 'D2_%d' % i)
        print('-----------------------------------------------')

    # ------------------------------------------------------------------- #
    def build_G2(self):
        """G2 maps label->image with use_fcn forced off
        (reference twostage_cycle_model.py:52-57)."""
        o = self.opt
        return nn.define_G(
            o.input_nc, o.output_nc, o.ngf2, o.which_model_netG2, o.norm,
            not o.no_dropout2, n_layers_G=o.n_layers_G2,
            use_residual=o.use_residual2, use_fcn=False, noise_nc=o.noise_nc2,
            add_gaussian_noise=o.add_gaussian_noise,
            gaussian_sigma=o.gaussian_sigma, upsample_mode=o.upsample_mode2,
            n_layers_CRN_block=o.n_layers_CRN_block2,
            share_label_weights=not o.no_share_label_block_weights2)

    def _phase_g1_gate(self):
        from .common import phase_label_gate
        return phase_label_gate(self.netG1, self.netD1,
                                self._label_space_size(), _PHASE_G1)

    def _label_space_size(self):
        # D1's real side is transform_inverse(real_A)
        if 'bilinear' in self.opt.transform_1to2:
            sc = int(self.opt.transform_1to2.split('_')[1])
            return self.opt.fineSize // sc
        return self.opt.fineSize

    def _noise_shapes(self):
        o = self.opt
        return {'noise1': (o.batchSize, o.noiseSize1, o.noiseSize1,
                           o.noise_nc1),
                'noise2': (o.batchSize, o.noiseSize2, o.noiseSize2,
                           o.noise_nc2)}

    def _build_train_step(self):
        opt = self.opt
        netG1, netG2, netF2 = self.netG1, self.netG2, self.netF2
        netD1, netD2 = self.netD1, self.netD2
        lsgan1, lsgan2 = not opt.no_lsgan1, not opt.no_lsgan2
        lambda_D1, lambda_D2 = tuple(opt.lambda_D1), tuple(opt.lambda_D2)
        multiclass = opt.use_multi_class_GAN
        cd = self.compute_dtype
        transform, transform_inverse = self.transform, self.transform_inverse
        noise_shapes = self._noise_shapes()

        def ctx(fkey=None):
            return nn.Ctx(fkey, compute_dtype=cd)

        # per-sample norms (instance) make batch-stacking the repeated
        # G2/F2/D passes exactly equivalent to separate calls (batch norm
        # would mix statistics).  Measured on v5e it is ~4.5% SLOWER
        # (spatial positions already fill the MXU rows; see BENCH_NOTES),
        # so it is opt-in via SGAN_TPU_BATCH_PASSES=1.
        can_batch = (opt.norm == 'instance'
                     and os.environ.get('SGAN_TPU_BATCH_PASSES', '') == '1')
        # phase-major F2 outputs (see _PHASE_F2 above); the Unet head
        # stride is 2, so phase tensors are (H/2, W/2, 4*input_nc)
        from ..nn.generators import UnetGenerator
        phase = _PHASE_F2 and isinstance(self.netF2, UnetGenerator)
        self._phase_f2 = phase
        # phase-major label pipeline (see _PHASE_G1 above): fake_A rides
        # phase-major through the taps/pool/D1; pixel space only for the
        # transform() consumers (XLA CSEs the repeated interleave)
        phase_g1 = getattr(self, '_phase_g1', False)
        s1 = getattr(self, '_g1_s', 1)
        d1_phase = s1 if phase_g1 else 0

        def fa_pix(taps):
            return (phase_to_space(taps['fake_A'], s1) if phase_g1
                    else taps['fake_A'])

        # one-pack-per-bank-apply for the D2 pair inputs (see _PHASE_D2)
        d2_nc = opt.output_nc if opt.no_cgan \
            else opt.input_nc + opt.output_nc
        d2_ok, d2_s = bank_phase_gate(netD2, d2_nc, opt.fineSize,
                                      _PHASE_D2)
        d2_pack = d2_s if d2_ok else 0

        def forward(params, inputs, noises, fkey):
            fk = [jax.random.fold_in(fkey, i) for i in range(8)]
            fake_A = g_apply(netG1, params['G1'], ctx(fk[0]),
                             noise=noises['noise1'], phase_out=phase_g1)
            x_in = transform(phase_to_space(fake_A, s1) if phase_g1
                             else fake_A)
            if opt.detach_G1_from_G2_x:
                x_in = lax.stop_gradient(x_in)
            if can_batch:
                fake_B_from_real_A, fake_B_from_fake_A = g_apply_multi(
                    netG2, params['G2'], ctx(fk[2]), [inputs['A'], x_in],
                    noise=noises['noise2'])
                (fake_A_from_real_B, recon_real_A,
                 recon_fake_A) = g_apply_multi(
                    netF2, params['F2'], ctx(fk[1]),
                    [inputs['B'], fake_B_from_real_A, fake_B_from_fake_A],
                    noise=noises['noise2'], phase_out=phase)
                return {'fake_A': fake_A,
                        'fake_A_from_real_B': fake_A_from_real_B,
                        'fake_B_from_real_A': fake_B_from_real_A,
                        'fake_B_from_fake_A': fake_B_from_fake_A,
                        'recon_real_A': recon_real_A,
                        'recon_fake_A': recon_fake_A}
            fake_A_from_real_B = g_apply(netF2, params['F2'], ctx(fk[1]),
                                         x=inputs['B'], noise=noises['noise2'],
                                         phase_out=phase)
            fake_B_from_real_A = g_apply(netG2, params['G2'], ctx(fk[2]),
                                         x=inputs['A'], noise=noises['noise2'])
            fake_B_from_fake_A = g_apply(netG2, params['G2'], ctx(fk[3]),
                                         x=x_in, noise=noises['noise2'])
            recon_real_A = g_apply(netF2, params['F2'], ctx(fk[4]),
                                   x=fake_B_from_real_A,
                                   noise=noises['noise2'], phase_out=phase)
            recon_fake_A = g_apply(netF2, params['F2'], ctx(fk[5]),
                                   x=fake_B_from_fake_A,
                                   noise=noises['noise2'], phase_out=phase)
            return {'fake_A': fake_A,
                    'fake_A_from_real_B': fake_A_from_real_B,
                    'fake_B_from_real_A': fake_B_from_real_A,
                    'fake_B_from_fake_A': fake_B_from_fake_A,
                    'recon_real_A': recon_real_A,
                    'recon_fake_A': recon_fake_A}

        def sample_noises(k, pools):
            if opt.use_fixed_noise1:
                n1 = pool_sample(pools['noise1'], opt.batchSize, k())
            else:
                n1 = jax.random.normal(k(), noise_shapes['noise1'])
            n2 = jax.random.normal(k(), noise_shapes['noise2'])
            return {'noise1': n1, 'noise2': n2}

        # ----------------------------- D1 ------------------------------ #
        def d1_pairs(taps, pools, key, inputs):
            fake, p1 = pool_query(pools['pool1'], taps['fake_A'], key)
            return {'fake': fake}, {**pools, 'pool1': p1}

        def d1_loss(pD, pairs, inputs, all_params):
            real = transform_inverse(inputs['A'])
            if phase_g1:
                real = space_to_phase(real, s1)
            if can_batch:
                outs_f, outs_r = bank_apply_multi(
                    netD1, pD, [pairs['fake'], real], ctx,
                    phase_in=d1_phase)
            else:
                outs_f = bank_apply(netD1, pD, pairs['fake'], ctx,
                                    phase_in=d1_phase)
                outs_r = bank_apply(netD1, pD, real, ctx,
                                    phase_in=d1_phase)
            lf = sum(gan_loss(o_, False, lsgan1) for o_ in outs_f)
            lr_ = sum(gan_loss(o_, True, lsgan1) for o_ in outs_r)
            total = (lf + lr_) * 0.5
            return total, {'D1': total}

        # ----------------------------- D2 ------------------------------ #
        def cat_pair(a, b):
            return b if opt.no_cgan else cat_channels(a, b)

        def d2_pairs(taps, pools, key, inputs):
            out = {}
            new_pools = dict(pools)
            k1, k2 = jax.random.split(key)
            if not multiclass:
                if 'real_fake' in opt.GAN_losses_D2:
                    fr, new_pools['pool2'] = pool_query(
                        new_pools['pool2'],
                        cat_pair(inputs['A'], taps['fake_B_from_real_A']), k1)
                    out['real_fake'] = fr
                if 'fake_fake' in opt.GAN_losses_D2:
                    ff, new_pools['pool2'] = pool_query(
                        new_pools['pool2'],
                        cat_pair(transform(fa_pix(taps)),
                                 taps['fake_B_from_fake_A']), k2)
                    out['fake_fake'] = ff
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
            fakes = list(pairs.values())
            if can_batch:
                outs = bank_apply_multi(netD2, pD, fakes + [real], ctx,
                                        pack_phase=d2_pack)
            else:
                outs = [bank_apply(netD2, pD, x, ctx, pack_phase=d2_pack)
                        for x in fakes + [real]]
            if not multiclass:
                loss_fake = sum(gan_loss(o_, False, lsgan2)
                                for fake_outs in outs[:-1]
                                for o_ in fake_outs) / len(fakes)
                loss_real = sum(gan_loss(o_, True, lsgan2)
                                for o_ in outs[-1])
                total = (loss_fake + loss_real) * 0.5
            else:
                # pairs order: c1, c2 (classes 1, 2); real is class 0
                l1 = sum(gan_loss_multiclass(o_, 1) for o_ in outs[0])
                l2 = sum(gan_loss_multiclass(o_, 2) for o_ in outs[1])
                l0 = sum(gan_loss_multiclass(o_, 0) for o_ in outs[-1])
                total = (l0 + l1 + l2) / 3
            return total, {'D2': total}

        # ----------------------------- G ------------------------------- #
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
            g2_pairs = []
            if 'real_fake' in opt.GAN_losses_G2:
                g2_pairs.append(cat_pair(real_A, taps['fake_B_from_real_A']))
            if 'fake_fake' in opt.GAN_losses_G2:
                label_part = transform(fa_pix(taps))
                if opt.detach_G1_from_G2_y:
                    label_part = lax.stop_gradient(label_part)
                g2_pairs.append(cat_pair(label_part,
                                         taps['fake_B_from_fake_A']))
            num_pairs = len(g2_pairs)
            if can_batch:
                g2_outs = bank_apply_multi(netD2, pD2, g2_pairs, ctx,
                                           pack_phase=d2_pack)
            else:
                g2_outs = [bank_apply(netD2, pD2, x, ctx,
                                      pack_phase=d2_pack)
                           for x in g2_pairs]
            g2 = 0.0
            for outs in g2_outs:
                for o_, lam in zip(outs, lambda_D2):
                    if multiclass:
                        # reference twostage_cycle_model.py:363-366: trick-off
                        # negates the class-0 CE
                        if not opt.no_logD_trick:
                            g2 += gan_loss_multiclass(o_, flipped) * lam
                        else:
                            g2 += -gan_loss_multiclass(o_, 0) * lam
                    elif not opt.no_logD_trick:
                        g2 += gan_loss(o_, True, lsgan2) * lam
                    else:
                        g2 += -gan_loss(o_, False, lsgan2) * lam

            if 'real_fake' in opt.GAN_losses_G2:
                w = l1_weight_map(real_A, opt.weights, opt.fineSize,
                                  opt.batchSize)
                l1 = weighted_l1_loss(taps['fake_B_from_real_A'], real_B, w)
            else:
                l1 = 0.0

            # with phase-major F2 outputs, space_to_phase the (gradient-
            # free) targets instead: BCE is an elementwise mean, so the
            # permutation leaves value and gradients identical
            ra = space_to_phase(real_A, 2) if phase else real_A
            fa_t = lax.stop_gradient(transform(fa_pix(taps)))
            if phase:
                fa_t = space_to_phase(fa_t, 2)
            ce = bce_loss((taps['fake_A_from_real_B'] + 1) / 2,
                          (ra + 1) / 2)
            real_cycle = bce_loss((taps['recon_real_A'] + 1) / 2,
                                  (ra + 1) / 2)
            fake_cycle = bce_loss((taps['recon_fake_A'] + 1) / 2,
                                  (fa_t + 1) / 2)

            total = (g1 + g2 / max(num_pairs, 1)
                     + l1 * opt.lambda_A
                     + ce * opt.lambda_B
                     + real_cycle * opt.lambda_A_cycle
                     + fake_cycle * opt.lambda_A_cycle * opt.lambda_fake_cycle)
            return total, {'G2_GAN': g2, 'G2_real_cycle': real_cycle,
                           'G2_fake_cycle': fake_cycle, 'G1_GAN': g1}

        return build_gan_train_step(
            noise_shapes=noise_shapes,
            forward=forward,
            sample_noises=sample_noises,
            d_specs=[
                dict(key='D1', tx=self.txD1, n_update=opt.n_update_D1,
                     lr='lr1', make_pairs=d1_pairs, loss=d1_loss),
                dict(key='D2', tx=self.txD2, n_update=opt.n_update_D2,
                     lr='lr2', make_pairs=d2_pairs, loss=d2_loss),
            ],
            g_spec=dict(keys=['G1', 'G2', 'F2'], tx=self.txG,
                        n_update=opt.n_update_G,
                        lrs={'G1': 'lr1', 'G2': 'lr2', 'F2': 'lr2'},
                        loss=g_loss),
            metrics_order=['G2_GAN', 'G2_real_cycle', 'G2_fake_cycle', 'D2',
                           'G1_GAN', 'D1'])

    # ------------------------------------------------------------------- #
    def optimize_parameters(self):
        inputs = self._step_inputs()
        self.state, self._metrics, taps = self._train_step(
            self.state, inputs, self.next_step_key(), self.lrs())
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
            f2 = ((lambda y: phase_to_space(y, 2))
                  if getattr(self, '_phase_f2', False) else (lambda y: y))
            fa = (phase_to_space(t['fake_A'], self._g1_s)
                  if getattr(self, '_phase_g1', False) else t['fake_A'])
            return OrderedDict([
                ('real_A', tensor2im(self.real_A)),
                ('fake_B_real_A', tensor2im(t['fake_B_from_real_A'])),
                ('fake_A', tensor2im(self.transform(fa))),
                ('fake_B_fake_A', tensor2im(t['fake_B_from_fake_A'])),
                ('fake_A_real_B', tensor2im(f2(t['fake_A_from_real_B']))),
                ('real_B', tensor2im(self.real_B)),
                ('recon_real_A', tensor2im(f2(t['recon_real_A']))),
                ('recon_fake_A', tensor2im(f2(t['recon_fake_A'])))])
        if save_as_single_image:
            ab = jnp.concatenate([self.transform(self.fake_A),
                                  self.fake_B_from_fake_A], -1)
            return OrderedDict([('AB', tensor2im(ab))])
        return OrderedDict([
            ('fake_A', tensor2im(self.transform(self.fake_A))),
            ('fake_B', tensor2im(self.fake_B_from_fake_A))])

    def save(self, label):
        params = jax.device_get(self.state['params'])
        self.save_network(self.netG1, params['G1'], 'G1', label)
        self.save_network(self.netG2, params['G2'], 'G2', label)
        self.save_network(self.netF2, params['F2'], 'F2', label)
        self.save_bank(self.netD1, params['D1'], 'D1_%d', label)
        self.save_bank(self.netD2, params['D2'], 'D2_%d', label)
        self.save_full_state(self.state, label,
                             extra={'lr': self.old_lr, 'lr1': self.old_lr1,
                                    'lr2': self.old_lr2})
