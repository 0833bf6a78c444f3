"""TwoStageFactD — twostage with a *factorized* second discriminator
(reference models/twostage_factD_model.py).

D2's prediction is the elementwise product
    mul(upsample(D1(label_part)), D2(pair))
with a reflection-padded centered broadcast (reference :268-292,362-379 and
util/util.py:131-145), pairing netD1[i] with netD2[i].  Requires the
conditional binary path (asserts no multiclass / no no_cgan, reference
:23-24).  The D2 update trains only D2's parameters (D1 logits enter as
constants), while the D1 update is the standard label-space loss —
matching the reference's separate optimizers.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
from jax import lax

from .twostage import TwoStageModel
from .common import build_gan_train_step, bank_apply, g_apply, mul_padded
from .pools import pool_query
from .. import nn
from ..nn.losses import gan_loss, weighted_l1_loss


class TwoStageFactDModel(TwoStageModel):
    # the factored per-pair D1(label) x D2(pair) products consume the
    # pixel-space label directly — the phase pipeline does not apply
    _phase_pipeline_ok = False

    def name(self):
        return 'TwoStageModel'

    def initialize(self, opt):
        assert not opt.use_multi_class_GAN
        assert not opt.no_cgan
        TwoStageModel.initialize(self, opt)

    def _build_train_step(self):
        opt = self.opt
        netG1, netG2 = self.netG1, self.netG2
        netD1, netD2 = self.netD1, self.netD2
        lsgan1, lsgan2 = not opt.no_lsgan1, not opt.no_lsgan2
        lambda_D1, lambda_D2 = tuple(opt.lambda_D1), tuple(opt.lambda_D2)
        cd = self.compute_dtype
        transform, transform_inverse = self.transform, self.transform_inverse
        n_pair = min(len(netD1), len(netD2))

        def ctx(fkey=None):
            return nn.Ctx(fkey, compute_dtype=cd)

        def forward(params, inputs, noises, fkey):
            fk = [jax.random.fold_in(fkey, i) for i in range(4)]
            fake_A = g_apply(netG1, params['G1'], ctx(fk[0]),
                             noise=noises['noise1'])
            fake_B_from_real_A = g_apply(netG2, params['G2'], ctx(fk[1]),
                                         x=inputs['A'], noise=noises['noise2'])
            x_in = transform(fake_A)
            if opt.detach_G1_from_G2_x:
                x_in = lax.stop_gradient(x_in)
            fake_B_from_fake_A = g_apply(netG2, params['G2'], ctx(fk[2]),
                                         x=x_in, noise=noises['noise2'])
            return {'fake_A': fake_A,
                    'fake_B_from_real_A': fake_B_from_real_A,
                    'fake_B_from_fake_A': fake_B_from_fake_A}

        def fact_pred(pD1, pD2, label_part, pair):
            """mul(transform(D1_i(label)), D2_i(pair)) per paired i."""
            preds = []
            for i in range(n_pair):
                d1 = netD1[i].apply(pD1[str(i)], label_part, ctx())
                d2 = netD2[i].apply(pD2[str(i)], pair, ctx())
                preds.append(mul_padded(transform(d1), d2))
            return preds

        def d1_pairs(taps, pools, key, inputs):
            fake, p1 = pool_query(pools['pool1'], taps['fake_A'], key)
            return {'fake': fake}, {**pools, 'pool1': p1}

        def d1_loss(pD, pairs, inputs, all_params):
            real = transform_inverse(inputs['A'])
            lf = sum(gan_loss(o_, False, lsgan1)
                     for o_ in bank_apply(netD1, pD, pairs['fake'], ctx))
            lr_ = sum(gan_loss(o_, True, lsgan1)
                      for o_ in bank_apply(netD1, pD, real, ctx))
            total = (lf + lr_) * 0.5
            return total, {'D1': total}

        def d2_pairs(taps, pools, key, inputs):
            out = {}
            new_pools = dict(pools)
            k1, k2 = jax.random.split(key)
            if 'real_fake' in opt.GAN_losses_D2:
                fr, new_pools['pool2'] = pool_query(
                    new_pools['pool2'],
                    jnp.concatenate([inputs['A'],
                                     taps['fake_B_from_real_A']], -1), k1)
                out['real_fake'] = fr
            if 'fake_fake' in opt.GAN_losses_D2:
                ff, new_pools['pool2'] = pool_query(
                    new_pools['pool2'],
                    jnp.concatenate([transform(taps['fake_A']),
                                     taps['fake_B_from_fake_A']], -1), k2)
                out['fake_fake'] = ff
            return out, new_pools

        def make_d2_loss():
            def d2_loss(pD2, pairs, inputs, all_params):
                # current (post-update) D1 params enter as constants
                pD1 = all_params['D1']
                loss_fake = 0.0
                for fake in pairs.values():
                    # re-extract the (pooled) label part; D1 is a constant here
                    fake_A_part = transform_inverse(
                        fake[..., :opt.input_nc])
                    for p in fact_pred(pD1, pD2, fake_A_part, fake):
                        loss_fake += gan_loss(p, False, lsgan2)
                loss_fake = loss_fake / len(pairs)
                real = jnp.concatenate([inputs['A'], inputs['B']], -1)
                real_A_part = transform_inverse(inputs['A'])
                loss_real = sum(gan_loss(p, True, lsgan2)
                                for p in fact_pred(pD1, pD2, real_A_part,
                                                   real))
                total = (loss_fake + loss_real) * 0.5
                return total, {'D2': total}
            return d2_loss

        def g_loss(taps, all_params, inputs, noises, fkey):
            pD1, pD2 = all_params['D1'], all_params['D2']
            real_A, real_B = inputs['A'], inputs['B']
            g1 = 0.0
            for o_, lam in zip(bank_apply(netD1, pD1, taps['fake_A'], ctx),
                               lambda_D1):
                if not opt.no_logD_trick:
                    g1 += gan_loss(o_, True, lsgan1) * lam
                else:
                    g1 += -gan_loss(o_, False, lsgan1) * lam

            g2 = 0.0
            num_pairs = 0
            if 'real_fake' in opt.GAN_losses_G2:
                fake = jnp.concatenate([real_A, taps['fake_B_from_real_A']],
                                       -1)
                label_part = transform_inverse(real_A)
                for p, lam in zip(fact_pred(pD1, pD2, label_part, fake),
                                  lambda_D2):
                    if not opt.no_logD_trick:
                        g2 += gan_loss(p, True, lsgan2) * lam
                    else:
                        g2 += -gan_loss(p, False, lsgan2) * lam
                num_pairs += 1
            if 'fake_fake' in opt.GAN_losses_G2:
                if opt.detach_G1_from_G2_y:
                    label_up = lax.stop_gradient(transform(taps['fake_A']))
                    label_part = lax.stop_gradient(taps['fake_A'])
                else:
                    label_up = transform(taps['fake_A'])
                    label_part = taps['fake_A']
                fake = jnp.concatenate([label_up,
                                        taps['fake_B_from_fake_A']], -1)
                for p, lam in zip(fact_pred(pD1, pD2, label_part, fake),
                                  lambda_D2):
                    if not opt.no_logD_trick:
                        g2 += gan_loss(p, True, lsgan2) * lam
                    else:
                        g2 += -gan_loss(p, False, lsgan2) * lam
                num_pairs += 1

            l1 = weighted_l1_loss(taps['fake_B_from_real_A'], real_B) \
                if 'real_fake' in opt.GAN_losses_G2 else 0.0
            total = (g1 * opt.lambda_G1
                     + g2 / max(num_pairs, 1) * opt.lambda_G2
                     + l1 * opt.lambda_G2 * opt.lambda_A)
            return total, {'G2_GAN': g2, 'G1_GAN': g1}

        d2_loss = make_d2_loss()

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
