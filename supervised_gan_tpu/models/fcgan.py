"""FCGAN recipe — unconditional GAN on channel-selected images.

Covers UnsupervisedGAN (--which_channel b), JointGAN (rg_b) and SGAN step 1
(rg) per reference README.md:33-51; reference implementation
models/fcgan_model.py.

TPU design: one jitted train step runs the whole iteration — noise
sampling, G forward, the n_update_D / n_update_G alternating schedule with
noise resampling between repeats (reference fcgan_model.py:178-193), the
device-side ImagePool query, and both Adam updates — as a single XLA
program with donated state (no host sync in the hot loop).
"""

from collections import OrderedDict

import os

import jax
import jax.numpy as jnp
from jax import lax

from .base import BaseModel, parse_which_channel, adam_transform, apply_adam
from .common import phase_label_gate
from .pools import init_pool, pool_query
from .. import nn
from ..nn.losses import gan_loss, bce_loss
from ..ops.edge_conv import space_to_phase, phase_to_space
from ..utils.images import tensor2im

# Phase-major label pipeline (see models/twostage_cycle.py _PHASE_G1): in
# this recipe the D bank and pool are G's ONLY consumers inside the step,
# so the head's pixel interleave disappears from the train program
# entirely — fakes interleave once, at display boundaries.  Default ON
# (BENCH_NOTES round 3 A/B).
_PHASE_G = os.environ.get('SGAN_TPU_PHASE_G1', '1') == '1'


class FCGANModel(BaseModel):
    def initialize(self, opt):
        BaseModel.initialize(self, opt)
        groups = parse_which_channel(opt.which_channel)
        self.chnl_idx = [i for g in groups for i in g]
        pos = 0
        self.visual_groups = []
        for g in groups:
            self.visual_groups.append(list(range(pos, pos + len(g))))
            pos += len(g)
        opt.input_nc = len(self.chnl_idx)

        self.netG = nn.define_G(
            opt.input_nc, 0, opt.ngf, opt.which_model_netG, opt.norm,
            not opt.no_dropout, n_layers_G=opt.n_layers_G,
            use_residual=opt.use_residual, use_fcn=opt.noiseSize != 1,
            noise_nc=opt.noise_nc,
            add_gaussian_noise=opt.add_gaussian_noise,
            gaussian_sigma=opt.gaussian_sigma,
            upsample_mode=opt.upsample_mode,
            n_layers_CRN_block=opt.n_layers_CRN_block,
            share_label_weights=not opt.no_share_label_block_weights)

        keys = jax.random.split(self.init_key, 16)
        params = {'G': nn.jit_init(self.netG, keys[0])}

        if self.isTrain:
            use_sigmoid = opt.no_lsgan
            assert (len(opt.scale_factor) == len(opt.lambda_D)
                    == len(opt.n_layers_D))
            self.n_netD = len(opt.scale_factor)
            self.netD = []
            for i, (scale, n_layers) in enumerate(
                    zip(opt.scale_factor, opt.n_layers_D)):
                self.netD.append(nn.define_D(
                    opt.input_nc, opt.ndf, opt.which_model_netD,
                    n_layers_D=n_layers, norm=opt.norm,
                    use_sigmoid=use_sigmoid, scale_factor=scale))
            params['D'] = {str(i): nn.jit_init(d, keys[1 + i])
                           for i, d in enumerate(self.netD)}

        if not self.isTrain or opt.continue_train:
            params['G'] = self.load_network(self.netG, 'G', opt.which_epoch)
            if self.isTrain:
                for i, d in enumerate(self.netD):
                    params['D'][str(i)] = self.load_network(
                        d, 'D_%d' % i, opt.which_epoch)

        state = {'params': params}
        if self.isTrain:
            self._phase_g, self._g_s = phase_label_gate(
                self.netG, self.netD, opt.fineSize, _PHASE_G)
            self.old_lr = opt.lr
            self.txG = adam_transform(opt.beta1)
            self.txD = adam_transform(opt.beta1)
            state['optG'] = self.txG.init(params['G'])
            state['optD'] = self.txD.init(params['D'])
            if self._phase_g:
                s = self._g_s
                pshape = (opt.fineSize // s, opt.fineSize // s,
                          opt.input_nc * s * s)
            else:
                pshape = (opt.fineSize, opt.fineSize, opt.input_nc)
            state['pool'] = init_pool(opt.pool_size, pshape)
            if opt.continue_train:
                restored = self.load_full_state(opt.which_epoch)
                if restored is not None:
                    state = restored['state']
                    self.old_lr = restored['extra'].get('lr', opt.lr)
            self._train_step = self.jit_train_step(
                self._build_train_step(), state)
        self.state = self.put_state(state)

        # fixed noises for latent interpolation (fcgan_model.py:64-67)
        self.fixed_noiseA = jax.random.normal(keys[14], self._noise_shape())
        self.fixed_noiseB = jax.random.normal(keys[15], self._noise_shape())

        self._g_fwd = jax.jit(
            lambda pG, noise, fkey: self.netG.apply(
                pG, noise, nn.Ctx(fkey, compute_dtype=self.compute_dtype)))

        print('------------ Networks initialized -------------')
        nn.print_network(self.netG, params['G'], 'G')
        if self.isTrain:
            for i, d in enumerate(self.netD):
                nn.print_network(d, params['D'][str(i)], 'D_%d' % i)
        print('-----------------------------------------------')

    # ------------------------------------------------------------------- #
    def _noise_shape(self):
        o = self.opt
        return (o.batchSize, o.noiseSize, o.noiseSize, o.noise_nc)

    def _build_train_step(self):
        opt = self.opt
        netG, netD = self.netG, self.netD
        n_D = self.n_netD
        lsgan = not opt.no_lsgan
        lambda_D = tuple(opt.lambda_D)
        n_update_D, n_update_G = opt.n_update_D, opt.n_update_G
        use_logD = not opt.no_logD_trick
        noise_shape = self._noise_shape()
        cd = self.compute_dtype
        txG, txD = self.txG, self.txD

        phase_s = self._g_s if self._phase_g else 0

        def g_fwd(pG, noise, fkey):
            ctx = nn.Ctx(fkey, compute_dtype=cd)
            if phase_s:
                return netG.apply(pG, noise, ctx, phase_out=True)
            return netG.apply(pG, noise, ctx)

        def d_fwd(pD, x):
            # bank_apply inherits the SGAN_TPU_PHASE_D2 auto-pack when the
            # phase pipeline isn't already feeding phase-major input
            from .common import bank_apply
            return bank_apply(netD, pD, x,
                              lambda: nn.Ctx(compute_dtype=cd),
                              phase_in=phase_s)

        def d_loss_fn(pD, fake, real):
            if phase_s:
                real = space_to_phase(real, phase_s)
            loss_fake = sum(gan_loss(o, False, lsgan) for o in d_fwd(pD, fake))
            loss_real = sum(gan_loss(o, True, lsgan) for o in d_fwd(pD, real))
            return (loss_fake + loss_real) * 0.5, (loss_fake, loss_real)

        def g_loss_fn(pG, pD, noise, fkey):
            fake = g_fwd(pG, noise, fkey)
            outs = d_fwd(pD, fake)
            if use_logD:
                return sum(gan_loss(o, True, lsgan) * lam
                           for o, lam in zip(outs, lambda_D))
            return sum(-gan_loss(o, False, lsgan) * lam
                       for o, lam in zip(outs, lambda_D))

        def train_step(state, real, key, lr):
            counter = iter(range(256))

            def k():
                return jax.random.fold_in(key, next(counter))

            G, D = state['params']['G'], state['params']['D']
            optG, optD, pool = state['optG'], state['optD'], state['pool']

            noise = jax.random.normal(k(), noise_shape)
            fkey = k()
            fake = g_fwd(G, noise, fkey)

            lossD_fake = lossD_real = jnp.zeros(())
            for _ in range(n_update_D):
                pooled, pool = pool_query(pool, lax.stop_gradient(fake), k())
                (_, (lf, lr_)), gD = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(D, pooled, real)
                D, optD = apply_adam(txD, gD, optD, D, lr)
                lossD_fake, lossD_real = lf, lr_
                if n_update_D > 1:
                    noise = jax.random.normal(k(), noise_shape)
                    fkey = k()
                    fake = g_fwd(G, noise, fkey)

            lossG = jnp.zeros(())
            for _ in range(n_update_G):
                lossG, gG = jax.value_and_grad(g_loss_fn)(G, D, noise, fkey)
                G, optG = apply_adam(txG, gG, optG, G, lr)
                if n_update_G > 1:
                    noise = jax.random.normal(k(), noise_shape)
                    fkey = k()
                    fake = g_fwd(G, noise, fkey)

            new_state = {'params': {'G': G, 'D': D},
                         'optG': optG, 'optD': optD, 'pool': pool}
            metrics = OrderedDict(
                [('G_GAN', lossG), ('D_real', lossD_real),
                 ('D_fake', lossD_fake)])
            return new_state, metrics, fake

        return train_step

    # ------------------------------------------------------------------- #
    def set_input(self, input):
        AorB = self.opt.which_direction == 'A'
        data = input['A' if AorB else 'B'][..., self.chnl_idx]
        self.input = self.to_device_batch(data)
        self.image_paths = input['A_paths' if AorB else 'B_paths']

    def optimize_parameters(self):
        self.state, self._metrics, taps = self._train_step(
            self.state, self._step_inputs(), self.next_step_key(),
            self._step_lrs())
        self._after_chunk(taps)

    def _step_inputs(self):
        return self.input

    def _step_lrs(self):
        return self.old_lr

    def _after_chunk(self, taps):
        # the train-step tap stays phase-major on device under the phase
        # pipeline; interleave only at display boundaries
        self.fake = taps
        self._fake_is_phase = getattr(self, '_phase_g', False)
        self.real = self.input

    def test(self):
        key = self.next_test_key()
        self.noise = jax.random.normal(
            jax.random.fold_in(key, 0), self._noise_shape())
        self.fake = self._g_fwd(self.state['params']['G'], self.noise,
                                jax.random.fold_in(key, 1))
        self._fake_is_phase = False
        print('Random check: {}'.format(float(self.noise[0, 0, 0, 0])))

    def interpolate(self, alpha):
        noise = alpha * self.fixed_noiseB + (1 - alpha) * self.fixed_noiseA
        self.noise = noise
        self.fake = self._g_fwd(self.state['params']['G'], noise,
                                jax.random.fold_in(self.master_key, 99))
        self._fake_is_phase = False
        self.real = self.input

    def set_fixed_noise(self, which_one):
        if which_one == 'A':
            self.fixed_noiseA = self.noise
        else:
            self.fixed_noiseB = self.noise

    def reconstruction(self):
        """LBFGS latent inversion (reference fcgan_model.py:238-307):
        3 restarts x 50 LBFGS iterations minimizing BCE((G(z)+1)/2,
        (x+1)/2); keeps the best and reports the N(0,I) negative
        log-likelihood of the recovered z."""
        import optax
        import numpy as np

        real = self.input
        label = (real + 1) / 2.0
        G = self.state['params']['G']
        fkey = jax.random.fold_in(self.master_key, 98)
        dim = self.opt.noise_nc * self.opt.noiseSize ** 2

        def nll(z):
            z = np.asarray(z, np.float64).ravel()
            return 0.5 * (z @ z) + 0.5 * dim * np.log(2 * np.pi)

        def objective(noise):
            pred = (self._g_fwd_raw(G, noise, fkey) + 1) / 2.0
            return bce_loss(pred, label)

        solver = optax.lbfgs()

        @jax.jit
        def lbfgs_step(noise, opt_state):
            loss, grads = jax.value_and_grad(objective)(noise)
            updates, opt_state = solver.update(
                grads, opt_state, noise, value=loss, grad=grads,
                value_fn=objective)
            return optax.apply_updates(noise, updates), opt_state, loss

        best = dict(err=float('inf'))
        for trial in range(3):
            print('trial {0} of 3'.format(trial + 1))
            noise0 = jax.random.normal(
                jax.random.fold_in(self.master_key, 200 + trial),
                self._noise_shape())
            noise, opt_state = noise0, solver.init(noise0)
            for _ in range(50):
                noise, opt_state, _ = lbfgs_step(noise, opt_state)
            recon = self._g_fwd_raw(G, noise, fkey)
            err = float(bce_loss((recon + 1) / 2, (real + 1) / 2))
            if err < best['err']:
                best = dict(err=err, noise=noise, recon=recon,
                            recon_init=self._g_fwd_raw(G, noise0, fkey),
                            ll=nll(noise), ll_init=nll(noise0))
        self.noise = best['noise']
        self.fake = best['recon']
        self._fake_is_phase = False
        self.fake_init = best['recon_init']
        self.real = real
        return best['err'], best['ll'], best['ll_init']

    def _g_fwd_raw(self, pG, noise, fkey):
        return self.netG.apply(pG, noise,
                               nn.Ctx(fkey, compute_dtype=self.compute_dtype))

    # ------------------------------------------------------------------- #
    def get_current_errors(self):
        return self._fetch_metrics()

    def get_current_visuals(self, save_real=False, save_as_single_image=True):
        if getattr(self, '_fake_is_phase', False):
            self.fake = phase_to_space(self.fake, self._g_s)
            self._fake_is_phase = False
        two = len(self.visual_groups) == 2
        if self.isTrain or save_real:
            if two:
                g0, g1 = self.visual_groups
                return OrderedDict([
                    ('real_label', tensor2im(self.real[..., g0])),
                    ('real_image', tensor2im(self.real[..., g1])),
                    ('fake_label', tensor2im(self.fake[..., g0])),
                    ('fake_image', tensor2im(self.fake[..., g1]))])
            return OrderedDict([('real', tensor2im(self.real)),
                                ('fake', tensor2im(self.fake))])
        if two:
            g0, g1 = self.visual_groups
            return OrderedDict([
                ('fake_label', tensor2im(self.fake[..., g0])),
                ('fake_image', tensor2im(self.fake[..., g1]))])
        return OrderedDict([('fake', tensor2im(self.fake))])

    def save(self, label):
        params = jax.device_get(self.state['params'])
        self.save_network(self.netG, params['G'], 'G', label)
        for i, d in enumerate(self.netD):
            self.save_network(d, params['D'][str(i)], 'D_%d' % i, label)
        self.save_full_state(self.state, label, extra={'lr': self.old_lr})

    def update_learning_rate(self):
        lrd = self.opt.lr / self.opt.niter_decay
        lr = self.old_lr - lrd
        print('update learning rate: %f -> %f' % (self.old_lr, lr))
        self.old_lr = lr
