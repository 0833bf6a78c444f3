"""Segmentation model — image -> per-pixel classes, the downstream
evaluation gate (reference models/segm_model.py).

Head: softmax + CrossEntropyLoss2d over logits, or sigmoid + weighted BCE
(--use_sigmoid_ss); optional conditional GAN loss when --which_model_netD
!= 'None'.  Streaming metrics (confusion matrix -> pixelAcc/meanAcc/meanIU,
Rand F-score) accumulate host-side exactly as the reference's formulas
(reference :282-341); train_ss.py / test_ss.py drive the
reset_accs/accum_accs/get_current_accs protocol.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel, parse_which_channel, adam_transform
from .common import build_gan_train_step, bank_apply, g_apply
from .pools import init_pool, pool_query
from .. import nn
from ..nn.losses import gan_loss, cross_entropy_2d
from ..utils.images import tensor2im
from ..utils.metrics import compute_rand_f_scores


class SegAccumulatorMixin:
    """reset_accs / accum_accs / get_current_accs (reference segm_model.py:282-341)."""

    def reset_accs(self):
        self.confusion = 0
        self.numAveragedImages = 0
        self.numAveragedPixels = 0
        self.RandScore = 0
        self.pixelAcc = 0
        self.meanAcc = 0
        self.meanIU = 0

    def accum_accs(self):
        if 'RandScore' in self.opt.which_metric:
            self.compute_current_rand_score()
        if 'meanIU' in self.opt.which_metric:
            self.compute_current_accuracy()

    def compute_current_rand_score(self):
        assert self.num_classes == 2
        # NHWC -> NCHW for the rand-score routine; foreground = channel 0
        T = np.transpose(np.asarray(self.real_B), (0, 3, 1, 2))[:, :1]
        S = np.transpose(np.asarray(self.fake_B), (0, 3, 1, 2))[:, :1]
        ris = compute_rand_f_scores(S, T, do_thin=False)
        n = self.numAveragedImages
        m = n + ris.size
        self.numAveragedImages = m
        self.RandScore = (n * self.RandScore + ris.sum()) / m

    def compute_current_accuracy(self):
        if self.opt.add_background_onehot_acc:
            labels = np.asarray(self.real_B)
            labels = np.concatenate(
                [labels, 1.0 - np.minimum(1, labels.sum(-1, keepdims=True))],
                -1).argmax(-1).ravel()
            preds = np.asarray(self.fake_B)
            preds = np.concatenate(
                [preds, 1.0 - np.minimum(1, preds.sum(-1, keepdims=True))],
                -1).argmax(-1).ravel()
            plusone = 1
        else:
            labels = np.asarray(self.label).ravel()
            preds = np.asarray(self.logit).argmax(-1).ravel()
            plusone = 0
        n_cls = self.num_classes + plusone
        num_pixels = labels.size
        conf = np.bincount(labels.astype(np.int64) * n_cls
                           + preds.astype(np.int64),
                           minlength=n_cls * n_cls).reshape(n_cls, n_cls)
        self.confusion = self.confusion + conf
        self.numAveragedPixels += num_pixels
        rel = np.sum(self.confusion, axis=1)
        sel = np.sum(self.confusion, axis=0)
        tp = np.diag(self.confusion)
        self.pixelAcc = tp.sum() / np.maximum(1, self.numAveragedPixels)
        self.meanAcc = np.mean(tp / np.maximum(1, rel))
        self.meanIU = np.mean(tp / np.maximum(1, rel + sel - tp))

    def get_current_accs(self):
        accs = []
        if 'RandScore' in self.opt.which_metric:
            accs.append(('RandScore', self.RandScore))
        if 'meanIU' in self.opt.which_metric:
            accs.append(('meanIU', self.meanIU))
        return OrderedDict(accs)

    def onehot_label_input(self, input_B):
        """[-1,1] label channels -> ([0,1] one-hot (+bg), argmax label)."""
        b = (input_B + 1) / 2.0
        if self.opt.add_background_onehot:
            bg = 1.0 - np.clip(b.sum(-1, keepdims=True), 0, 1)
            b = np.concatenate([b, bg], -1)
        label = b.argmax(-1)
        return b, label


class SegmentationModel(SegAccumulatorMixin, BaseModel):
    def name(self):
        return 'SegmentationModel'

    def initialize(self, opt):
        BaseModel.initialize(self, opt)
        groups = parse_which_channel(opt.which_channel)
        assert len(groups) == 2
        self.groups = groups
        opt.input_nc = len(groups[0])
        opt.output_nc = len(groups[1])
        self.num_classes = opt.output_nc + 1 if opt.add_background_onehot \
            else opt.output_nc
        self.use_sigmoid_ss = opt.use_sigmoid_ss
        self.act = 'sigmoid' if opt.use_sigmoid_ss else 'softmax'
        self.class_weights = opt.weights
        self.use_D = opt.isTrain and opt.which_model_netD != 'None'
        self.old_lr = getattr(opt, 'lr', 0.0)

        self.netG = nn.define_G(
            opt.input_nc, self.num_classes, opt.ngf, opt.which_model_netG,
            opt.norm, not opt.no_dropout, n_layers_G=opt.n_layers_G,
            use_residual=opt.use_residual, use_fcn=opt.noiseSize != 1,
            noise_nc=opt.noise_nc, add_gaussian_noise=opt.add_gaussian_noise,
            gaussian_sigma=opt.gaussian_sigma, upsample_mode=opt.upsample_mode,
            n_layers_CRN_block=opt.n_layers_CRN_block,
            share_label_weights=not opt.no_share_label_block_weights,
            n_layers_G_skip=opt.n_layers_G_skip)
        keys = jax.random.split(self.init_key, 8)
        params = {'G': nn.jit_init(self.netG, keys[0])}

        if self.use_D:
            assert (len(opt.scale_factor) == len(opt.lambda_D)
                    == len(opt.n_layers_D))
            d_in = self.num_classes if opt.no_cgan \
                else self.num_classes + opt.input_nc
            self.netD = []
            for scale, n_layers in zip(opt.scale_factor, opt.n_layers_D):
                self.netD.append(nn.define_D(
                    d_in, opt.ndf, opt.which_model_netD, n_layers_D=n_layers,
                    norm=opt.norm, use_sigmoid=opt.no_lsgan,
                    scale_factor=scale))
            params['D'] = {str(i): nn.jit_init(d, jax.random.fold_in(keys[1], i))
                           for i, d in enumerate(self.netD)}

        if not self.isTrain or opt.continue_train:
            params['G'] = self.load_network(self.netG, 'G', opt.which_epoch)
            if self.use_D:
                for i, d in enumerate(self.netD):
                    params['D'][str(i)] = self.load_network(
                        d, 'D_%d' % i, opt.which_epoch)

        state = {'params': params, 'opt': {}, 'pools': {}}
        if self.isTrain:
            self.txG = adam_transform(opt.beta1)
            state['opt']['G'] = self.txG.init({'G': params['G']})
            if self.use_D:
                self.txD = adam_transform(opt.beta1)
                state['opt']['D'] = self.txD.init(params['D'])
                pool_nc = self.num_classes if opt.no_cgan \
                    else opt.input_nc + self.num_classes
                state['pools']['fake'] = init_pool(
                    opt.pool_size, (opt.fineSize, opt.fineSize, pool_nc))
            self._train_step = self.jit_train_step(
                self._build_train_step(), state)
        self.state = self.put_state(state)

        cd = self.compute_dtype
        self._logit_jit = jax.jit(lambda p, x, noise, fk: g_apply(
            self.netG, p, nn.Ctx(fk, compute_dtype=cd), x=x, noise=noise,
            activation='none'))

        print('------------ Networks initialized -------------')
        nn.print_network(self.netG, params['G'], 'G')
        if self.use_D:
            for i, d in enumerate(self.netD):
                nn.print_network(d, params['D'][str(i)], 'D_%d' % i)
        print('-----------------------------------------------')

    # ------------------------------------------------------------------- #
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
        onehot, label = self.onehot_label_input(input_B)
        self.input_A = self.to_device_batch(input_A)
        self.input_B = self.to_device_batch(onehot)
        self.label = jnp.asarray(label, jnp.int32)
        self.image_paths = input['A_paths' if AtoB else 'B_paths']

    def _noise_shape(self, val=False):
        o = self.opt
        s = o.noiseSizeVal if val else o.noiseSize
        return (o.batchSize, s, s, o.noise_nc)

    def _activate(self, logit):
        if self.use_sigmoid_ss:
            return jax.nn.sigmoid(logit)
        return jax.nn.softmax(logit, axis=-1)

    def _ce(self, logit, fake_B, real_B, label, weighted):
        from ..nn.losses import bce_loss
        if self.use_sigmoid_ss:
            if weighted and self.class_weights is not None:
                w = jnp.ones(real_B.shape[:-1] + (1,), jnp.float32)
                for i, wi in enumerate(self.class_weights):
                    w = w + real_B[..., i:i + 1] * (wi - 1.0)
                p = jnp.clip(fake_B, 1e-12, 1.0)
                terms = -(real_B * jnp.maximum(jnp.log(p), -100)
                          + (1 - real_B) * jnp.maximum(jnp.log(1 - fake_B),
                                                       -100))
                return jnp.mean(terms * w)
            p = fake_B
            terms = -(real_B * jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100)
                      + (1 - real_B) * jnp.maximum(
                          jnp.log(jnp.maximum(1 - p, 0.0)), -100))
            return jnp.mean(terms)
        weights = self.class_weights if weighted else None
        return cross_entropy_2d(logit, label, weights)

    def _build_train_step(self):
        opt = self.opt
        netG = self.netG
        cd = self.compute_dtype
        use_D = self.use_D
        lsgan = not opt.no_lsgan

        def ctx(fkey=None):
            return nn.Ctx(fkey, compute_dtype=cd)

        def forward(params, inputs, noises, fkey):
            logit = g_apply(netG, params['G'], ctx(fkey), x=inputs['A'],
                            noise=noises['noise'], activation='none')
            return {'logit': logit, 'fake_B': self._activate(logit)}

        d_specs = []
        if use_D:
            netD = self.netD
            lambda_D = tuple(opt.lambda_D)

            def make_pairs(taps, pools, key, inputs):
                fake_in = taps['fake_B'] if opt.no_cgan else jnp.concatenate(
                    [inputs['A'], taps['fake_B']], -1)
                fake, pool = pool_query(pools['fake'], fake_in, key)
                return {'fake': fake}, {**pools, 'fake': pool}

            def d_loss(pD, pairs, inputs, all_params):
                real = inputs['B'] if opt.no_cgan else jnp.concatenate(
                    [inputs['A'], inputs['B']], -1)
                lf = sum(gan_loss(o_, False, lsgan)
                         for o_ in bank_apply(netD, pD, pairs['fake'], ctx))
                lr_ = sum(gan_loss(o_, True, lsgan)
                          for o_ in bank_apply(netD, pD, real, ctx))
                return (lf + lr_) * 0.5, {}

            d_specs.append(dict(key='D', tx=self.txD,
                                n_update=opt.n_update_D, lr='lr',
                                make_pairs=make_pairs, loss=d_loss))

        def g_loss(taps, all_params, inputs, noises, fkey):
            gan = 0.0
            if use_D:
                fake = taps['fake_B'] if opt.no_cgan else jnp.concatenate(
                    [inputs['A'], taps['fake_B']], -1)
                for o_, lam in zip(
                        bank_apply(self.netD, all_params['D'], fake, ctx),
                        tuple(opt.lambda_D)):
                    gan += gan_loss(o_, True, lsgan) * lam
            ce = self._ce(taps['logit'], taps['fake_B'], inputs['B'],
                          inputs['label'], weighted=True)
            aux = {'G_CE': ce}
            if use_D:
                aux['G_GAN'] = gan
            return gan + ce, aux

        order = ['G_CE'] + (['G_GAN'] if use_D else [])
        return build_gan_train_step(
            noise_shapes={'noise': self._noise_shape()},
            forward=forward,
            d_specs=d_specs,
            g_spec=dict(keys=['G'], tx=self.txG, n_update=opt.n_update_G,
                        lrs={'G': 'lr'}, loss=g_loss),
            metrics_order=order)

    # ------------------------------------------------------------------- #
    def optimize_parameters(self):
        self.state, self._metrics, taps = self._train_step(
            self.state, self._step_inputs(), self.next_step_key(),
            self._step_lrs())
        self._after_chunk(taps)

    def _step_inputs(self):
        return {'A': self.input_A, 'B': self.input_B, 'label': self.label}

    def _step_lrs(self):
        return {'lr': self.old_lr, 'lr1': self.old_lr, 'lr2': self.old_lr}

    def _after_chunk(self, taps):
        self.real_A, self.real_B = self.input_A, self.input_B
        self.logit, self.fake_B = taps['logit'], taps['fake_B']

    def forward(self, val_mode=False):
        key = self.next_test_key()
        noise = jax.random.normal(jax.random.fold_in(key, 0),
                                  self._noise_shape(val=val_mode))
        self.real_A, self.real_B = self.input_A, self.input_B
        self.logit = self._logit_jit(self.state['params']['G'], self.input_A,
                                     noise, jax.random.fold_in(key, 1))
        self.fake_B = self._activate(self.logit)

    def test(self):
        self.forward(val_mode=False)

    def compute_cross_entropy_loss(self):
        ce = self._ce(self.logit, self.fake_B, self.real_B,
                      jnp.argmax(self.real_B, -1), weighted=False)
        self._metrics = OrderedDict([('G_CE', ce)])

    def get_current_errors(self):
        return self._fetch_metrics()

    def get_current_visuals(self):
        return OrderedDict([
            ('image', tensor2im(self.real_A)),
            ('label', tensor2im(self.real_B * 2 - 1)),
            ('prediction', tensor2im(self.fake_B * 2 - 1))])

    def save(self, label):
        params = jax.device_get(self.state['params'])
        self.save_network(self.netG, params['G'], 'G', label)
        if self.use_D:
            for i, d in enumerate(self.netD):
                self.save_network(d, params['D'][str(i)], 'D_%d' % i, label)
        self.save_full_state(self.state, label, extra={'lr': self.old_lr})

    def update_learning_rate(self):
        lr = self.old_lr - self.opt.lr / self.opt.niter_decay
        print('update learning rate: %f -> %f' % (self.old_lr, lr))
        self.old_lr = lr
