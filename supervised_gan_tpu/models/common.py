"""Shared GAN-recipe machinery (the "composition algebra").

The reference implements 11 recipes as near-duplicate 300-500 line classes
(models/*_model.py).  Every one of them is the same shape:

  (set of nets) x (forward graph -> taps) x (loss terms over taps)
                x (alternating update schedule with noise resampling)

Here that shape is data: ``build_gan_train_step`` assembles ONE jitted,
donated-state XLA program per recipe from
  * noise specs           (shape per named noise stream),
  * a pure ``forward``    (params, inputs, noises, fkey) -> taps dict,
  * D specs               (params subtree, pair builder with device-pool
                           queries, loss over pairs, n_update, lr name),
  * a G spec              (subtree names, loss terms recomputing the forward
                           for gradients, per-subtree lr names, n_update).

Faithfulness notes:
  * In the reference, D losses backprop into a shared autograd graph and
    must ``.detach()`` fakes; functionally, D-loss gradients are taken only
    w.r.t. D params so taps are constants — no detach needed.
  * ``resample``: models with n_update>1 redraw noise and recompute the
    forward after *every* repeat, including the last (reference
    fcgan_model.py:178-193) — so the post-step visuals reflect the redrawn
    noise.  The G-loss recomputes the generator forward with the *same*
    noise AND the same dropout key, which reproduces backpropagating
    through the stored graph exactly.
  * Adam moments are per-parameter, so one ``scale_by_adam`` over a dict of
    subtrees is the reference's single Adam over chained param groups;
    per-group learning rates are applied as traced scalars at update time
    (so the linear per-epoch decay never triggers a recompile).
"""

import os
from collections import OrderedDict

import jax
import jax.numpy as jnp

from .base import apply_adam


def g_apply(net, params, ctx, x=None, noise=None, activation='tanh',
            phase_out=False):
    """Uniform generator invocation across zoo signatures: fcgan/dcgan take
    only noise; CRN takes (label, noise); unet/resnet/autoencoder take x and
    ignore noise (reference models/networks.py:362-367,535,711).

    ``phase_out=True`` (UnetGenerator / FCGANGenerator) returns the output
    in phase-major layout — space_to_phase(pixel output, head stride); see
    nn/generators.UnetGenerator.apply."""
    from ..nn.generators import (FCGANGenerator, FCGANGeneratorStar,
                                 DCGANGenerator, CascadedRefinementNetwork)
    if isinstance(net, FCGANGenerator):
        return net.apply(params, noise, ctx, activation=activation,
                         phase_out=phase_out)
    if isinstance(net, (FCGANGeneratorStar, DCGANGenerator)):
        return net.apply(params, noise, ctx, activation=activation)
    if isinstance(net, CascadedRefinementNetwork):
        return net.apply(params, x, noise, ctx, activation=activation)
    if phase_out:
        return net.apply(params, x, ctx, noise=noise, activation=activation,
                         phase_out=True)
    return net.apply(params, x, ctx, noise=noise, activation=activation)


def make_transform(transform_1to2):
    """The G1-output -> G2-input coupling pair: bilinear x-sc upsample and
    its AvgPool inverse (reference models/cgan_model.py:51-57)."""
    from ..ops import bilinear_upsample, avg_pool
    if 'bilinear' in transform_1to2:
        sc = int(transform_1to2.split('_')[1])
        return (lambda x: bilinear_upsample(x, sc),
                lambda x: avg_pool(x, sc, sc))
    return (lambda x: x), (lambda x: x)


def cat_channels(a, b):
    """Channel-concat a (conditioning, generated) pair for a cGAN D input
    (reference models/cgan_model.py:181-188 torch.cat((real_A, fake_B), 1)).

    The conditioning side (an f32 input batch) is cast to the generated
    side's dtype first: letting jnp.concatenate PROMOTE the generator's
    bf16 output to f32 makes the D-stem backward carry an f32 cotangent
    through the un-space-to-depth relayout — 2x the bytes in a
    lane-hostile layout (profiled 1.08 ms/step at the DSGAN 512px D2
    sites, round-3 trace).  The D stem re-casts to compute dtype
    immediately anyway, so forward numerics are unchanged."""
    return jnp.concatenate([a.astype(b.dtype), b], -1)


def l1_weight_map(real_A, weights, fine_size, batch_size):
    """Per-pixel weight map for WeightedL1: 1 + sum_i A_i*(w_i - 1) on the
    [0,1]-rescaled label channels (reference models/cgan_model.py:197-205)."""
    if weights is None:
        return None
    w = jnp.ones((batch_size, fine_size, fine_size, 1), jnp.float32)
    a = (jax.lax.stop_gradient(real_A) + 1) / 2
    for i, wi in enumerate(weights):
        w = w + a[..., i:i + 1] * (wi - 1.0)
    return w


def mul_padded(in1, in2):
    """Size-matched elementwise product with reflection-pad centering
    (reference util/util.py:131-145): pads in1 to in2's spatial size with
    left/bottom getting the floor of the split, then multiplies."""
    from ..ops import reflection_pad2d
    if in1.shape == in2.shape:
        return in1 * in2
    h1, w1 = in1.shape[1], in1.shape[2]
    h2, w2 = in2.shape[1], in2.shape[2]
    pad_l = (w2 - w1) // 2
    pad_b = (h2 - h1) // 2
    pad_r = w2 - w1 - pad_l
    pad_t = h2 - h1 - pad_b
    return reflection_pad2d(in1, (pad_l, pad_r, pad_t, pad_b)) * in2


def phase_label_gate(netG, netDs, label_size, enabled=True):
    """(enabled, phase stride) for the phase-major label-space pipeline
    (SGAN_TPU_PHASE_G1): the generator must be an FCGAN whose head is a
    strided ConvTranspose (the phase-major producer), the label grid must
    tile by its stride, and every D must be an NLayerDiscriminator (the
    phase-aware consumer: stem_conv_phase / blur_downsample_phase)."""
    if not enabled:
        return False, 1
    from ..nn.generators import FCGANGenerator
    from ..nn.discriminators import NLayerDiscriminator
    from ..nn.core import ConvTranspose2d
    if not isinstance(netG, FCGANGenerator):
        return False, 1
    head = netG.model.layers[-1]
    if not (isinstance(head, ConvTranspose2d) and head.stride > 1):
        return False, 1
    if label_size % head.stride:
        return False, 1
    if not all(isinstance(d, NLayerDiscriminator) for d in netDs):
        return False, 1
    return True, head.stride


def bank_phase_gate(netDs, input_nc, spatial, enabled=True):
    """(ok, s) for packing a PIXEL bank input once per apply: every
    member must consume the phase-major tensor natively — scale-1
    members through stem_conv_phase (their shared stem stride sets s),
    scale>1 through blur_downsample_phase.  Without at least one scale-1
    member the pack buys nothing (the blur reads the same bytes either
    way) and the gate stays off."""
    if not enabled:
        return False, 1
    from ..nn.discriminators import NLayerDiscriminator
    s = None
    for d in netDs:
        if not isinstance(d, NLayerDiscriminator):
            return False, 1
        first = d.model.layers[0]
        if input_nc is not None and first.in_nc != input_nc:
            return False, 1
        if d.scale_factor == 1:
            st, k, p = first.stride, first.kernel, first.padding
            if s is None:
                s = st
            # static half of stem_phase_supported: shared stride >= 2,
            # full-lane co, and the output grid == the phase block grid
            if (st != s or s < 2 or first.out_nc < 16 or not 0 <= p < s
                    or spatial % s
                    or (spatial + 2 * p - k) // s + 1 != spatial // s):
                return False, 1
    if s is None or spatial % s:
        return False, 1
    return True, s


# auto one-pack-per-bank for pixel D inputs (SGAN_TPU_PHASE_D2): when a
# bank_apply caller passes no explicit phase/pack, gate on the bank
# itself — every recipe's D sites inherit the packing with no wiring
_PACK_BANK = os.environ.get('SGAN_TPU_PHASE_D2', '0') == '1'


def bank_apply(netDs, paramsD, x, ctx_factory, phase_in=0, pack_phase=None):
    """Run every discriminator in a bank on x.

    phase_in = s > 0: x is phase-major (space_to_phase(·, s)); each D
    consumes it without a pixel interleave (NLayerDiscriminator.apply).
    pack_phase = s > 0: x is PIXEL; pack it once here (one relayout for
    the whole bank instead of one s2d per scale-1 stem) — callers gate
    on bank_phase_gate.  pack_phase = None (default): decide here from
    the bank under SGAN_TPU_PHASE_D2 (explicit 0 disables)."""
    if pack_phase is None:
        pack_phase = 0
        if _PACK_BANK and not phase_in and x.shape[1] == x.shape[2]:
            ok, s = bank_phase_gate(netDs, x.shape[-1], x.shape[1])
            if ok:
                pack_phase = s
    if pack_phase and not phase_in:
        from ..ops.edge_conv import space_to_phase
        x = space_to_phase(x, pack_phase)
        phase_in = pack_phase
    if phase_in:
        return [netDs[i].apply(paramsD[str(i)], x, ctx_factory(),
                               phase_in=phase_in)
                for i in range(len(netDs))]
    return [netDs[i].apply(paramsD[str(i)], x, ctx_factory())
            for i in range(len(netDs))]


def bank_apply_multi(netDs, paramsD, xs, ctx_factory, phase_in=0,
                     pack_phase=None):
    """Run every discriminator once on the batch-stacked inputs.

    The recipes evaluate each D on several same-shaped tensors (fake pair,
    real pair, ...) — at batch 1 each pass under-fills the MXU, so stacking
    them into one batch-n invocation is pure throughput.  Per-sample ops
    (instance norm, the blur front-end) make this exactly equivalent to
    separate passes.  Returns [per-input][per-D] prediction maps.
    """
    n = len(xs)
    if n == 1:
        return [bank_apply(netDs, paramsD, xs[0], ctx_factory, phase_in,
                           pack_phase)]
    b = xs[0].shape[0]
    stacked = jnp.concatenate(xs, 0)
    outs = bank_apply(netDs, paramsD, stacked, ctx_factory, phase_in,
                      pack_phase)
    return [[o[j * b:(j + 1) * b] for o in outs] for j in range(n)]


def g_apply_multi(net, params, ctx, xs, noise=None, activation='tanh',
                  phase_out=False):
    """Run a (per-sample-normalized) generator once on batch-stacked inputs;
    returns the per-input outputs.  noise is tiled along batch."""
    n = len(xs)
    if n == 1:
        return [g_apply(net, params, ctx, x=xs[0], noise=noise,
                        activation=activation, phase_out=phase_out)]
    b = xs[0].shape[0]
    stacked = jnp.concatenate(xs, 0)
    noise_n = None if noise is None else jnp.concatenate([noise] * n, 0)
    out = g_apply(net, params, ctx, x=stacked, noise=noise_n,
                  activation=activation, phase_out=phase_out)
    return [out[j * b:(j + 1) * b] for j in range(n)]


# Set by BaseModel.jit_train_step: True when the model's nets contain conv
# sites the Pallas 3x3 kernel can dispatch (the vjp-recorded G-grad form is
# only worth its residual traffic when custom-calls defeat XLA's CSE of the
# recompute form; recipes with no such convs keep the recompute form).
G_GRAD_VJP_HINT = False


def set_g_grad_vjp_hint(flag):
    global G_GRAD_VJP_HINT
    G_GRAD_VJP_HINT = bool(flag)


def has_pallas_conv_sites(layer):
    """Walk a Layer tree for Conv2d configs the pixel-packed 3x3 kernel
    accepts (channel test only; spatial size is decided per call)."""
    from ..nn import core
    if isinstance(layer, core.Conv2d):
        c = layer.in_nc
        if (layer.kernel == 3 and layer.stride == 1 and layer.padding == 1
                and layer.in_nc == layer.out_nc
                and (c % 128 == 0 or (c and 128 % c == 0))):
            return True
    return any(has_pallas_conv_sites(ch)
               for ch in layer.children().values())


def build_gan_train_step(*, noise_shapes, forward, d_specs, g_spec,
                         metrics_order=None, sample_noises=None):
    """Returns train_step(state, inputs, key, lrs) -> (state, metrics, taps).

    state:  {'params': {...subtrees...}, 'opt': {subtree_or_group: opt_state},
             'pools': {...}}
    inputs: dict of device arrays (e.g. {'A':..., 'B':...})
    lrs:    dict of traced lr scalars keyed by name ('lr', 'lr1', 'lr2')

    d_spec fields:
      key        params subtree name ('D', 'D1', 'D2')
      tx         optax transform
      n_update   static repeat count
      lr         lrs key
      make_pairs (taps, pools, key, inputs) -> (pairs, new_pools)  # pool queries here
      loss       (paramsD, pairs, inputs, all_params) -> (loss, aux_dict)
                 # all_params holds the current full params dict (constants)

    g_spec fields:
      keys       list of G subtree names (update order preserved)
      tx, n_update, lrs (dict subtree -> lrs key)
      loss       (taps, all_params, inputs, noises, fkey) -> (loss, aux)
                 # pure function of the taps; generator gradients are pulled
                 # back through the recorded forward (see below)
    resample occurs when the respective n_update > 1 (reference semantics).

    Generator gradients — two equivalent forms (same linearization point:
    same noises, dropout keys, and pre-update G params; both see
    post-update D params inside the loss, the reference's
    backward-through-the-stored-graph semantics):

      * 'recompute': the differentiated G loss re-executes the forward and
        XLA CSEs the duplicate away.  Fastest pure-XLA form (a recorded
        jax.vjp measured -2.5% on the DSGAN bench: residual traffic).
      * 'vjp': the forward is recorded ONCE with jax.vjp and the G grads
        pulled back through it.  Required for the Pallas conv kernels:
        XLA does NOT CSE opaque custom-calls, so the recompute form would
        execute every Pallas conv twice.

    Selected automatically (vjp iff Pallas kernels are enabled on a TPU
    backend); override with SGAN_TPU_G_GRAD=recompute|vjp.
    """
    noise_names = sorted(noise_shapes)

    def _g_grad_mode():
        mode = os.environ.get('SGAN_TPU_G_GRAD', 'auto')
        if mode in ('recompute', 'vjp'):
            return mode
        from ..nn import core
        return ('vjp' if core.PALLAS_ENABLED and G_GRAD_VJP_HINT
                and jax.default_backend() == 'tpu' else 'recompute')

    def train_step(state, inputs, key, lrs):
        counter = iter(range(1024))
        use_vjp = _g_grad_mode() == 'vjp'

        def k():
            return jax.random.fold_in(key, next(counter))

        params = dict(state['params'])
        opts = dict(state['opt'])
        pools = dict(state['pools'])
        g_keys = g_spec['keys']

        def draw():
            if sample_noises is not None:
                noises = sample_noises(k, pools)
            else:
                noises = {n: jax.random.normal(k(), noise_shapes[n])
                          for n in noise_names}
            return noises, k()

        def record(noises, fkey):
            """One forward execution; in vjp mode also its pullback wrt
            the G param subtrees."""
            gp = {kk: params[kk] for kk in g_keys}

            def fwd(gp_):
                merged = dict(params)
                merged.update(gp_)
                return forward(merged, inputs, noises, fkey)

            if use_vjp:
                taps, pull = jax.vjp(fwd, gp)
                return taps, pull
            return fwd(gp), None

        noises, fkey = draw()
        taps, g_pull = record(noises, fkey)
        aux_all = {}

        for spec in d_specs:
            dkey = spec['key']
            for _ in range(spec['n_update']):
                pairs, pools = spec['make_pairs'](taps, pools, k(), inputs)
                (_, aux), gD = jax.value_and_grad(
                    spec['loss'], has_aux=True)(params[dkey], pairs, inputs,
                                                params)
                params[dkey], opts[dkey] = apply_adam(
                    spec['tx'], gD, opts[dkey], params[dkey], lrs[spec['lr']])
                aux_all.update(aux)
                if spec['n_update'] > 1:
                    noises, fkey = draw()
                    taps, g_pull = record(noises, fkey)

        for _ in range(g_spec['n_update']):
            gp0 = {kk: params[kk] for kk in g_keys}
            if use_vjp:
                def loss_of_taps(t):
                    merged = dict(params)
                    merged.update(gp0)
                    return g_spec['loss'](t, merged, inputs, noises, fkey)

                (_, gaux), dtaps = jax.value_and_grad(
                    loss_of_taps, has_aux=True)(taps)
                (grads,) = g_pull(dtaps)
            else:
                def g_loss(g_params):
                    merged = dict(params)
                    merged.update(g_params)
                    t = forward(merged, inputs, noises, fkey)
                    return g_spec['loss'](t, merged, inputs, noises, fkey)

                (_, gaux), grads = jax.value_and_grad(
                    g_loss, has_aux=True)(gp0)
            from .base import FlatAdam, flat_update_enabled
            if isinstance(g_spec['tx'], FlatAdam) and flat_update_enabled():
                # packed p - lr*u over the chained G groups: one lr
                # scalar per leaf (dict flatten order = sorted keys)
                leaves_lr = []
                for kk in sorted(gp0):
                    leaves_lr += [lrs[g_spec['lrs'][kk]]] * len(
                        jax.tree_util.tree_leaves(gp0[kk]))
                new_gp, opts['G'] = g_spec['tx'].apply_updates(
                    grads, opts['G'], gp0, leaves_lr)
                params.update(new_gp)
            else:
                updates, opts['G'] = g_spec['tx'].update(grads, opts['G'],
                                                         gp0)
                for kk in g_keys:
                    lr = lrs[g_spec['lrs'][kk]]
                    params[kk] = jax.tree_util.tree_map(
                        lambda p, u: p - lr * u, params[kk], updates[kk])
            aux_all.update(gaux)
            if g_spec['n_update'] > 1:
                noises, fkey = draw()
                taps, g_pull = record(noises, fkey)

        new_state = {'params': params, 'opt': opts, 'pools': pools}
        order = metrics_order or sorted(aux_all)
        metrics = OrderedDict((name, aux_all[name]) for name in order)
        return new_state, metrics, taps

    return train_step
