"""Network zoo structural tests.

Golden parameter counts were extracted once from the reference implementation
(reference models/networks.py, counted via print_network semantics) for the
exact configurations the README recipes use.  Multi-scale discriminators
differ by design: the reference stores the frozen gauss_filter as (non-
learnable) parameters while we implement it as a fixed function, so golden
comparisons for scale>1 use the reference's `.model`-only count (which is
also exactly the set its optimizers train, models/fcgan_model.py:100-109).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy e2e/compile tier; deselect with -m 'not slow'


from supervised_gan_tpu import nn


KEY = jax.random.PRNGKey(0)


def build_g(*args, **kw):
    net = nn.define_G(*args, **kw)
    return net, net.init(KEY)


def build_d(*args, **kw):
    net = nn.define_D(*args, **kw)
    return net, net.init(KEY)


def test_fcgan_g1_params_and_shape():
    # DSGAN G1: fcgan ngf32 n_layers5 noise_nc8 noiseSize8 (README.md:18)
    net, params = build_g(2, 0, 32, 'fcgan', 'instance', False,
                          n_layers_G=5, use_fcn=True, noise_nc=8)
    assert nn.count_params(params) == 1772448
    y = net.apply(params, jnp.zeros((1, 8, 8, 8)), nn.Ctx(KEY))
    assert y.shape == (1, 512, 512, 2)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)


def test_fcgan_projection_mode():
    # noiseSize == 1 -> first layer is a k4 s1 p0 projection
    net, params = build_g(3, 0, 64, 'fcgan', 'instance', False,
                          n_layers_G=4, use_fcn=False, noise_nc=8)
    y = net.apply(params, jnp.zeros((2, 1, 1, 8)), nn.Ctx(KEY))
    # 1 -> 4 (projection), then 4 stride-2 convT: 4*2^4 = 64
    assert y.shape == (2, 64, 64, 3)


def test_deconv_alias():
    a = nn.define_G(2, 0, 32, 'deconv', 'instance', False, n_layers_G=5,
                    use_fcn=True, noise_nc=8)
    b = nn.define_G(2, 0, 32, 'fcgan', 'instance', False, n_layers_G=5,
                    use_fcn=True, noise_nc=8)
    assert nn.count_params(a.init(KEY)) == nn.count_params(b.init(KEY))


def test_crn_g2_params_and_shape():
    # DSGAN G2: crn ngf64 bilinear block2 in2 out1 noise8 (README.md:18)
    net, params = build_g(2, 1, 64, 'crn', 'instance', True, n_layers_G=5,
                          noise_nc=8, upsample_mode='bilinear',
                          n_layers_CRN_block=2, share_label_weights=True)
    assert nn.count_params(params) == 782785
    label = jnp.zeros((1, 512, 512, 2))
    noise = jnp.zeros((1, 8, 8, 8))
    y = net.apply(params, label, noise, nn.Ctx(KEY))
    assert y.shape == (1, 512, 512, 1)


def test_crn_unshared_label_blocks():
    net, params = build_g(2, 1, 64, 'crn', 'instance', True, n_layers_G=5,
                          noise_nc=8, upsample_mode='bilinear',
                          n_layers_CRN_block=2, share_label_weights=False)
    assert 'blockl4' in params and 'blockl0' in params and 'blockl' not in params


def test_unet128_f2_params_and_shape():
    # DSGAN F2: unet_128 nff32 in1 out2 (README.md:18)
    net, params = build_g(1, 2, 32, 'unet_128', 'instance', True, noise_nc=8)
    assert nn.count_params(params) == 10457794
    y = net.apply(params, jnp.zeros((1, 128, 128, 1)), nn.Ctx(KEY))
    assert y.shape == (1, 128, 128, 2)


def test_unet256_params():
    # SGAN step-2 G: unet_256 ngf64 in2 out1 + gaussian noise (README.md:38)
    net, params = build_g(2, 1, 64, 'unet_256', 'instance', True, noise_nc=8,
                          add_gaussian_noise=True)
    assert nn.count_params(params) == 54404481
    y = net.apply(params, jnp.zeros((1, 256, 256, 2)), nn.Ctx(KEY))
    assert y.shape == (1, 256, 256, 1)


def test_unet_phase_out():
    # phase_out=True returns space_to_phase(pixel output, 2): same
    # elements, (q, r, co) lane order — value AND parameter gradients of
    # an elementwise loss (vs the space_to_phase'd target) must match the
    # pixel-space formulation (models/twostage_cycle.py uses this for the
    # F2 cycle heads)
    from supervised_gan_tpu.ops.edge_conv import space_to_phase
    net, params = build_g(1, 2, 32, 'unet_128', 'instance', False,
                          noise_nc=8)
    x = jax.random.normal(KEY, (1, 128, 128, 1))
    t = jax.random.normal(jax.random.fold_in(KEY, 1), (1, 128, 128, 2))

    y_pix = net.apply(params, x, nn.Ctx(KEY))
    y_ph = net.apply(params, x, nn.Ctx(KEY), phase_out=True)
    assert y_ph.shape == (1, 64, 64, 8)
    np.testing.assert_allclose(np.asarray(space_to_phase(y_pix, 2)),
                               np.asarray(y_ph), rtol=2e-5, atol=2e-5)

    def loss_pix(p):
        y = net.apply(p, x, nn.Ctx(KEY))
        return jnp.mean(jnp.square(y - t))

    def loss_ph(p):
        y = net.apply(p, x, nn.Ctx(KEY), phase_out=True)
        return jnp.mean(jnp.square(y - space_to_phase(t, 2)))

    g1 = jax.grad(loss_pix)(params)
    g2 = jax.grad(loss_ph)(params)
    leaves1 = jax.tree_util.tree_leaves(g1)
    # normalize by a global scale: conv biases feeding InstanceNorm have a
    # mathematically ZERO gradient (the norm subtracts the mean), so a
    # per-leaf scale would amplify pure fp noise into "mismatches"
    sc = max(float(jnp.max(jnp.abs(a))) for a in leaves1) + 1e-9
    for a, b in zip(leaves1, jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b) / sc, np.asarray(a) / sc,
                                   rtol=0, atol=1e-5)


def test_unet_phase_out_residual_fallback():
    # use_residual forces the pixel-space fallback; phase_out must still
    # return the phase-major permutation of the residual output
    from supervised_gan_tpu.ops.edge_conv import space_to_phase
    net, params = build_g(2, 2, 8, 'unet_128', 'instance', False,
                          noise_nc=8, use_residual=True)
    x = jax.random.normal(KEY, (1, 128, 128, 2))
    y_pix = net.apply(params, x, nn.Ctx(KEY))
    y_ph = net.apply(params, x, nn.Ctx(KEY), phase_out=True)
    np.testing.assert_allclose(np.asarray(space_to_phase(y_pix, 2)),
                               np.asarray(y_ph), rtol=0, atol=0)


def test_inert_bias_peephole():
    """A conv bias followed by InstanceNorm/BatchNorm (optionally through a
    constant-preserving Upsample) is cancelled exactly by the norm's mean
    subtraction: skipping it must not change the output, and its exact
    gradient becomes zero (the reference still reduces a full cotangent
    into fp noise for these)."""
    from supervised_gan_tpu.nn import core
    from supervised_gan_tpu.nn.core import (Sequential, Conv2d,
                                            ConvTranspose2d, InstanceNorm2d,
                                            Upsample, LeakyReLU)
    x = jax.random.normal(KEY, (1, 16, 16, 8))

    for seq in (Sequential(Conv2d(8, 16, 3, 1, 1), InstanceNorm2d(16),
                           LeakyReLU(0.2)),
                Sequential(Conv2d(8, 16, 3, 1, 1), Upsample(2, 'bilinear'),
                           InstanceNorm2d(16)),
                Sequential(ConvTranspose2d(8, 16, 4, 2, 1),
                           InstanceNorm2d(16))):
        params = seq.init(KEY)
        params['0']['bias'] = params['0']['bias'] + 0.37   # make it matter
        y_on = seq.apply(params, x, nn.Ctx(KEY))
        try:
            core._SKIP_INERT_BIAS = False
            y_off = seq.apply(params, x, nn.Ctx(KEY))
        finally:
            core._SKIP_INERT_BIAS = True
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   rtol=2e-4, atol=2e-5)
        g = jax.grad(lambda p: jnp.sum(
            jnp.square(seq.apply(p, x, nn.Ctx(KEY)))))(params)
        assert float(jnp.max(jnp.abs(g['0']['bias']))) == 0.0
        assert float(jnp.max(jnp.abs(g['0']['weight']))) > 0.0

    # NOT followed by a norm: the bias stays live
    seq = Sequential(Conv2d(8, 16, 3, 1, 1), LeakyReLU(0.2))
    params = seq.init(KEY)
    g = jax.grad(lambda p: jnp.sum(
        jnp.square(seq.apply(p, x, nn.Ctx(KEY)))))(params)
    assert float(jnp.max(jnp.abs(g['0']['bias']))) > 0.0


def test_unet_noise_arg_ignored():
    net, params = build_g(1, 2, 32, 'unet_128', 'instance', False, noise_nc=8)
    x = jnp.ones((1, 128, 128, 1))
    y1 = net.apply(params, x, nn.Ctx(KEY), noise=jnp.zeros((1, 4, 4, 8)))
    y2 = net.apply(params, x, nn.Ctx(KEY), noise=None)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_resnet9_params():
    net, params = build_g(3, 3, 64, 'resnet_9blocks', 'instance', False)
    assert nn.count_params(params) == 11378179
    y = net.apply(params, jnp.zeros((1, 64, 64, 3)), nn.Ctx(KEY))
    assert y.shape == (1, 64, 64, 3)


def test_autoencoder_params():
    net, params = build_g(3, 3, 64, 'autoencoder', 'instance', False,
                          n_layers_G=3)
    assert nn.count_params(params) == 1383040
    y = net.apply(params, jnp.zeros((1, 64, 64, 3)), nn.Ctx(KEY))
    assert y.shape == (1, 64, 64, 3)


def test_fcgan_star_params_and_shape():
    net, params = build_g(2, 0, 64, 'fcgan_star', 'instance', False,
                          n_layers_G=5, use_fcn=True, noise_nc=8)
    assert nn.count_params(params) == 20914944
    y = net.apply(params, jnp.zeros((1, 4, 4, 8)), nn.Ctx(KEY))
    assert y.shape == (1, 256, 256, 2)


def test_dcgan_g_d_params():
    g, gp = build_g(3, 0, 64, 'dcgan', 'instance', False, noise_nc=100)
    assert nn.count_params(gp) == 3608000
    d, dp = build_d(3, 64, 'dcgan', norm='instance')
    assert nn.count_params(dp) == 2796928
    y = g.apply(gp, jnp.zeros((2, 1, 1, 100)), nn.Ctx(KEY))
    assert y.shape == (2, 128, 128, 3)
    s = d.apply(dp, y, nn.Ctx(KEY))
    assert s.shape == (2,)


def test_nlayer_d_params_and_patch_shape():
    # DSGAN D1: n_layers 3, ndf32, input 2ch, instance norm
    d, dp = build_d(2, 32, 'n_layers', n_layers_D=3, norm='instance',
                    use_sigmoid=True, scale_factor=1)
    assert nn.count_params(dp) == 693729
    y = d.apply(dp, jnp.zeros((1, 512, 512, 2)), nn.Ctx(KEY))
    # py2 padw=1: 512 ->256 ->128 ->64 ->63 ->62
    assert y.shape == (1, 62, 62, 1)
    assert float(np.min(np.asarray(y))) >= 0.0  # sigmoid head


def test_nlayer_d_multiscale():
    d, dp = build_d(3, 64, 'n_layers', n_layers_D=4, norm='instance',
                    use_sigmoid=True, scale_factor=2)
    # reference model-only count (gauss_filter is a fixed function here)
    assert nn.count_params(dp) == 6959553
    y = d.apply(dp, jnp.zeros((1, 512, 512, 3)), nn.Ctx(KEY))
    # blur+subsample: 512 -> 256, 4 stride-2 convs -> 16, two s1 k4 p1 -> 14
    assert y.shape == (1, 14, 14, 1)


def test_nlayer_d_multiclass_logits():
    d, dp = build_d(3, 32, 'n_layers', n_layers_D=3, norm='instance',
                    use_sigmoid=False, scale_factor=1, num_classes=3)
    y = d.apply(dp, jnp.zeros((1, 128, 128, 3)), nn.Ctx(KEY))
    assert y.shape[-1] == 3


def test_nlayer_sep_params():
    d, dp = build_d(3, 64, 'n_layers_sep', n_layers_D=4, norm='instance',
                    scale_factor=1)
    assert nn.count_params(dp) == 7615105
    y = d.apply(dp, jnp.zeros((1, 128, 128, 3)), nn.Ctx(KEY))
    assert y.shape[0] == 1 and y.shape[-1] == 1


def test_batch_vs_instance_param_difference():
    di, pi = build_d(2, 32, 'n_layers', n_layers_D=3, norm='instance')
    db, pb = build_d(2, 32, 'n_layers', n_layers_D=3, norm='batch')
    assert nn.count_params(pb) > nn.count_params(pi)


def test_weight_init_statistics():
    net, params = build_g(2, 0, 32, 'fcgan', 'instance', False,
                          n_layers_G=5, use_fcn=True, noise_nc=8)
    w = np.asarray(params['model']['0']['weight'])
    assert abs(w.std() - 0.02) < 0.004
    assert abs(w.mean()) < 0.004
    bn_w = np.asarray(params['model']['1']['weight'])
    assert abs(bn_w.mean() - 1.0) < 0.02


def test_dropout_and_gauss_injection_stochastic():
    net, params = build_g(2, 1, 64, 'unet_256', 'instance', True, noise_nc=8,
                          add_gaussian_noise=True)
    x = jnp.ones((1, 256, 256, 2))
    y1 = net.apply(params, x, nn.Ctx(jax.random.PRNGKey(1)))
    y2 = net.apply(params, x, nn.Ctx(jax.random.PRNGKey(2)))
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-4
    # same key -> deterministic
    y3 = net.apply(params, x, nn.Ctx(jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))


@pytest.mark.parametrize("name", ['resnet_9blocks', 'resnet_6blocks',
                                  'unet_128', 'unet_256', 'autoencoder',
                                  'crn', 'fcgan', 'fcgan_star', 'dcgan',
                                  'deconv'])
def test_registry_complete(name):
    kw = dict(noise_nc=8)
    if name == 'fcgan_star':
        kw.update(use_fcn=True, n_layers_G=5)
        net = nn.define_G(2, 0, 8, name, 'instance', False, **kw)
    elif name == 'crn':
        net = nn.define_G(2, 1, 8, name, 'instance', False, n_layers_G=5, **kw)
    else:
        net = nn.define_G(2, 1, 8, name, 'instance', False, **kw)
    assert net is not None


def test_unknown_names_raise():
    with pytest.raises(NotImplementedError):
        nn.define_G(2, 1, 8, 'nope', 'instance')
    with pytest.raises(NotImplementedError):
        nn.define_D(2, 8, 'nope')
