"""Network factories — string registry identical to reference
models/networks.py:53-132, plus the ``deconv`` alias.

The README recipes use ``--which_model_netG deconv`` (reference README.md:33)
but the reference's define_G has no such branch; we map ``deconv`` to the
fcgan ConvTranspose generator so the published commands run.
"""

from .core import BatchNorm2d, InstanceNorm2d, count_params
from . import generators as G
from . import discriminators as D


def get_norm_layer(norm_type='instance'):
    if norm_type == 'batch':
        return BatchNorm2d
    if norm_type == 'instance':
        return InstanceNorm2d
    raise NotImplementedError('normalization layer [%s] is not found' % norm_type)


def define_G(input_nc, output_nc, ngf, which_model_netG, norm='batch',
             use_dropout=False, n_layers_G=5, use_residual=False,
             use_fcn=False, noise_nc=0, add_gaussian_noise=False,
             gaussian_sigma=0.1, n_layers_G_skip=-1, upsample_mode='convt',
             share_label_weights=True, n_layers_CRN_block=1):
    norm_layer = get_norm_layer(norm)
    if which_model_netG == 'resnet_9blocks':
        return G.ResnetGenerator(input_nc, output_nc, ngf, norm_layer,
                                 use_dropout, 9, use_residual)
    if which_model_netG == 'resnet_6blocks':
        return G.ResnetGenerator(input_nc, output_nc, ngf, norm_layer,
                                 use_dropout, 6, use_residual)
    if which_model_netG == 'unet_128':
        return G.UnetGenerator(input_nc, output_nc, 7, ngf, norm_layer,
                               use_dropout, use_residual, add_gaussian_noise,
                               gaussian_sigma, n_layers_G_skip)
    if which_model_netG == 'unet_256':
        return G.UnetGenerator(input_nc, output_nc, 8, ngf, norm_layer,
                               use_dropout, use_residual, add_gaussian_noise,
                               gaussian_sigma, n_layers_G_skip)
    if which_model_netG == 'autoencoder':
        return G.AutoEncoder(input_nc, output_nc, n_layers_G, ngf, norm_layer,
                             use_dropout)
    if which_model_netG == 'crn':
        return G.CascadedRefinementNetwork(
            input_nc, output_nc, noise_nc, ngf=ngf, n_layers=n_layers_G,
            norm_layer=norm_layer, concat_label=False,
            upsample_mode=upsample_mode, add_gaussian_noise=add_gaussian_noise,
            gaussian_sigma=gaussian_sigma,
            share_label_weights=share_label_weights,
            n_layers_block=n_layers_CRN_block)
    if which_model_netG in ('fcgan', 'deconv'):
        return G.FCGANGenerator(noise_nc, input_nc, ngf, n_layers=n_layers_G,
                                use_dropout=use_dropout, use_fcn=use_fcn)
    if which_model_netG == 'fcgan_star':
        return G.FCGANGeneratorStar(noise_nc, input_nc, ngf,
                                    n_layers=n_layers_G,
                                    use_dropout=use_dropout, use_fcn=use_fcn)
    if which_model_netG == 'dcgan':
        return G.DCGANGenerator(nz=noise_nc, nc=input_nc, ngf=ngf)
    raise NotImplementedError(
        'Generator model name [%s] is not recognized' % which_model_netG)


def define_D(input_nc, ndf, which_model_netD, n_layers_D=3, norm='batch',
             use_sigmoid=False, scale_factor=1, num_classes=2):
    norm_layer = get_norm_layer(norm)
    if which_model_netD == 'basic':
        return D.NLayerDiscriminator(input_nc, ndf, 3, norm_layer,
                                     use_sigmoid, scale_factor, num_classes)
    if which_model_netD == 'n_layers':
        return D.NLayerDiscriminator(input_nc, ndf, n_layers_D, norm_layer,
                                     use_sigmoid, scale_factor, num_classes)
    if which_model_netD == 'n_layers_sep':
        return D.NLayerDiscriminatorSep(input_nc, ndf, n_layers_D, norm_layer,
                                        use_sigmoid, scale_factor, num_classes)
    if which_model_netD == 'dcgan':
        return D.DCGANDiscriminator(nc=input_nc, ndf=ndf)
    raise NotImplementedError(
        'Discriminator model name [%s] is not recognized' % which_model_netD)


def print_network(net, params, name=''):
    """Parameter accounting, the reference's eyeball check
    (models/networks.py:135-140)."""
    n = count_params(params)
    print('%s[%s] Total number of parameters: %d'
          % (name and name + ' ', type(net).__name__, n))
    return n
