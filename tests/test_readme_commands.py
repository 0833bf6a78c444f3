"""Flag-surface parity: every published README recipe command must parse
through our options unchanged (reference README.md:18,23,33,38,45,51),
including the README's stale flags ('deconv', '--weight_L1') that we alias.
"""

import shlex

import pytest

from supervised_gan_tpu.options import TrainOptions, TestOptions


DSGAN_TRAIN = """--dataroot ./datasets/gan/vnc-rgb --name dsgan_model --model twostage_cycle --which_direction AtoB --dataset_mode single --loadSize 1024 --fineSize 512 --transform_1to2 bilinear_2 --batchSize 1 --input_nc 2 --output_nc 1 --which_channel rg_b --which_model_netG1 fcgan --n_layers_G1 5 --ngf1 32 --which_model_netD1 n_layers --n_layers_D1 3 3 --ndf1 32 --scale_factor1 1 2 --lambda_D1 0.5 0.4 --which_model_netG2 crn --ngf2 64 --upsample_mode2 bilinear --n_layers_CRN_block2 2 --which_model_netF2 unet_128 --nff2 32 --which_model_netD2 n_layers --n_layers_D2 3 4 3 4 --ndf2 64 --scale_factor2 1 1 2 2 --lambda_D2 0.3 0.3 0.2 0.2 --lambda_A 10 --lambda_B 10 --lambda_A_cycle 5 --lambda_fake_cycle 1 --noise_nc1 8 --noiseSize1 4 --noise_nc2 8 --noiseSize2 8 --norm instance --no_dropout1 --n_update_G 1 --niter 150 --niter_decay 50 --display_freq 40 --save_epoch_freq 200 --no_lsgan1 --no_lsgan2 --sequential_train --manualSeed 0 --GAN_losses_D2 real_fake --GAN_losses_G2 real_fake --sequential_train --which_epoch_sequential seq --which_model_to_load G1 D1 --pretrained_model_dir pretrained/twostage --lr1 0.0002 --lr2 0.0002"""

DSGAN_TEST = """--dataroot ./datasets/null --name dsgan_model --model twostage_cycle --which_direction AtoB --dataset_mode single --loadSize 512 --fineSize 512 --transform_1to2 bilinear_2 --batchSize 1 --input_nc 2 --output_nc 1 --which_channel rg_b --which_model_netG1 fcgan --n_layers_G1 5 --ngf1 32 --which_model_netD1 n_layers --n_layers_D1 3 3 --ndf1 32 --scale_factor1 1 2 --which_model_netG2 crn --ngf2 64 --upsample_mode2 bilinear --n_layers_CRN_block2 2 --which_model_netF2 unet_128 --nff2 32 --which_model_netD2 n_layers --n_layers_D2 3 4 3 4 --ndf2 64 --scale_factor2 1 1 2 2 --noise_nc1 8 --noiseSize1 2 --noise_nc2 8 --noiseSize2 4 --norm instance --no_dropout1 --manualSeed 0 --serial_batches --no_flip --no_rotate --how_many 100"""

SGAN_STEP1 = """--dataroot ./datasets/gan/vnc-rgb --name sgan_gan --model fcgan --which_direction A --dataset_mode single --loadSize 512 --fineSize 512 --batchSize 1 --input_nc 2 --which_model_netG deconv --n_layers_G 5 --ngf 32 --which_model_netD n_layers --n_layers_D 3 3 3 --ndf 32 --scale_factor 1 2 4 --lambda_D 0.5 0.4 0.1 --noise_nc 8 --noiseSize 8 --norm instance --no_dropout --n_update_G 2 --niter 100 --niter_decay 100 --display_freq 40 --save_epoch_freq 200 --no_lsgan --which_channel rg --no_dropout"""

SGAN_STEP2 = """--dataroot ./datasets/gan/vnc-rgb --name sgan_cgan --model cgan --which_direction AtoB --dataset_mode single --loadSize 1024 --fineSize 512 --batchSize 1 --input_nc 2 --output_nc 1 --which_model_netG unet_256 --ngf 64 --which_model_netD n_layers --n_layers_D 3 4 --ndf 64 --scale_factor 1 1 --lambda_D 0.5 0.5 --lambda_A 10 --noise_nc 8 --noiseSize 4 --norm instance --n_update_G 2 --niter 150 --niter_decay 50 --display_freq 50 --save_epoch_freq 200 --weight_L1 2 4 --no_lsgan --manualSeed 0 --add_gaussian_noise --which_channel rg_b"""

JOINTGAN = SGAN_STEP1.replace('sgan_gan', 'jointgan').replace(
    '--which_channel rg', '--which_channel rg_b')
UNSUPGAN = SGAN_STEP1.replace('sgan_gan', 'unsupgan').replace(
    '--which_channel rg', '--which_channel b')


def parse_train(cmd, tmp_path):
    args = shlex.split(cmd) + ['--checkpoints_dir', str(tmp_path)]
    return TrainOptions().parse(args)


@pytest.mark.parametrize("cmd,model", [
    (DSGAN_TRAIN, 'twostage_cycle'),
    (SGAN_STEP1, 'fcgan'),
    (SGAN_STEP2, 'cgan'),
    (JOINTGAN, 'fcgan'),
    (UNSUPGAN, 'fcgan'),
])
def test_readme_train_commands_parse(cmd, model, tmp_path):
    opt = parse_train(cmd, tmp_path)
    assert opt.model == model
    assert opt.isTrain


def test_readme_sgan2_weight_alias(tmp_path):
    opt = parse_train(SGAN_STEP2, tmp_path)
    assert opt.weights == [2.0, 4.0]


def test_readme_dsgan_test_command_parses(tmp_path):
    args = shlex.split(DSGAN_TEST) + ['--checkpoints_dir', str(tmp_path)]
    opt = TestOptions().parse(args)
    assert opt.how_many == 100 and not opt.isTrain


def test_readme_dsgan_shapes_consistent(tmp_path):
    """The DSGAN train geometry: G1 fcgan n5 noise 4px -> 256px labels,
    transform x2 -> 512 = fineSize; CRN pool64(512) = 8 = noiseSize2."""
    opt = parse_train(DSGAN_TRAIN, tmp_path)
    g1_out = opt.noiseSize1 * 2 ** (opt.n_layers_G1 + 1)
    sc = int(opt.transform_1to2.split('_')[1])
    assert g1_out * sc == opt.fineSize
    assert opt.fineSize // 64 == opt.noiseSize2
