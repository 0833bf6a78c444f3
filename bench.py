"""Benchmark: VNC 512px DSGAN training images/sec/chip (BASELINE.json metric).

Runs the full jitted twostage_cycle train step for the README DSGAN recipe
(reference README.md:18 architecture: fcgan G1 ngf32 + CRN G2 ngf64 +
unet_128 F2 nff32, 2-scale D1 + 4-scale D2, six-term G loss, three pools,
three Adams) at 512px batch 1 on the attached TPU chip with synthetic
input, and prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is an estimated A100-PyTorch throughput for the same config,
derived from the step's own XLA FLOP count at an assumed 3 TFLOP/s
effective A100 fp32 training throughput (~15% utilization — typical for
this small-channel 512px conv workload under eager PyTorch).  Fallback
constant when cost analysis is unavailable: 3 img/s.

A value fetch is used as the timing barrier: block_until_ready returns
early through the remote-execution relay.
"""

import json
import os
import time

import numpy as np

DSGAN_ARGS = [
    '--dataroot', '/tmp/bench_unused', '--name', 'bench_dsgan',
    '--model', 'twostage_cycle', '--which_direction', 'AtoB',
    '--dataset_mode', 'single', '--loadSize', '1024', '--fineSize', '512',
    '--transform_1to2', 'bilinear_2', '--batchSize', '1',
    '--input_nc', '2', '--output_nc', '1', '--which_channel', 'rg_b',
    '--which_model_netG1', 'fcgan', '--n_layers_G1', '5', '--ngf1', '32',
    '--which_model_netD1', 'n_layers', '--n_layers_D1', '3', '3',
    '--ndf1', '32', '--scale_factor1', '1', '2', '--lambda_D1', '0.5', '0.4',
    '--which_model_netG2', 'crn', '--ngf2', '64',
    '--upsample_mode2', 'bilinear', '--n_layers_CRN_block2', '2',
    '--which_model_netF2', 'unet_128', '--nff2', '32',
    '--which_model_netD2', 'n_layers', '--n_layers_D2', '3', '4', '3', '4',
    '--ndf2', '64', '--scale_factor2', '1', '1', '2', '2',
    '--lambda_D2', '0.3', '0.3', '0.2', '0.2',
    '--lambda_A', '10', '--lambda_B', '10', '--lambda_A_cycle', '5',
    '--lambda_fake_cycle', '1', '--noise_nc1', '8', '--noiseSize1', '4',
    '--noise_nc2', '8', '--noiseSize2', '8', '--norm', 'instance',
    '--no_dropout1', '--n_update_G', '1', '--no_lsgan1', '--no_lsgan2',
    '--GAN_losses_D2', 'real_fake', '--GAN_losses_G2', 'real_fake',
    '--manualSeed', '0', '--lr1', '0.0002', '--lr2', '0.0002',
    '--checkpoints_dir', '/tmp/bench_ckpt', '--display_id', '0',
    '--compute_dtype', 'bfloat16',
]

A100_EFFECTIVE_FLOPS = 3.0e12
FALLBACK_BASELINE_IMG_S = 3.0


def main():
    import jax
    from supervised_gan_tpu.runtime import enable_compilation_cache
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model

    enable_compilation_cache()

    opt = TrainOptions().parse(DSGAN_ARGS)
    model = create_model(opt)

    rng = np.random.RandomState(0)
    batch = {'A': rng.uniform(-1, 1, (opt.batchSize, opt.fineSize,
                                      opt.fineSize, 3)).astype(np.float32),
             'A_paths': ['bench.png'] * opt.batchSize}
    model.set_input(batch)

    # Per-step dispatch: through the relay the single-step program
    # already pipelines back-to-back (device cadence == duration,
    # profiled), while the scanned multi-step program runs 4-15% slower
    # per iteration (carry overhead) — chunked dispatch
    # (--steps_per_dispatch / train_chunk) measured 21.2-21.3 vs 21.38
    # img/s here and stays an opt-in for dispatch-bound environments.
    for _ in range(5):
        model.optimize_parameters()
    model.get_current_errors()   # value fetch = true barrier

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        model.optimize_parameters()
    model.get_current_errors()
    dt = time.perf_counter() - t0
    img_per_sec = n_steps * opt.batchSize / dt

    # The axon backend cannot serialize executables, so .lower().compile()
    # for cost analysis would pay the full ~10 min remote compile AGAIN on
    # every bench run.  The step FLOP count is a pure function of the
    # (fixed) bench config, so it is computed once and cached on disk.
    baseline = FALLBACK_BASELINE_IMG_S
    flops_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'BENCH_FLOPS.json')
    flops = 0.0
    try:
        with open(flops_cache) as f:
            flops = json.load(f)['flops']
    except Exception:
        try:
            inputs = {'A': model.input_A, 'B': model.input_B}
            lowered = model._train_step.lower(
                model.state, inputs, jax.random.PRNGKey(0),
                {'lr': 2e-4, 'lr1': 2e-4, 'lr2': 2e-4})
            cost = lowered.compile().cost_analysis()
            flops = cost.get('flops', 0.0) if isinstance(cost, dict) else 0.0
            if flops and flops > 0:
                with open(flops_cache, 'w') as f:
                    json.dump({'flops': flops,
                               'note': 'XLA cost_analysis of the DSGAN '
                                       'bench train step; delete to '
                                       'recompute'}, f)
        except Exception:
            pass
    if flops and flops > 0:
        baseline = A100_EFFECTIVE_FLOPS / flops * opt.batchSize

    print(json.dumps({
        'metric': 'vnc512_dsgan_twostage_cycle_train_images_per_sec_per_chip',
        'value': round(img_per_sec, 3),
        'unit': 'images/sec',
        'vs_baseline': round(img_per_sec / baseline, 3),
    }))


if __name__ == '__main__':
    main()
