"""Benchmark: VNC 512px training images/sec/chip (BASELINE.json metric).

Runs the full jitted train step (G forward, alternating D/G updates, pools,
Adam) for the README UnsupervisedGAN/JointGAN fcgan 512px recipe
(reference README.md:45-51) on the attached TPU chip with synthetic input,
and prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is an estimated A100-PyTorch throughput for the same config,
derived from the step's own FLOP count at an assumed 3 TFLOP/s effective
A100 fp32 training throughput (~15% utilization of 19.5 TFLOP/s peak —
typical for this small-channel 512px conv workload under eager PyTorch).
When XLA cost analysis is unavailable the fallback constant 8 img/s is used.
"""

import json
import time

import numpy as np

BENCH_ARGS = [
    '--dataroot', '/tmp/bench_unused', '--name', 'bench_fcgan',
    '--model', 'fcgan', '--which_direction', 'A', '--dataset_mode', 'single',
    '--loadSize', '512', '--fineSize', '512', '--batchSize', '1',
    '--which_model_netG', 'deconv', '--n_layers_G', '5', '--ngf', '32',
    '--which_model_netD', 'n_layers', '--n_layers_D', '3', '3', '3',
    '--ndf', '32', '--scale_factor', '1', '2', '4',
    '--lambda_D', '0.5', '0.4', '0.1', '--noise_nc', '8', '--noiseSize', '8',
    '--norm', 'instance', '--no_dropout', '--n_update_G', '2', '--no_lsgan',
    '--which_channel', 'rg_b', '--manualSeed', '0',
    '--checkpoints_dir', '/tmp/bench_ckpt', '--display_id', '0',
    '--compute_dtype', 'bfloat16',
]

A100_EFFECTIVE_FLOPS = 3.0e12
FALLBACK_BASELINE_IMG_S = 8.0


def main():
    import jax
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model

    opt = TrainOptions().parse(BENCH_ARGS)
    model = create_model(opt)

    rng = np.random.RandomState(0)
    batch = {'A': rng.uniform(-1, 1, (opt.batchSize, opt.fineSize,
                                      opt.fineSize, 3)).astype(np.float32),
             'A_paths': ['bench.png'] * opt.batchSize}
    model.set_input(batch)

    # warmup (compile); a value fetch is the only reliable barrier through
    # the remote-execution relay (block_until_ready returns early there)
    for _ in range(5):
        model.optimize_parameters()
    model.get_current_errors()

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        model.optimize_parameters()
    model.get_current_errors()
    dt = time.perf_counter() - t0
    img_per_sec = n_steps * opt.batchSize / dt

    baseline = FALLBACK_BASELINE_IMG_S
    try:
        lowered = model._train_step.lower(
            model.state, model.input, jax.random.PRNGKey(0),
            np.float32(2e-4))
        cost = lowered.compile().cost_analysis()
        flops = cost.get('flops', 0.0) if isinstance(cost, dict) else 0.0
        if flops and flops > 0:
            baseline = A100_EFFECTIVE_FLOPS / flops * opt.batchSize
    except Exception:
        pass

    print(json.dumps({
        'metric': 'vnc512_fcgan_train_images_per_sec_per_chip',
        'value': round(img_per_sec, 3),
        'unit': 'images/sec',
        'vs_baseline': round(img_per_sec / baseline, 3),
    }))


if __name__ == '__main__':
    main()
