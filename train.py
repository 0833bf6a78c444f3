"""GAN training driver — reference train.py.

Owns the epoch/iter loop, seeding, display/print/save cadence, and linear lr
decay after --niter epochs.  All compute happens inside each model's jitted
train step; this loop only feeds batches and handles IO.
"""

import random
import time

import numpy as np

from supervised_gan_tpu.runtime import enable_compilation_cache
from supervised_gan_tpu.options import TrainOptions
from supervised_gan_tpu.data import CreateDataLoader
from supervised_gan_tpu.models import create_model
from supervised_gan_tpu.utils.visualizer import Visualizer


def main():
    enable_compilation_cache()
    opt = TrainOptions().parse()

    if opt.manualSeed is None:
        opt.manualSeed = random.randint(1, 10000)
    print("Random Seed: ", opt.manualSeed)
    random.seed(opt.manualSeed)
    np.random.seed(opt.manualSeed)

    data_loader = CreateDataLoader(opt)
    dataset = data_loader.load_data()
    dataset_size = len(data_loader)
    print('#training images = %d' % dataset_size)

    model = create_model(opt)
    visualizer = Visualizer(opt)
    total_steps = 0

    for epoch in range(1, opt.niter + opt.niter_decay + 1):
        epoch_start_time = time.time()
        spd = max(1, int(getattr(opt, 'steps_per_dispatch', 1) or 1))
        pending = []
        for i, data in enumerate(dataset):
            iter_start_time = time.time()
            total_steps += opt.batchSize
            epoch_iter = total_steps - dataset_size * (epoch - 1)
            if opt.profile_dir and total_steps == 10 * opt.batchSize:
                import jax
                jax.profiler.start_trace(opt.profile_dir)
            if spd > 1:
                # chunked dispatch (--steps_per_dispatch): accumulate
                # batches and scan them in ONE device call; flush before
                # any step whose display/print/save cadence must observe
                # fresh per-step outputs
                pending.append(data)
                boundary = (total_steps % opt.display_freq == 0
                            or total_steps % opt.print_freq == 0
                            or total_steps % opt.save_latest_freq == 0
                            or (opt.profile_dir
                                and total_steps in (9 * opt.batchSize,
                                                    19 * opt.batchSize,
                                                    20 * opt.batchSize))
                            or i + 1 == dataset_size // opt.batchSize)
                if len(pending) >= spd or boundary:
                    model.train_chunk(pending)
                    pending = []
                else:
                    continue
            else:
                model.set_input(data)
                model.optimize_parameters()
            if opt.profile_dir and total_steps == 20 * opt.batchSize:
                import jax
                model.get_current_errors()  # sync before stopping the trace
                jax.profiler.stop_trace()
                print('profiler trace written to %s' % opt.profile_dir)

            if total_steps % opt.display_freq == 0:
                visualizer.display_current_results(
                    model.get_current_visuals(), epoch)

            if total_steps % opt.print_freq == 0:
                errors = model.get_current_errors()
                t = (time.time() - iter_start_time) / opt.batchSize
                visualizer.print_current_errors(epoch, epoch_iter, errors, t)
                if opt.display_id > 0:
                    visualizer.plot_current_errors(
                        epoch, float(epoch_iter) / dataset_size, opt, errors)
                if opt.abort_on_nan and not all(
                        np.isfinite(v) for v in errors.values()):
                    # opt-in (reference semantics: train through NaN).
                    # By the time a metric is non-finite the state is
                    # already poisoned — stop burning epochs; the last
                    # periodic checkpoint is the recovery point.
                    raise SystemExit(
                        'abort_on_nan: non-finite metrics at epoch %d '
                        'step %d: %s — last saved checkpoint is the '
                        'recovery point' % (epoch, total_steps,
                                            dict(errors)))

            if total_steps % opt.save_latest_freq == 0:
                print('saving the latest model (epoch %d, total_steps %d)'
                      % (epoch, total_steps))
                model.save('latest')

        if spd > 1 and pending:
            model.train_chunk(pending)
            pending = []

        if epoch % opt.save_epoch_freq == 0:
            print('saving the model at the end of epoch %d, iters %d'
                  % (epoch, total_steps))
            model.save('latest')
            model.save(epoch)

        print('End of epoch %d / %d \t Time Taken: %d sec'
              % (epoch, opt.niter + opt.niter_decay,
                 time.time() - epoch_start_time))

        if epoch > opt.niter:
            model.update_learning_rate()

    # checkpoint writes are async (worker thread); surface any IO error and
    # make in-process callers (tests, notebooks) see the files before return
    model.flush_checkpoints()


if __name__ == '__main__':
    main()
