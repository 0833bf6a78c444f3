"""Dump the optimized HLO of the DSGAN bench train step to a text file.

The per-source attribution workflow (BENCH_NOTES.md round 3):

    python tools/ab_step.py --tag base --top 40      # device table
    python tools/dump_hlo.py                         # /tmp/step_hlo.txt
    grep -m1 '%fusion.1076 ' /tmp/step_hlo.txt       # op -> source line

``lower().compile().as_text()`` is FREE in-process once the step has
compiled from the persistent compile cache (~1 s for the 24 MB dump);
from a cold cache it pays the full ~10-19 min remote compile, so warm
the cache first (any ab_step/bench run does).

The jitted step is the StatePacker-wrapped program, so the lowering
must be done on the INNER pjit with the packed state (after one
optimize_parameters the model's state is already a PackedState).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/step_hlo.txt')
    args = ap.parse_args()

    import numpy as np
    from supervised_gan_tpu.runtime import enable_compilation_cache
    from supervised_gan_tpu.options import TrainOptions
    from supervised_gan_tpu.models import create_model
    from supervised_gan_tpu.models.packing import PackedState
    from bench import DSGAN_ARGS

    enable_compilation_cache()
    opt = TrainOptions().parse(DSGAN_ARGS)
    model = create_model(opt)
    # bench-config-only tool: with a mesh active, model._train_step comes
    # from shard_train_step and the lowering targets below don't apply
    assert model.mesh is None, 'dump_hlo.py supports the no-mesh bench config only'
    rng = np.random.RandomState(0)
    batch = {'A': rng.uniform(-1, 1, (opt.batchSize, opt.fineSize,
                                      opt.fineSize, 3)).astype(np.float32),
             'A_paths': ['bench.png'] * opt.batchSize}
    model.set_input(batch)
    model.optimize_parameters()
    model.get_current_errors()

    if isinstance(model.state, PackedState):
        packed = model.state.packed
        pjit_step = model._train_step._pjit
    else:                       # SGAN_TPU_PACK_STATE=0 fallback: plain jit
        packed = model.state
        pjit_step = model._train_step
    t0 = time.time()
    low = pjit_step.lower(packed, model._step_inputs(),
                          model.next_step_key(), model._step_lrs())
    txt = low.compile().as_text()
    with open(args.out, 'w') as f:
        f.write(txt)
    print('dump took %.1f s, %d bytes -> %s'
          % (time.time() - t0, len(txt), args.out))


if __name__ == '__main__':
    main()
