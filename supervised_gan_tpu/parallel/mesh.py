"""Device mesh / sharding helpers.

The reference's only parallelism is single-process intra-op data parallelism
(nn.parallel.data_parallel over --gpu_ids, reference models/networks.py:
263-266 et al.).  The TPU-native equivalent: a 1-D ``jax.sharding.Mesh``
over ICI with the batch sharded on the 'data' axis and parameters/optimizer
state replicated.  The whole train step is one jit program, so XLA GSPMD
inserts the gradient psum and any resharding automatically — no explicit
collectives (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives).

Per-sample ops (instance norm, per-image pools) shard cleanly along batch;
batch norm's cross-batch reduction becomes an automatic cross-replica psum
inside the jit program, matching the reference's single-process full-batch
statistics.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator, num_processes, process_id):
    """Multi-host (DCN) wiring: jax.distributed.initialize.

    Must run before the first JAX backend use.  After it, jax.devices()
    returns the GLOBAL device list, so make_mesh() spans processes and the
    same GSPMD train step runs unchanged — collectives ride ICI within a
    host/slice and DCN across (scaling-book recipe).  The reference has no
    multi-process support at all (SURVEY.md §2.12); this is the TPU-first
    extension.
    """
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(num_processes),
                               process_id=int(process_id))


def make_mesh(n_devices=None, axis='data', n_sp=1):
    """1-D data mesh, or — with n_sp > 1 — a 2-D ('data', 'sp') mesh whose
    'sp' axis spatially partitions the image height (batch-1 latency
    scaling: a 512px conv shards its rows across ICI neighbours and XLA
    GSPMD inserts the k-1 halo exchanges; DP cannot cut single-image
    latency at all)."""
    devs = jax.devices()
    if n_sp > 1:
        nd = n_devices or (len(devs) // n_sp)
        devs = np.array(devs[:nd * n_sp]).reshape(nd, n_sp)
        return Mesh(devs, (axis, 'sp'))
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh, axis='data'):
    """NHWC batch spec on this mesh: N on 'data', plus H on 'sp' when the
    mesh has a spatial axis."""
    if 'sp' in mesh.axis_names:
        return NamedSharding(mesh, P(axis, 'sp'))
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_train_step(step_fn, mesh, state_template, donate_state=True):
    """jit a (state, batch, key, lr) -> (state, ...) step over the mesh:
    batch sharded on 'data', everything else replicated.

    Multi-process (DCN): every argument of a global program must be a
    global array, so the per-step PRNG key (a process-local array from
    fold_in) is re-placed as a replicated global array before the call;
    batches arrive global already (BaseModel.to_device_batch) and lr
    scalars are host values, which jit replicates itself.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: repl, state_template)
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, data, repl, repl),
        donate_argnums=(0,) if donate_state else ())
    if jax.process_count() == 1:
        return jitted

    def multiprocess_step(state, inputs, key, lrs):
        key = jax.device_put(np.asarray(key), repl)
        return jitted(state, inputs, key, lrs)
    return multiprocess_step
