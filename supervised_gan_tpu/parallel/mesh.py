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


def make_mesh(n_devices=None, axis='data'):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh, axis='data'):
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_train_step(step_fn, mesh, state_template, donate_state=True):
    """jit a (state, batch, key, lr) -> (state, ...) step over the mesh:
    batch sharded on 'data', everything else replicated."""
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: repl, state_template)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data, repl, repl),
        donate_argnums=(0,) if donate_state else ())
