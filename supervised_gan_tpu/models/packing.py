"""State packing at the jit boundary: fewer, larger argument leaves.

Dispatch cost through the remote-execution relay scales with the ARG
COUNT of the jitted call (~6 us/leaf measured; see BENCH_NOTES.md round
3): the DSGAN train state is 457 leaves (~590 MB), of which 413 leaves
are < 4 MB totaling only 79 MB.  Packing every small leaf into one flat
buffer per dtype — big leaves (pool ring buffers, the widest conv
kernels) stay as-is — cuts the per-step host dispatch gap 6.2 -> 1.0 ms
on the DSGAN bench (21.8 -> 23.7 img/s) for +1.4 ms of in-graph
pack/unpack device time (the unpack slices fuse into their consumers;
the repack is one concatenate per dtype).

The packed representation only ever exists at the jit boundary:
``StatePacker.wrap`` turns a ``step_fn(state, ...)`` into a callable
with identical semantics whose steady-state signature is
``(bigs tuple, {dtype: buffer})`` with the packed operands donated, and
whose return value is a :class:`PackedState` that lazily materializes
the logical tree (one extra unpack dispatch) when non-hot-path code
indexes into it (``model.state['params']`` at test/save time).

Numerics: pack -> unpack is bit-exact (tests/test_state_packing.py); the
train computation itself is the same traced graph, refused only when a
mesh is active (multi-process GSPMD state must keep its named shardings).
Opt out with SGAN_TPU_PACK_STATE=0.
"""

import os

import jax
import jax.numpy as jnp
from jax import tree_util as jtu

DEFAULT_THRESHOLD = 4 * 1024 * 1024


def packing_enabled():
    return os.environ.get('SGAN_TPU_PACK_STATE', '1') != '0'


class PackedState:
    """Device train state in packed form + lazy logical view."""

    __slots__ = ('packer', 'packed', '_mat')

    def __init__(self, packer, packed):
        self.packer = packer
        self.packed = packed
        self._mat = None

    def materialize(self):
        if self._mat is None:
            self._mat = self.packer._unpack_jit(self.packed)
        return self._mat

    def __getitem__(self, key):
        return self.materialize()[key]

    def keys(self):
        return self.materialize().keys()


def materialize_state(state):
    """PackedState -> logical tree; identity for plain trees."""
    if isinstance(state, PackedState):
        return state.materialize()
    return state


class StatePacker:
    def __init__(self, template, threshold=DEFAULT_THRESHOLD):
        leaves, self.treedef = jtu.tree_flatten(template)
        self.plan = []
        offs = {}
        for l in leaves:
            nbytes = int(l.size) * jnp.dtype(l.dtype).itemsize
            dt = jnp.dtype(l.dtype).name
            if nbytes < threshold:
                off = offs.get(dt, 0)
                self.plan.append((dt, off, int(l.size), tuple(l.shape)))
                offs[dt] = off + int(l.size)
            else:
                self.plan.append(None)
        self.n_big = sum(1 for p in self.plan if p is None)
        self._pack_jit = jax.jit(self.pack)
        self._unpack_jit = jax.jit(self.unpack)

    # ------------------------------------------------- in-graph pieces -- #
    def pack(self, state):
        leaves = jtu.tree_leaves(state)
        assert len(leaves) == len(self.plan), (len(leaves), len(self.plan))
        bigs, bydt = [], {}
        for p, l in zip(self.plan, leaves):
            if p is None:
                bigs.append(l)
            else:
                bydt.setdefault(p[0], []).append(jnp.ravel(l))
        bufs = {dt: (jnp.concatenate(v) if len(v) > 1 else v[0])
                for dt, v in bydt.items()}
        return tuple(bigs), bufs

    def unpack(self, packed):
        bigs, bufs = packed
        out, bi = [], 0
        for p in self.plan:
            if p is None:
                out.append(bigs[bi])
                bi += 1
            else:
                dt, off, size, shape = p
                out.append(jax.lax.slice(bufs[dt], (off,),
                                         (off + size,)).reshape(shape))
        return jtu.tree_unflatten(self.treedef, out)

    # ----------------------------------------------------- step wrapper -- #
    def wrap(self, step_fn):
        """step_fn(state, inputs, key, lrs) -> (state', metrics, taps),
        repackaged to run pack/unpack inside one jitted program with the
        packed state donated."""

        def packed_step(packed, inputs, key, lrs):
            st, metrics, taps = step_fn(self.unpack(packed), inputs, key,
                                        lrs)
            return self.pack(st), metrics, taps

        from ..runtime import compiler_options_from_env
        pjit_step = jax.jit(packed_step, donate_argnums=(0,),
                            compiler_options=compiler_options_from_env())

        def call(state, inputs, key, lrs):
            if isinstance(state, PackedState):
                packed = state.packed
            else:
                packed = self._pack_jit(state)
            new_packed, metrics, taps = pjit_step(packed, inputs, key, lrs)
            return PackedState(self, new_packed), metrics, taps

        call.packer = self
        call._pjit = pjit_step
        return call
