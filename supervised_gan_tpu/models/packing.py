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
# FlatAdam's small-leaf rule (element count, not bytes) — grouped param
# buffers must classify leaves EXACTLY like models/base._pack_small_leaves
# or the concat-folding below breaks (harmlessly: it just stops folding).
_GROUP_COUNT_THRESHOLD = 1 << 20


def packing_enabled():
    return os.environ.get('SGAN_TPU_PACK_STATE', '1') != '0'


def group_packing_enabled():
    """One boundary f32 buffer per params SUBTREE (instead of one
    shared f32 buffer for every small leaf in the state).

    With the FlatAdam packed update (SGAN_TPU_FLAT_UPD) each group's new
    parameters are ordered slices of ONE flat vector; a boundary repack
    buffer that spans a contiguous run of that vector's leaves in the
    same order folds to a slice of the update's output buffer —
    zero-copy — where the shared buffer pays a real multi-group gather
    (three f32 concats, 47 MB/step at 330-490 GB/s: concatenate.1239/
    1235/988 at packing.py:97, round-3 s10 trace)."""
    return os.environ.get('SGAN_TPU_GROUP_PACK', '0') == '1'


def _param_groups(template):
    """{params_key: group_name}: one boundary buffer per params SUBTREE
    ('G1', 'D2', ...).  A subtree's small leaves are a contiguous
    segment of its optimizer group's FlatAdam flat vector (groups pack
    subtrees in the same sorted tree-flatten order, and big leaves are
    excluded on both sides by the same count rule), so each per-subtree
    boundary concat folds to ONE slice of the update output — where the
    state-wide shared f32 buffer gathers across all three groups plus
    stray leaves and XLA must materialize it.  Keyed on the subtree
    name directly so every recipe's state layout works (fcgan stores
    optD/optG beside params, the engine recipes store 'opt')."""
    if not isinstance(template, dict):
        return {}
    params = template.get('params')
    if not isinstance(params, dict):
        return {}
    return {k: k for k in params}


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
        paths_leaves, self.treedef = jtu.tree_flatten_with_path(template)
        groups = _param_groups(template) if group_packing_enabled() else {}
        self.plan = []
        offs = {}
        for path, l in paths_leaves:
            nbytes = int(l.size) * jnp.dtype(l.dtype).itemsize
            dt = jnp.dtype(l.dtype).name
            grp = None
            if groups and len(path) >= 2 and dt == 'float32':
                k0 = getattr(path[0], 'key', None)
                k1 = getattr(path[1], 'key', None)
                if k0 == 'params' and k1 in groups:
                    grp = groups[k1]
            if grp is not None:
                # FlatAdam classification: count, not bytes
                if int(l.size) < _GROUP_COUNT_THRESHOLD:
                    key = f'{dt}:{grp}'
                    off = offs.get(key, 0)
                    self.plan.append((key, off, int(l.size),
                                      tuple(l.shape)))
                    offs[key] = off + int(l.size)
                else:
                    self.plan.append(None)
            elif nbytes < threshold:
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
        jit_kwargs = {}
        if os.environ.get('SGAN_TPU_AUTO_LAYOUT', '0') == '1':
            # Round-4 structural probe: AUTO parameter layouts for the
            # donated packed state.  The packed per-dtype buffers are 1-D
            # (no layout freedom), but the big conv kernels ride alongside
            # as 4-D `bigs` — AUTO lets XLA pick their HBM layouts to match
            # their consumers instead of paying per-step relayout copies.
            # Donation keeps state in the chosen layout across steps; the
            # first call pays a one-time host->chosen-layout copy.
            try:
                # version-unstable experimental API; the probe also assumes
                # the unmeshed packed path's 4-arg/3-output signature
                from jax.experimental.layout import Format, Layout
                auto = Format(Layout.AUTO)
                jit_kwargs = {'in_shardings': (auto, None, None, None),
                              'out_shardings': (auto, None, None)}
            except Exception as e:     # pragma: no cover - jax-version drift
                print('SGAN_TPU_AUTO_LAYOUT unavailable (%s); running '
                      'with default layouts' % e)
        pjit_step = jax.jit(packed_step, donate_argnums=(0,),
                            compiler_options=compiler_options_from_env(),
                            **jit_kwargs)

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
