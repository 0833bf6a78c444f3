"""BaseModel: the duck-typed recipe protocol the drivers consume
(reference models/base_model.py:5-64) plus shared TPU plumbing.

Protocol: initialize / set_input / forward / test / optimize_parameters /
get_current_errors / get_current_visuals / save / update_learning_rate.

Shared plumbing:
  * seeded PRNG service (one master key from --manualSeed; per-step keys by
    fold_in — replaces torch's global generator),
  * which_channel parsing ('rg_b' -> input channels [r,g], output [b];
    reference models/fcgan_model.py:47-58),
  * checkpoint IO: torch-compatible ``<label>_net_<name>.pth`` per net plus
    a native ``<label>_state.pkl`` carrying the FULL train state (params +
    Adam moments + pools + lr) so resume is exact — the reference loses
    optimizer state on resume (SURVEY.md §5.3),
  * linear lr decay bookkeeping.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import pth as pthio


def parse_which_channel(spec):
    """'rg_b' -> [[0,1],[2]] (rgb indices per group)."""
    idx = {'r': 0, 'g': 1, 'b': 2}
    return [[idx[c] for c in group] for group in spec.split('_')]


_FLAT_ADAM_COUNT = 1 << 20          # elements (= 4 MB at f32)


def _flat_adam_enabled():
    return os.environ.get('SGAN_TPU_FLAT_ADAM', '1') != '0'


def flat_update_enabled():
    """Packed ``p - lr*u``: the parameter subtraction runs on the same
    flat per-dtype buffers as the FlatAdam moment math instead of one
    tiny fusion per parameter tensor (~457 sub-2us ops/step on the DSGAN
    bench; round-3 s8 trace).  Bit-exact either way."""
    return (_flat_adam_enabled()
            and os.environ.get('SGAN_TPU_FLAT_UPD', '1') != '0')


def _pack_dtype(dtype):
    """Packing group for a leaf dtype.  All floating leaves pack as f32:
    the vjp path returns SOME gradients as bf16 (the edge-conv backward
    casts its cotangents, BENCH_NOTES round 2), so grouping by the leaf's
    own dtype would give grads a different packed STRUCTURE than the
    moments initialized from the f32 params — upcasting first keeps the
    structure fixed (and runs the moment math at >= per-leaf precision)."""
    dt = jnp.dtype(dtype)
    return jnp.dtype(jnp.float32) if jnp.issubdtype(dt, jnp.floating) else dt


def _pack_small_leaves(tree, threshold=_FLAT_ADAM_COUNT):
    """tree -> {'flat': {dtype_name: 1-D vec}, 'big': {str(i): leaf}}.

    Deterministic tree_flatten order; leaves under the ELEMENT-count
    threshold (count, not bytes — classification must not depend on a
    leaf arriving bf16 vs f32) are raveled and concatenated per packing
    dtype, larger leaves pass through.  The packed form exists so
    elementwise optimizer math runs as a handful of full-bandwidth vector
    ops instead of one tiny fusion per parameter (the DSGAN step spent
    ~2.5 ms/step in sub-20us optimizer/packing ops; BENCH_NOTES round 3)."""
    leaves = jax.tree_util.tree_leaves(tree)
    bydt, big = {}, {}
    for i, l in enumerate(leaves):
        if l.size < threshold:
            dt = _pack_dtype(l.dtype)
            bydt.setdefault(dt.name, []).append(jnp.ravel(l).astype(dt))
        else:
            big[str(i)] = l
    flat = {dt: (jnp.concatenate(v) if len(v) > 1 else v[0])
            for dt, v in bydt.items()}
    return {'flat': flat, 'big': big}


def _unpack_small_leaves(packed, like, threshold=_FLAT_ADAM_COUNT):
    """Inverse of _pack_small_leaves against the template ``like``
    (packed-dtype segments are returned as-is — f32 for floats)."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    offs = {}
    out = []
    for i, l in enumerate(leaves):
        if l.size < threshold:
            dt = _pack_dtype(l.dtype).name
            off = offs.get(dt, 0)
            out.append(jax.lax.slice(packed['flat'][dt], (off,),
                                     (off + l.size,)).reshape(l.shape))
            offs[dt] = off + l.size
        else:
            out.append(packed['big'][str(i)])
    return jax.tree_util.tree_unflatten(treedef, out)


class FlatAdam:
    """optax.scale_by_adam over flat per-dtype buffers — bit-exact.

    Adam is elementwise, so running the moment updates on the
    concatenation of all (small) parameter leaves computes exactly the
    per-leaf result (bit-exact for f32 grads; bf16 cotangent leaves are
    upcast before packing, so their moment math runs at f32 instead of
    optax's mixed promotion) while replacing ~3 tiny XLA ops per
    parameter tensor with ~3 vector ops per dtype.  Moments are STORED flat (they are never
    consumed per-leaf), so the jit-boundary packer also sees 2 big buffers
    instead of ~800 small mu/nu leaves.  Large leaves keep per-leaf
    moments.  Delegates the actual math to optax.scale_by_adam applied to
    the packed tree, so the formulas (bias correction, eps placement,
    safe count increment) are optax's own."""

    def __init__(self, beta1):
        self._tx = optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)

    def init(self, params):
        return self._tx.init(_pack_small_leaves(params))

    def update(self, grads, state, params=None):
        fu, state = self._tx.update(_pack_small_leaves(grads), state, None)
        return _unpack_small_leaves(fu, grads), state

    def apply_updates(self, grads, state, params, leaves_lr):
        """params - lr*adam(grads), with the subtraction ALSO in packed
        space: params are concatenated once per dtype (XLA folds the
        concat-of-ordered-slices where the leaves came from the packed
        state buffer), updated by a handful of vector ops, and sliced
        back out — replacing the per-leaf tree_map subtract.

        ``leaves_lr`` is one traced lr scalar per leaf of ``params`` in
        tree-flatten order (constant for a D group; per-subtree for the
        chained G groups).  Bit-exact vs the per-leaf form: the packed
        buffers hold the same f32 elements and the subtract is
        elementwise."""
        fu, state = self._tx.update(_pack_small_leaves(grads), state, None)
        fp = _pack_small_leaves(params)
        segs, big_lr = _flat_lr_plan(leaves_lr, params)
        new_flat = {}
        for dt, buf in fp['flat'].items():
            ss = segs.get(dt, [])
            if len(ss) == 1:
                new_flat[dt] = buf - ss[0][0] * fu['flat'][dt]
            else:
                lrv = jnp.concatenate(
                    [jnp.full((s,), lr, buf.dtype) for lr, s in ss])
                new_flat[dt] = buf - lrv * fu['flat'][dt]
        new_big = {i: l - big_lr[i] * fu['big'][i]
                   for i, l in fp['big'].items()}
        packed = {'flat': new_flat, 'big': new_big}
        return _unpack_small_leaves(packed, params), state


def _flat_lr_plan(leaves_lr, tree, threshold=_FLAT_ADAM_COUNT):
    """Per-dtype contiguous (lr, size) segments + {big_idx: lr}, aligned
    with the _pack_small_leaves classification of ``tree``'s leaves.
    Adjacent leaves sharing the SAME lr object merge into one segment,
    so a constant-lr group costs a single scalar broadcast."""
    segs, big = {}, {}
    leaves = jax.tree_util.tree_leaves(tree)
    assert len(leaves) == len(leaves_lr), (len(leaves), len(leaves_lr))
    for i, (l, lr) in enumerate(zip(leaves, leaves_lr)):
        if l.size < threshold:
            dt = _pack_dtype(l.dtype).name
            lst = segs.setdefault(dt, [])
            if lst and lst[-1][0] is lr:
                lst[-1][1] += int(l.size)
            else:
                lst.append([lr, int(l.size)])
        else:
            big[str(i)] = lr
    return segs, big


def adam_transform(beta1):
    """scale_by_adam; the step's learning rate is applied inside the train
    step from a traced scalar, so per-epoch lr decay never recompiles.
    Flat-buffer form by default (SGAN_TPU_FLAT_ADAM=0 for per-leaf optax);
    both compute bit-identical updates."""
    if _flat_adam_enabled():
        return FlatAdam(beta1)
    return optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)


def _is_flat_moments(tree):
    return isinstance(tree, dict) and set(tree) == {'flat', 'big'}


def _migrate_opt_entry(entry):
    """Convert a checkpointed optimizer entry between the per-leaf and
    flat-moment representations to match the active adam_transform form
    (checkpoints written before/after the FlatAdam switch stay loadable)."""
    mu = getattr(entry, 'mu', None)
    if mu is None:
        return entry
    if _flat_adam_enabled() and not _is_flat_moments(mu):
        return entry._replace(mu=_pack_small_leaves(mu),
                              nu=_pack_small_leaves(entry.nu))
    if not _flat_adam_enabled() and _is_flat_moments(mu):
        raise ValueError(
            'checkpoint holds flat Adam moments; unset SGAN_TPU_FLAT_ADAM=0 '
            'to resume from it (the flat->per-leaf direction needs the '
            'parameter shapes and is not reconstructed here)')
    return entry


def apply_adam(tx, grads, opt_state, params, lr):
    if isinstance(tx, FlatAdam) and flat_update_enabled():
        n = len(jax.tree_util.tree_leaves(params))
        return tx.apply_updates(grads, opt_state, params, [lr] * n)
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u, params, updates)
    return new_params, opt_state


class BaseModel:
    def name(self):
        return type(self).__name__

    def initialize(self, opt):
        self.opt = opt
        self.isTrain = opt.isTrain
        self.save_dir = os.path.join(opt.checkpoints_dir, opt.name)
        self.model_dir = opt.pretrained_model_dir
        os.makedirs(self.save_dir, exist_ok=True)
        seed = opt.manualSeed if opt.manualSeed is not None else 0
        self.master_key = jax.random.PRNGKey(seed)
        self.init_key = jax.random.fold_in(self.master_key, 0)
        self._step_count = 0
        self._test_count = 0
        self.compute_dtype = (jnp.bfloat16
                              if opt.compute_dtype == 'bfloat16' else None)
        # fused norm+activation dispatch (XLA-fused expression by default,
        # Mosaic kernel behind SGAN_TPU_PALLAS_IN=1); pure function of the
        # same math, so it is enabled on every backend unless --no_pallas.
        from ..nn.core import set_pallas_enabled
        set_pallas_enabled(not getattr(opt, 'no_pallas', False))
        self.image_paths = []
        # --data_mesh N > 1: 1-D data-parallel mesh (built before any state
        # device_put so replication spans it; with --dcn_* flags the device
        # list is global across processes)
        self.mesh = None
        n = int(getattr(opt, 'data_mesh', 0) or 0)
        n_sp = int(getattr(opt, 'spatial_mesh', 0) or 0)
        if n > 1 or n_sp > 1:
            from ..parallel import make_mesh
            self.mesh = make_mesh(max(n, 1), n_sp=max(n_sp, 1))

    def jit_train_step(self, step_fn, state_template):
        """jit the recipe's train step; with --data_mesh N > 1 the step is
        compiled over an N-device 1-D mesh with the batch sharded on the
        'data' axis and state replicated (GSPMD inserts the gradient psum).
        batchSize must then be divisible by N."""
        # vjp-vs-recompute G-grad hint: walk this model's nets for conv
        # sites the Pallas 3x3 kernel can claim (models/common.py)
        from .common import has_pallas_conv_sites, set_g_grad_vjp_hint
        from ..nn.core import Layer
        set_g_grad_vjp_hint(any(
            has_pallas_conv_sites(v) for v in vars(self).values()
            if isinstance(v, Layer)))
        self._raw_step_fn = step_fn        # kept for the multi-step scan
        if self.mesh is not None:
            from ..parallel import shard_train_step
            return shard_train_step(step_fn, self.mesh, state_template)
        from .packing import StatePacker, packing_enabled
        if packing_enabled():
            # fewer, larger argument leaves: the relay's dispatch cost
            # scales with arg count (models/packing.py docstring)
            return StatePacker(state_template).wrap(step_fn)
        from ..runtime import compiler_options_from_env
        return jax.jit(step_fn, donate_argnums=(0,),
                       compiler_options=compiler_options_from_env())

    # ------------------------------------------------- multi-step scan -- #
    # One device dispatch per K training iterations: lax.scan over the
    # recipe's step with stacked inputs and in-graph per-step keys (the
    # same fold_in(master, 2*step+1) sequence next_step_key produces;
    # agreement with per-step training is exact up to XLA reassociation
    # in the differently-fused scanned program).  Amortizes the
    # relay's per-dispatch cost (~6 ms/step wall vs the 40 ms device step
    # on the DSGAN bench) and is the natural XLA training-loop form.
    _multi_steps = None   # {k: compiled scan program}

    def _step_inputs(self):
        """The inputs dict the recipe's optimize_parameters feeds its
        train step for the CURRENT set_input; models override."""
        raise NotImplementedError

    def _step_lrs(self):
        """The learning-rate argument the recipe's train step takes."""
        return self.lrs()

    def train_chunk(self, batches):
        """Run len(batches) training iterations in one dispatch.

        Equivalent to set_input(b); optimize_parameters() per batch —
        same rng keys, same final state; metrics/taps are the last
        step's.  Falls back to per-step calls when the recipe does not
        define _step_inputs or a mesh is active."""
        ok = (self.mesh is None
              and type(self)._step_inputs is not BaseModel._step_inputs)
        if not ok or len(batches) == 1:
            for b in batches:
                self.set_input(b)
                self.optimize_parameters()
            return
        ins = []
        for b in batches:
            self.set_input(b)
            ins.append(self._step_inputs())
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ins)
        self.train_chunk_stacked(stacked, len(batches))

    def train_chunk_stacked(self, stacked, k):
        """Dispatch k iterations whose per-step inputs are already
        stacked on the leading axis (callers that reuse or prefetch
        device-stacked inputs skip train_chunk's per-batch set_input —
        its eager ops cost several relay round-trips per batch)."""
        if self._multi_steps is None:
            self._multi_steps = {}
        if k not in self._multi_steps and self._multi_steps:
            # A second scan length would recompile the whole scanned
            # program (~10 min through the relay).  Chunks whose length
            # differs from the already-compiled one (print/save cadence
            # boundaries not aligned to --steps_per_dispatch) run through
            # the per-step program instead.
            taps = None
            for i in range(k):
                inp = jax.tree_util.tree_map(lambda a, i=i: a[i], stacked)
                self.state, self._metrics, taps = self._train_step(
                    self.state, inp, self.next_step_key(), self._step_lrs())
            self._taps = taps
            self._after_chunk(taps)
            return
        from .packing import PackedState, materialize_state
        packer = getattr(self._train_step, 'packer', None)
        if k not in self._multi_steps:
            step_fn = self._raw_step_fn

            if packer is not None:
                # scan with the PACKED state as carry: the round-2 scan
                # penalty was the ~600-leaf carry through the while loop;
                # the packed carry is ~46 buffers (BENCH_NOTES.md round 3)
                def multi(packed, sins, master_key, ns, lrs):
                    def body(pk, xs):
                        inp, n = xs
                        key = jax.random.fold_in(master_key, n)
                        st, metrics, taps = step_fn(
                            packer.unpack(pk), inp, key, lrs)
                        return packer.pack(st), (metrics, taps)
                    packed, ys = jax.lax.scan(body, packed, (sins, ns))
                    last = jax.tree_util.tree_map(lambda a: a[-1], ys)
                    return packed, last[0], last[1]
            else:
                def multi(state, sins, master_key, ns, lrs):
                    def body(st, xs):
                        inp, n = xs
                        key = jax.random.fold_in(master_key, n)
                        st, metrics, taps = step_fn(st, inp, key, lrs)
                        return st, (metrics, taps)
                    state, ys = jax.lax.scan(body, state, (sins, ns))
                    last = jax.tree_util.tree_map(lambda a: a[-1], ys)
                    return state, last[0], last[1]

            from ..runtime import compiler_options_from_env
            self._multi_steps[k] = jax.jit(
                multi, donate_argnums=(0,),
                compiler_options=compiler_options_from_env())
        import numpy as _np
        ns = _np.asarray(
            [2 * (self._step_count + 1 + i) + 1 for i in range(k)],
            _np.uint32)
        self._step_count += k
        if packer is not None:
            if isinstance(self.state, PackedState):
                packed = self.state.packed
            else:
                packed = packer._pack_jit(materialize_state(self.state))
            packed, self._metrics, taps = self._multi_steps[k](
                packed, stacked, self.master_key, ns, self._step_lrs())
            self.state = PackedState(packer, packed)
        else:
            self.state, self._metrics, taps = self._multi_steps[k](
                self.state, stacked, self.master_key, ns, self._step_lrs())
        self._taps = taps
        self._after_chunk(taps)

    def _after_chunk(self, taps):
        """Post-step attribute wiring (real_A/fake_B etc.); models with
        extra bookkeeping override."""
        pass

    def put_state(self, state):
        """Device-place freshly built train state; replicated over the mesh
        when one exists (required for multi-process: every argument of a
        global jit program must be a global array)."""
        if self.mesh is not None:
            from ..parallel import replicated_sharding
            return jax.device_put(state, replicated_sharding(self.mesh))
        return jax.device_put(state)

    # ------------------------------------------------------------- rng -- #
    # Per-step keys fold in PURE NUMPY (utils/prng.py, bit-exact threefry
    # fold_in validated against jax.random in tests) and ride the step
    # call's argument upload.  Folding on device costs two extra jit
    # dispatches per step; a first attempt that folded on the "CPU
    # backend" was far worse — through the relay, np.asarray of its
    # result is a synchronous ~30 ms value FETCH per step (profiled:
    # step cadence 76 ms vs the 40 ms device duration).
    _np_key = None

    def _host_fold(self, n):
        if self._np_key is None:
            self._np_key = np.asarray(self.master_key)
        from ..utils.prng import fold_in as np_fold_in
        return np_fold_in(self._np_key, n)

    def next_step_key(self):
        self._step_count += 1
        return self._host_fold(2 * self._step_count + 1)

    def next_test_key(self):
        self._test_count += 1
        return self._host_fold(2 * self._test_count)

    # ------------------------------------------------------ checkpoints -- #
    # Writes are asynchronous: the device->host snapshot happens on the
    # caller (cheap), serialization + disk IO go to a single worker thread
    # so the train loop never stalls on checkpoint cadence (the reference
    # blocks moving nets to CPU and pickling, base_model.py:44-52).
    _ckpt_pool = None

    @staticmethod
    def _ckpt_submit(fn, *args):
        from concurrent.futures import ThreadPoolExecutor
        if BaseModel._ckpt_pool is None:
            BaseModel._ckpt_pool = ThreadPoolExecutor(max_workers=1)
        return BaseModel._ckpt_pool.submit(fn, *args)

    def flush_checkpoints(self):
        """Block until queued checkpoint writes are on disk."""
        if BaseModel._ckpt_pool is not None:
            BaseModel._ckpt_pool.shutdown(wait=True)
            BaseModel._ckpt_pool = None

    def _net_path(self, network_label, epoch_label, model_dir=''):
        d = model_dir or self.save_dir
        return os.path.join(d, '%s_net_%s.pth' % (epoch_label, network_label))

    def save_network(self, net, params, network_label, epoch_label):
        host_params = jax.device_get(params)
        self._ckpt_submit(pthio.save_pth,
                          self._net_path(network_label, epoch_label),
                          net, host_params)

    def load_network(self, net, network_label, epoch_label, model_dir=''):
        # explicit model_dir wins, else save_dir (reference base_model.py:55-61)
        self.flush_checkpoints()  # don't read files still being written
        path = self._net_path(network_label, epoch_label, model_dir)
        print('loading %s' % path)
        return pthio.load_pth(path, net)

    def save_full_state(self, state, epoch_label, extra=None):
        from .packing import materialize_state
        payload = {'state': jax.device_get(materialize_state(state)),
                   'extra': extra or {}}
        self._ckpt_submit(pthio.save_state, os.path.join(
            self.save_dir, '%s_state.pkl' % epoch_label), payload)

    def load_full_state(self, epoch_label):
        self.flush_checkpoints()
        path = os.path.join(self.save_dir, '%s_state.pkl' % epoch_label)
        if os.path.exists(path):
            payload = pthio.load_state(path)
            opt_tree = (payload or {}).get('state', {}).get('opt')
            if isinstance(opt_tree, dict):
                payload['state']['opt'] = {
                    k: _migrate_opt_entry(v) for k, v in opt_tree.items()}
            return payload
        return None

    # ------------------------------------------------------------ misc -- #
    def _fetch_metrics(self):
        """One aggregated device->host transfer for the whole metrics dict.
        Through the relay a value fetch costs ~25-30 ms ROUND TRIP, so the
        former per-metric float(v) pattern paid it once per metric — ~5
        ms/step amortized into every print/bench window (round-3 find)."""
        from collections import OrderedDict
        host = jax.device_get(dict(self._metrics))
        return OrderedDict((k, float(host[k])) for k in self._metrics)

    def set_input(self, input):
        self.input = input

    def get_image_paths(self):
        """Paths of the current batch's source images (reference
        models/base_model.py:28; every cgan-style recipe returns
        self.image_paths, set by its set_input).  Drivers (test.py:47,
        test_ss.py:46, recon.py, train_ss.py) call this when saving
        per-image results."""
        return self.image_paths

    def forward(self):
        pass

    def test(self):
        pass

    def optimize_parameters(self):
        pass

    def get_current_visuals(self, **kw):
        return self.input

    def get_current_errors(self):
        return {}

    def save(self, label):
        pass

    def update_learning_rate(self):
        pass

    @staticmethod
    def to_device(arr):
        return jnp.asarray(np.ascontiguousarray(arr), jnp.float32)

    def to_device_batch(self, arr):
        """Batch input placement.  Single process: plain host->device put
        (jit reshards per in_shardings).  Multi-process: every process loads
        the full global batch (same seed => same stream) and contributes its
        addressable shards of a global array."""
        if self.mesh is None or jax.process_count() == 1:
            return self.to_device(arr)
        from ..parallel import batch_sharding
        a = np.ascontiguousarray(np.asarray(arr, np.float32))
        return jax.make_array_from_callback(
            a.shape, batch_sharding(self.mesh), lambda idx: a[idx])
