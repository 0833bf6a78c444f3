"""FlatAdam (flat per-dtype moment buffers) vs per-leaf optax: bit-exact."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from supervised_gan_tpu.models.base import (FlatAdam, _pack_small_leaves,
                                            _unpack_small_leaves,
                                            _migrate_opt_entry,
                                            _is_flat_moments)


def _tree(key, big=False):
    ks = jax.random.split(key, 6)
    t = {'a': {'w': jax.random.normal(ks[0], (3, 3, 8, 16)),
               'b': jax.random.normal(ks[1], (16,))},
         'c': [jax.random.normal(ks[2], (7,)),
               jax.random.normal(ks[3], (2, 5))]}
    if big:
        # > 4 MB leaf stays per-leaf inside FlatAdam
        t['huge'] = jax.random.normal(ks[4], (1024, 1100))
    return t


def test_pack_unpack_roundtrip():
    t = _tree(jax.random.PRNGKey(0), big=True)
    packed = _pack_small_leaves(t, threshold=1024)   # (2,5), (7,), (16,) small
    out = _unpack_small_leaves(packed, t, threshold=1024)
    for a, b in zip(jax.tree_util.tree_leaves(t),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_adam_bit_exact_vs_optax():
    params = _tree(jax.random.PRNGKey(1), big=True)
    flat = FlatAdam(0.5)
    ref = optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8)
    sf, sr = flat.init(params), ref.init(params)
    p_f = params
    p_r = jax.tree_util.tree_map(lambda x: x, params)
    for i in range(5):
        grads = _tree(jax.random.PRNGKey(100 + i), big=True)
        uf, sf = flat.update(grads, sf)
        ur, sr = ref.update(grads, sr, None)
        p_f = jax.tree_util.tree_map(lambda p, u: p - 0.01 * u, p_f, uf)
        p_r = jax.tree_util.tree_map(lambda p, u: p - 0.01 * u, p_r, ur)
    for a, b in zip(jax.tree_util.tree_leaves(p_f),
                    jax.tree_util.tree_leaves(p_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_adam_under_jit_donated():
    params = _tree(jax.random.PRNGKey(2))
    flat = FlatAdam(0.9)
    state = flat.init(params)

    @jax.jit
    def step(state, params, grads):
        u, state = flat.update(grads, state)
        return state, jax.tree_util.tree_map(lambda p, q: p - 0.1 * q,
                                             params, u)

    grads = _tree(jax.random.PRNGKey(3))
    state, params2 = step(state, params, grads)
    assert all(np.all(np.isfinite(l))
               for l in jax.tree_util.tree_leaves(jax.device_get(params2)))


def test_flat_adam_bf16_grad_leaves():
    """The vjp path returns SOME grads bf16 (edge-conv cotangent casts):
    the packed structure must stay identical to the f32-params moments,
    and classification must not flip on dtype (count threshold)."""
    params = _tree(jax.random.PRNGKey(7), big=True)
    flat = FlatAdam(0.5)
    state = flat.init(params)
    grads = _tree(jax.random.PRNGKey(8), big=True)
    # mixed-precision cotangents: one small and the big leaf arrive bf16
    grads['a']['w'] = grads['a']['w'].astype(jnp.bfloat16)
    grads['huge'] = grads['huge'].astype(jnp.bfloat16)
    u, state = flat.update(grads, state)     # raised ValueError before fix
    ref = optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8)
    ur, _ = ref.update(grads, ref.init(params), None)
    for a, b in zip(jax.tree_util.tree_leaves(u),
                    jax.tree_util.tree_leaves(ur)):
        # f32-upcast moment math vs optax's mixed promotion: close, and
        # identical where the grads were f32 all along
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_apply_updates_bit_exact_vs_per_leaf():
    """The packed p - lr*u path (apply_updates) vs per-leaf tree_map —
    bit-exact, including per-subtree lrs and a >threshold big leaf."""
    params = _tree(jax.random.PRNGKey(9), big=True)
    flat = FlatAdam(0.5)
    state_a = flat.init(params)
    state_b = flat.init(params)
    lr_a, lr_c = jnp.float32(0.01), jnp.float32(0.003)
    # per-leaf lrs in tree-flatten order (dict keys sorted: a, c, huge)
    leaves_lr = ([lr_a] * len(jax.tree_util.tree_leaves(params['a']))
                 + [lr_c] * len(jax.tree_util.tree_leaves(params['c']))
                 + [lr_a])
    p_packed, p_leaf = params, params
    for i in range(3):
        grads = _tree(jax.random.PRNGKey(200 + i), big=True)
        p_packed, state_a = flat.apply_updates(grads, state_a, p_packed,
                                               leaves_lr)
        u, state_b = flat.update(grads, state_b)
        lrs = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(p_leaf), leaves_lr)
        p_leaf = jax.tree_util.tree_map(lambda p, uu, lr: p - lr * uu,
                                        p_leaf, u, lrs)
    for a, b in zip(jax.tree_util.tree_leaves(p_packed),
                    jax.tree_util.tree_leaves(p_leaf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_apply_adam_flat_gate(monkeypatch):
    """apply_adam routes through apply_updates when the gate is on and
    matches the per-leaf path exactly."""
    from supervised_gan_tpu.models.base import apply_adam
    params = _tree(jax.random.PRNGKey(10))
    grads = _tree(jax.random.PRNGKey(11))
    flat = FlatAdam(0.5)
    monkeypatch.setenv('SGAN_TPU_FLAT_UPD', '1')
    p1, _ = apply_adam(flat, grads, flat.init(params), params,
                       jnp.float32(0.02))
    monkeypatch.setenv('SGAN_TPU_FLAT_UPD', '0')
    p2, _ = apply_adam(flat, grads, flat.init(params), params,
                       jnp.float32(0.02))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_migrate_per_leaf_checkpoint_to_flat(monkeypatch):
    monkeypatch.setenv('SGAN_TPU_FLAT_ADAM', '1')
    params = _tree(jax.random.PRNGKey(4))
    ref = optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8)
    old = ref.init(params)
    grads = _tree(jax.random.PRNGKey(5))
    _, old = ref.update(grads, old, None)

    migrated = _migrate_opt_entry(old)
    assert _is_flat_moments(migrated.mu)

    # continuing from the migrated state matches continuing per-leaf
    flat = FlatAdam(0.5)
    grads2 = _tree(jax.random.PRNGKey(6))
    uf, _ = flat.update(grads2, migrated)
    ur, _ = ref.update(grads2, old, None)
    for a, b in zip(jax.tree_util.tree_leaves(uf),
                    jax.tree_util.tree_leaves(ur)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
