"""Persistent XLA compilation cache.

The fused recipe train steps are large XLA programs (the DSGAN step
contains ~17 network passes plus their gradients); first compilation takes
minutes.  Caching the serialized executables on disk makes every later
run of the same (recipe, shapes) config start in seconds — including the
driver's bench runs.  Called by every entry-point driver and bench.py.
"""

import os


def enable_compilation_cache(cache_dir=None):
    import jax
    # Optional platform pin (e.g. SGAN_TPU_PLATFORM=cpu to run a driver on
    # the host while the chip is busy).  Must happen before the first
    # backend init; this environment's sitecustomize force-registers the
    # TPU backend programmatically, so the config update — not the
    # JAX_PLATFORMS env var — is the only effective pin (tests/conftest.py
    # does the same dance).
    plat = os.environ.get('SGAN_TPU_PLATFORM')
    if plat:
        jax.config.update('jax_platforms', plat)
    # Default the cache INSIDE the repo tree: this environment wipes /tmp
    # and ~/.cache between sessions (observed between bench sessions —
    # BENCH_NOTES session 13: a wipe put a ~19 min cold compile in front of
    # the first run), while the repo directory persists.  A repo-local
    # default keeps the driver's bench/dryrun warm across wipes.
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = cache_dir or os.environ.get(
        'SGAN_TPU_XLA_CACHE', os.path.join(repo_root, '.xla_cache'))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception as e:  # cache is an optimization, never fatal
        print('compilation cache disabled: %s' % e)
    return path
