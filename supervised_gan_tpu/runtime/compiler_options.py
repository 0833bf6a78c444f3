"""Per-jit TPU compiler options from the environment.

The axon relay compiles remotely, so client-side ``XLA_FLAGS`` never
reach the TPU compiler — but ``jax.jit(..., compiler_options=...)`` is
forwarded and applied (an invalid option name fails the remote compile,
so a successful compile proves application).  This hook lets the A/B lab
sweep backend flags on the full train step without code changes:

    SGAN_TPU_COMPILER_OPTIONS='xla_tpu_scoped_vmem_limit_kib=65536' \
        python tools/ab_step.py --tag vmem64

Multiple options are ';'-separated ``name=value`` pairs.  Values stay
strings — XLA parses them by the flag's declared type.
"""

import os


def compiler_options_from_env():
    """dict for jax.jit(compiler_options=...), or None when unset."""
    spec = os.environ.get('SGAN_TPU_COMPILER_OPTIONS', '').strip()
    if not spec:
        return None
    out = {}
    for part in spec.split(';'):
        part = part.strip()
        if not part:
            continue
        if '=' not in part:
            raise ValueError(
                'SGAN_TPU_COMPILER_OPTIONS entries must be name=value, '
                'got %r' % part)
        k, v = part.split('=', 1)
        out[k.strip()] = v.strip()
    return out or None
