"""Persistent XLA compilation cache helper.

Forward programs here compile in tens of seconds (801² domains, FFT plans);
enabling JAX's persistent compilation cache makes repeat CLI invocations and
benchmark runs start in seconds instead.  Called by the CLI/bench drivers —
library imports stay side-effect free.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _machine_tag() -> str:
    """Short fingerprint of the host CPU so cached XLA:CPU AOT results are
    never reloaded on a machine with different vector extensions (XLA only
    warns on the mismatch and 'could lead to execution errors such as
    SIGILL')."""
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    feats = ' '.join(sorted(line.split(':', 1)[1].split()))
                    break
            else:
                feats = platform.processor()
    except OSError:
        feats = platform.processor()
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


_DEFAULT = os.path.join(os.path.expanduser('~'), '.cache',
                        'parasitoids_tpu_xla-' + _machine_tag())


def enable_compilation_cache(path: str | None = None):
    import jax

    pin_platform_from_env()
    path = path or os.environ.get('PARA_TPU_CACHE_DIR', _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    return path


def pin_platform_from_env():
    """Re-apply ``JAX_PLATFORMS`` from the environment: the hosted-TPU site
    hook overrides it via ``jax.config`` at import time, so without this,
    ``JAX_PLATFORMS=cpu`` runs would silently land on the TPU tunnel.
    Called by every driver entry point (via enable_compilation_cache)."""
    import jax

    env = os.environ.get('JAX_PLATFORMS')
    if env:
        jax.config.update('jax_platforms', env)
