"""Persistent XLA compilation cache helper.

Forward programs here compile in tens of seconds (801² domains, FFT plans);
enabling JAX's persistent compilation cache makes repeat CLI invocations and
benchmark runs start in seconds instead.  Called by the CLI/bench drivers —
library imports stay side-effect free.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser('~'), '.cache',
                        'parasitoids_tpu_xla')


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get('PARA_TPU_CACHE_DIR', _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    return path
