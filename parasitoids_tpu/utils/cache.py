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
import subprocess


def _machine_tag() -> str:
    """Short fingerprint of the host CPU so cached XLA:CPU AOT results are
    never reloaded on a machine with different vector extensions (loading
    one is not just XLA's warned-about SIGILL risk — observed as a hard
    SIGSEGV inside executable deserialization).

    /proc/cpuinfo is NOT sufficient under virtualization: VMs report a
    stable masked model ('Intel(R) Xeon(R) Processor @ 2.10GHz') while
    LLVM detects the real host's features through CPUID, so two physical
    hosts can share cpuinfo but produce incompatible AOT code.  Prefer the
    compiler's own CPUID-based native detection (``gcc -march=native``
    resolves the actual microarchitecture, e.g. 'cooperlake'), falling
    back to cpuinfo flags."""
    feats = ''
    try:
        out = subprocess.run(['gcc', '-march=native', '-Q',
                              '--help=target'],
                             capture_output=True, text=True, timeout=15)
        if out.returncode == 0:
            feats = out.stdout
    except (OSError, subprocess.TimeoutExpired):
        pass
    if not feats:
        try:
            with open('/proc/cpuinfo') as f:
                for line in f:
                    if line.startswith('flags'):
                        feats = ' '.join(
                            sorted(line.split(':', 1)[1].split()))
                        break
                else:
                    feats = platform.processor()
        except OSError:
            feats = platform.processor()
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


_tag_cache: list = []


def default_cache_dir() -> str:
    """Machine-tagged cache directory, computed lazily: the tag shells out
    to gcc, which must not run as an import side effect (and is pure waste
    when the cache is skipped)."""
    if not _tag_cache:
        _tag_cache.append(os.path.join(
            os.path.expanduser('~'), '.cache',
            'parasitoids_tpu_xla-' + _machine_tag()))
    return _tag_cache[0]


def enable_compilation_cache(path: str | None = None):
    import jax

    pin_platform_from_env()
    # XLA:CPU executable (de)serialization has segfaulted on this stack —
    # observed both reading an entry compiled on a different physical host
    # behind the same virtualized cpuinfo AND writing a fresh multi-device
    # CPU executable (pytest faulthandler: compilation_cache.py
    # get/put_executable_and_time).  The cache's real value is the TPU
    # tunnel's multi-minute compiles, so persistent caching is accelerator-
    # only unless PARA_TPU_CACHE_CPU=1 explicitly opts CPU in (e.g. for
    # repeated full-scale f64 parity audits on a known-stable host).
    first = (os.environ.get('JAX_PLATFORMS') or '').split(',')[0]
    first = first.strip().lower()
    if not first:
        # no env pin: ask the backend (quick on a CPU-only host; on this
        # rig the driver always pins JAX_PLATFORMS so this is never the
        # wedged-tunnel probe)
        first = jax.default_backend()
    if first == 'cpu' and os.environ.get('PARA_TPU_CACHE_CPU') != '1':
        return None
    # `or` keeps default_cache_dir() lazy: it shells out to gcc for the
    # machine tag, which must not run when the env var already decides
    path = path or os.environ.get('PARA_TPU_CACHE_DIR') or default_cache_dir()
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
