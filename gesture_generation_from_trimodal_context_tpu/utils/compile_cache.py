"""Persistent XLA compilation cache for the CLIs.

Compiling the flagship train step via the axon tunnel costs minutes
(BENCH_r02 measured 741 s of compile+warmup); the JAX persistent cache
keys serialized executables by HLO hash so warm reruns of
train/synthesize/bench skip straight to execution.  Safe no-op when the
backend cannot serialize executables.
"""

import logging
import os


def enable(cache_dir=None):
    """Point JAX's persistent compilation cache at a repo-local dir.

    Call BEFORE building jitted functions.  Returns the directory used,
    or None when the running JAX build rejects the config (the cache is
    an optimization, never a failure).
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("GG_COMPILE_CACHE") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:
        logging.info("persistent compilation cache unavailable: %s", e)
        return None
    return cache_dir
