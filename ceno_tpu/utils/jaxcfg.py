"""JAX global configuration for ceno-tpu.

Enables the persistent compilation cache (measured: a fresh-process TPU compile
through the axon tunnel drops from tens of seconds to ~30ms on a cache hit).
The prover compiles one kernel per (array-size, term-signature) pair, so cache
persistence across processes is load-bearing for startup latency.

Opt out with CENO_TPU_NO_CACHE=1; override the location with CENO_TPU_CACHE_DIR.
"""

import os

import jax

if not os.environ.get("CENO_TPU_NO_CACHE"):
    # separate cache per platform: axon's remote compiler emits CPU AOT blobs
    # whose machine features differ from the local host's
    _platform = os.environ.get("JAX_PLATFORMS", "default").split(",")[0] or "default"
    _dir = os.environ.get(
        "CENO_TPU_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
            _platform,
        ),
    )
    jax.config.update("jax_compilation_cache_dir", _dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
