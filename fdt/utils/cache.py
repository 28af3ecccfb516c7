"""Persistent XLA compilation cache, gated to the TPU backend.

TPU compiles in this environment are minutes each (1 CPU core + a remote
compile path), and they dominated the bench/train wall clock: round 4
measured the flagship detect graph alone at ~11 min cold vs 0.004 s from
this cache.  The cache is therefore load-bearing for every TPU CLI
(bench.py, scripts/train_pyramid.py, scripts/serve.py).

It must stay OFF for the CPU backend: reloading XLA:CPU AOT executables on
this host trips a CPU-feature mismatch ("+prefer-no-gather" SIGILL) that can
HANG the process (observed round 2; the test suite and dryrun_multichip pin
CPU and never enable it).  The cache key includes the platform, but merely
enabling the cache in a CPU-backend process would WRITE CPU entries that a
later process could reload — so the gate checks the actual default backend
before enabling anything.

Env vars are useless here (jax is pre-imported at interpreter start, so
JAX_COMPILATION_CACHE_DIR is never read); only jax.config.update works.
"""
import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache_tpu")


def enable_tpu_compile_cache(cache_dir: str = DEFAULT_DIR) -> bool:
    """Enable the persistent compilation cache iff the default backend is a
    real TPU.  Returns True when enabled.

    Safe to call multiple times.  Never raises: a cache problem must not
    take down the caller (it only costs compile time).
    """
    import jax

    try:
        # default_backend() initializes the backend; in this environment the
        # axon TPU plugin claims it unless jax_platforms pinned cpu first.
        if jax.default_backend() != "tpu":
            return False
        # tests pin the CPU *device* while the plugin still reports a tpu
        # default backend (NOTES.md round-2 finding) — respect the pin
        dd = jax.config.jax_default_device
        if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
            return False
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # every TPU compile here is worth caching (even 1s graphs pay ~20s+
        # through the remote compile path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception:
        return False
