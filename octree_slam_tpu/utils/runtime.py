"""Runtime setup shared by benchmarks / apps / profiling scripts."""

from __future__ import annotations

import os

import jax

_DONE = False


def setup(cache_dir: str = "/root/.jax_cache",
          matmul_precision: str = "highest") -> None:
    """Configure JAX for production runs:

    * persistent compilation cache — TPU compiles through this
      environment's remote-compile tunnel take minutes; the cache makes
      re-runs near-instant;
    * float32 matmul precision — pose chains drift visibly at the TPU's
      default bf16 matmul precision (heavy einsums set their own precision
      explicitly, so this costs nothing on the hot path).
    """
    global _DONE
    if _DONE:
        return
    _DONE = True
    # This image's sitecustomize pins jax_platforms="axon,cpu" (the TPU
    # tunnel) regardless of the JAX_PLATFORMS env var; re-assert the user's
    # choice so `JAX_PLATFORMS=cpu python -m octree_slam_tpu.app ...` works.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    # Persistent cache only off-CPU: it exists for the remote-TPU tunnel,
    # where compiles take minutes. CPU compiles are fast AND the XLA:CPU
    # AOT loader is unsafe across compile flavors — an executable cached
    # by an ahead-of-time .lower().compile() (app.precompile_step) carries
    # different target machine features than jit-path entries, and
    # deserializing it in a later process warns about the mismatch and can
    # segfault inside compilation_cache.get_executable_and_time (observed
    # under tests/). Keying the cache off on CPU removes both the write
    # and the read side of that hazard.
    try:
        if jax.default_backend() != "cpu":
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
    except Exception:
        pass  # cache is best-effort
