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
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is best-effort
