"""Test configuration: run everything on a virtual 8-device CPU mesh.

Benchmarks (bench.py) run on the real TPU chip; unit/property tests run on
CPU with 8 fake devices so multi-chip sharding code paths are exercised
without hardware (SURVEY.md section 4).

Note: this image's sitecustomize registers the 'axon' TPU backend and forces
jax_platforms="axon,cpu", so the JAX_PLATFORMS env var alone is not enough —
we must override via jax.config before any backend initializes, otherwise
every eager op round-trips through the TPU tunnel (~0.5s/op).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU has segfaulted three times inside backend_compile_and_load
    late in full single-process suite runs (~test 160+, different tests
    each time; both alphabetical halves pass, `-n 2 --dist loadfile`
    passes) — a cumulative-state compiler flake in jaxlib, not a repo
    regression. Dropping the accumulated executables between modules keeps
    the per-process program count bounded. Costs some recompiles; module-
    level jit caches (app._step_cache) stay correct — a cleared jit simply
    recompiles on next use."""
    yield
    import jax
    jax.clear_caches()
