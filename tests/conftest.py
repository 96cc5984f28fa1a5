"""Test configuration: run everything on a virtual 8-device CPU mesh.

Benchmarks (bench.py) run on the real TPU chip; unit/property tests run on
CPU with 8 fake devices so multi-chip sharding code paths are exercised
without hardware (SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
