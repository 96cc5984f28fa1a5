"""Stage timing (startTiming/stopTiming analog, timing_utils.cu:11-32).

The reference brackets CUDA kernels with cudaEvent pairs; here a Timer
blocks on the given JAX arrays to close the async-dispatch window, and a
StageStats registry accumulates per-stage wall times for structured logs
(SURVEY.md section 5 observability). For deep kernel analysis use
jax.profiler.trace around the step.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp

import numpy as np


@jax.jit
def _probe(*leaves):
    """First element of every leaf as one tiny vector: fetching it forces
    every producing computation with ONE host round trip."""
    return jnp.stack([x.ravel()[0].astype(jnp.float32) for x in leaves])


def sync(*arrays) -> None:
    """Force completion of `arrays` and everything they depend on.

    jax.block_until_ready is NOT reliable on the axon remote-TPU platform
    (it returns immediately while the computation is still queued — measured
    in examples/bisect_slow.py); fetching bytes to host is. All leaves are
    probed through ONE jitted gather + ONE fetch: per-leaf fetches each pay
    a full serialized tunnel round trip (~30 ms), which made pytree syncs
    cost n_leaves x RTT and wildly inflated stage timings.
    Use this, never bare block_until_ready, around anything timed.
    """
    leaves = [x for a in arrays for x in jax.tree_util.tree_leaves(a)
              if hasattr(x, "ravel") and getattr(x, "size", 0)]
    if not leaves:
        return
    np.asarray(_probe(*leaves))


class StageStats:
    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, *block_on):
        t0 = time.perf_counter()
        yield
        if block_on:
            sync(*block_on)
        dt = time.perf_counter() - t0
        self.total[name] += dt
        self.count[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self.count[name]
        return 1000.0 * self.total[name] / c if c else 0.0

    def report(self) -> Dict[str, float]:
        return {k: round(self.mean_ms(k), 3) for k in sorted(self.total)}


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace wrapper for TPU timeline capture."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
