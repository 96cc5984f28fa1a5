"""Gather microbenchmark: what does a random gather actually cost on this
TPU, as a function of (lanes N, table size M, dtype, index shape)?

The hybrid band march is gather-bound (BASELINE.md round-4): per-trip cost
measured ~0.28 ms flat + ~25 ns/lane at i32 from the 536 MB leaf mip, and
the K-crawl batching (one (C, K) gather per trip) was a measured WASH —
which together say the cost is NOT per-kernel overhead. This pins down the
per-element price and its scaling so march designs can be costed on paper:
  * N x 1 i32 gathers from tables of 256 KB / 10 MB / 536 MB
  * (N, 4) batched gather vs 4 separate N gathers (the crawl shape)
  * u8 vs i32 element type
  * sequential (coalesced) vs random indices

Run (real TPU): python examples/gather_microbench.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()

import jax
import jax.numpy as jnp

from octree_slam_tpu.utils.timing import sync


def sync_floor(n=8):
    f = jax.jit(lambda x: x + 1)
    x = f(jnp.zeros((8, 128), jnp.float32))
    sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        sync(x)
    return (time.perf_counter() - t0) / n


def bench(fn, *args, reps=10):
    g = jax.jit(fn)
    out = g(*args)
    sync(out)
    fl = sync_floor()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(*args)
    sync(out)
    return (time.perf_counter() - t0 - fl) / reps


def main():
    rng = np.random.default_rng(0)
    results = []

    # chain NG dependent gathers so one timed run amortizes dispatch the
    # way the march's while-loop does (each trip depends on the last)
    NG = 16

    def chained(table, idx):
        acc = jnp.zeros(idx.shape, table.dtype)
        for k in range(NG):
            v = table[(idx + acc.astype(idx.dtype)) % table.shape[0]]
            acc = acc + v
        return acc

    for M, mname in ((1 << 16, "256KB"), (1 << 21, "8MB"),
                     (1 << 27, "536MB")):
        table = jnp.asarray(rng.integers(0, 2, M, dtype=np.int32))
        for N in (19200, 76800, 307200):
            idx = jnp.asarray(rng.integers(0, M, N, dtype=np.int32))
            dt = bench(chained, table, idx)
            per = dt / NG
            results.append({
                "case": f"i32_{mname}_N{N}", "ms_per_gather":
                round(per * 1e3, 3),
                "ns_per_elem": round(per / N * 1e9, 2)})
            print(json.dumps(results[-1]), flush=True)

    # coalesced vs random at the big table
    M = 1 << 27
    table = jnp.asarray(rng.integers(0, 2, M, dtype=np.int32))
    N = 76800
    idx_seq = jnp.arange(N, dtype=jnp.int32) + 12345
    dt = bench(chained, table, idx_seq)
    results.append({"case": "i32_536MB_N76800_sequential",
                    "ms_per_gather": round(dt / NG * 1e3, 3),
                    "ns_per_elem": round(dt / NG / N * 1e9, 2)})
    print(json.dumps(results[-1]), flush=True)

    # u8 table
    t8 = jnp.asarray(rng.integers(0, 2, M, dtype=np.uint8))

    def chained8(table, idx):
        acc = jnp.zeros(idx.shape, jnp.int32)
        for k in range(NG):
            v = table[(idx + acc) % table.shape[0]]
            acc = acc + v.astype(jnp.int32)
        return acc

    idx = jnp.asarray(rng.integers(0, M, N, dtype=np.int32))
    dt = bench(chained8, t8, idx)
    results.append({"case": "u8_536MB_N76800",
                    "ms_per_gather": round(dt / NG * 1e3, 3),
                    "ns_per_elem": round(dt / NG / N * 1e9, 2)})
    print(json.dumps(results[-1]), flush=True)

    # (N, 4) one batched gather vs 4 chained N-gathers (crawl shape): the
    # batched indices are NOT dependent, so compare against 4 independent
    # gathers too
    def batched4(table, idx4):
        acc = jnp.zeros(idx4.shape, table.dtype)
        for k in range(NG):
            v = table[(idx4 + acc) % table.shape[0]]
            acc = acc + v
        return acc

    idx4 = jnp.asarray(rng.integers(0, M, (N, 4), dtype=np.int32))
    dt = bench(batched4, table, idx4)
    results.append({"case": "i32_536MB_N76800x4_batched",
                    "ms_per_gather": round(dt / NG * 1e3, 3),
                    "ns_per_elem": round(dt / NG / (N * 4) * 1e9, 2)})
    print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"config": "gather_microbench", "rows": results}),
          flush=True)


if __name__ == "__main__":
    main()
