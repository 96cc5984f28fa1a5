"""Raw TPU primitive throughput: gather, scatter, sort, segment ops.

Grounds the design of the map/render kernels: octree traversal is
gather-bound, fusion is sort/scatter-bound. Iterations are chained (each
input depends on the previous output) and synced by host fetch —
block_until_ready is unreliable on the axon platform (utils.timing.sync).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.utils import runtime
runtime.setup()
from octree_slam_tpu.utils.timing import sync

SYNC_MS = None


def timeit(name, step, state0, n=8, per=1):
    """step(state) -> state' (same structure). Reports (mean - sync floor)."""
    state = step(state0)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(state)
        sync(state)
    dt = (time.perf_counter() - t0) / n
    ms = dt * 1e3 - (SYNC_MS or 0.0)
    print(f"{name:46s} {ms / per:9.3f} ms", flush=True)
    return ms / per


def main():
    global SYNC_MS
    rng = np.random.default_rng(0)
    N = 307_200

    # calibrate the sync floor (tiny jit + fetch round trip)
    tiny = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8, 128), jnp.float32)
    x0 = tiny(x0); sync(x0)
    t0 = time.perf_counter()
    for _ in range(10):
        x0 = tiny(x0); sync(x0)
    SYNC_MS = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{'sync floor (subtracted below)':46s} {SYNC_MS:9.3f} ms",
          flush=True)

    idx0 = jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32)

    for logM in (12, 16, 20, 24):
        M = 1 << logM
        table = jnp.asarray(rng.integers(0, 2**31, M), jnp.int32)

        @jax.jit
        def g(i):
            i = i & (M - 1)
            return table[i] ^ i  # output feeds next iteration's indices
        timeit(f"gather N=307k from M=2^{logM}", g, idx0)

    M = 1 << 20
    table = jnp.asarray(rng.integers(0, 2**31, M), jnp.int32)

    @jax.jit
    def g_sorted(i):
        s = jnp.sort(i & (M - 1))
        return table[s] ^ s
    timeit("sort + gather 307k from 2^20", g_sorted, idx0)

    @jax.jit
    def chained10(i):
        for _ in range(10):
            i = table[i & (M - 1)] ^ i
        return i
    timeit("10 chained gathers 307k from 2^20 (per)", chained10, idx0,
           per=10)

    # scatter
    @jax.jit
    def sc_set(i):
        t = jnp.zeros((M,), jnp.int32)
        t = t.at[i & (M - 1)].set(i)
        return i ^ t[:N]
    timeit("zeros+scatter-set 307k into 2^20", sc_set, idx0)

    @jax.jit
    def sc_min(i):
        t = jnp.full((M,), np.int32(2**31 - 1), jnp.int32)
        t = t.at[i & (M - 1)].min(i)
        return i ^ t[:N]
    timeit("full+scatter-min 307k into 2^20", sc_min, idx0)

    @jax.jit
    def sc_unique(i):
        # scatter with indices known unique+sorted (iota-based)
        base = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
        t = jnp.zeros((M,), jnp.int32)
        t = t.at[base * 3].set(i, unique_indices=True,
                               indices_are_sorted=True)
        return i ^ t[:N]
    timeit("scatter-set unique+sorted 307k into 2^20", sc_unique, idx0)

    # sort
    @jax.jit
    def s1(i):
        return jnp.sort(i) ^ i
    timeit("sort 307k i32", s1, idx0)

    @jax.jit
    def s2(i):
        k, v = jax.lax.sort_key_val(i, i * 2)
        return k ^ v
    timeit("sort_key_val 307k i32", s2, idx0)

    big = jnp.asarray(rng.integers(0, 2**31, 4 << 20), jnp.int32)

    @jax.jit
    def s3(i):
        return jnp.sort(i) ^ i
    timeit("sort 4M i32", s3, big)

    @jax.jit
    def s4(i):
        k, v, w = jax.lax.sort((i, i * 2, i * 3), num_keys=2)
        return k ^ v ^ w
    timeit("sort 2-key 4M i32", s4, big)

    # searchsorted (binary-search gathers)
    q = jnp.asarray(rng.integers(0, 2**31, N), jnp.int32)

    @jax.jit
    def ss(i):
        s = jnp.sort(big)
        p = jnp.searchsorted(s, i)
        return (p ^ i).astype(jnp.int32)
    timeit("sort4M + searchsorted 307k", ss, q)

    # segment ops over sorted segments
    seg_ids = jnp.sort(idx0 % 4096)

    @jax.jit
    def seg(i):
        r = jax.ops.segment_sum(i.astype(jnp.float32), seg_ids, 4096,
                                indices_are_sorted=True)
        return i ^ r.astype(jnp.int32)[seg_ids]
    timeit("segment_sum 307k -> 4096 (sorted ids)", seg, idx0)

    # cumsum (compaction backbone)
    @jax.jit
    def cs(i):
        return i ^ jnp.cumsum(i, dtype=jnp.int32)
    timeit("cumsum 307k i32", cs, idx0)

    # elementwise streaming floor: 24MB read+write
    stream = jnp.zeros((6 << 20,), jnp.float32)

    @jax.jit
    def ew(s):
        return s * 1.000001 + 1.0
    timeit("elementwise 6M f32 (24MB rw)", ew, stream)


if __name__ == "__main__":
    main()
