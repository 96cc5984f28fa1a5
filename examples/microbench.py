"""Raw TPU primitive throughput: gather, scatter, sort, segment_sum.

Grounds the design of the map/render kernels: octree traversal is
gather-bound, fusion is sort/scatter-bound.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    N = 307200

    for M in (1 << 14, 1 << 17, 1 << 20):
        table = jnp.asarray(rng.integers(0, 2**31, M), jnp.int32)
        idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        dt = timeit(f"gather N=307k from M=2^{int(np.log2(M))}", f, table, idx)
        print(f"    -> {N / dt / 1e6:.1f} M gathers/s")

    M = 1 << 20
    table = jnp.asarray(rng.integers(0, 2**31, M), jnp.int32)
    idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)
    idx_sorted = jnp.sort(idx)
    f = jax.jit(lambda t, i: t[i])
    timeit("gather 307k SORTED idx from 2^20", f, table, idx_sorted)

    # 10 chained gathers (descent analog: index depends on previous)
    def chained(t, i):
        cur = i
        for _ in range(10):
            cur = (t[cur] & (M - 1)).astype(jnp.int32)
        return cur
    timeit("10 chained gathers 307k from 2^20", jax.jit(chained), table, idx)

    # scatter-set / scatter-min
    vals = jnp.asarray(rng.integers(0, 2**31, N), jnp.int32)
    buf = jnp.zeros((M,), jnp.int32)
    timeit("scatter-set 307k into 2^20",
           jax.jit(lambda b, i, v: b.at[i].set(v)), buf, idx, vals)
    timeit("scatter-min 307k into 2^20",
           jax.jit(lambda b, i, v: b.at[i].min(v)), buf, idx, vals)

    # sort / argsort
    keys = jnp.asarray(rng.integers(0, 2**30, N), jnp.int32)
    timeit("sort 307k i32", jax.jit(jnp.sort), keys)
    timeit("argsort 307k i32", jax.jit(jnp.argsort), keys)
    payload = jnp.asarray(rng.integers(0, 100, N), jnp.int32)
    timeit("sort_key_val 307k i32",
           jax.jit(lambda k, v: jax.lax.sort_key_val(k, v)), keys, payload)

    # segment_sum
    seg = jnp.sort(idx % 4096)
    valsf = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
    timeit("segment_sum 307k x3 -> 307k segs",
           jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=N)),
           valsf, seg)

    # cumsum
    timeit("cumsum 307k i32", jax.jit(jnp.cumsum), payload)

    # one-hot matmul gather (MXU trick) from 2^14 table
    Msm = 1 << 14
    tab_f = jnp.asarray(rng.uniform(size=(Msm,)), jnp.float32)
    idx_sm = jnp.asarray(rng.integers(0, Msm, N), jnp.int32)

    def onehot_gather(t, i):
        oh = jax.nn.one_hot(i, Msm, dtype=jnp.bfloat16)
        return oh @ t.astype(jnp.bfloat16)
    timeit("one-hot matmul gather 307k from 2^14",
           jax.jit(onehot_gather), tab_f, idx_sm)

    # elementwise baseline
    big = jnp.asarray(rng.uniform(size=(N, 32)), jnp.float32)
    timeit("elementwise 307k x32 x10ops",
           jax.jit(lambda x: jnp.tanh(x * 1.1 + 0.3) * x), big)


if __name__ == "__main__":
    main()
