"""Trustworthy timing: vary inputs per call / chain dependencies."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(name, fn, x0, n=10):
    """fn must map x -> x-like. Chain outputs so no call can be cached."""
    x = jax.block_until_ready(fn(x0))
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def timeit_varied(name, fn, args_list):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    for a in args_list[1:]:
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (len(args_list) - 1)
    print(f"{name:52s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # matmul, chained: x = normalize(x @ w)
    w = jnp.asarray(rng.normal(size=(4096, 4096)) * 0.01, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
    f = jax.jit(lambda x: (jnp.dot(x, w, preferred_element_type=jnp.float32)
                           .astype(jnp.bfloat16)))
    dt = timeit_chained("matmul 4096^3 bf16 chained", f, x0)
    print(f"    -> {2 * 4096**3 / dt / 1e12:.1f} TFLOP/s", flush=True)

    # copy chained
    big0 = jnp.asarray(rng.normal(size=(64 * 1024 * 1024,)), jnp.float32)
    dt = timeit_chained("copy 256MB chained (x*1.0001+1)",
                        jax.jit(lambda x: x * 1.0001 + 1.0), big0)
    print(f"    -> {2 * big0.size * 4 / dt / 1e9:.0f} GB/s", flush=True)

    N = 307200
    M = 1 << 20
    table = jnp.asarray(rng.integers(0, 2**31 - 1, M), jnp.int32)

    # gather, chained via indices
    idx0 = jnp.asarray(rng.integers(0, M, N), jnp.int32)
    dt = timeit_chained("gather 307k chained", jax.jit(
        lambda i: (table[i] & (M - 1)).astype(jnp.int32)), idx0)
    print(f"    -> {N / dt / 1e6:.1f} M gathers/s", flush=True)

    # 9-level chained descent per call, chained across calls
    def descend(i):
        cur = i
        for _ in range(9):
            cur = (table[cur] & (M - 1)).astype(jnp.int32)
        return cur
    dt = timeit_chained("9-level descent chained", jax.jit(descend), idx0)
    print(f"    -> {9 * N / dt / 1e6:.1f} M gathers/s", flush=True)

    # scatter chained
    def scat(b):
        i = (b[:N] & (M - 1)).astype(jnp.int32)
        return b.at[i].set(b[:N] + 1)
    buf0 = jnp.asarray(rng.integers(0, 2**31 - 1, M), jnp.int32)
    timeit_chained("scatter 307k chained", jax.jit(scat), buf0)

    # sort chained
    def srt(k):
        return jnp.sort(k ^ 12345)
    keys0 = jnp.asarray(rng.integers(0, 2**30, N), jnp.int32)
    timeit_chained("sort 307k chained", jax.jit(srt), keys0)

    # elementwise chained (morton-like)
    def morton_like(p):
        c = jnp.zeros_like(p)
        e = jnp.float32(1.0)
        key = jnp.zeros((p.shape[0],), jnp.int32)
        for _ in range(9):
            e = e * 0.5
            gt = p > c
            octant = gt[:, 0] * 1 + gt[:, 1] * 2 + gt[:, 2] * 4
            key = (key << 3) | octant.astype(jnp.int32)
            c = c + jnp.where(gt, e, -e)
        return p * 0.999 + key[:, None].astype(jnp.float32) * 1e-9
    pts0 = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
    timeit_chained("morton-like chain chained", jax.jit(morton_like), pts0)

    # while_loop overhead: trivial body, 32 iterations
    def wl(x):
        def body(s):
            i, v = s
            return i + 1, v * 1.0001
        def cond(s):
            return s[0] < 32
        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1]
    small0 = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    dt = timeit_chained("while_loop 32 trivial iters chained", jax.jit(wl), small0)
    print(f"    -> {dt / 32 * 1e3:.3f} ms per iteration", flush=True)

    def fl(x):
        def body(i, v):
            return v * 1.0001
        return jax.lax.fori_loop(0, 32, body, x)
    timeit_chained("fori_loop 32 trivial iters chained", jax.jit(fl), small0)


if __name__ == "__main__":
    main()
