"""Calibrate chip peaks and isolate the slow-gather effect."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # peak matmul (bf16): 4096^3 = 137 GFLOP
    a = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
    dt = timeit("matmul 4096^3 bf16", jax.jit(
        lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)), a, b)
    print(f"    -> {2 * 4096**3 / dt / 1e12:.1f} TFLOP/s", flush=True)

    # HBM copy bandwidth: 256MB read+write
    big = jnp.asarray(rng.normal(size=(64 * 1024 * 1024,)), jnp.float32)
    dt = timeit("copy 256MB (x+1)", jax.jit(lambda x: x + 1.0), big)
    print(f"    -> {2 * big.size * 4 / dt / 1e9:.0f} GB/s", flush=True)

    N = 307200
    M = 1 << 20
    table = jnp.asarray(rng.integers(0, 2**31 - 1, M), jnp.int32)
    idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)

    # bare gather, more reps
    timeit("bare gather 307k (n=50)", jax.jit(lambda t, i: t[i]), table, idx, n=50)

    # gather with computed indices (forces fusion of producer)
    timeit("gather with computed idx (i*5+3)%M",
           jax.jit(lambda t, i: t[(i * 5 + 3) % M]), table, idx, n=10)

    # gather then elementwise consumer
    timeit("gather + consumer (tanh)",
           jax.jit(lambda t, i: jnp.tanh(t[i].astype(jnp.float32))), table, idx, n=10)

    # gather with barrier around indices and result
    def barriered(t, i):
        i2 = jax.lax.optimization_barrier((i * 5 + 3) % M)
        g = jax.lax.optimization_barrier(t[i2])
        return jnp.tanh(g.astype(jnp.float32))
    timeit("barriered computed gather + consumer", jax.jit(barriered), table, idx)

    # chained gathers, barriered
    def chained_barrier(t, i):
        cur = i
        for _ in range(9):
            g = t[cur]
            g = jax.lax.optimization_barrier(g)
            cur = (g & (M - 1)).astype(jnp.int32)
            cur = jax.lax.optimization_barrier(cur)
        return cur
    timeit("9 chained gathers barriered", jax.jit(chained_barrier), table, idx)

    def chained_plain(t, i):
        cur = i
        for _ in range(9):
            cur = (t[cur] & (M - 1)).astype(jnp.int32)
        return cur
    timeit("9 chained gathers plain", jax.jit(chained_plain), table, idx)

    # elementwise chain like morton encode
    pts = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)

    def morton_like(p):
        c = jnp.zeros_like(p)
        e = jnp.float32(1.0)
        key = jnp.zeros((N,), jnp.int32)
        for _ in range(9):
            e = e * 0.5
            gt = p > c
            octant = gt[:, 0] * 1 + gt[:, 1] * 2 + gt[:, 2] * 4
            key = (key << 3) | octant.astype(jnp.int32)
            c = c + jnp.where(gt, e, -e)
        return key
    timeit("morton-like elementwise chain", jax.jit(morton_like), pts)

    # scatter drop-mode vs clip-mode
    vals = jnp.asarray(rng.integers(0, 2**31 - 1, N), jnp.int32)
    buf = jnp.zeros((M,), jnp.int32)
    idx_oob = jnp.where(idx % 7 == 0, M, idx)
    timeit("scatter-set drop mode (some OOB)",
           jax.jit(lambda b, i, v: b.at[i].set(v, mode="drop")), buf, idx_oob, vals)
    timeit("scatter-set clip mode",
           jax.jit(lambda b, i, v: b.at[i].set(v, mode="clip")), buf, idx, vals)
    timeit("scatter-add 307k->307k (segsum-like)",
           jax.jit(lambda b, i, v: b.at[i % N].add(v)),
           jnp.zeros((N,), jnp.int32), idx, vals)


if __name__ == "__main__":
    main()
