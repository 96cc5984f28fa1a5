"""Isolate: 64k-lane scatter into a donated 613 MB buffer (round-5
measured: plain 5.59 ms, through-cond 6.33, with-gather 6.72 — the
5.6 ms is the scatter primitive itself, not a cond/aliasing copy;
BASELINE.md round-5 floor table) — plain, vs
through a lax.cond (the pipeline heal wrapper), vs with a second
consumer of the pre-scatter buffer."""
import sys, time, json, functools
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
from octree_slam_tpu.utils import runtime
runtime.setup()
import numpy as np, jax, jax.numpy as jnp
from octree_slam_tpu.utils.timing import sync

N = 153391688  # total_cells(9)
U = 1 << 16
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.choice(N, U, replace=False).astype(np.int32))
val = jnp.asarray(rng.integers(0, 2**32, U, dtype=np.uint64).astype(np.uint32))

@functools.partial(jax.jit, donate_argnums=0)
def plain(buf, idx, val):
    return buf.at[idx].set(val, mode="drop", unique_indices=True)

@functools.partial(jax.jit, donate_argnums=0)
def through_cond(buf, idx, val, flag):
    buf = jax.lax.cond(flag, lambda b: b + jnp.uint32(1), lambda b: b, buf)
    return buf.at[idx].set(val, mode="drop", unique_indices=True)

@functools.partial(jax.jit, donate_argnums=0)
def with_gather(buf, idx, val):
    # mimic the step: the band march gathers from the POST-scatter buffer,
    # nothing reads the pre-scatter one
    out = buf.at[idx].set(val, mode="drop", unique_indices=True)
    s = out[idx].astype(jnp.uint32).sum()
    return out, s

def bench(f, *args, n=8):
    x = jnp.zeros((N,), jnp.uint32)
    r = f(x, *args)
    x2 = r[0] if isinstance(r, tuple) else r
    sync(x2 if not isinstance(x2, tuple) else x2[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(x2, *args)
        x2 = r[0] if isinstance(r, tuple) else r
        sync(x2)
    return (time.perf_counter() - t0) / n

fj = jax.jit(lambda q: q + 1); q = fj(jnp.zeros((8,128))); sync(q)
t0 = time.perf_counter()
for _ in range(8): q = fj(q); sync(q)
floor = (time.perf_counter()-t0)/8

d1 = bench(plain, idx, val)
d2 = bench(through_cond, idx, val, jnp.bool_(False))
d3 = bench(with_gather, idx, val)
print(json.dumps({"floor_ms": round(floor*1e3,2),
                  "plain_scatter_ms": round((d1-floor)*1e3,2),
                  "through_cond_ms": round((d2-floor)*1e3,2),
                  "with_gather_ms": round((d3-floor)*1e3,2)}))
