"""Stamp/scatter formulation A/B on the real TPU (round-5 measured:
A 16.35 ms / B 16.17 / C 11.88, bit-equal — the separate-leaf-array
formulation saves ~4.5 ms but no formulation reaches the ~3 ms
bandwidth bound; BASELINE.md round-5 floor table):
A) current encode_free_dist (dynamic_slice + dynamic_update_slice on the
   613MB unified mirror) + 64k-lane scatter into the unified mirror
B) static-slice variants of the same
C) separate donated 537MB leaf-only array (no slicing)
"""
import sys, time, json
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
from octree_slam_tpu.utils import runtime
runtime.setup()
import numpy as np, jax, jax.numpy as jnp, functools
from octree_slam_tpu.map import mips
from octree_slam_tpu.core import packing
from octree_slam_tpu.utils.timing import sync

D, LVL = 9, 6
g = 1 << LVL
total = mips.total_cells(D)
lo = mips.level_offset(D)
hi = mips.level_offset(D + 1)
n_leaf = hi - lo
per_cell = 1 << (3 * (D - LVL))
U = 1 << 16

rng = np.random.default_rng(0)
vals_np = np.zeros(total, np.uint32)
occ_idx = rng.choice(n_leaf, 80000, replace=False)
vals_np[lo + occ_idx] = 0xFF00FF00  # alpha 255 occupied
values = jnp.asarray(vals_np)
dist = jnp.asarray(rng.integers(0, 15, g*g*g).astype(np.int32))
ip = jnp.asarray(mips._xyz_of_morton_perm(LVL))
sc_idx = jnp.asarray(lo + rng.choice(n_leaf, U, replace=False).astype(np.int32))
sc_val = jnp.asarray(rng.integers(0, 2**32, U, dtype=np.uint64).astype(np.uint32))

@functools.partial(jax.jit, donate_argnums=0)
def variant_a(values, dist, sc_idx, sc_val):
    values = values.at[sc_idx].set(sc_val, mode="drop", unique_indices=True)
    leaf_vals = jax.lax.dynamic_slice(values, (lo,), (n_leaf,))
    dist_m = dist[ip].astype(jnp.uint32)
    lv = leaf_vals.reshape(g*g*g, per_cell)
    enc = jnp.where(packing.is_occupied(lv), lv, dist_m[:, None])
    return jax.lax.dynamic_update_slice(values, enc.reshape(-1), (lo,))

@functools.partial(jax.jit, donate_argnums=0)
def variant_b(values, dist, sc_idx, sc_val):
    values = values.at[sc_idx].set(sc_val, mode="drop", unique_indices=True)
    lv = values[lo:hi].reshape(g*g*g, per_cell)
    dist_m = dist[ip].astype(jnp.uint32)
    enc = jnp.where(packing.is_occupied(lv), lv, dist_m[:, None])
    return values.at[lo:hi].set(enc.reshape(-1))

@functools.partial(jax.jit, donate_argnums=0)
def variant_c(leaf, dist, sc_idx_leaf, sc_val):
    leaf = leaf.at[sc_idx_leaf].set(sc_val, mode="drop", unique_indices=True)
    dist_m = dist[ip].astype(jnp.uint32)
    lv = leaf.reshape(g*g*g, per_cell)
    enc = jnp.where(packing.is_occupied(lv), lv, dist_m[:, None])
    return enc.reshape(-1)

def bench(f, x0, *args, n=8):
    x = f(x0, *args); sync(x)
    floor_t = []
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x, *args)
        sync(x)
    dt = (time.perf_counter() - t0) / n
    return dt, x

fj = jax.jit(lambda q: q + 1)
q = fj(jnp.zeros((8,128))); sync(q)
t0 = time.perf_counter()
for _ in range(8):
    q = fj(q); sync(q)
floor = (time.perf_counter() - t0) / 8

dt_a, _ = bench(variant_a, jnp.asarray(vals_np), dist, sc_idx, sc_val)
dt_b, _ = bench(variant_b, jnp.asarray(vals_np), dist, sc_idx, sc_val)
leaf0 = jnp.asarray(vals_np[lo:hi])
dt_c, _ = bench(variant_c, leaf0, dist, sc_idx - lo, sc_val)

# correctness cross-check (fresh buffers)
ra = np.asarray(variant_a(jnp.asarray(vals_np), dist, sc_idx, sc_val))
rb = np.asarray(variant_b(jnp.asarray(vals_np), dist, sc_idx, sc_val))
rc = np.asarray(variant_c(jnp.asarray(vals_np[lo:hi]), dist, sc_idx - lo, sc_val))
ok = bool(np.array_equal(ra, rb) and np.array_equal(ra[lo:hi], rc))
print(json.dumps({"floor_ms": round(floor*1e3,2),
  "A_dynslice_unified_ms": round((dt_a-floor)*1e3,2),
  "B_staticslice_unified_ms": round((dt_b-floor)*1e3,2),
  "C_separate_leaf_ms": round((dt_c-floor)*1e3,2),
  "bit_equal": ok}))
