"""Stateful fuzz: random op sequences on the SVO pool vs the NumPy oracle.

Each seed drives the same random interleaving of
  insert (blending, with unique-cap paging),
  insert_exact (value-verbatim, overwrite both ways),
  grow_capacity (pad within a prealloc tier), and
  reroot_double (volume doubling, [i, rest] -> [i, ~i, rest])
through both implementations and compares the full occupied-leaf set and
values after every mutation round — the interplay coverage the individual
suites can't give (e.g. exact-writes onto blended leaves across a
re-root, paging into a just-grown pool)."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import morton, svo

import oracle as orc


def rebuild_oracle_interiors(o: orc.OracleOctree) -> None:
    """Recompute every interior from the leaf dict with the mipmap rule
    (the oracle twin of svo.refresh_interior)."""
    leaves = {k: list(v) for (lv, k), v in o.values.items() if lv == o.depth}
    o.values = {}
    o.children = set()
    for k, v in leaves.items():
        for level in range(1, o.depth):
            p = k >> (3 * (o.depth - level))
            o.values.setdefault((level, p), o._init_value())
            o.children.add((level, p))
        o.values[(o.depth, k)] = v
    for level in range(o.depth - 1, 0, -1):
        for (lv, p) in [n for n in list(o.values) if n[0] == level]:
            kids = [o.values.get((level + 1, (p << 3) | i),
                                 o._init_value()) for i in range(8)]
            occ = [v for v in kids if v[3] > 127]
            rgb = ([sum(v[i] for v in occ) / len(occ) for i in range(3)]
                   if occ else [0.0, 0.0, 0.0])
            o.values[(level, p)] = [int(rgb[0]), int(rgb[1]), int(rgb[2]),
                                    max(v[3] for v in kids)]


def oracle_insert_exact(o: orc.OracleOctree, keys, vals, overwrite):
    for k, v in zip(keys, vals):
        k = int(k)
        leaf = (o.depth, k)
        cur = o.values.get(leaf)
        fresh = cur is None or cur == o._init_value()
        for level in range(1, o.depth):
            p = k >> (3 * (o.depth - level))
            o.values.setdefault((level, p), o._init_value())
            o.children.add((level, p))
        if overwrite or fresh:
            r, g, b, a = [int(x) for x in packing.unpack_rgba8(
                jnp.uint32(int(v)))]
            o.values[leaf] = [r, g, b, a]
        else:
            o.values.setdefault(leaf, cur if cur is not None
                                else o._init_value())
    rebuild_oracle_interiors(o)


def oracle_reroot(o: orc.OracleOctree) -> None:
    d = o.depth
    low = (1 << (3 * (d - 1))) - 1
    leaves = {}
    for (lv, k), v in o.values.items():
        if lv != d:
            continue
        i1 = k >> (3 * (d - 1))
        leaves[(i1 << (3 * d)) | ((i1 ^ 7) << (3 * (d - 1))) | (k & low)] \
            = list(v)
    o.depth = d + 1
    o.half_size *= 2.0
    o.values = {(o.depth, k): v for k, v in leaves.items()}
    rebuild_oracle_interiors(o)


def paged_insert(pool, pts, cols, depth, cap):
    pool, st = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols),
                          depth=depth, unique_cap=cap)
    while bool(st.unique_overflow):
        pool, st = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols),
                              depth=depth, unique_cap=cap,
                              min_key=st.last_key)
    return pool


def svo_leaf_dict(pool, depth):
    p = svo.refresh_interior(pool, depth=depth)
    ex, _ = svo.extract_all_leaves(p, depth=depth, start_capacity=1 << 13)
    n = int(ex.count)
    nodes = np.asarray(ex.nodes[:n])
    keys = np.asarray(ex.keys[:n])
    vals = np.asarray(p.value)[np.maximum(nodes, 0)]
    live = nodes >= 0
    return dict(zip(keys[live].tolist(), vals[live].tolist()))


def compare(pool, depth, o: orc.OracleOctree, ctx):
    got = svo_leaf_dict(pool, depth)
    want = o.occupied_leaves()
    assert set(got) == set(want), (
        f"{ctx}: leaf sets differ: only-svo="
        f"{sorted(set(got) - set(want))[:5]} only-oracle="
        f"{sorted(set(want) - set(got))[:5]}")
    for k, v in got.items():
        r, g, b, a = [int(x) for x in packing.unpack_rgba8(jnp.uint32(v))]
        ov = want[k]
        assert a == ov[3], (ctx, k, a, ov)
        for i, c in enumerate((r, g, b)):
            # oracle blends in float64 and truncates; +-1 rounding slack
            assert abs(c - ov[i]) <= 1, (ctx, k, (r, g, b), ov)


def ensure_headroom(pool, n_new, depth):
    """Proactive growth like the production loops: a silent capacity
    overflow drops leaves by design (flagged), which the oracle does not
    model — the fuzz exercises growth via this path instead."""
    need = 8 * n_new * max(1, depth - svo.prealloc_levels(pool.capacity))
    while pool.capacity - int(pool.n_nodes) < need:
        pool = svo.grow_capacity(pool, pool.capacity * 2)
    return pool


def run_fuzz(seed, n_rounds=10):
    rng = np.random.default_rng(seed)
    depth = 5
    pool = svo.create(1 << 14, jnp.zeros(3), 1.0)
    o = orc.OracleOctree((0.0, 0.0, 0.0), 1.0, depth)
    reroots = 0
    for step in range(n_rounds):
        op = rng.choice(["insert", "insert", "exact", "grow", "reroot"])
        if op == "insert":
            n = int(rng.integers(50, 600))
            pts = rng.uniform(-0.9 * float(pool.half_size),
                              0.9 * float(pool.half_size),
                              (n, 3)).astype(np.float32)
            cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
            pool = ensure_headroom(pool, n, depth)
            pool = paged_insert(pool, pts, cols, depth, cap=256)
            o.insert(pts, cols)
        elif op == "exact":
            n = int(rng.integers(5, 120))
            pts = rng.uniform(-0.9 * float(pool.half_size),
                              0.9 * float(pool.half_size),
                              (n, 3)).astype(np.float32)
            keys, ok = morton.encode(jnp.asarray(pts), pool.center,
                                     pool.half_size, depth)
            keys = np.unique(np.asarray(keys)[np.asarray(ok)])
            vals = rng.integers(0, 1 << 24, keys.size).astype(np.uint32) \
                | (rng.integers(120, 256, keys.size).astype(np.uint32) << 24)
            overwrite = bool(rng.integers(0, 2))
            pool = ensure_headroom(pool, int(keys.size), depth)
            # n <= 120 distinct keys < unique_cap: single pass suffices
            pool, _ = svo.insert_exact(
                pool, jnp.asarray(keys.astype(np.int32)),
                jnp.asarray(vals), depth=depth, unique_cap=256,
                overwrite=overwrite)
            oracle_insert_exact(o, keys, vals, overwrite)
        elif op == "grow":
            if pool.capacity < 1 << 18 and (
                    svo.prealloc_levels(pool.capacity * 2)
                    == svo.prealloc_levels(pool.capacity)):
                pool = svo.grow_capacity(pool, pool.capacity * 2)
        elif op == "reroot":
            if reroots < 2 and depth < 7:
                if int(pool.n_nodes) + (8 ** svo.prealloc_levels(
                        pool.capacity)) > pool.capacity:
                    pool = svo.grow_capacity(pool, pool.capacity * 2)
                pool = svo.reroot_double(pool)
                assert not bool(pool.overflowed)
                depth += 1
                reroots += 1
                oracle_reroot(o)
        compare(pool, depth, o, ctx=f"seed={seed} step={step} op={op}")


class TestFuzzMap:
    def test_seed_0(self):
        run_fuzz(0)

    def test_seed_1(self):
        run_fuzz(1)

    def test_seed_2(self):
        run_fuzz(2)
