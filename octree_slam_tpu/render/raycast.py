"""Voxel cone tracing over the SVO node pool.

TPU-native rebuild of the CUDA cone tracer
(src/rendering/cone_tracing_kernels.cu). The reference's host loop —
relaunch kernel + thrust::remove_if stream compaction of live rays until
none remain (coneTraceSVO, cone_tracing_kernels.cu:183-189) — becomes a
lax.while_loop with an active-ray mask: all lanes march together and the
loop exits when every ray saturated or left the volume (SURVEY.md section 7
step 5: all-lanes-march replaces compaction).

Per-step semantics follow coneTrace (cone_tracing_kernels.cu:53-146):
  * cone LOD: target depth = ceil(log2(oct_size / pix_size)) from the pixel
    footprint pix_size = ray_len * pix_scale (:68-69);
  * stackless root-down descent, early-out at a childless node (:76-103);
  * front-to-back accumulation with alpha = max(0, node_alpha - 127) and
    rgb += (alpha/127) * node_rgb, terminating when accumulated alpha
    saturates 127 (:106-122);
  * step length = node half-size at the reached depth (:126-129);
  * rays past MAX_RANGE get their color rescaled by 127/w and finish (:131-139).

Perf design (v5e: random gather ~100M elem/s is the binding constraint):
  * octant digits come from integer leaf-grid coordinates (pure bit math) —
    no per-level floating-point center updates;
  * an optional dense ENTRY GRID caches the node index + depth of the
    deepest existing ancestor at a fixed level L for every L-level cell,
    cutting the per-step descent from max_depth gathers to
    1 + (max_depth - L). Child pointers are write-once, so the grid only
    needs rebuilding when an insert allocates tiles at depth <= L
    (InsertStats.shallow_allocs) — rare after warmup.

Divergences: accumulation is float32 (the reference adds into uint8 channels
which wrap on overflow, :110-112); with the entry grid, rays whose cone LOD
is shallower than L (pixel footprint > cell size, i.e. geometry beyond
~L-level cell x focal_length distance) sample at depth L instead of their
exact LOD.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from octree_slam_tpu.core import packing
from octree_slam_tpu.map.svo import SVONodePool


class AccelGrid(NamedTuple):
    """Dense per-cell entry points at a fixed octree level."""

    entry: jnp.ndarray  # i32[G^3] packed (node_idx << 4) | reached_depth

    @property
    def level(self) -> int:
        g3 = self.entry.shape[0]
        level = max(1, round((g3.bit_length() - 1) / 3))
        assert (1 << (3 * level)) == g3
        return level


@functools.partial(jax.jit, static_argnames=("level",))
def build_accel(pool: SVONodePool, *, level: int) -> AccelGrid:
    """Descend every level-L cell to its deepest existing ancestor."""
    g = 1 << level
    cap = pool.capacity
    lin = jnp.arange(g * g * g, dtype=jnp.int32)
    x = lin & (g - 1)
    y = (lin >> level) & (g - 1)
    z = lin >> (2 * level)

    def octant(l):
        s = level - l
        return (((x >> s) & 1) | (((y >> s) & 1) << 1)
                | (((z >> s) & 1) << 2))

    cur = octant(1)
    d = jnp.ones_like(cur)
    for l in range(1, level):
        tile = pool.child[cur]
        go = tile > 0
        cur = jnp.where(go, tile + octant(l + 1), cur)
        d = jnp.where(go, l + 1, d)
    return AccelGrid(entry=(jnp.minimum(cur, cap - 1) << 4) | d)


def make_rays(world_T_cam: jnp.ndarray, fx, fy, width: int, height: int
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel unit ray directions in world space (createRays,
    cone_tracing_kernels.cu:29-51, with proper per-camera focals instead of
    the hardcoded Kinect constants at :45-46).

    Returns (origin f32[3], dirs f32[H*W, 3])."""
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    d_cam = jnp.stack(
        [(x - width / 2.0) / fx, (height / 2.0 - y) / fy, jnp.ones_like(x)],
        axis=-1,
    ).reshape(-1, 3)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    R = world_T_cam[:3, :3]
    return world_T_cam[:3, 3], d_cam @ R.T


def _ray_box(origin: jnp.ndarray, dirs: jnp.ndarray, inv_dirs: jnp.ndarray,
             lo: jnp.ndarray, hi: jnp.ndarray):
    """Slab-method ray/AABB interval per ray: (t_enter f32[N], t_exit f32[N]).
    Axis-parallel rays outside the slab get an empty interval."""
    o = origin[None, :]
    ta = (lo[None, :] - o) * inv_dirs
    tb = (hi[None, :] - o) * inv_dirs
    par = jnp.abs(dirs) <= 1e-9
    inside = (o >= lo[None, :]) & (o <= hi[None, :])
    tmin = jnp.where(par, jnp.where(inside, -jnp.inf, jnp.inf),
                     jnp.minimum(ta, tb))
    tmax = jnp.where(par, jnp.where(inside, jnp.inf, -jnp.inf),
                     jnp.maximum(ta, tb))
    return jnp.max(tmin, axis=-1), jnp.min(tmax, axis=-1)


def _quantize(pool: SVONodePool, targets: jnp.ndarray, max_depth: int):
    """Integer leaf-grid coordinates of world points, clipped to the volume
    (boundary clamping matches the reference's unbounded octant walk)."""
    n_leaf = 1 << max_depth
    bbox0 = pool.center - pool.half_size
    cell = (2.0 * pool.half_size) / n_leaf
    q = jnp.floor((targets - bbox0) / cell).astype(jnp.int32)
    return jnp.clip(q, 0, n_leaf - 1)


def _octant_bits(q: jnp.ndarray, max_depth: int, level: int) -> jnp.ndarray:
    s = max_depth - level
    return (((q[:, 0] >> s) & 1) | (((q[:, 1] >> s) & 1) << 1)
            | (((q[:, 2] >> s) & 1) << 2))


def _descend(pool: SVONodePool, targets: jnp.ndarray, lod_depth: jnp.ndarray,
             max_depth: int, accel: AccelGrid | None, accel_level: int):
    """Vectorized stackless descent to min(lod, deepest existing node).
    Returns (value u32[N], reached i32[N])."""
    cap = pool.capacity
    q = _quantize(pool, targets, max_depth)

    if accel is not None:
        g = 1 << accel_level
        shift = max_depth - accel_level
        cx = q[:, 0] >> shift
        cy = q[:, 1] >> shift
        cz = q[:, 2] >> shift
        e = accel.entry[(cz << (2 * accel_level)) | (cy << accel_level) | cx]
        cur = e >> 4
        reached = e & 15
        start = accel_level
        going = (reached == accel_level) & (lod_depth > accel_level)
    else:
        cur = _octant_bits(q, max_depth, 1)
        reached = jnp.ones_like(cur)
        start = 1
        going = lod_depth > 1

    for level in range(start, max_depth):
        tile = pool.child[cur]
        go = going & (tile > 0)
        cur = jnp.where(go, tile + _octant_bits(q, max_depth, level + 1), cur)
        reached = jnp.where(go, level + 1, reached)
        going = go & (lod_depth > level + 1)
    return pool.value[jnp.minimum(cur, cap - 1)], reached


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "max_depth", "max_iters",
                     "accel_level"))
def cone_trace(pool: SVONodePool, world_T_cam: jnp.ndarray, fx, fy, *,
               width: int, height: int, max_depth: int,
               max_iters: int = 96, max_range: float = 10.0,
               start_dist: float = 0.002,
               accel: AccelGrid | None = None,
               accel_level: int = 6) -> jnp.ndarray:
    """Render the SVO map to an RGBA framebuffer.

    Returns f32[height, width, 4]: rgb in [0,1], alpha = accumulated opacity
    in [0,1] (255 = ray finished, mirroring the uchar4 PBO output).
    """
    origin, dirs = make_rays(world_T_cam, fx, fy, width, height)
    n = dirs.shape[0]
    pix_scale = 1.0 / fy  # per-pixel angular footprint (replaces :171)

    # clip rays to the octree volume (see cone_trace_dense)
    inv_dirs = jnp.where(jnp.abs(dirs) > 1e-9, 1.0 / dirs, jnp.inf)
    t0, t1 = _ray_box(origin, dirs, inv_dirs,
                      pool.center - pool.half_size,
                      pool.center + pool.half_size)
    miss = (t0 > t1) | (t1 < 0.0) | (t0 > max_range)
    start = jnp.maximum(start_dist, jnp.where(t0 > 0.0, t0 + 1e-4, 0.0))
    limit = jnp.minimum(jnp.float32(max_range), t1)

    state = dict(
        ray_len=jnp.where(miss, jnp.float32(max_range), start),
        rgb=jnp.zeros((n, 3), jnp.float32),
        w=jnp.where(miss, 255.0, 0.0),
        active=~miss,
        it=jnp.int32(0),
    )

    oct_size = pool.half_size

    def cond(s):
        return (s["it"] < max_iters) & jnp.any(s["active"])

    def body(s):
        ray_len = s["ray_len"]
        target = origin + dirs * ray_len[:, None]
        pix_size = ray_len * pix_scale
        lod = jnp.ceil(jnp.log2(jnp.maximum(oct_size / jnp.maximum(pix_size, 1e-9), 1.0)))
        lod = jnp.clip(lod.astype(jnp.int32), 1, max_depth)
        value, reached = _descend(pool, target, lod, max_depth,
                                  accel, accel_level)

        r, g, b, a = packing.unpack_rgba8(value)
        alpha = jnp.maximum(a - 127, 0).astype(jnp.float32)
        contrib = (alpha / 127.0)[:, None] * jnp.stack(
            [r, g, b], axis=-1).astype(jnp.float32)

        active = s["active"]
        rgb = jnp.where(active[:, None], s["rgb"] + contrib, s["rgb"])
        w_new = s["w"] + jnp.where(active, alpha, 0.0)

        # saturation: finish the ray at full opacity (:115-121)
        saturated = active & (w_new >= 127.0)
        w_out = jnp.where(saturated, 255.0, w_new)

        # march by the reached node's half-size (:126-129)
        step = oct_size / jnp.exp2(reached.astype(jnp.float32))
        ray_len = jnp.where(active, ray_len + step, ray_len)

        # out of range / out of volume: rescale color, finish (:131-139)
        oor = active & ~saturated & (ray_len > limit)
        scale = 127.0 / jnp.maximum(w_out, 1.0)
        rgb = jnp.where(oor[:, None], rgb * scale[:, None], rgb)
        w_out = jnp.where(oor, 255.0, w_out)

        return dict(
            ray_len=ray_len,
            rgb=rgb,
            w=w_out,
            active=active & ~saturated & ~oor,
            it=s["it"] + 1,
        )

    state = jax.lax.while_loop(cond, body, state)
    rgb = jnp.clip(state["rgb"], 0.0, 255.0) / 255.0
    a = jnp.clip(state["w"], 0.0, 255.0) / 255.0
    fb = jnp.concatenate([rgb, a[:, None]], axis=-1)
    return fb.reshape(height, width, 4)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "max_depth", "dist_level",
                     "max_iters", "max_skip", "debug_iters",
                     "compact_after", "compact_cap"))
def cone_trace_dense(cache, center: jnp.ndarray, half_size, world_T_cam,
                     fx, fy, *, width: int, height: int, max_depth: int,
                     dist_level: int = 6, max_iters: int = 48,
                     max_range: float = 10.0, start_dist: float = 0.002,
                     max_skip: int = 7, debug_iters: bool = False,
                     compact_after: int = 12,
                     compact_cap: int | None = None):
    """Cone trace the dense value-mip render cache (map/mips.py).

    Same accumulation semantics as cone_trace (coneTrace,
    cone_tracing_kernels.cu:53-146) but TWO gathers per step total — one
    distance-field lookup, one any-LOD value sample from the flat mip
    buffer — instead of a per-level pointer descent; empty space is crossed
    in (dist-1)-cell skips instead of node-sized steps. This is the
    kernel-count-bound design the v5e measurements demand (~0.5 ms per
    unfused gather regardless of size).

    Live-ray compaction (the reference's thrust::remove_if relaunch loop,
    cone_tracing_kernels.cu:157-198, as static-shape sort-compaction): the
    value/dist gathers are throughput-bound in the LANE count, but the
    all-lanes loop keeps paying full-frame cost for the shrinking minority
    of unfinished rays (grazers/misses — the march's tail, p99 ~87 trips).
    After `compact_after` all-lanes trips — continuing until the live count
    fits — the live rays are packed into `compact_cap` lanes (one stable
    sort + a few gathers), the tail marches at ~1/4 frame width, and the
    results scatter back. Per-lane step sequences are untouched, so the
    image is BIT-IDENTICAL to the uncompacted march (tests/test_mips.py);
    `compact_after=max_iters` disables. debug_iters implies uncompacted
    (the per-ray trip histogram wants full-frame lanes).
    """
    from octree_slam_tpu.map import mips as mips_mod

    origin, dirs = make_rays(world_T_cam, fx, fy, width, height)
    n = dirs.shape[0]
    pix_scale = 1.0 / fy

    depth_bits = max_depth
    n_leaf = 1 << max_depth
    bbox0 = center - half_size
    leaf_cell = (2.0 * half_size) / n_leaf
    g = 1 << dist_level
    cell_l = (2.0 * half_size) / g  # dist-grid cell edge
    oct_size = half_size

    linf = jnp.max(jnp.abs(dirs), axis=-1)
    inv_dirs = jnp.where(jnp.abs(dirs) > 1e-9, 1.0 / dirs, jnp.inf)

    # Ray/volume clipping: advance rays starting outside the octree to
    # their entry face; rays that miss the volume entirely finish with
    # zero alpha (a camera inside the map — the SLAM case — has
    # t_enter <= 0 and this is a no-op). Without this, the position
    # quantization clamps outside samples onto boundary cells.
    t0, t1 = _ray_box(origin, dirs, inv_dirs, center - half_size,
                      center + half_size)
    miss = (t0 > t1) | (t1 < 0.0) | (t0 > max_range)
    start = jnp.maximum(start_dist, jnp.where(t0 > 0.0, t0 + 1e-4, 0.0))
    # terminate where the ray leaves the volume, not only at max_range —
    # past t1 the quantization would clamp samples onto boundary cells
    limit = jnp.minimum(jnp.float32(max_range), t1)

    state = dict(
        ray_len=jnp.where(miss, jnp.float32(max_range), start),
        rgb=jnp.zeros((n, 3), jnp.float32),
        w=jnp.where(miss, 255.0, 0.0),
        active=~miss,
        it=jnp.int32(0),
    )

    shift_l = max_depth - dist_level

    def dist_at(q):
        cx = q[:, 0] >> shift_l
        cy = q[:, 1] >> shift_l
        cz = q[:, 2] >> shift_l
        return cache.dist[(cz << (2 * dist_level)) | (cy << dist_level) | cx]

    def quantize(pos):
        return jnp.clip(jnp.floor((pos - bbox0) / leaf_cell).astype(jnp.int32),
                        0, n_leaf - 1)

    def make_cell_exit(dirs_, inv_):
        def cell_exit(pos, q, shift, cell):
            corner = bbox0 + (q >> shift[:, None]).astype(jnp.float32) \
                * cell[:, None]
            t_axis = jnp.where(
                jnp.abs(dirs_) > 1e-9,
                jnp.where(dirs_ > 0,
                          (corner + cell[:, None] - pos),
                          (corner - pos)) * inv_,
                jnp.inf)  # axis-parallel rays never exit through this face
            return jnp.maximum(jnp.min(t_axis, axis=-1), 0.0)
        return cell_exit

    cell_exit = make_cell_exit(dirs, inv_dirs)

    # --- Phase 1: skip-only march (ONE gather per step, ~2ms vs ~7ms).
    # Advance rays through free space until every live ray either sits in
    # an occupied dist-cell or left the range. Free cells contribute zero
    # alpha, so this is exactly the work the full loop would do — at a
    # third of the per-iteration cost (the value gather never runs). ---
    eps = 0.05 * leaf_cell

    def skip_body(s):
        ray_len = s["ray_len"]
        pos = origin + dirs * ray_len[:, None]
        q = quantize(pos)
        d = dist_at(q)
        free = s["active"] & (d > 0)
        t_exit = cell_exit(pos, q, jnp.full((n,), shift_l, jnp.int32),
                           jnp.full((n,), cell_l, jnp.float32))
        skip = (d - 1).astype(jnp.float32) * cell_l / jnp.maximum(linf, 1e-6)
        step = jnp.maximum(t_exit + skip + eps, 0.25 * leaf_cell)
        ray_len = jnp.where(free, ray_len + step, ray_len)
        oor = s["active"] & (ray_len > limit)
        w = jnp.where(oor, 255.0, s["w"])
        return dict(ray_len=ray_len, rgb=s["rgb"], w=w,
                    active=s["active"] & ~oor, it=s["it"] + 1,
                    moving=jnp.any(free & ~oor))

    state_p1 = dict(state, moving=jnp.bool_(True))
    state_p1 = jax.lax.while_loop(
        lambda s: (s["it"] < max_iters) & s["moving"], skip_body, state_p1)
    state_p1.pop("moving")
    state = state_p1
    p1_trips = state["it"]
    state["it"] = jnp.int32(0)
    if debug_iters:
        state["fin"] = jnp.where(state["active"], jnp.int32(max_iters),
                                 jnp.int32(0))

    def make_body(dirs_, inv_, linf_, limit_):
        """Phase-2 march body over an arbitrary ray subset (full frame, or
        the compacted live set — per-lane math is identical either way)."""
        exit_ = make_cell_exit(dirs_, inv_)

        def body(s):
            ray_len = s["ray_len"]
            pos = origin + dirs_ * ray_len[:, None]
            q = quantize(pos)

            # --- distance-field lookup (gather 1) ---
            d = dist_at(q)
            free = d > 0

            # --- any-LOD value sample (gather 2) ---
            pix_size = ray_len * pix_scale
            lod = jnp.ceil(jnp.log2(jnp.maximum(
                oct_size / jnp.maximum(pix_size, 1e-9), 1.0)))
            lod = jnp.clip(lod.astype(jnp.int32), 1, max_depth)
            shift = max_depth - lod
            m = mips_mod.interleave3(q[:, 0] >> shift, q[:, 1] >> shift,
                                     q[:, 2] >> shift, depth_bits)
            fidx = ((jnp.int32(1) << (3 * lod)) - 8) // 7 + m
            value = cache.values[fidx]

            r, gg, b, a = packing.unpack_rgba8(value)
            alpha = jnp.where(free, 0.0,
                              jnp.maximum(a - 127, 0).astype(jnp.float32))
            contrib = (alpha / 127.0)[:, None] * jnp.stack(
                [r, gg, b], axis=-1).astype(jnp.float32)

            active = s["active"]
            rgb = jnp.where(active[:, None], s["rgb"] + contrib, s["rgb"])
            w_new = s["w"] + jnp.where(active, alpha, 0.0)
            saturated = active & (w_new >= 127.0)
            w_out = jnp.where(saturated, 255.0, w_new)

            # --- step: exact exit of the current cell (+ dist-1 cells of
            #     guaranteed-empty L-infinity ball when in free space) ---
            s_lod = oct_size * 2.0 / jnp.exp2(lod.astype(jnp.float32))
            lev_cell = jnp.where(free, cell_l, s_lod)
            lev_shift = jnp.where(free, shift_l, shift)
            t_exit = exit_(pos, q, lev_shift, lev_cell)
            skip = jnp.where(
                free,
                (d - 1).astype(jnp.float32) * cell_l
                / jnp.maximum(linf_, 1e-6),
                0.0)
            step = jnp.maximum(t_exit + skip + eps, 0.25 * leaf_cell)
            ray_len = jnp.where(active, ray_len + step, ray_len)

            oor = active & ~saturated & (ray_len > limit_)
            scale = 127.0 / jnp.maximum(w_out, 1.0)
            rgb = jnp.where(oor[:, None], rgb * scale[:, None], rgb)
            w_out = jnp.where(oor, 255.0, w_out)

            live = active & ~saturated & ~oor
            nxt = dict(
                ray_len=ray_len,
                rgb=rgb,
                w=w_out,
                active=live,
                n_act=jnp.sum(live).astype(jnp.int32),
                it=s["it"] + 1,
            )
            if debug_iters:
                nxt["fin"] = jnp.where(active & ~nxt["active"], nxt["it"],
                                       s["fin"])
            return nxt

        return body

    body_full = make_body(dirs, inv_dirs, linf, limit)
    state["n_act"] = jnp.sum(state["active"]).astype(jnp.int32)

    def cond(s):
        return (s["it"] < max_iters) & (s["n_act"] > 0)

    C = compact_cap if compact_cap is not None else max(128, n // 4)
    if debug_iters or C >= n or compact_after >= max_iters:
        state = jax.lax.while_loop(cond, body_full, state)
    else:
        # Phase 2a: all-lanes until the live set fits the compact buffer
        # (at least compact_after trips — early trips finish the bulk).
        def cond_a(s):
            return cond(s) & ((s["it"] < compact_after) | (s["n_act"] > C))

        state = jax.lax.while_loop(cond_a, body_full, state)

        # Compact: stable-sort lane ids by liveness, take the first C.
        # (s["n_act"] <= C here unless the loop exhausted max_iters, in
        # which case phase 2b's cond is immediately false.)
        order = jnp.argsort(jnp.where(state["active"], 0, 1).astype(jnp.int32))
        sel = order[:C]
        sub = dict(
            ray_len=state["ray_len"][sel],
            rgb=state["rgb"][sel],
            w=state["w"][sel],
            active=state["active"][sel],
            n_act=state["n_act"],
            it=state["it"],
        )
        body_c = make_body(dirs[sel], inv_dirs[sel], linf[sel], limit[sel])
        sub = jax.lax.while_loop(cond, body_c, sub)

        # Scatter the tail's results back; lanes outside `sel` were already
        # finished at compaction time and keep their values.
        state = dict(
            state,
            rgb=state["rgb"].at[sel].set(sub["rgb"]),
            w=state["w"].at[sel].set(sub["w"]),
            active=state["active"].at[sel].set(sub["active"]),
            it=sub["it"],
        )

    rgb = jnp.clip(state["rgb"], 0.0, 255.0) / 255.0
    a = jnp.clip(state["w"], 0.0, 255.0) / 255.0
    fb = jnp.concatenate([rgb, a[:, None]], axis=-1)
    fb = fb.reshape(height, width, 4)
    if debug_iters:
        return fb, dict(p1_trips=p1_trips, p2_trips=state["it"],
                        fin=state["fin"].reshape(height, width))
    return fb


def to_u8(framebuffer: jnp.ndarray) -> jnp.ndarray:
    """f32 [0,1] rgba -> u8, the PBO-style output."""
    return jnp.round(jnp.clip(framebuffer, 0.0, 1.0) * 255.0).astype(jnp.uint8)
