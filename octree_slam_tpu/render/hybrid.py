"""Hybrid cone renderer: slab composite + seeded exact march of the edge band.

The slab compositor (render/conesplat.py) reaches ~28 dB PSNR vs the exact
per-ray march at 77 FPS; the round-3 error analysis (BASELINE.md) showed its
residual error concentrates in the EDGE BAND — luminance-gradient pixels
dilated 2 px, ~24% of the image carrying ~55% of the MSE (grazing halos and
sub-leaf assignment at silhouettes). The exact march
(cone_tracing_kernels.cu:53-146 accumulation; render/raycast.cone_trace_dense
is the bit-faithful rebuild) delivers those pixels correctly but costs
~450 ms full-frame: its lax.while_loop is bound by its slowest ray and most
trips are spent marching empty space toward the first surface.

This module composes the two so each covers the other's weakness:

  1. Render the slab image, additionally extracting per pixel the
     accumulated weight and the NEAR boundary of the first contributing
     slab (conesplat.render_cone_splat want_aux).
  2. Select the `band_cap` highest-priority pixels — slab-image luminance
     gradient max-pooled over a (2*grad_dilate+1)^2 window — and compact
     them into dense march lanes (the reference's thrust::remove_if live-ray
     compaction, :157-198, applied *up front* to the rays that matter).
  3. March ONLY those rays, each SEEDED at the slab's own conservative
     first-hit depth (3x3-neighborhood min of z_first, one leaf of margin):
     the slab image acts as an acceleration structure for the march, which
     skips the empty-space trips that dominate its full-frame cost. The
     march runs a FIXED band_iters trips (no live count, no mid-march
     compaction: grazers keep the live set wide until the cap, and the
     per-trip bookkeeping costs as much as the gathers; compact_after <
     band_iters re-enables the compacting variant for experiments).
  4. Scatter the marched colors back over the slab image: finished rays
     verbatim; rays still active at the cap composite their partial
     front onto the slab pixel (front-to-back continuation — the slab
     stands in for the un-marched tail, and a w == 0 capped ray
     degenerates to the pure slab pixel).

Sampling reads the LEAF level of the dense mip always: at SLAM ranges the
march's cone footprint is sub-leaf (LOD == max_depth whenever
z < fx * leaf_size, e.g. 10.6 m on Kinect intrinsics at 2 cm leaves), so
this is the same sample the full march takes — and it lets LAZY frames
maintain the mirror with one leaf scatter + one occupancy scatter
(pipeline._fuse_once leaf_mirror) instead of the eager interior mipmap.

Documented divergences from the full exact march (quality is measured as
PSNR against it in bench.py / BENCH_r*.json):
  * non-band pixels keep the slab image (their error was the small half);
  * a band ray still active at `band_iters` trips blends its partial
    front with the slab pixel standing in for the un-marched tail;
  * samples beyond the leaf-LOD range (z > fx * leaf_size / 1 px) read
    leaves instead of the coarser interior LOD the full march would;
  * if geometry exists closer than a ray's seed but the slab shows nothing
    within its (2*seed_halo+1)^2 neighborhood at any slab (a full-stack
    slab hole), the march starts past it and samples what lies behind.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import mips as mips_mod
from octree_slam_tpu.render import conesplat
from octree_slam_tpu.render.conesplat import SlabSpec
from octree_slam_tpu.render.raycast import _ray_box, make_rays
from octree_slam_tpu.render.splat import LeafList


@functools.partial(
    jax.jit,
    static_argnames=("spec", "depth", "dist_level", "band_cap",
                     "band_iters", "compact_after", "grad_dilate",
                     "seed_halo", "crawl", "fused_dist", "depth_prio",
                     "dilate", "debug_band", "sel_decimate"))
def render_cone_hybrid(leaves: LeafList, cache, center: jnp.ndarray,
                       half_size, world_T_cam: jnp.ndarray, fx, fy, *,
                       spec: SlabSpec, depth: int, dist_level: int,
                       max_range: float = 10.0, start_dist: float = 0.002,
                       band_cap: int = 0, band_iters: int = 12,
                       compact_after: int = 999, grad_dilate: int = 2,
                       seed_halo: int = 4, crawl: int = 1,
                       fused_dist: bool = False, depth_prio: float = 0.0,
                       dilate: int = 1, debug_band: bool = False,
                       sel_decimate: bool = False):
    """Slab image with the edge band re-rendered by the seeded exact march.

    cache is the dense-mip RenderCache (map/mips.py); only its leaf level
    and the dist field are read, so lazy frames need only the leaf-mirror
    maintenance (see module docstring). Returns f32[H, W, 4]; with
    debug_band also a dict of band diagnostics (selected flat indices,
    per-lane trip state) for tests.
    """
    fb, _w_slab, z_first = conesplat.render_cone_splat(
        leaves, center, half_size, world_T_cam, fx, fy, spec=spec,
        depth=depth, dilate=dilate, want_aux=True)
    return band_march_merge(
        fb, z_first, cache, center, half_size, world_T_cam, fx, fy,
        spec=spec, depth=depth, dist_level=dist_level,
        max_range=max_range, start_dist=start_dist, band_cap=band_cap,
        band_iters=band_iters, compact_after=compact_after,
        grad_dilate=grad_dilate, seed_halo=seed_halo, crawl=crawl,
        fused_dist=fused_dist, depth_prio=depth_prio,
        debug_band=debug_band, sel_decimate=sel_decimate)


def band_march_merge(fb, z_first, cache, center: jnp.ndarray,
                     half_size, world_T_cam: jnp.ndarray, fx, fy, *,
                     spec: SlabSpec, depth: int, dist_level: int,
                     max_range: float = 10.0, start_dist: float = 0.002,
                     band_cap: int = 0, band_iters: int = 12,
                     compact_after: int = 999, grad_dilate: int = 2,
                     seed_halo: int = 4, crawl: int = 1,
                     fused_dist: bool = False, depth_prio: float = 0.0,
                     debug_band: bool = False, sel_decimate: bool = False):
    """Steps 2-4 of the hybrid (band select, seeded march, merge) on a
    PREBUILT slab image + aux — split out so the multi-chip renderer can
    compose its per-shard scatter-min slab (one pmin of packed words over
    ICI) and then run the identical replicated band march over the union
    leaf mirror (parallel/distributed.render_sharded_hybrid). fb/z_first
    are conesplat's want_aux outputs; semantics and knobs match
    render_cone_hybrid exactly (that function is now this one behind the
    single-chip slab render). Traced-only (callers jit)."""
    W, H = spec.width, spec.height
    n = W * H
    C = band_cap if band_cap > 0 else max(128, n // 4)
    C = min(C, n)
    C2 = max(128, C // 4)

    # --- Band selection: slab-image luminance gradient (edge pixels carry
    # ~55% of slab-vs-march MSE), max-pooled so the band extends grad_dilate
    # px to each side of every edge; argsort keeps the top band_cap. ---
    lum = (fb[..., 0] * 0.299 + fb[..., 1] * 0.587 + fb[..., 2] * 0.114)
    gx = jnp.abs(lum - jnp.concatenate([lum[:, :1], lum[:, :-1]], axis=1))
    gy = jnp.abs(lum - jnp.concatenate([lum[:1, :], lum[:-1, :]], axis=0))
    grad = jnp.maximum(gx, gy)
    if depth_prio > 0.0:
        # depth-discontinuity term: slab assignment fails hardest where
        # z_first jumps (occlusion boundaries between similar-colored
        # surfaces leave no luminance edge for the term above). Relative
        # jump, saturating at 30% of the nearer depth — one slab of the
        # geometric ladder — scaled into the luminance-gradient range.
        zf = jnp.where(jnp.isfinite(z_first), z_first,
                       jnp.float32(spec.z_far * 4.0))
        zx = jnp.abs(zf - jnp.concatenate([zf[:, :1], zf[:, :-1]], axis=1))
        zy = jnp.abs(zf - jnp.concatenate([zf[:1, :], zf[:-1, :]], axis=0))
        znear2 = jnp.minimum(
            zf, jnp.minimum(
                jnp.concatenate([zf[:, :1], zf[:, :-1]], axis=1),
                jnp.concatenate([zf[:1, :], zf[:-1, :]], axis=0)))
        gz = jnp.maximum(zx, zy) / jnp.maximum(znear2 * 0.3, 1e-3)
        grad = jnp.maximum(grad, depth_prio * jnp.clip(gz, 0.0, 1.0))
    k = 2 * grad_dilate + 1
    if sel_decimate and C % 4 == 0 and W % 2 == 0 and H % 2 == 0:
        # DECIMATED top-C: the max-pool that dilates the priorities also
        # strides 2, so the argsort runs over n/4 block priorities and
        # each selected 2x2 BLOCK expands to its 4 pixels. The set
        # changes at 2x2 granularity only — the priorities were already
        # (2*grad_dilate+1)^2 max-pooled, so a selected block's pixels
        # are within the dilation reach of the edge that selected it.
        # Saves the full-frame sort (the band select's dominant kernel);
        # blocks also tighten the march's gather locality further.
        priob = jax.lax.reduce_window(grad, jnp.float32(0.0), jax.lax.max,
                                      (k, k), (2, 2), "SAME")
        hb, wb = priob.shape
        selb = jnp.argsort(-priob.reshape(-1))[: C // 4]
        by = (selb // wb).astype(jnp.int32)
        bx = (selb % wb).astype(jnp.int32)
        px = ((2 * by)[:, None] * W + (2 * bx)[:, None]
              + jnp.asarray([0, 1, W, W + 1], jnp.int32)[None, :])
        sel = jnp.sort(px.reshape(-1)).astype(jnp.int32)
    else:
        prio = jax.lax.reduce_window(grad, jnp.float32(0.0), jax.lax.max,
                                     (k, k), (1, 1), "SAME")
        # raster-order the selected lanes: the set is identical (top-C
        # by priority) but adjacent lanes become adjacent PIXELS, so the
        # march's per-trip leaf-value gathers hit Morton-adjacent
        # addresses of the dense mip instead of priority-random ones
        # (gather locality on the ~600 MB table is the band march's
        # whole cost at production widths)
        sel = jnp.sort(jnp.argsort(-prio.reshape(-1))[:C]).astype(jnp.int32)

    # --- Seeds: conservative march start from the slab's own depth. ---
    # z_first is the near boundary of the pixel's first contributing slab
    # (leaf centers there have z >= z_first); the neighborhood MIN extends
    # the bound to silhouette-adjacent rays, and its window must cover the
    # march's GRAZING reach — a ray up to one projected leaf footprint
    # (~fx * leaf / z px, ~5 px at bench scale) past a silhouette still
    # crosses the edge leaf and accumulates its halo, so seeding it at the
    # background depth would skip exactly the samples the band exists to
    # recover (measured: a 3x3 window UNDID the slab's dilate-borrow halo
    # and lost 0.2 dB vs slab; seed_halo=4 covers the footprint). One leaf
    # of margin covers the center -> near-face offset.
    leaf = 2.0 * half_size / (1 << depth)
    kz = 2 * seed_halo + 1
    zmin = jax.lax.reduce_window(z_first, jnp.float32(jnp.inf), jax.lax.min,
                                 (kz, kz), (1, 1), "SAME")
    seed_z = jnp.maximum(zmin - leaf, 0.0).reshape(-1)[sel]

    origin, dirs_all = make_rays(world_T_cam, fx, fy, W, H)
    dirs = dirs_all[sel]
    # camera-space z per unit ray length (rays are unit-norm world vectors;
    # dz is invariant under the rotation): z = t * dz
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)[sel]
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)[sel]
    xr = (x - W / 2.0) / fx
    yr = (H / 2.0 - y) / fy
    dz = 1.0 / jnp.sqrt(xr * xr + yr * yr + 1.0)

    inv_dirs = jnp.where(jnp.abs(dirs) > 1e-9, 1.0 / dirs, jnp.inf)
    linf = jnp.max(jnp.abs(dirs), axis=-1)
    t0, t1 = _ray_box(origin, dirs, inv_dirs, center - half_size,
                      center + half_size)
    miss = (t0 > t1) | (t1 < 0.0) | (t0 > max_range)
    start = jnp.maximum(start_dist, jnp.where(t0 > 0.0, t0 + 1e-4, 0.0))
    t_seed = jnp.where(jnp.isfinite(seed_z), seed_z / dz, 0.0)
    start = jnp.maximum(start, t_seed)
    limit = jnp.minimum(jnp.float32(max_range), t1)
    start = jnp.minimum(start, limit)

    # --- Seeded exact march over the band lanes (cone_trace_dense body at
    # fixed leaf LOD; same accumulation/termination rules). ---
    n_leaf = 1 << depth
    bbox0 = center - half_size
    leaf_cell = (2.0 * half_size) / n_leaf
    g = 1 << dist_level
    cell_l = (2.0 * half_size) / g
    shift_l = depth - dist_level
    leaf_off = mips_mod.level_offset(depth)
    eps = 0.05 * leaf_cell

    def quantize(pos):
        return jnp.clip(
            jnp.floor((pos - bbox0) / leaf_cell).astype(jnp.int32),
            0, n_leaf - 1)

    def make_body(dirs_, inv_, linf_, limit_, with_count=True):
        def body(s):
            t = s["t"]
            pos = origin + dirs_ * t[:, None]
            q = quantize(pos)

            m = mips_mod.interleave3(q[:, 0], q[:, 1], q[:, 2], depth)
            value = cache.values[leaf_off + m]
            r, gg, b, a = packing.unpack_rgba8(value)
            if fused_dist:
                # SINGLE-GATHER trip: free leaf cells carry their covering
                # dist cell's Chebyshev distance in the low byte
                # (mips.encode_free_dist), so the value sample doubles as
                # the empty-space-skip lookup. Occupied leaves (alpha >
                # 127) necessarily sit in distance-0 cells, so d = 0 for
                # them reproduces the two-gather body's cell classification
                # exactly; the trip cost drops from two HBM gathers to one
                # (the ~600 MB leaf-mip gather is the band march's whole
                # marginal cost at production widths, BASELINE.md).
                d = jnp.where(a > packing.OCCUPIED_ALPHA, 0, r)
            else:
                cx = q[:, 0] >> shift_l
                cy = q[:, 1] >> shift_l
                cz = q[:, 2] >> shift_l
                d = cache.dist[(cz << (2 * dist_level)) | (cy << dist_level)
                               | cx]
            free = d > 0
            # free cells read alpha 0 either way: EMPTY_VALUE's byte is
            # exactly 127 and an encoded free cell's is 0
            alpha = jnp.where(free, 0.0,
                              jnp.maximum(a - 127, 0).astype(jnp.float32))
            contrib = (alpha / 127.0)[:, None] * jnp.stack(
                [r, gg, b], axis=-1).astype(jnp.float32)

            active = s["active"]
            rgb = jnp.where(active[:, None], s["rgb"] + contrib, s["rgb"])
            w_new = s["w"] + jnp.where(active, alpha, 0.0)
            saturated = active & (w_new >= 127.0)
            w_out = jnp.where(saturated, 255.0, w_new)

            # step to the current cell's exit (+ guaranteed-empty skip)
            shift = jnp.where(free, shift_l, 0)
            cell = jnp.where(free, cell_l, leaf_cell)
            corner = bbox0 + (q >> shift[:, None]).astype(jnp.float32) \
                * cell[:, None]
            t_axis = jnp.where(
                jnp.abs(dirs_) > 1e-9,
                jnp.where(dirs_ > 0, (corner + cell[:, None] - pos),
                          (corner - pos)) * inv_,
                jnp.inf)
            t_exit = jnp.maximum(jnp.min(t_axis, axis=-1), 0.0)
            skip = jnp.where(
                free,
                (d - 1).astype(jnp.float32) * cell_l
                / jnp.maximum(linf_, 1e-6),
                0.0)
            step = jnp.maximum(t_exit + skip + eps, 0.25 * leaf_cell)
            t = jnp.where(active, t + step, t)

            oor = active & ~saturated & (t > limit_)
            scale = 127.0 / jnp.maximum(w_out, 1.0)
            rgb = jnp.where(oor[:, None], rgb * scale[:, None], rgb)
            w_out = jnp.where(oor, 255.0, w_out)

            live = active & ~saturated & ~oor
            out = dict(t=t, rgb=rgb, w=w_out, active=live,
                       it=s["it"] + 1)
            if with_count:
                out["n_act"] = jnp.sum(live).astype(jnp.int32)
            return out

        return body

    state = dict(
        t=jnp.where(miss, jnp.float32(max_range), start),
        rgb=jnp.zeros((C, 3), jnp.float32),
        w=jnp.where(miss, 255.0, 0.0),
        active=~miss,
        it=jnp.int32(0),
    )

    def cond(s):
        return (s["it"] < band_iters) & (s["n_act"] > 0)

    if C2 >= C or compact_after >= band_iters:
        # FIXED-TRIP fast path (the production shape): no live count in
        # the carry, no compaction — grazers rarely drop below any useful
        # compaction width before the cap (measured: 64% of band rays
        # still active at trip 24 on the bench map), and the per-trip
        # liveness reduce + bookkeeping cost ~1.8 ms/trip of pure
        # while-loop overhead against two gathers totalling ~1.8 ms.
        # Capped rays take the slab-continuation blend below.
        if crawl > 1:
            # K-CRAWL trip: the single-sample body pays two flat-cost HBM
            # gathers (dist + leaf value) per SAMPLE — on this platform
            # every unfused kernel is ~0.5 ms regardless of width, so the
            # march is kernel-count-bound, not bandwidth-bound. This body
            # takes K leaf samples per while-loop trip with ONE (C, K)
            # value gather: the K DDA positions are pure ray geometry
            # (successive leaf-cell exits), so they fuse into the
            # elementwise prologue, and the per-sample accumulate/
            # terminate rules run sequentially in-register. Semantics are
            # those of the single-sample march: sampling a leaf inside a
            # free dist cell reads 0 (the mirror stores 0 for unoccupied
            # leaves) and contributes nothing, and the trip's final t is
            # max(crawled extent, dist-skip bound) — both are safe
            # advance bounds (sampled space vs guaranteed-free space), so
            # their max never jumps unsampled occupied leaves. band_iters
            # counts TRIPS here (up to K samples each).
            K = crawl

            def body_lean(s):
                t_in = s["t"]
                pos0 = origin + dirs * t_in[:, None]
                q0 = quantize(pos0)
                cx = q0[:, 0] >> shift_l
                cy = q0[:, 1] >> shift_l
                cz = q0[:, 2] >> shift_l
                d = cache.dist[(cz << (2 * dist_level))
                               | (cy << dist_level) | cx]
                free = d > 0
                # guaranteed-free advance: exit of the dist cell plus
                # (d - 1) free cells (free lanes only — an occupied
                # lane's bound is whatever the crawl sampled)
                corner_l = bbox0 + (q0 >> shift_l).astype(jnp.float32) \
                    * cell_l
                t_axis_l = jnp.where(
                    jnp.abs(dirs) > 1e-9,
                    jnp.where(dirs > 0, (corner_l + cell_l - pos0),
                              (corner_l - pos0)) * inv_dirs,
                    jnp.inf)
                exit_l = jnp.maximum(jnp.min(t_axis_l, axis=-1), 0.0)
                skip = (d - 1).astype(jnp.float32) * cell_l \
                    / jnp.maximum(linf, 1e-6)
                t_skip = jnp.where(
                    free,
                    t_in + jnp.maximum(exit_l + skip + eps,
                                       0.25 * leaf_cell),
                    0.0)
                # K-step leaf DDA: gather-free geometry
                tts = []
                ms = []
                tt = t_in
                for _ in range(K):
                    ppos = origin + dirs * tt[:, None]
                    qq = quantize(ppos)
                    ms.append(mips_mod.interleave3(
                        qq[:, 0], qq[:, 1], qq[:, 2], depth))
                    corner = bbox0 + qq.astype(jnp.float32) * leaf_cell
                    t_axis = jnp.where(
                        jnp.abs(dirs) > 1e-9,
                        jnp.where(dirs > 0, (corner + leaf_cell - ppos),
                                  (corner - ppos)) * inv_dirs,
                        jnp.inf)
                    t_exit = jnp.maximum(jnp.min(t_axis, axis=-1), 0.0)
                    tt = tt + jnp.maximum(t_exit + eps, 0.25 * leaf_cell)
                    tts.append(tt)
                vals = cache.values[leaf_off + jnp.stack(ms, axis=-1)]
                r, gg, b, a = packing.unpack_rgba8(vals)
                alpha_k = jnp.maximum(a - 127, 0).astype(jnp.float32)
                rgb_k = jnp.stack([r, gg, b], axis=-1).astype(jnp.float32)
                rgb, w, act, t_out = s["rgb"], s["w"], s["active"], s["t"]
                for i in range(K):
                    a_i = jnp.where(act, alpha_k[:, i], 0.0)
                    rgb = rgb + (a_i / 127.0)[:, None] * rgb_k[:, i]
                    w_new = w + a_i
                    saturated = act & (w_new >= 127.0)
                    w = jnp.where(saturated, 255.0, w_new)
                    t_i = tts[i]
                    if i == K - 1:
                        t_i = jnp.maximum(t_i, t_skip)
                    t_out = jnp.where(act, t_i, t_out)
                    oor = act & ~saturated & (t_i > limit)
                    scale = 127.0 / jnp.maximum(w, 1.0)
                    rgb = jnp.where(oor[:, None], rgb * scale[:, None],
                                    rgb)
                    w = jnp.where(oor, 255.0, w)
                    act = act & ~saturated & ~oor
                return dict(t=t_out, rgb=rgb, w=w, active=act,
                            it=s["it"] + 1)
        else:
            body_lean = make_body(dirs, inv_dirs, linf, limit,
                                  with_count=False)
        state = jax.lax.while_loop(lambda s: s["it"] < band_iters,
                                   body_lean, state)
    else:
        state["n_act"] = jnp.sum(state["active"]).astype(jnp.int32)
        body_full = make_body(dirs, inv_dirs, linf, limit)
        def cond_a(s):
            return cond(s) & ((s["it"] < compact_after)
                              | (s["n_act"] > C2))

        state = jax.lax.while_loop(cond_a, body_full, state)
        order = jnp.argsort(
            jnp.where(state["active"], 0, 1).astype(jnp.int32))
        sub_sel = order[:C2]
        sub = dict(
            t=state["t"][sub_sel],
            rgb=state["rgb"][sub_sel],
            w=state["w"][sub_sel],
            active=state["active"][sub_sel],
            n_act=state["n_act"],
            it=state["it"],
        )
        body_c = make_body(dirs[sub_sel], inv_dirs[sub_sel], linf[sub_sel],
                           limit[sub_sel])
        sub = jax.lax.while_loop(cond, body_c, sub)
        state = dict(
            state,
            rgb=state["rgb"].at[sub_sel].set(sub["rgb"]),
            w=state["w"].at[sub_sel].set(sub["w"]),
            active=state["active"].at[sub_sel].set(sub["active"]),
            it=sub["it"],
        )

    # --- Merge. Finished rays (saturated / out of range) are the exact
    # march. Rays still ACTIVE at the trip cap — grazers crawling
    # leaf-by-leaf through occupied dist cells, the exact march's own
    # p99-87-trip tail — composite their partial front ONTO the slab
    # pixel: the march accumulated the edge graze exactly; what lies
    # behind is the background the slab already renders well (measured
    # out-of-band slab MSE is 4x below in-band). This is the march's own
    # front-to-back rule with the slab standing in for the un-marched
    # tail; a w == 0 capped ray degenerates to the pure slab pixel, so
    # the fallback is continuous. (The previous 127/w full-strength
    # rescale of capped rays measured NO better than the slab: 64% of
    # band rays cap, and the rescale over-weights a half-accumulated
    # graze.) ---
    w_lane = state["w"]
    capped = state["active"]
    fb_flat = fb.reshape(n, 4)
    slab_sel = fb_flat[sel]
    front01 = jnp.clip(state["rgb"], 0.0, 255.0) / 255.0
    rem = jnp.clip(1.0 - w_lane / 127.0, 0.0, 1.0)
    blended = front01 + rem[:, None] * slab_sel[:, :3]
    exact01 = jnp.concatenate(
        [front01, jnp.clip(w_lane, 0.0, 255.0)[:, None] / 255.0], axis=-1)
    merged_rgb = jnp.where(capped[:, None],
                           jnp.clip(blended, 0.0, 1.0), exact01[:, :3])
    merged = jnp.concatenate(
        [merged_rgb,
         jnp.where(capped, 1.0, exact01[:, 3])[:, None]], axis=-1)
    out = fb_flat.at[sel].set(merged).reshape(H, W, 4)
    if debug_band:
        return out, dict(sel=sel, use_march=~capped | (w_lane > 0.0),
                         trips=state["it"], capped=capped, seed_t=start,
                         w=w_lane)
    return out
