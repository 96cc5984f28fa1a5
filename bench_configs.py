"""The remaining BASELINE.json benchmark configs, one JSON line each.

The headline config (synthetic-orbit track+fuse+render at 640x480) lives in
bench.py; this file covers the rest of `BASELINE.json.configs`:

  cube      — objs/cube.obj voxelize at 64^3 -> octree depth 6 -> cone render
  textured  — objs/teapot_tex.obj + textures/texture1.bmp at 256^3
              (GRID_RES=8 parity, voxelization.cu:24) -> cone render
  bunny     — objs/bunny_tex.obj + texture2.bmp, same pipeline (the
              textured asset BASELINE.json names; dragon.obj does not
              exist in the reference tree)
  cow       — objs/cow_tex.obj + textures/cow.bmp, same pipeline
  sponza    — crytek-sponza orbit: voxelized mesh -> synthetic RGB-D orbit
              -> full ICP+fusion loop. NOTE: the sponza main geometry ships
              as sponza.am.any (not OBJ — the reference's own objloader
              cannot read it either); the loadable sponza asset is
              banner.obj, which this config uses.
  cone1080p — full track+fuse+cone step at 1920x1080
  capstone1080 — BASELINE.json config 5 all-at-once: streamed brick pool
              (host tiering active) + hybrid cone render at 1080p
  depth10   — 1 cm leaves / 10.24 m volume, dense mips off (the deep-map
              regime; the production cone path is leaf-only)
  slam1cm   — the reference's SLAM resolution head-to-head: 1 cm leaves
              (scene.cpp:94) at depth 9 (5.12 m volume), fusing from
              pyramid level 1 (2-px ray spacing ~ 7.5 mm at 2 m < the
              1 cm leaf) with unique_cap == the point count so every
              frame fuses in one lossless pass
  slam1cmfull — the same arm at fuse_level=0: every full-res pixel
              fuses losslessly (~150-250k distinct 1 cm leaves/frame,
              the insert directory cache's target regime)
  warmmarch — the EXACT cone marcher on an alpha-saturated map (its
              best case; the cold-map figure is bench.py cone_march_fps)
  conescale — the exact marcher at cone_scale 1/2/4 (quarter/sixteenth
              rays, nearest-upsampled): fps + PSNR per scale — the
              recommended hybrid when exact march semantics are needed
              at interactive rates
  rgbdterm  — ICP + photometric tracking A/B (w_rgbd 0.0 vs 0.1): the
              reference's intended-but-stubbed combined system
              (rgbd_camera.cpp:131-141, localization_kernels.cu:328-331)
  tum       — TUM-format replay end to end (association, quaternion ground
              truth, native PNG prefetcher, 5000-per-meter depth). No real
              fr1/desk exists in this offline environment; the sequence is
              synthesized in the exact on-disk format
              (examples/make_tum_sequence.py).

Run: python bench_configs.py
     [--config cube|textured|sponza|cone1080p|depth10|slam1cm|warmmarch|tum|all]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from octree_slam_tpu.utils import runtime

runtime.setup()

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.utils.timing import sync

REF = "/root/reference"


def sync_floor(n=8):
    f = jax.jit(lambda x: x + 1)
    x = f(jnp.zeros((8, 128)))
    sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        sync(x)
    return (time.perf_counter() - t0) / n


def leaves_from_tree(tree, cfg):
    """LeafList view of an octree's occupied leaves (for the slab cone)."""
    from octree_slam_tpu.map import svo
    from octree_slam_tpu.render.splat import LeafList

    ex = svo.extract_voxels(tree.pool, depth=tree.max_depth,
                            capacity=cfg.extract_capacity)
    # extraction is front-compacted: right-size to the next power of two so
    # the render's scatter (its entire device cost, lane-bound) doesn't pay
    # for the extract-capacity padding
    cnt = int(ex.count)
    cap2 = min(max(1 << 14, 1 << max(cnt - 1, 1).bit_length()),
               ex.keys.shape[0])
    keys = ex.keys[:cap2]
    live = np.asarray(ex.nodes[:cap2]) >= 0
    nodes = jnp.where(jnp.asarray(live), ex.nodes[:cap2], 0)
    return LeafList(
        keys=keys, nodes=nodes,
        vals=jnp.where(jnp.asarray(live), tree.pool.value[nodes], 0),
        node2pos=jnp.zeros((1,), jnp.int32),
        count=ex.count, overflowed=jnp.bool_(False)), cnt


def cone_views(tree, cfg, fx, eye_dist, n_views=32):
    """Timed slab-cone renders orbiting the voxelized map."""
    from octree_slam_tpu.render import conesplat
    from octree_slam_tpu.sensor import sources

    leaves, n_leaves = leaves_from_tree(tree, cfg)
    center = np.asarray(tree.pool.center)
    spec = conesplat.make_slab_spec(
        width=cfg.width, height=cfg.height, fx=fx,
        leaf_size=2.0 * float(tree.pool.half_size) / (1 << tree.max_depth),
        z_near=max(0.02, 0.1 * eye_dist), z_far=cfg.max_range,
        n_slabs=cfg.cone_slabs, max_scale=cfg.cone_max_scale)

    # poses are HOST work (eager jnp math, ~10 ms each through this
    # platform's dispatch) — build them all before the timed region; a
    # device trace showed the render itself at ~0.5 ms while per-view
    # orbit_pose dominated the wall clock
    poses = [jax.device_put(sources.orbit_pose(
        2 * np.pi * i / n_views, radius=eye_dist, height=0.3 * eye_dist,
        target=center)) for i in range(n_views)]

    def render(i):
        return conesplat.render_cone_splat(
            leaves, tree.pool.center, tree.pool.half_size, poses[i], fx, fx,
            spec=spec, depth=tree.max_depth)

    fb = render(0)
    sync(fb)
    fl = sync_floor()
    t0 = time.perf_counter()
    for i in range(n_views):
        fb = render(i)
    sync(fb)
    dt = (time.perf_counter() - t0 - fl) / n_views
    # return VIEW 0's image (not the last orbit view) so callers can
    # compare it against an oracle render at the same pose
    return 1.0 / max(dt, 1e-6), n_leaves, render(0)


def _psnr_db(a, b):
    """PSNR of two f32 RGB(A) framebuffers over the rgb channels."""
    d = (np.asarray(a[..., :3], np.float64)
         - np.asarray(b[..., :3], np.float64))
    return float(10.0 * np.log10(1.0 / max(float((d * d).mean()), 1e-12)))


def march_view(tree, cfg, fx, pose, width, height, max_iters=192):
    """One exact pointer-march render of a voxelized tree (PSNR oracle)."""
    from octree_slam_tpu.render import raycast

    lvl = max(1, min(cfg.accel_level, tree.max_depth - 2))
    accel = raycast.build_accel(tree.pool, level=lvl)
    return raycast.cone_trace(
        tree.pool, pose, fx, fx, width=width, height=height,
        max_depth=tree.max_depth, max_iters=max_iters,
        max_range=cfg.max_range, start_dist=cfg.start_dist,
        accel=accel, accel_level=lvl)


def config_mesh_cone(name, obj_path, tex_path, log_n, width=640, height=480):
    from octree_slam_tpu.scene import Scene

    cfg = SLAMConfig(width=width, height=height, vox_log_n=log_n,
                     node_capacity=1 << 21, extract_capacity=1 << 19,
                     insert_unique_cap=1 << 17)
    # warm pass: compile the voxelize + insert jits on a throwaway scene
    warm = Scene(cfg)
    warm.load_obj_file(obj_path)
    if tex_path:
        warm.load_texture(tex_path)
    warm.voxelize_meshes(octree=True)
    sync(warm.tree.pool.value)

    scene = Scene(cfg)
    mesh = scene.load_obj_file(obj_path)
    if tex_path:
        scene.load_texture(tex_path)
    t0 = time.perf_counter()
    grid = scene.voxelize_meshes(octree=False)
    sync(grid.centers)
    vox_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    scene.voxelize_meshes(octree=True)
    sync(scene.tree.pool.value)
    vox_insert_ms = (time.perf_counter() - t0) * 1e3

    half = float(scene.tree.pool.half_size)
    fx = cfg.focal_x
    fps, n_leaves, fb0 = cone_views(scene.tree, cfg, fx,
                                    eye_dist=2.6 * half)
    # per-config slab-vs-exact-march PSNR on the first orbit view
    # (round-2 verdict #9); the march is the bit-faithful pointer
    # descent, so this is the same oracle the headline PSNR uses
    from octree_slam_tpu.sensor import sources
    center = np.asarray(scene.tree.pool.center)
    pose0 = jax.device_put(sources.orbit_pose(
        0.0, radius=2.6 * half, height=0.3 * 2.6 * half, target=center))
    march = march_view(scene.tree, cfg, fx, pose0, width, height)
    psnr = _psnr_db(np.asarray(march), np.asarray(fb0))
    print(json.dumps({
        "config": name, "metric": "cone_render_fps", "value": round(fps, 2),
        "unit": "fps", "grid": f"{1 << log_n}^3",
        "octree_depth": scene.tree.max_depth,
        "occupied_voxels": int(grid.count), "leaves": n_leaves,
        "voxelize_ms": round(vox_ms, 1),
        "voxelize_insert_ms": round(vox_insert_ms, 1),
        "tris": int(mesh.faces.shape[0]),
        "resolution": f"{width}x{height}",
        "cone_psnr_db": round(psnr, 2),
    }))


def config_sponza_orbit(n_frames=12, width=640, height=480):
    """Voxelize the sponza banner mesh, synthesize an RGB-D orbit from the
    voxel map (splat z-buffer -> depth + color), run full ICP+fusion."""
    from octree_slam_tpu import app
    from octree_slam_tpu.core.types import Frame
    from octree_slam_tpu.render import splat as sp
    from octree_slam_tpu.scene import Scene
    from octree_slam_tpu.sensor import sources

    cfg = SLAMConfig(width=width, height=height, vox_log_n=8,
                     node_capacity=1 << 21, extract_capacity=1 << 19,
                     insert_unique_cap=1 << 17)
    scene = Scene(cfg)
    mesh = scene.load_obj_file(f"{REF}/objs/crytek-sponza/banner.obj")
    # sponza ships in centimeter-scale units (banner spans ~1000 units);
    # normalize to a ~2.4 m object centered at the origin so the RGB-D
    # camera model (10 m range, mm depth) applies
    from octree_slam_tpu.core.types import BoundingBox
    lo = np.asarray(mesh.bbox.bbox0)
    hi = np.asarray(mesh.bbox.bbox1)
    c = 0.5 * (lo + hi)
    s = 1.2 / max(float(np.max(hi - c)), 1e-6)
    verts = (np.asarray(mesh.vertices) - c) * s
    scene.meshes[0] = mesh._replace(
        vertices=jnp.asarray(verts),
        bbox=BoundingBox(bbox0=jnp.asarray((lo - c) * s),
                         bbox1=jnp.asarray((hi - c) * s)))
    scene.voxelize_meshes(octree=True)
    tree = scene.tree
    leaves, _ = leaves_from_tree(tree, cfg)
    center = np.asarray(tree.pool.center)
    half = float(tree.pool.half_size)
    eye_dist = 1.6 * half

    # SLAM-loop config over the synthesized stream (2 cm-class leaves
    # relative to the banner's size)
    scfg = SLAMConfig(width=width, height=height,
                      voxel_resolution=max(0.01, half / 256.0), max_depth=9,
                      node_capacity=1 << 20, leaf_capacity=1 << 17)

    def rgbd(i):
        pose = sources.orbit_pose(0.5 + 0.01 * i, radius=eye_dist,
                                  height=0.2 * eye_dist, target=center)
        live = (jnp.arange(leaves.keys.shape[0]) < leaves.count) \
            & (leaves.keys >= 0)
        buf = sp.splat_zbuffer(leaves.vals, leaves.keys, live,
                               tree.pool.center, tree.pool.half_size, pose,
                               scfg.focal_x, scfg.focal_y, width=width,
                               height=height, depth=tree.max_depth,
                               max_range=scfg.max_range)
        buf = np.asarray(buf).reshape(height, width)
        hit = buf != sp.EMPTY
        qz = np.where(hit, buf >> 16, 0)
        depth_mm = (qz * (scfg.max_range / 32766.0) * 1e3).astype(np.uint16)
        w = np.where(hit, buf, 0) & 0xFFFF
        r = ((w >> 11) & 0x1F) << 3
        g = ((w >> 5) & 0x3F) << 2
        b = (w & 0x1F) << 3
        color = np.stack([r, g, b], -1).astype(np.uint8)
        return pose, Frame(depth=jnp.asarray(depth_mm),
                           color=jnp.asarray(color),
                           timestamp=jnp.float32(i / 30.0))

    frames = []
    gts = []
    for i in range(n_frames):
        pose, f = rgbd(i)
        frames.append(f)
        gts.append(np.asarray(pose))

    # warm pass compiles the step jits; timed pass is steady-state
    app.run_slam(lambda i: frames[i], 2, scfg, initial_pose=gts[0],
                 render_every=1, render_mode="splat", map_center=center)
    state_box = []
    res = app.run_slam(lambda i: frames[i], n_frames, scfg,
                       initial_pose=gts[0], gt_fn=lambda i: gts[i],
                       render_every=1, render_mode="splat",
                       map_center=center, state_out=state_box)
    # slab-vs-march PSNR on the run's final map (round-3 verdict item #8:
    # every cone-rendering config row carries a fidelity figure)
    from octree_slam_tpu import pipeline
    st = state_box[0]
    s1 = jax.tree_util.tree_map(jnp.copy, st)
    s2 = jax.tree_util.tree_map(jnp.copy, st)
    _, out_s = pipeline.step(s1, frames[-1], scfg, render="cone")
    _, out_m = pipeline.step(s2, frames[-1], scfg, render="cone_march")
    psnr = _psnr_db(np.asarray(out_s.framebuffer),
                    np.asarray(out_m.framebuffer))
    print(json.dumps({
        "config": "sponza_orbit_icp_fusion", "metric": "slam_fps",
        "value": round(res.fps, 2), "unit": "fps",
        "ate_rmse_m": round(res.ate_rmse, 5) if res.ate_rmse else None,
        "frames": n_frames, "map_nodes": res.map_nodes,
        "diverged": res.diverged,
        "cone_psnr_db": round(psnr, 2),
        "source_mesh": "crytek-sponza/banner.obj",
        "note": "sponza main geometry is .am.any (not OBJ; unreadable by "
                "the reference objloader too) - banner.obj is the loadable "
                "sponza asset; RGB-D synthesized from its voxel map",
    }))


def config_cone_1080p(n_frames=8, max_scale=16):
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.sensor import sources

    # Track + fuse at level 1 (960x540 — the scale the reference's {10,5,4}
    # GN schedule was designed for, rgbd_camera.cpp:19 at 640x480), render
    # the cone at full 1080p. pyramid_depth=4 gives the tracked sub-pyramid
    # the same three levels the reference uses; ATE below validates that
    # tracking quality is unchanged (full-res GN was 22 ms/frame of the
    # 64 ms step in the device trace).
    # cone_max_scale: the footprint-matched-raster rule (make_slab_spec)
    # needs coarser cells at 1080p intrinsics — fx*leaf/z is ~16 px at
    # 2 m (vs ~5 px at 640x480), and the 640x480 default cap of 8 left
    # slab HOLES at near range (measured 17.7 dB vs 26.5 dB with 16)
    cfg = SLAMConfig(width=1920, height=1080, focal_x=1597.7, focal_y=1594.6,
                     max_depth=9, voxel_resolution=0.02,
                     pyramid_depth=4, track_finest_level=1, fuse_level=1,
                     node_capacity=1 << 20, leaf_capacity=1 << 18,
                     insert_unique_cap=1 << 17, cone_max_scale=max_scale)
    scene = sources.default_scene()
    frames = []
    gts = []
    for i in range(n_frames):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append(f)
        gts.append(gt)
    state = pipeline.init_state(cfg, initial_pose=gts[0])
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="cone"),
                   donate_argnums=0)
    poses = [None] * n_frames
    for i in range(2):
        state, out = step(state, frames[i])
        poses[i] = out.pose
    sync(out.framebuffer)
    fl = sync_floor()
    t0 = time.perf_counter()
    for i in range(2, n_frames):
        state, out = step(state, frames[i])
        poses[i] = out.pose  # device array: no fetch inside the timed loop
    sync(out.framebuffer)
    dt = (time.perf_counter() - t0 - fl) / (n_frames - 2)
    from octree_slam_tpu.utils import metrics
    ate = metrics.ate_rmse(np.asarray(jnp.stack(poses)), np.stack(gts))
    # slab-vs-march PSNR on a clean single-pass map (round-3 verdict #8;
    # bench.py's fidelity methodology: the timed state above re-fused
    # donated replays, which ghost-dirties the comparison)
    st = pipeline.init_state(cfg, initial_pose=gts[0])
    stepn = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="none"),
                    donate_argnums=0)
    for i in range(n_frames - 1):
        st, _ = stepn(st, frames[i])
    sync(st.pose)
    s1 = jax.tree_util.tree_map(jnp.copy, st)
    s2 = jax.tree_util.tree_map(jnp.copy, st)
    _, out_s = pipeline.step(s1, frames[-1], cfg, render="cone")
    _, out_m = pipeline.step(s2, frames[-1], cfg, render="cone_march")
    psnr = _psnr_db(np.asarray(out_s.framebuffer),
                    np.asarray(out_m.framebuffer))
    print(json.dumps({
        "config": "cone_trace_1080p", "metric": "track_fuse_cone_fps_1080p",
        "value": round(1.0 / dt, 2), "unit": "fps",
        "resolution": "1920x1080", "frames": n_frames - 2,
        "ate_rmse_m": round(float(ate), 5),
        "track_fuse_level": 1,
        "cone_psnr_db": round(psnr, 2),
        "map_nodes": int(out.map_nodes),
        "unique_overflow_last_frame": bool(out.unique_overflow),
    }))


def config_capstone1080(n_frames=60, band_cap=115200, band_iters=24):
    """BASELINE.json config 5 capstone: the large-scale GigaVoxels-style
    deployment — streamed brick pool (host tiering ACTIVE: tight spill
    radius + growth-pressure archiving, map/tiering.py) + the QUALITY
    cone renderer (cone_hybrid: slab + seeded edge-band march) at full
    1920x1080 — every subsystem on at once, which no other config
    combines. The reference scaffolds this and never finished it
    (svo.h:8, svo.cu:467-496 disabled brick-pool path).

    Two measurements: (a) the streamed run — app.run_slam over a long
    orbit arc with capacities sized so HBM pressure forces cold-region
    spills as the camera sweeps (steady FPS, ATE, spill/restore
    traffic); (b) hybrid fidelity at 1080p on a clean single-pass map vs
    the exact march (bench.py methodology). Track+fuse ride pyramid
    level 1 (960x540) like config_cone_1080p; the render is full-res."""
    from octree_slam_tpu import app, pipeline
    from octree_slam_tpu.sensor import sources
    from octree_slam_tpu.utils import metrics

    cfg = SLAMConfig(width=1920, height=1080, focal_x=1597.7,
                     focal_y=1594.6, max_depth=9, voxel_resolution=0.02,
                     pyramid_depth=4, track_finest_level=1, fuse_level=1,
                     node_capacity=1 << 19, leaf_capacity=1 << 17,
                     insert_unique_cap=1 << 16,
                     # 1080p intrinsics need 16 px slab cells (the
                     # footprint rule — see config_cone_1080p)
                     cone_max_scale=16,
                     cone_band_cap=band_cap, cone_band_iters=band_iters,
                     host_spill=True, spill_keep_radius=2.2,
                     # hysteresis: restore STRICTLY inside the keep
                     # radius or every spill un-spills next frame
                     # (restore_radius default 11 m is sized for the
                     # 12 m default keep radius, not a 2.2 m one)
                     restore_radius=1.8,
                     precompile_ahead=False)
    scene = sources.default_scene()
    step_angle = 2.0 * np.pi / 200  # the soak's arc density
    gts = [sources.orbit_pose(i * step_angle, radius=2.0)
           for i in range(n_frames)]

    def frame_fn(i):
        return sources.render_frame(scene, gts[i], cfg.focal_x,
                                    cfg.focal_y, width=cfg.width,
                                    height=cfg.height)

    res = app.run_slam(frame_fn, n_frames, cfg, initial_pose=gts[0],
                       gt_fn=lambda i: gts[i], render_every=1,
                       render_mode="cone_hybrid", log_every=20)

    # (b) fidelity: clean 8-frame map, hybrid vs exact march at 1080p
    import dataclasses
    fcfg = dataclasses.replace(cfg, host_spill=False,
                               node_capacity=1 << 20)
    st = pipeline.init_state(fcfg, initial_pose=gts[0])
    stepn = jax.jit(lambda s, f: pipeline.step(s, f, fcfg, render="none"),
                    donate_argnums=0)
    fr = [frame_fn(i) for i in range(8)]
    for f in fr:
        sync(f.depth)
    for f in fr[:-1]:
        st, _ = stepn(st, f)
    sync(st.pose)
    s1 = jax.tree_util.tree_map(jnp.copy, st)
    s2 = jax.tree_util.tree_map(jnp.copy, st)
    _, out_h = pipeline.step(s1, fr[-1], fcfg, render="cone_hybrid")
    _, out_m = pipeline.step(s2, fr[-1], fcfg, render="cone_march")
    psnr = _psnr_db(np.asarray(out_h.framebuffer),
                    np.asarray(out_m.framebuffer))
    print(json.dumps({
        "config": "capstone_1080p_streamed_hybrid",
        "metric": "streamed_hybrid_fps_1080p",
        "value": round(res.steady_fps, 2), "unit": "fps",
        "resolution": "1920x1080", "frames": n_frames,
        "band_cap": band_cap, "band_iters": band_iters,
        "ate_rmse_m": (round(res.ate_rmse, 4)
                       if res.ate_rmse is not None else None),
        "diverged": res.diverged,
        "spilled_leaves": res.spilled_leaves,
        "restored_leaves": res.restored_leaves,
        "archived_cells": res.archived_cells,
        "map_nodes": res.map_nodes,
        "hybrid_psnr_db_1080p": round(psnr, 2),
    }))


def config_depth10(n_frames=8):
    """Depth-10 regime (1 cm leaves, 10.24 m volume): the dense-mip mirror
    would cost 4.9 GB at this depth (map/mips.py), so it is OFF; splat and
    the slab cone read only the leaf registry, so the deep-map fallback is
    the PRODUCTION cone path, not the slow pointer-descent marcher."""
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.sensor import sources

    # 1 cm leaves make most of the 307k pixels distinct voxels: size the
    # unique cap so a typical frame fuses in ONE pass instead of paging
    # through the in-step remainder loop (paging is lossless but each
    # page re-runs the insert)
    cfg = SLAMConfig(width=640, height=480, max_depth=10,
                     voxel_resolution=0.01, use_dense_mips=False,
                     node_capacity=1 << 21, leaf_capacity=1 << 19,
                     insert_unique_cap=1 << 18)
    scene = sources.default_scene()
    frames = []
    gts = []
    for i in range(n_frames):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append(f)
        gts.append(gt)
    state = pipeline.init_state(cfg, initial_pose=gts[0])
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="cone"),
                   donate_argnums=0)
    for i in range(2):
        state, out = step(state, frames[i])
    sync(out.framebuffer)
    fl = sync_floor()
    t0 = time.perf_counter()
    for i in range(2, n_frames):
        state, out = step(state, frames[i])
    sync(out.framebuffer)
    dt = (time.perf_counter() - t0 - fl) / (n_frames - 2)
    print(json.dumps({
        "config": "depth10_track_fuse_cone", "metric":
        "track_fuse_cone_fps_depth10", "value": round(1.0 / dt, 2),
        "unit": "fps", "octree_depth": 10, "voxel_m": 0.01,
        "dense_mips": False, "frames": n_frames - 2,
        "map_nodes": int(out.map_nodes),
    }))


def config_slam1cm(n_frames=10, fuse_level=1):
    """Track + fuse + cone at the reference's 1 cm SLAM voxel size
    (/root/reference/src/world/scene.cpp:94) — the strict resolution-parity
    arm (round-2 verdict item #1). Depth 9 puts 1 cm leaves over a 5.12 m
    volume; fusion reads pyramid level 1 (320x240 = 76.8k points, ray
    spacing 2z/fx ~ 7.5 mm at 2 m — below the leaf size, so surfaces
    within ~2.7 m still land >= 1 sample per leaf) and unique_cap equals
    the point count, so overflow is impossible and every frame fuses in
    ONE pass. ATE is recorded against the orbit ground truth.

    fuse_level=0 is the strictest arm: every full-res pixel fuses
    losslessly (~150-250k distinct 1 cm leaves/frame — the unique-count-
    bound regime the insert directory cache exists for)."""
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.sensor import sources

    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.01, use_dense_mips=False,
                     fuse_level=fuse_level, node_capacity=1 << 21,
                     leaf_capacity=1 << 19,
                     insert_unique_cap=((640 >> fuse_level)
                                        * (480 >> fuse_level)))
    scene = sources.default_scene()
    frames, gts = [], []
    for i in range(n_frames):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append(f)
        gts.append(gt)
    state = pipeline.init_state(cfg, initial_pose=gts[0])
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="cone"),
                   donate_argnums=0)
    poses = [None] * n_frames
    for i in range(2):
        state, out = step(state, frames[i])
        poses[i] = out.pose
    sync(out.framebuffer)
    fl = sync_floor()
    t0 = time.perf_counter()
    for i in range(2, n_frames):
        state, out = step(state, frames[i])
        poses[i] = out.pose  # device array: no fetch inside the timed loop
    sync(out.framebuffer)
    dt = (time.perf_counter() - t0 - fl) / (n_frames - 2)
    from octree_slam_tpu.utils import metrics
    ate = metrics.ate_rmse(np.asarray(jnp.stack(poses)), np.stack(gts))
    print(json.dumps({
        "config": ("slam1cm_track_fuse_cone" if fuse_level
                   else "slam1cm_fullres_track_fuse_cone"), "metric":
        "track_fuse_cone_fps_1cm", "value": round(1.0 / dt, 2),
        "unit": "fps", "octree_depth": 9, "voxel_m": 0.01,
        "fuse_level": fuse_level, "frames": n_frames - 2,
        "ate_rmse_m": round(float(ate), 5),
        "map_nodes": int(out.map_nodes),
        "map_leaves": int(out.map_leaves),
        "unique_overflow_any": bool(out.unique_overflow),
    }))


def config_warm_march(n_rounds=4):
    """The EXACT cone marcher on a WARM map: the march is
    accumulation-bound while alpha is low (a cold map needs ~87 while-loop
    trips at p99); once leaves saturate (alpha blend adds 2/observation,
    fillNodes svo.cu:326-332), rays terminate at first surface contact.
    Measures the reference-semantics path's best case alongside the slab
    compositor's PSNR on the same map."""
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.sensor import sources

    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20,
                     leaf_capacity=1 << 17)
    scene = sources.default_scene()
    frames = []
    for i in range(14):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append((gt, f))
    state = pipeline.init_state(cfg, initial_pose=frames[0][0])
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="none"),
                   donate_argnums=0)
    # saturate alpha: replay the stream n_rounds times (+2 alpha per
    # observation; ~64 rounds saturate fully, a few push past the
    # occupancy threshold everywhere the camera saw)
    for _ in range(n_rounds):
        for gt, f in frames:
            state, out = step(state, f)
    sync(out.pose)

    render = jax.jit(lambda s, f: pipeline.step(s, f, cfg,
                                                render="cone_march"),
                     donate_argnums=0)
    state, out = render(state, frames[0][1])
    sync(out.framebuffer)
    fl = sync_floor()
    t0 = time.perf_counter()
    n = 3
    for i in range(1, 1 + n):
        state, out = render(state, frames[i % 14][1])
    sync(out.framebuffer)
    dt = (time.perf_counter() - t0 - fl) / n
    print(json.dumps({
        "config": "warm_map_exact_cone_march", "metric": "cone_march_fps",
        "value": round(1.0 / dt, 2), "unit": "fps",
        "warm_rounds": n_rounds, "map_nodes": int(out.map_nodes),
        "note": "measured 1.15 fps vs 1.2 cold: alpha saturation does NOT "
                "speed the march, because the all-lanes lax.while_loop is "
                "bound by its SLOWEST ray (misses and grazers marching "
                "toward max_range), not the average — per-trip cost is "
                "~7 ms flat regardless of how many lanes already "
                "terminated. That worst-lane bound is the structural "
                "reason the slab compositor (per-leaf scatter, no rays) "
                "replaces marching on TPU (render/conesplat.py)",
    }))


def config_cone_scale():
    """The EXACT marcher at cfg.cone_scale s: march (W/s, H/s) rays with
    scaled intrinsics, nearest-upsample s x back (pipeline.step's
    render="cone_march" path, cone_tracing_kernels.cu:157-198 semantics at
    reduced ray count). Records fps per scale plus PSNR of the upsampled
    image vs the full-ray march — the recommended hybrid when exact march
    SEMANTICS are required at interactive rates (the slab compositor
    remains the real-time default)."""
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.render import raycast
    from octree_slam_tpu.sensor import sources

    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20,
                     leaf_capacity=1 << 17)
    scene = sources.default_scene()
    state = pipeline.init_state(cfg, initial_pose=sources.orbit_pose(0.0))
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="none"),
                   donate_argnums=0)
    for i in range(14):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        state, out = step(state, f)
    sync(out.pose)
    pose = state.pose
    lvl = pipeline._accel_level(cfg)
    pool, cache = pipeline.heal_for_march(state, cfg)
    sync(cache.values)

    # big arrays must be ARGUMENTS (a closure capture embeds the ~600 MB
    # mips cache as a jit constant; the tunnel rejects the upload)
    def march_at(s):
        return jax.jit(lambda c, T: raycast.cone_trace_dense(
            c, pool.center, pool.half_size, T,
            cfg.focal_x / s, cfg.focal_y / s,
            width=cfg.width // s, height=cfg.height // s,
            max_depth=cfg.max_depth, dist_level=lvl,
            max_iters=cfg.max_march_iters, max_range=cfg.max_range,
            start_dist=cfg.start_dist, max_skip=cfg.dist_max_skip))

    results = {}
    ref_img = None
    for s in (1, 2, 4):
        fn = march_at(s)
        fb = fn(cache, pose)
        sync(fb)
        fl = sync_floor()
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            fb = fn(cache, pose)
        sync(fb)
        dt = (time.perf_counter() - t0 - fl) / n
        img = np.asarray(fb)
        if s == 1:
            ref_img = img
            results["fps_scale1"] = round(1.0 / dt, 2)
        else:
            up = np.repeat(np.repeat(img, s, axis=0), s, axis=1)
            up = up[:cfg.height, :cfg.width]
            results[f"fps_scale{s}"] = round(1.0 / dt, 2)
            results[f"psnr_scale{s}_db"] = round(
                _psnr_db(ref_img, up), 2)

    # full track+fuse+march step at scale 4 (the hybrid's production
    # configuration: exact march semantics at 1/16 rays): the render-only
    # figures above exclude fusion and the eager interior/dist refresh
    # that cone_march frames pay
    import dataclasses
    cfg4 = dataclasses.replace(cfg, cone_scale=4)
    step4 = jax.jit(lambda s, f: pipeline.step(s, f, cfg4,
                                               render="cone_march"),
                    donate_argnums=0)
    scene4 = sources.default_scene()
    st4 = pipeline.init_state(cfg4, initial_pose=sources.orbit_pose(0.0))
    fr = []
    for i in range(8):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene4, gt, cfg4.focal_x, cfg4.focal_y,
                                 width=cfg4.width, height=cfg4.height)
        sync(f.depth)
        fr.append(f)
    for i in range(2):
        st4, o4 = step4(st4, fr[i])
    sync(o4.framebuffer)
    fl = sync_floor()
    t0 = time.perf_counter()
    for i in range(2, 8):
        st4, o4 = step4(st4, fr[i])
    sync(o4.framebuffer)
    dt = (time.perf_counter() - t0 - fl) / 6
    results["track_fuse_march_fps_scale4"] = round(1.0 / dt, 2)

    print(json.dumps({
        "config": "exact_march_cone_scale", "metric": "cone_march_fps_s2",
        "value": results["fps_scale2"], "unit": "fps",
        **results, "map_nodes": int(out.map_nodes),
    }))


def _rgbd_arm(w: float, n_frames=10):
    """One w_rgbd arm of the photometric A/B (subprocess body)."""
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.utils import metrics
    from octree_slam_tpu.sensor import sources

    import dataclasses
    scene = sources.default_scene()
    base = SLAMConfig(width=640, height=480, max_depth=9,
                      voxel_resolution=0.02, node_capacity=1 << 20,
                      leaf_capacity=1 << 17)
    frames, gts = [], []
    for i in range(n_frames):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, base.focal_x, base.focal_y,
                                 width=base.width, height=base.height)
        sync(f.depth)
        frames.append(f)
        gts.append(gt)
    cfg = dataclasses.replace(base, w_rgbd=w)
    state = pipeline.init_state(cfg, initial_pose=gts[0])
    step = jax.jit(lambda s, f, _cfg=cfg: pipeline.step(
        s, f, _cfg, render="cone"), donate_argnums=0)
    poses = [None] * n_frames
    for i in range(2):
        state, out = step(state, frames[i])
        poses[i] = out.pose
    sync(out.framebuffer)
    fl = sync_floor()
    t0 = time.perf_counter()
    for i in range(2, n_frames):
        state, out = step(state, frames[i])
        poses[i] = out.pose
    sync(out.framebuffer)
    dt = (time.perf_counter() - t0 - fl) / (n_frames - 2)
    ate = metrics.ate_rmse(np.asarray(jnp.stack(poses)), np.stack(gts))
    print(json.dumps({"rgbd_arm": w, "frames": n_frames - 2,
                      "ate_rmse_m": round(float(ate), 5),
                      "fps": round(1.0 / dt, 2)}), flush=True)


def config_rgbd_term(n_frames=10):
    """ICP + photometric RGBD tracking A/B (round-2 verdict item #8): the
    reference sketches the combined system at rgbd_camera.cpp:131-141 with
    W_RGBD=0.1 (:20) but its kernel is an empty stub
    (localization_kernels.cu:328-331); ours is implemented
    (sensor/tracking.py:132-216). Records ATE + fps for w_rgbd in
    {0.0, 0.1} on the same orbit stream.

    Each arm runs in its OWN PROCESS (--rgbd-arm): a measured axon
    platform defect makes the SECOND jitted step program in one process
    die with INVALID_ARGUMENT at its first or second fetch — per-frame
    pacing, gc, and jax.clear_caches() between arms were all tried and
    none helped; only process isolation is reliable (the first program in
    a process has never failed this way)."""
    import subprocess
    import sys

    out_line = {"config": "rgbd_photometric_term", "metric":
                "ate_rmse_m_wrgbd0.1", "unit": "m", "frames": n_frames - 2}
    for w in (0.0, 0.1):
        r = subprocess.run(
            [sys.executable, __file__, "--config", "rgbdterm",
             "--rgbd-arm", str(w)],
            capture_output=True, text=True, timeout=1200)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        arm = json.loads(line)
        key = str(w).rstrip("0").rstrip(".") if w else "0"
        out_line[f"ate_rmse_m_w{key}"] = arm["ate_rmse_m"]
        out_line[f"fps_w{key}"] = arm["fps"]
    out_line["value"] = out_line["ate_rmse_m_w0.1"]
    print(json.dumps(out_line))


def config_tum(n_frames=30):
    from octree_slam_tpu import app
    from octree_slam_tpu.io import native
    from octree_slam_tpu.io.tum import TUMDataset
    from examples.make_tum_sequence import write_sequence

    root = "/tmp/tum_synth_bench"
    if not pathlib.Path(root, "depth.txt").exists():
        write_sequence(root, n_frames)
    ds = TUMDataset(root, max_frames=n_frames)
    cfg = SLAMConfig(width=640, height=480, focal_x=ds.FX, focal_y=ds.FY,
                     max_depth=9, voxel_resolution=0.02,
                     node_capacity=1 << 20, leaf_capacity=1 << 17)
    init = ds.gt_pose(0)
    # warm pass compiles the step jits so fps is steady-state replay
    warm = ds.prefetched()
    app.run_slam(lambda i: next(warm), 2, cfg, initial_pose=init,
                 render_every=1, render_mode="splat")
    # end-to-end: decode (native prefetcher) + host->device + SLAM step
    frames = ds.prefetched()
    res_e2e = app.run_slam(lambda i: next(frames), len(ds), cfg,
                           initial_pose=init, gt_fn=ds.gt_pose,
                           render_every=1, render_mode="splat")
    # device-resident: frames pre-staged in HBM (how a live sensor feed
    # pipelines), isolating the SLAM compute from the remote-tunnel H2D
    staged = [ds.frame(i) for i in range(len(ds))]
    for f in staged:
        sync(f.depth)
    res = app.run_slam(lambda i: staged[i], len(ds), cfg,
                       initial_pose=init, gt_fn=ds.gt_pose,
                       render_every=1, render_mode="splat")
    print(json.dumps({
        "config": "tum_format_replay", "metric": "slam_fps",
        "value": round(res.fps, 2), "unit": "fps",
        "e2e_fps_incl_decode_upload": round(res_e2e.fps, 2),
        "ate_rmse_m": round(res.ate_rmse, 5) if res.ate_rmse else None,
        "frames": res.frames, "diverged": res.diverged,
        "native_prefetcher": native.available(),
        "note": "synthetic sequence in exact TUM on-disk format (no real "
                "fr1/desk in this offline environment); exercises "
                "association, quaternions, PNG prefetch, 5000/m depth; "
                "e2e rate is bound by per-frame H2D through the remote "
                "TPU tunnel",
    }))


def config_hybrid(n_stream=14, n_fresh=32, band_cap=0, band_iters=24,
                  compact_after=999, seed_halo=4, accel_level=6,
                  full_pipeline=True):
    """Hybrid cone renderer (render/hybrid.py) on the HEADLINE bench
    configuration: track+fuse+hybrid throughput plus clean-single-pass-map
    PSNR vs the exact march (bench.py's fidelity methodology) — the
    round-3 verdict item #1 numbers."""
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.render import conesplat, hybrid
    from octree_slam_tpu.sensor import sources
    import dataclasses

    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20,
                     leaf_capacity=1 << 17, accel_level=accel_level,
                     cone_band_cap=band_cap, cone_band_iters=band_iters,
                     cone_band_compact_after=compact_after)
    scene = sources.default_scene()
    frames, gts = [], []
    for i in range(n_stream):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append(f)
        gts.append(gt)

    results = {}
    if full_pipeline:
        # FRESH-stream throughput (the production case): a replayed
        # 14-frame loop re-tracks from drifted poses and ghost-fuses new
        # leaves every frame, charging the hybrid dist-refresh + pager
        # work a real stream at steady state never pays
        fresh = []
        for i in range(n_fresh):
            gt = sources.orbit_pose(0.14 + i * 0.01, radius=2.0)
            f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
            sync(f.depth)
            fresh.append(f)
        state = pipeline.init_state(cfg, initial_pose=gts[0])
        step = jax.jit(lambda s, f: pipeline.step(s, f, cfg,
                                                  render="cone_hybrid"),
                       donate_argnums=0)
        for i in range(2):
            state, out = step(state, frames[i])
        sync(out.framebuffer)
        fl = sync_floor()
        t0 = time.perf_counter()
        for i in range(2, n_stream):
            state, out = step(state, frames[i])
        sync(out.framebuffer)
        dt = (time.perf_counter() - t0 - fl) / (n_stream - 2)
        results["track_fuse_hybrid_fps_replay"] = round(1.0 / dt, 2)
        t0 = time.perf_counter()
        for f in fresh:
            state, out = step(state, f)
        sync(out.framebuffer)
        dt = (time.perf_counter() - t0 - fl) / n_fresh
        results["track_fuse_hybrid_fps"] = round(1.0 / dt, 2)

    # fidelity on a clean single-pass map (bench.py methodology: replayed
    # streams through donated state ghost-fuse the comparison map)
    state = pipeline.init_state(cfg, initial_pose=gts[0])
    stepn = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="splat"),
                    donate_argnums=0)
    for i in range(n_stream - 1):
        state, _ = stepn(state, frames[i])
    sync(state.pose)
    s1 = jax.tree_util.tree_map(jnp.copy, state)
    s2 = jax.tree_util.tree_map(jnp.copy, state)
    s3 = jax.tree_util.tree_map(jnp.copy, state)
    st_h, out_h = pipeline.step(s1, frames[-1], cfg, render="cone_hybrid")
    _, out_m = pipeline.step(s2, frames[-1], cfg, render="cone_march")
    _, out_s = pipeline.step(s3, frames[-1], cfg, render="cone")
    h = np.asarray(out_h.framebuffer)
    m = np.asarray(out_m.framebuffer)
    sl = np.asarray(out_s.framebuffer)
    results["hybrid_psnr_db"] = round(_psnr_db(h, m), 2)
    results["slab_psnr_db"] = round(_psnr_db(sl, m), 2)

    # --- band diagnostics on the clean map: where does the hybrid's
    # error actually live vs the slab's? ---
    lvl = pipeline._accel_level(cfg)
    spec_d = conesplat.make_slab_spec(
        width=cfg.width, height=cfg.height, fx=cfg.focal_x,
        leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
        z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
        max_scale=cfg.cone_max_scale)
    fb_d, dbg = hybrid.render_cone_hybrid(
        st_h.leaves, st_h.accel, st_h.pool.center, st_h.pool.half_size,
        out_h.pose, cfg.focal_x, cfg.focal_y, spec=spec_d,
        depth=cfg.max_depth, dist_level=lvl, band_cap=cfg.cone_band_cap,
        band_iters=cfg.cone_band_iters,
        compact_after=cfg.cone_band_compact_after, seed_halo=seed_halo,
        debug_band=True)
    sel = np.asarray(dbg["sel"])
    usem = np.asarray(dbg["use_march"])
    wl = np.asarray(dbg["w"])
    hh = np.asarray(fb_d)[..., :3].reshape(-1, 3)
    mm = m[..., :3].reshape(-1, 3)
    ss = sl[..., :3].reshape(-1, 3)
    nall = cfg.width * cfg.height
    band = np.zeros(nall, bool)
    band[sel] = True
    mse = lambda a, b, msk: float(((a[msk] - b[msk]) ** 2).mean())
    results["diag_use_march_frac"] = round(float(usem.mean()), 4)
    results["diag_capped_frac"] = round(
        float(np.asarray(dbg["capped"]).mean()), 4)
    results["diag_trips"] = int(dbg["trips"])
    results["diag_inband_mse_hybrid"] = round(mse(hh, mm, band), 6)
    results["diag_inband_mse_slab"] = round(mse(ss, mm, band), 6)
    results["diag_outband_mse_slab"] = round(mse(ss, mm, ~band), 6)
    results["diag_band_share_of_slab_mse"] = round(
        mse(ss, mm, band) * band.mean()
        / max(mse(ss, mm, band) * band.mean()
              + mse(ss, mm, ~band) * (~band).mean(), 1e-12), 4)

    # render-only timing of the hybrid on the final map (A/B vs the slab)
    spec = conesplat.make_slab_spec(
        width=cfg.width, height=cfg.height, fx=cfg.focal_x,
        leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
        z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
        max_scale=cfg.cone_max_scale)

    def rh(st, T):
        return hybrid.render_cone_hybrid(
            st.leaves, st.accel, st.pool.center, st.pool.half_size, T,
            cfg.focal_x, cfg.focal_y, spec=spec, depth=cfg.max_depth,
            dist_level=lvl, band_cap=cfg.cone_band_cap,
            band_iters=cfg.cone_band_iters,
            compact_after=cfg.cone_band_compact_after,
            seed_halo=seed_halo)

    fn = jax.jit(rh)
    fb = fn(s1, s1.pose)
    sync(fb)
    fl = sync_floor()
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        fb = fn(s1, s1.pose)
    sync(fb)
    dt = (time.perf_counter() - t0 - fl) / n
    results["hybrid_render_only_fps"] = round(1.0 / dt, 2)

    print(json.dumps({
        "config": "hybrid_cone", "metric": "track_fuse_hybrid_fps",
        "value": results.get("track_fuse_hybrid_fps", 0.0), "unit": "fps",
        "band_cap": band_cap or (cfg.width * cfg.height // 4),
        "band_iters": band_iters, "compact_after": compact_after,
        "seed_halo": seed_halo,
        **results,
    }))
    return results


def config_satgate(n_warm=72, n_timed=8):
    """Saturation pre-gate at strict full-res 1 cm fusion parity
    (round-3 verdict item #2): warm the map past alpha saturation
    (64 observations), then time steady-state gated frames vs the
    ungated control, and measure the map-content drift the gate trades
    for the speed (truncation creep, see tests/test_satgate.py)."""
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.sensor import sources
    import dataclasses

    base = SLAMConfig(width=640, height=480, max_depth=9,
                      voxel_resolution=0.01, use_dense_mips=False,
                      fuse_level=0, node_capacity=1 << 21,
                      leaf_capacity=1 << 19,
                      insert_unique_cap=640 * 480)
    cfg_g = dataclasses.replace(base, saturation_gate=True,
                                insert_unique_cap=1 << 16)
    scene = sources.default_scene()
    n = n_warm + n_timed
    frames, gts = [], []
    for i in range(n):
        # tight arc: the camera keeps re-observing the same surfaces, the
        # long-session steady state the gate targets
        gt = sources.orbit_pose(i * 0.004, radius=2.0)
        f = sources.render_frame(scene, gt, base.focal_x, base.focal_y,
                                 width=base.width, height=base.height)
        sync(f.depth)
        frames.append(f)
        gts.append(gt)

    def run_arm(cfg, tag, results):
        state = pipeline.init_state(cfg, initial_pose=gts[0])
        step = jax.jit(lambda s, f: pipeline.step(s, f, cfg,
                                                  render="cone"),
                       donate_argnums=0)
        t0 = time.perf_counter()
        for i in range(n_warm):
            state, out = step(state, frames[i])
        sync(out.framebuffer)
        warm_s = time.perf_counter() - t0
        fl = sync_floor()
        t0 = time.perf_counter()
        for i in range(n_warm, n):
            state, out = step(state, frames[i])
        sync(out.framebuffer)
        dt = (time.perf_counter() - t0 - fl) / n_timed
        results[f"{tag}_steady_fps"] = round(1.0 / dt, 2)
        results[f"{tag}_warm_fps"] = round(n_warm / warm_s, 2)
        results[f"{tag}_map_leaves"] = int(out.map_leaves)
        assert not bool(out.diverged)
        return state

    results = {}
    st_g = run_arm(cfg_g, "gated", results)
    st_c = run_arm(base, "lossless", results)

    # map-content drift: same leaf SET and alphas required; channel creep
    # (1 level/frame toward darker observations at weight 1/256) is the
    # quantization-equivalence bound being bought
    def union(st):
        k = np.asarray(st.leaves.keys)
        v = np.asarray(st.leaves.vals)
        live = k >= 0
        o = np.argsort(k[live], kind="stable")
        return k[live][o], v[live][o]

    kg, vg = union(st_g)
    kc, vc = union(st_c)
    same_keys = kg.size == kc.size and bool(np.all(kg == kc))
    results["drift_same_leaf_set"] = same_keys
    if same_keys:
        diffs = []
        for shift in (0, 8, 16):
            diffs.append(np.abs(((vg >> shift) & 0xFF).astype(int)
                                - ((vc >> shift) & 0xFF).astype(int)))
        d = np.stack(diffs)
        results["drift_max_channel_levels"] = int(d.max())
        results["drift_mean_channel_levels"] = round(float(d.mean()), 4)
        results["drift_leaves_changed_frac"] = round(
            float((d.max(axis=0) > 0).mean()), 4)
        ag = (vg >> 24) & 0xFF
        ac = (vc >> 24) & 0xFF
        results["drift_alpha_equal"] = bool(np.all(ag == ac))

    print(json.dumps({
        "config": "slam1cm_fullres_saturation_gate",
        "metric": "track_fuse_cone_fps_1cm_fullres_steady",
        "value": results.get("gated_steady_fps", 0.0), "unit": "fps",
        "octree_depth": 9, "voxel_m": 0.01, "fuse_level": 0,
        "unique_cap_gated": cfg_g.insert_unique_cap,
        "n_warm": n_warm, "n_timed": n_timed,
        **results,
    }))
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="all",
                   choices=["cube", "textured", "bunny", "cow", "sponza",
                            "cone1080p", "capstone1080", "depth10",
                            "slam1cm", "slam1cmfull", "warmmarch",
                            "conescale", "rgbdterm", "tum", "hybrid",
                            "satgate", "all"])
    p.add_argument("--band-cap", type=int, default=0)
    p.add_argument("--band-iters", type=int, default=24)
    p.add_argument("--compact-after", type=int, default=999)
    p.add_argument("--accel-level", type=int, default=6)
    p.add_argument("--seed-halo", type=int, default=4)
    p.add_argument("--render-only", action="store_true",
                   help="hybrid config: skip the full-pipeline pass "
                        "(cheaper knob sweeps)")
    p.add_argument("--rgbd-arm", type=float, default=None,
                   help="internal: run ONE w_rgbd arm in this process "
                        "(see config_rgbd_term's process-isolation note)")
    args = p.parse_args()
    if args.rgbd_arm is not None:
        _rgbd_arm(args.rgbd_arm)
        return
    runs = {
        "cube": lambda: config_mesh_cone(
            "cube_voxelize_raycast_d6", f"{REF}/objs/cube.obj", None,
            log_n=6),
        "textured": lambda: config_mesh_cone(
            "textured_voxelize_cone_256", f"{REF}/objs/teapot_tex.obj",
            f"{REF}/textures/texture1.bmp", log_n=8),
        # the other textured assets the reference ships (BASELINE.json
        # names bunny_tex; dragon.obj does not exist in the tree)
        "bunny": lambda: config_mesh_cone(
            "bunny_tex_voxelize_cone_256", f"{REF}/objs/bunny_tex.obj",
            f"{REF}/textures/texture2.bmp", log_n=8),
        "cow": lambda: config_mesh_cone(
            "cow_tex_voxelize_cone_256", f"{REF}/objs/cow_tex.obj",
            f"{REF}/textures/cow.bmp", log_n=8),
        "sponza": config_sponza_orbit,
        "cone1080p": config_cone_1080p,
        "capstone1080": config_capstone1080,
        "depth10": config_depth10,
        "slam1cm": config_slam1cm,
        "slam1cmfull": lambda: config_slam1cm(fuse_level=0),
        "warmmarch": config_warm_march,
        "conescale": config_cone_scale,
        "rgbdterm": config_rgbd_term,
        "tum": config_tum,
        "hybrid": lambda: config_hybrid(
            band_cap=args.band_cap, band_iters=args.band_iters,
            compact_after=args.compact_after, seed_halo=args.seed_halo,
            accel_level=args.accel_level,
            full_pipeline=not args.render_only),
        "satgate": config_satgate,
    }
    for name, fn in runs.items():
        if args.config in ("all", name):
            fn()


if __name__ == "__main__":
    main()
