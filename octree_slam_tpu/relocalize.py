"""Tracking-loss recovery: relocalize the camera against map renders.

The reference detects divergence and gives up — computeICPCost2's NaN check
prints "Camera tracking is lost" and aborts the level
(rgbd_camera.cpp:148-151); the pose freezes while frames keep arriving.
This module adds the recovery the reference lacks (beyond-parity,
SURVEY.md section 5 "failure detection ... no relocalization"):

  1. The app records a small ring of KEYPOSES while tracking is healthy
     (every cfg.keypose_every frames).
  2. On divergence, each recent keypose becomes a candidate: the map is
     rendered into a synthetic depth image at that pose (the splat
     z-buffer — the same packed word the display path uses), a standard
     vertex/normal pyramid is built from it, and the live frame is ICP'd
     against the RENDERED view with the production coarse-to-fine tracker.
  3. The best candidate whose full-resolution inlier count clears
     cfg.reloc_min_inlier_frac re-anchors the pose; the sticky diverged
     flag clears and tracking resumes frame-to-frame.

One attempt is one jitted program per candidate (render -> pyramid ->
track -> score) plus one packed fetch; recovery is rare, so the host loop
cost is irrelevant. While diverged, pipeline.step gates fusion
(insert valid &= ~diverged), so a lost camera stops poisoning the map —
frames between loss and recovery are simply not fused, mirroring the
reference's abort-without-update (rgbd_camera.cpp:151 returns before the
frame swap).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.render.splat import EMPTY, LeafList, \
    dilate_zbuffer, splat_zbuffer
from octree_slam_tpu.sensor import tracking


def pyramid_from_zbuffer(buf: jnp.ndarray, cfg: SLAMConfig):
    """Packed splat z-buffer (i32[H*W], depth<<16 | rgb565) -> synthetic
    vertex/normal pyramid: unpack quantized depth (0.3 mm steps at 10 m —
    well under the leaf size) and run the standard sensor preprocessing.
    Shared by the single-chip model_pyramid and the sharded recovery path
    (distributed.model_zbuffer_sharded produces the same buffer with a
    per-shard scatter + pmin)."""
    # leaf centers splat one point each: close sub-footprint holes before
    # differencing normals, or the model view is unusably sparse
    buf = dilate_zbuffer(buf, width=cfg.width, height=cfg.height,
                         rounds=3).reshape(-1)
    hit = buf != EMPTY
    qz = jnp.where(hit, buf >> 16, 0)
    depth_mm = (qz.astype(jnp.float32) * (cfg.max_range / 32766.0)
                * 1e3).astype(jnp.uint16).reshape(cfg.height, cfg.width)
    color = jnp.zeros((cfg.height, cfg.width, 3), jnp.uint8)
    # allow_pallas=False: this runs under score_candidates' vmap, and a
    # vmapped pallas_call hangs the axon remote compile (measured)
    return tracking.build_pyramid(depth_mm, color, cfg, allow_pallas=False)


def model_pyramid(leaves: LeafList, center: jnp.ndarray, half_size,
                  pose: jnp.ndarray, cfg: SLAMConfig):
    """Synthetic vertex/normal pyramid of the MAP as seen from `pose`:
    splat the leaf registry into a packed z-buffer, then
    pyramid_from_zbuffer. Good for COARSE alignment only: occupancy leaves
    render blocky and the nearest-fill dilation biases depth toward the
    camera (per-frame hot-path model tracking was measured to degrade ATE
    0.22 -> 0.90 m and rejected; recovery needs only cm-scale accuracy)."""
    live = (jnp.arange(leaves.keys.shape[0]) < leaves.count) \
        & (leaves.keys >= 0)
    buf = splat_zbuffer(leaves.vals, leaves.keys, live, center, half_size,
                        pose, cfg.focal_x, cfg.focal_y,
                        width=cfg.width, height=cfg.height,
                        depth=cfg.max_depth, max_range=cfg.max_range)
    return pyramid_from_zbuffer(buf, cfg)


def _score_pyramid(model_pyr, candidate: jnp.ndarray, live_pyramid,
                   cfg: SLAMConfig) -> jnp.ndarray:
    """ICP the live pyramid against a rendered model pyramid. Returns one
    packed f32[19] row: pose.ravel() ++ [inliers, residual, ok] where
    pose = candidate @ update."""
    update_T, stats = tracking.track(list(model_pyr), list(live_pyramid),
                                     cfg)
    pose = candidate @ update_T
    # stats rows are appended coarse -> fine; the last is the finest
    # TRACKED level (cfg.track_finest_level)
    inliers = stats.inliers[-1]
    residual = stats.residual[-1]
    # the finest TRACKED level has num_pixels >> 2*track_finest_level
    # candidates, so the inlier fraction gates against that count
    n_px_tracked = cfg.num_pixels >> (2 * cfg.track_finest_level)
    min_inl = jnp.int32(cfg.reloc_min_inlier_frac * n_px_tracked)
    ok = (~stats.diverged) & (inliers >= min_inl) \
        & jnp.all(jnp.isfinite(pose))
    return jnp.concatenate([
        pose.ravel(),
        jnp.stack([inliers.astype(jnp.float32), residual,
                   ok.astype(jnp.float32)])])


def _score_one(leaves: LeafList, center: jnp.ndarray, half_size,
               candidate: jnp.ndarray, live_pyramid, cfg: SLAMConfig
               ) -> jnp.ndarray:
    """Render the map at `candidate`, ICP the live pyramid against it."""
    model_pyr = model_pyramid(leaves, center, half_size, candidate, cfg)
    return _score_pyramid(model_pyr, candidate, live_pyramid, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def score_zbuffer(buf: jnp.ndarray, candidate: jnp.ndarray, live_pyramid,
                  cfg: SLAMConfig) -> jnp.ndarray:
    """Score ONE candidate from a pre-rendered packed z-buffer (the
    sharded recovery path: distributed.model_zbuffer_sharded renders the
    Morton-sharded map, this scores it replicated). Same f32[19] row as
    score_candidates."""
    model_pyr = pyramid_from_zbuffer(buf, cfg)
    return _score_pyramid(model_pyr, candidate, live_pyramid, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def score_candidates(leaves: LeafList, center: jnp.ndarray, half_size,
                     candidates: jnp.ndarray, live_pyramid,
                     cfg: SLAMConfig) -> jnp.ndarray:
    """All K candidates in ONE vmapped program -> f32[K, 19], read with a
    single fetch (per-candidate programs each pay a full tunnel round
    trip, ~30-90 ms, and a lost camera attempts recovery EVERY frame)."""
    return jax.vmap(lambda c: _score_one(leaves, center, half_size, c,
                                         live_pyramid, cfg))(candidates)


def relocalize(state, cfg: SLAMConfig, keyposes: List[np.ndarray]
               ) -> Tuple[np.ndarray | None, bool, dict]:
    """Try the most recent cfg.reloc_candidates keyposes against the live
    frame (state.last_pyramid). Returns (pose, ok, diagnostics); the best
    accepted candidate wins by inlier count."""
    cands = [np.asarray(c, np.float32)
             for c in keyposes[::-1][:cfg.reloc_candidates]]
    if not cands:
        return None, False, {"candidates_tried": 0, "inliers": -1,
                             "residual": None}
    tried = len(cands)
    while len(cands) < cfg.reloc_candidates:  # pad to the static K
        cands.append(cands[-1])
    host = np.asarray(score_candidates(
        state.leaves, state.pool.center, state.pool.half_size,
        jnp.asarray(np.stack(cands)), state.last_pyramid, cfg))
    ok = host[:, 18] > 0
    best_pose, best_inl, best_res = None, -1, None
    if ok.any():
        k = int(np.argmax(np.where(ok, host[:, 16], -1)))
        best_pose = host[k, :16].reshape(4, 4)
        best_inl = int(host[k, 16])
        best_res = float(host[k, 17])
    return best_pose, best_pose is not None, {
        "candidates_tried": tried, "inliers": best_inl,
        "residual": best_res}
