"""Point-to-plane ICP camera tracking over an image pyramid.

TPU-native rebuild of RGBDCamera::update (rgbd_camera.cpp:53-191) and the
ICP cost kernels (localization_kernels.cu). The per-thread-strip fused
gating+accumulation kernel plus 42-float thrust::reduce
(computeICPCostsUncorrespondedKernel, localization_kernels.cu:154-229,
reduce at :318) becomes a masked einsum building the 6x6 normal equations
directly on device; the host Cholesky round-trip (solveCholesky,
rgbd_camera.cpp:145,194-222) becomes jax.scipy cho_solve on device, so the
whole coarse-to-fine Gauss-Newton loop stays inside one jitted program.

Association is projective-by-pixel-index (no search), same as the reference.

Documented divergences (SURVEY.md section 7 risk (d)):
  * Jacobian is the mathematically correct point-to-plane linearization
    J = [v2 x n1; n1], r = n1.(v1 - v2). The reference's hand-packed G
    matrix (localization_kernels.cu:131-132,208-209) has wrong rows 0/2.
  * The incremental update is a proper SE(3) exponential; the reference
    composes per-axis glm::rotate calls interpreting radians as degrees
    (rgbd_camera.cpp:154-158).
  * Divergence (NaN solve) freezes the update for that level instead of
    aborting mid-iteration ("Camera tracking is lost", rgbd_camera.cpp:148).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core import se3
from octree_slam_tpu.core.types import PyramidLevel
from octree_slam_tpu.sensor import image_ops


class TrackStats(NamedTuple):
    inliers: jnp.ndarray    # i32[levels] inlier count at final iter per level
    residual: jnp.ndarray   # f32[levels] mean |r| at final iter per level
    diverged: jnp.ndarray   # bool[] any NaN solve


def build_pyramid(depth_mm: jnp.ndarray, color: jnp.ndarray,
                  cfg: SLAMConfig,
                  allow_pallas: bool = True) -> List[PyramidLevel]:
    """Bilateral filter + intensity + per-level vertex/normal maps
    (rgbd_camera.cpp:61-93). Level 0 is full resolution."""
    filtered = image_ops.bilateral_filter(
        depth_mm, kernel_size=cfg.bilateral_kernel_size,
        sigma_spatial=cfg.bilateral_sigma_spatial,
        sigma_depth=cfg.bilateral_sigma_depth,
        allow_pallas=allow_pallas)
    intensity = image_ops.color_to_intensity(color, cfg.intensity_ratio)
    levels = []
    d, inten = filtered, intensity
    # Levels finer than every consumer (ICP stops at track_finest_level,
    # fusion reads fuse_level) carry 1x1 placeholder maps: at 1080p the
    # full-res vertex+normal maps alone are ~4 ms/frame of pure waste when
    # both knobs are >= 1. The depth/intensity chain still runs at full
    # res — coarser levels are built from it.
    min_map_level = min(cfg.track_finest_level, cfg.fuse_level)
    for i in range(cfg.pyramid_depth):
        if i >= min_map_level:
            vertex = image_ops.generate_vertex_map(
                d, cfg.focal_x, cfg.focal_y, (cfg.width, cfg.height))
            normal = image_ops.generate_normal_map(vertex)
        else:
            vertex = jnp.full((1, 1, 3), jnp.inf, jnp.float32)
            normal = jnp.full((1, 1, 3), jnp.inf, jnp.float32)
        levels.append(PyramidLevel(vertex=vertex, normal=normal, intensity=inten))
        if i != cfg.pyramid_depth - 1:
            d = image_ops.subsample_depth(d, cfg.bilateral_sigma_depth,
                                          allow_pallas=allow_pallas)
            inten = image_ops.subsample(inten)
    return levels


def icp_normal_equations(v1: jnp.ndarray, n1: jnp.ndarray,
                         v2: jnp.ndarray, n2: jnp.ndarray,
                         cfg: SLAMConfig) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                   jnp.ndarray, jnp.ndarray]:
    """Build (A = sum J J^T, b = sum r J) over same-index correspondences.

    v1/n1: last-frame maps, v2/n2: current maps (any matching [..., 3]
    shapes). Gates per localization_kernels.cu:186-204: finiteness,
    0.1 < z < 10 for both, |v2-v1| <= 0.1, n2.n1 >= 0.87.
    Returns (A f32[6,6], b f32[6], inlier_count i32, mean_abs_residual f32).
    """
    v1 = v1.reshape(-1, 3)
    n1 = n1.reshape(-1, 3)
    v2 = v2.reshape(-1, 3)
    n2 = n2.reshape(-1, 3)

    finite = (
        jnp.all(jnp.isfinite(v1), axis=-1)
        & jnp.all(jnp.isfinite(v2), axis=-1)
        & jnp.all(jnp.isfinite(n1), axis=-1)
        & jnp.all(jnp.isfinite(n2), axis=-1)
    )
    v1c = jnp.where(finite[:, None], v1, 0.0)
    v2c = jnp.where(finite[:, None], v2, 0.0)
    n1c = jnp.where(finite[:, None], n1, 0.0)
    n2c = jnp.where(finite[:, None], n2, 0.0)

    z_ok = (
        (v1c[:, 2] > cfg.icp_z_min) & (v2c[:, 2] > cfg.icp_z_min)
        & (v1c[:, 2] < cfg.icp_z_max) & (v2c[:, 2] < cfg.icp_z_max)
    )
    diff = v2c - v1c
    dist_ok = jnp.sum(diff * diff, axis=-1) <= cfg.icp_dist_thresh ** 2
    norm_ok = jnp.sum(n2c * n1c, axis=-1) >= cfg.icp_norm_thresh
    mask = finite & z_ok & dist_ok & norm_ok

    if cfg.icp_symmetric:
        # symmetric point-to-plane: project the residual on BOTH surface
        # normals (n2 is already in the last frame here — the caller
        # transforms the current maps each iteration). The one-sided
        # linearization leaves a first-order bias along n1 wherever the
        # two normal estimates disagree (quantized depth makes them
        # disagree systematically on oblique surfaces); the symmetric
        # form cancels it (Rusinkiewicz, "A symmetric objective function
        # for ICP", 2019). Gates are unchanged.
        ns = n1c + n2c
        J = jnp.concatenate([jnp.cross(v2c, ns), ns], axis=-1)
        r = jnp.sum(ns * (v1c - v2c), axis=-1)
    else:
        J = jnp.concatenate([jnp.cross(v2c, n1c), n1c], axis=-1)  # [N, 6]
        r = jnp.sum(n1c * (v1c - v2c), axis=-1)                   # [N]
    w = mask.astype(jnp.float32)
    if cfg.icp_huber_k > 0.0:
        # IRLS: one Huber reweight per Gauss-Newton iteration (the
        # residuals are recomputed each iteration, so this IS iteratively
        # reweighted least squares across the scan)
        w = w * jnp.minimum(1.0, cfg.icp_huber_k / jnp.maximum(
            jnp.abs(r), 1e-9))
    Jw = J * w[:, None]
    # f32 accumulation on the MXU: force highest precision for the 6x6.
    A = jax.lax.dot_general(
        Jw, J, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    b = (r * w) @ J
    count = jnp.sum(mask.astype(jnp.int32))
    mean_res = jnp.sum(jnp.abs(r) * w) / jnp.maximum(count.astype(jnp.float32), 1.0)
    return A, b, count, mean_res


def rgbd_normal_equations(last: PyramidLevel, cur_vertex: jnp.ndarray,
                          cur_intensity: jnp.ndarray, level: int,
                          cfg: SLAMConfig):
    """Photometric (direct) alignment term.

    The reference scaffolds this (RGBDFrame intensity pyramids,
    rgbd_camera.cpp:83-85,111-141, W_RGBD=0.1 at :20) but computeRGBDCost is
    an empty stub (localization_kernels.cu:328-331). This is a working
    implementation: warp current-frame points into the last camera, compare
    intensities, linearize through the last image's gradient.

    For a residual model r(xi) ~ r0 + [v x m, m] . xi with m = dpi^T grad,
    we accumulate J = -[v x m, m] so the same (A, b) solve convention as the
    ICP term applies. Returns (A f32[6,6], b f32[6], count).

    Note: each Gauss-Newton iteration costs ~6 image gathers per pixel —
    enable via cfg.w_rgbd > 0 (default off, like the reference).
    """
    h, w = cur_intensity.shape
    img_w, img_h = cfg.width, cfg.height
    sx = w / img_w  # level pixel scale
    sy = h / img_h

    i1 = last.intensity
    # central-difference gradients of the last intensity image; the roll
    # wraps at the borders, producing finite but bogus cross-image
    # gradients — zero the border ring so warped points landing there
    # contribute no photometric force instead of a biased one
    gx = 0.5 * (jnp.roll(i1, -1, 1) - jnp.roll(i1, 1, 1))
    gy = 0.5 * (jnp.roll(i1, -1, 0) - jnp.roll(i1, 1, 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    interior = ((col > 0) & (col < w - 1) & (rowi > 0)
                & (rowi < h - 1)).astype(i1.dtype)
    gx = gx * interior
    gy = gy * interior

    v = cur_vertex.reshape(-1, 3)
    finite = jnp.all(jnp.isfinite(v), axis=-1)
    vc = jnp.where(finite[:, None], v, 1.0)
    X, Y, Z = vc[:, 0], vc[:, 1], vc[:, 2]
    z_ok = (Z > cfg.icp_z_min) & (Z < cfg.icp_z_max)

    px = (cfg.focal_x * X / Z + img_w / 2.0) * sx
    py = (img_h / 2.0 - cfg.focal_y * Y / Z) * sy
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    inb = finite & z_ok & (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)
    fxp = px - x0c
    fyp = py - y0c

    def bilinear(img):
        i00 = img[y0c, x0c]
        i01 = img[y0c, x0c + 1]
        i10 = img[y0c + 1, x0c]
        i11 = img[y0c + 1, x0c + 1]
        return (i00 * (1 - fxp) * (1 - fyp) + i01 * fxp * (1 - fyp)
                + i10 * (1 - fxp) * fyp + i11 * fxp * fyp)

    warped = bilinear(i1)
    g_u = bilinear(gx)
    g_v = bilinear(gy)

    r0 = warped - cur_intensity.reshape(-1)
    mask = inb & (jnp.abs(r0) < 0.3) & jnp.isfinite(r0) \
        & jnp.isfinite(g_u) & jnp.isfinite(g_v)

    # m = dpi^T grad: residual change per unit 3D motion of the point
    fx_l = cfg.focal_x * sx
    fy_l = cfg.focal_y * sy
    mx = g_u * fx_l / Z
    my = -g_v * fy_l / Z
    mz = -g_u * fx_l * X / (Z * Z) + g_v * fy_l * Y / (Z * Z)
    m = jnp.stack([mx, my, mz], axis=-1)
    J = -jnp.concatenate([jnp.cross(vc, m), m], axis=-1)
    wgt = mask.astype(jnp.float32)
    Jw = J * wgt[:, None]
    A = jax.lax.dot_general(
        Jw, J, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    b = (r0 * wgt) @ J
    return A, b, jnp.sum(mask.astype(jnp.int32))


def solve_normal_equations(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b on device (replaces the D2H copy + host LLT at
    rgbd_camera.cpp:145). Tiny Tikhonov damping guards rank deficiency."""
    damped = A + 1e-6 * jnp.trace(A) * jnp.eye(6, dtype=A.dtype) + 1e-12 * jnp.eye(6, dtype=A.dtype)
    factor = jax.scipy.linalg.cho_factor(damped)
    return jax.scipy.linalg.cho_solve(factor, b)


def _track_level(last: PyramidLevel, cur: PyramidLevel, level: int,
                 update_T, iters: int, cfg: SLAMConfig):
    """Gauss-Newton iterations at one pyramid level via lax.scan.

    Combines the geometric point-to-plane term with the photometric term
    when cfg.w_rgbd > 0 (the A1+A2 combination sketched at
    rgbd_camera.cpp:131-141).

    PERF NOTE (measured on v5e, device traces; do not re-try): this loop
    is ~2.4 ms/frame, ~11 tiny kernels x 19 iterations, and this shape is
    its measured optimum. Three rewrites that look like wins are not:
      * folding the rigid v2/n2 transform + count/|r| columns into one
        9-wide Gram dot_general broke XLA's producer fusion (the
        finiteness gates became standalone full-size reduce kernels):
        2.4 -> 3.6 ms/frame;
      * replacing cho_factor/cho_solve with a closed-form 3x3-block Schur
        solve (scalar or cross-product form) emitted MORE tiny kernels
        than the linalg path it replaced;
      * lax.scan(unroll=True) left device time unchanged (43.9 vs
        44.0 ms/4 frames) while inflating compile time, which map-growth
        recompiles pay again through the tunnel's unstable compile cache.
    The remaining cost is per-op dispatch in the scan body; shrinking it
    further means a Pallas mega-kernel per iteration (gates + Gram +
    solve), which trades ATE bit-stability for ~0.5 ms/frame."""
    v1, n1 = last.vertex, last.normal
    v2, n2 = cur.vertex, cur.normal

    def step(carry, _):
        T, diverged = carry
        v2t = image_ops.transform_vertex_map(v2, T)
        n2t = image_ops.transform_normal_map(n2, T)
        A, b, count, res = icp_normal_equations(v1, n1, v2t, n2t, cfg)
        if cfg.w_rgbd > 0.0:
            Ar, br, _ = rgbd_normal_equations(
                last, v2t, cur.intensity, level, cfg)
            A = A + cfg.w_rgbd * Ar
            b = b + cfg.w_rgbd * br
        x = solve_normal_equations(A, b)
        bad = ~jnp.all(jnp.isfinite(x)) | (count < 6)
        # twist is [omega, v] = [x[:3], x[3:]] by our Jacobian layout
        delta = se3.exp_se3(jnp.where(bad, jnp.zeros(6, x.dtype), x))
        new_T = delta @ T
        return (new_T, diverged | bad), (count, res)

    (update_T, diverged), (counts, residuals) = jax.lax.scan(
        step, (update_T, jnp.bool_(False)), None, length=iters)
    return update_T, diverged, counts[-1], residuals[-1]


@functools.partial(jax.jit, static_argnames=("cfg",))
def track(last_pyramid: List[PyramidLevel], current_pyramid: List[PyramidLevel],
          cfg: SLAMConfig,
          init_T: jnp.ndarray | None = None
          ) -> Tuple[jnp.ndarray, TrackStats]:
    """Coarse-to-fine ICP: returns cam_{t-1}_T_cam_t, the rigid transform
    aligning the current camera frame onto the last one, plus health stats
    (per-frame inlier/residual metrics; SURVEY.md section 5 failure
    detection).

    Mirrors the schedule at rgbd_camera.cpp:102-170: iterate levels
    coarse -> fine with cfg.pyramid_iters (fine-first order, like
    PYRAMID_ITERS), carrying the accumulated update across levels.

    init_T seeds the Gauss-Newton iterations (identity when omitted —
    the frame-to-frame case, where motion is sub-threshold). Keyframe
    anchoring passes the previous frame's keyframe-relative transform so
    the solver starts one frame, not one keyframe, from the optimum.
    """
    update_T = (jnp.eye(4, dtype=jnp.float32) if init_T is None
                else jnp.asarray(init_T, jnp.float32))
    diverged = jnp.bool_(False)
    inliers = []
    residuals = []
    # With track_finest_level > 0 the refinement stops early and
    # pyramid_iters re-anchors to the finest TRACKED level, so the same
    # {10,5,4} budget applies to the tracked sub-pyramid (the schedule was
    # tuned for a 640x480 sensor, rgbd_camera.cpp:19 — at 1080p level 1 is
    # the comparable scale).
    tfl = cfg.track_finest_level
    assert len(cfg.pyramid_iters) >= cfg.pyramid_depth - tfl, (
        f"pyramid_iters needs {cfg.pyramid_depth - tfl} entries for "
        f"pyramid_depth={cfg.pyramid_depth}, "
        f"track_finest_level={tfl}")
    for level in range(cfg.pyramid_depth - 1, tfl - 1, -1):
        update_T, div, count, res = _track_level(
            last_pyramid[level], current_pyramid[level], level,
            update_T, cfg.pyramid_iters[level - tfl], cfg)
        diverged = diverged | div
        inliers.append(count)
        residuals.append(res)
    # Skipped finer levels report the finest tracked level's stats so the
    # [-1] entry stays "finest available" for consumers (relocalize gates
    # on it; app logs keep pyramid_depth entries).
    for _ in range(tfl):
        inliers.append(inliers[-1])
        residuals.append(residuals[-1])
    stats = TrackStats(
        inliers=jnp.stack(inliers),
        residual=jnp.stack(residuals),
        diverged=diverged,
    )
    return update_T, stats
