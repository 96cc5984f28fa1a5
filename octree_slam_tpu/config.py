"""Configuration for the TPU SLAM engine.

The reference keeps every knob as a compile-time constant scattered across the
tree (mode #defines in main.h:28-32, filter constants image_kernels.cu:18-22,
ICP gates localization_kernels.cu:17-18, pyramid schedule rgbd_camera.cpp:19,
grid constants voxelization.cu:24-25, USE_BRICK_POOL svo.h:8). Here they live
in one frozen dataclass; fields are static w.r.t. jit (shapes / loop bounds).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SLAMConfig:
    # --- Sensor / image (reference: main.h:39, openni_device.cpp:64-65) ---
    width: int = 640
    height: int = 480
    focal_x: float = 532.57  # Kinect-class defaults (cone_tracing_kernels.cu:45-46)
    focal_y: float = 531.54
    depth_min_mm: int = 1          # depth==0 is "no measurement" (image_kernels.cu:40)
    depth_max_mm: int = 15000      # image_kernels.cu:40

    # --- Bilateral filter (image_kernels.cu:18-20) ---
    bilateral_kernel_size: int = 7
    bilateral_sigma_depth: float = 40.0   # mm
    bilateral_sigma_spatial: float = 4.5

    # --- Intensity ratios (image_kernels.cu:22; reference has an r,b,b bug
    #     at :196-197 which we fix to r,g,b) ---
    intensity_ratio: Tuple[float, float, float] = (0.299, 0.587, 0.114)

    # --- ICP tracking (localization_kernels.cu:17-18, rgbd_camera.h:57,
    #     rgbd_camera.cpp:19) ---
    pyramid_depth: int = 3
    pyramid_iters: Tuple[int, ...] = (10, 5, 4)   # fine -> coarse order, like ref
    track_finest_level: int = 0  # ICP refines down to this pyramid level.
                                 # The reference's {10,5,4} schedule was
                                 # designed for its fixed 640x480 sensor
                                 # (main.h:39); at higher sensor resolutions
                                 # setting 1 keeps the Gauss-Newton work at
                                 # ~VGA scale (e.g. 960x540 for a 1080p
                                 # stream) while the RENDER stays full-res.
                                 # pyramid_iters indexes relative to this
                                 # level, so the same schedule applies to
                                 # the tracked sub-pyramid.
    fuse_level: int = 0          # pyramid level whose vertex map feeds map
                                 # fusion (main.cpp:39-44 uses the full-res
                                 # map; at 1080p with 2 cm voxels level 1's
                                 # 960x540 cloud still oversamples every
                                 # leaf many times over)
    track_keyframe: bool = False # anchor ICP to the last KEYFRAME's maps
                                 # instead of the immediately previous
                                 # frame: pose = key_pose @ icp(key, cur),
                                 # re-anchoring when the camera moves
                                 # keyframe_max_dist/_angle away. Halves
                                 # odometry drift accumulation (error
                                 # accrues per keyframe, not per frame)
                                 # at identical per-frame cost. The
                                 # reference is frame-to-frame
                                 # (rgbd_camera.cpp:53-191) — this is the
                                 # round-2 verdict item #7 drift fix.
    keyframe_max_dist: float = 0.12     # m: re-anchor beyond this baseline
    keyframe_max_angle_deg: float = 8.0  # deg: ... or this rotation
    icp_symmetric: bool = True   # symmetric point-to-plane residual
                                 # r = (n1 + n2').(v1 - v2') instead of the
                                 # reference's one-sided n1 term
                                 # (localization_kernels.cu:207-226):
                                 # first-order-cancels the surface-normal
                                 # bias a one-sided linearization leaves in
                                 # every solve (Rusinkiewicz 2019) — the
                                 # round-3 soak diagnosis named exactly
                                 # such a motion-proportional per-solve
                                 # bias. PRODUCTION DEFAULT since round 5:
                                 # together with icp_huber_k=0.02 the
                                 # 200-frame soak A/B measured ATE
                                 # 0.476 -> 0.259 m (-46%) and the
                                 # 14-frame orbit 2.68 -> 1.85 mm, at
                                 # identical per-frame cost
                                 # (examples/soak_estimator_ab.py,
                                 # BASELINE.md round-5). Set False +
                                 # icp_huber_k=0 for strict reference
                                 # estimator semantics.
    icp_huber_k: float = 0.02    # > 0: IRLS Huber weight w = min(1, k/|r|)
                                 # (meters) on the point-to-plane residual
                                 # — robustness to the depth-quantization
                                 # tail without the reference's hard 0.1 m
                                 # gate cliff; 0 = off (reference
                                 # behavior). Default 0.02 per the soak
                                 # A/B (alone: 0.476 -> 0.400 m; with
                                 # icp_symmetric: 0.259 m)
    icp_dist_thresh: float = 0.1        # meters
    icp_norm_thresh: float = 0.87       # cos(30 deg)
    icp_z_min: float = 0.1              # meters (localization_kernels.cu:189)
    icp_z_max: float = 10.0
    w_rgbd: float = 0.0                 # photometric term weight (W_RGBD=0.1
                                        # exists but is dead code in the ref,
                                        # rgbd_camera.cpp:20,131-141)

    # --- Map / SVO (scene.cpp:94,101; svo.cu) ---
    lazy_interior: bool = True          # defer the interior mipmap + dense
                                        # mirror refresh on frames whose
                                        # renderer reads only leaves (splat,
                                        # slab cone): ~7 ms/frame; the exact
                                        # marcher / extraction self-heal via
                                        # refresh_interior (see pipeline)
    device_remainder: bool = True       # finish unique-cap remainder pages
                                        # inside the jitted step via
                                        # lax.while_loop (no host round
                                        # trip); False = host-driven
                                        # insert_remainder loop
    voxel_resolution: float = 0.01      # meters, SLAM-mode leaf size
    max_depth: int = 9                  # octree levels (<=10 for 30-bit keys)
    node_capacity: int = 1 << 21        # static node-pool capacity
    extract_capacity: int = 1 << 18     # static voxel-extraction buffer
    insert_unique_cap: int = 1 << 16    # distinct leaf voxels per insert
    leaf_capacity: int = 1 << 19        # persistent leaf registry (renderer)
    insert_dircache: bool = False       # directory cache: last frame's
                                        # leaf key -> (node, value, registry
                                        # pos) map lets repeat keys skip the
                                        # insert descent + value/node2pos
                                        # gathers (svo.insert dir_* args).
                                        # Default OFF: measured a WASH at
                                        # depth-10/1cm full-res across three
                                        # designs (22.0-22.9 vs 24.0 FPS
                                        # uncached, same-day tunnel ~7%
                                        # slower) — on this platform every
                                        # U-wide op costs a flat ~0.5-1.3ms,
                                        # so swapping ~6 gathers for a sort
                                        # merge + payload gathers + merge
                                        # scatters nets zero; kept (tested,
                                        # content-identical) for regimes
                                        # with deeper descents
    saturation_gate: bool = False       # drop fused points whose leaf is
                                        # already alpha-saturated BEFORE
                                        # the key sort, via one probe of a
                                        # dense per-leaf bitmask at
                                        # max_depth (SLAMState.sat_mask,
                                        # 2^(3*depth)/8 bytes: 16.8 MB at
                                        # depth 9, 134 MB at depth 10).
                                        # At alpha 255 the fillNodes blend
                                        # (svo.cu:326-332) moves a color
                                        # channel only when |new - old| >=
                                        # 128 (weight 1/256 rounds to 0
                                        # otherwise), so steady-state
                                        # re-observation frames shrink to
                                        # their genuinely-new uniques —
                                        # pair with a smaller
                                        # insert_unique_cap and the
                                        # device_remainder pager for the
                                        # full-res 1 cm win (round-3
                                        # verdict item #2).
                                        # DEFAULT DECIDED OFF with
                                        # round-5 numbers: on a FRESH
                                        # stream (nothing saturated) the
                                        # per-frame bitmask probe +
                                        # mask maintenance cost the
                                        # headline 93.9 -> 71.8 FPS
                                        # (-24%, measured 2026-08-20),
                                        # pure overhead; the 2.2x win
                                        # (24.1 -> 53.8 FPS) is the
                                        # STEADY-STATE re-observation
                                        # regime. Turn it ON for
                                        # long-running strict-1cm
                                        # deployments (bench_configs
                                        # --config satgate is the
                                        # reference recipe)
    debug_validate_dircache: int = 0    # 0 = off; N > 0: every N frames
                                        # run_slam re-runs the frame
                                        # UNCACHED on a pre-step copy and
                                        # asserts leaf-content identity —
                                        # the CLAUDE.md dircache
                                        # invariant contract as an
                                        # executable check (app.
                                        # _validate_dircache; a violated
                                        # reset obligation fails loudly
                                        # instead of silently blending
                                        # into wrong nodes)
    insert_miss_cap: int = 0            # first-seen-key lanes per cached
                                        # insert (0 = unique_cap // 4);
                                        # frames with more misses defer the
                                        # tail uniques to the in-step pager
                                        # (exactly the unique-cap protocol)

    # --- Rendering (cone_tracing_kernels.cu:24-27) ---
    max_range: float = 10.0             # meters
    start_dist: float = 0.002
    max_march_iters: int = 96           # replaces while-live-rays + remove_if
    accel_level: int = 6                # entry/dist grid level for cone tracing
    use_dense_mips: bool = True         # dense value-mip render cache
                                        # (613MB HBM at max_depth 9; see
                                        # map/mips.py) — the fast cone path
    dist_max_skip: int = 15             # empty-space skip radius (cells)
    cone_scale: int = 1                 # cone-trace at (W/s, H/s), upsample
                                        # s x (exact at 1; 2 = ~4x faster)
    # --- slab cone splatter (render/conesplat.py) — the real-time cone
    #     path; the exact marchers stay behind render="cone_march" ---
    cone_slabs: int = 16                # geometric depth slabs
    cone_znear: float = 0.25            # nearest slab boundary (meters)
    cone_max_scale: int = 4             # coarsest slab raster decimation
                                        # (round-3 sweep: 4 + the dilate-1
                                        # empty-cell borrow beats 8 by
                                        # 0.7 dB — the 4 px cell matches
                                        # the march's own ~5 px leaf
                                        # quantization at SLAM depths)
    # --- hybrid cone renderer (render/hybrid.py): slab composite + seeded
    #     exact march of the edge band (render="cone_hybrid") ---
    cone_band_cap: int = 0              # marched band lanes (0 = pixels//4)
    cone_band_iters: int = 12           # march trip cap for band rays;
                                        # capped rays composite their
                                        # partial front onto the slab
                                        # pixel, so a low cap degrades
                                        # gracefully (trips are the
                                        # hybrid's whole marginal cost:
                                        # ~2 gathers + flat while-loop
                                        # overhead per trip)
    cone_band_sel_decimate: bool = False  # top-C band selection on a
                                        # stride-2 block grid (selection
                                        # argsort n/4 wide, chosen 2x2
                                        # blocks expand to pixels).
                                        # MEASURED AND REJECTED as the
                                        # default (round-5 A/B, real
                                        # TPU): 17.9 vs 18.6 FPS fresh
                                        # and -0.06 dB — on this
                                        # platform sorts are cheap
                                        # (0.8 ms/307k) and the block
                                        # expand's extra flat-cost
                                        # kernels exceed the sort
                                        # saving. Kept for
                                        # gather-locality experiments.
    cone_band_crawl: int = 1            # leaf samples per march trip (>1:
                                        # one (lanes, crawl) value gather
                                        # covers crawl DDA samples — the
                                        # march is flat-kernel-cost bound,
                                        # so this divides the per-sample
                                        # price; band_iters then counts
                                        # TRIPS of up to crawl samples)
    cone_band_depth_prio: float = 0.0   # >0 adds a z_first-discontinuity
                                        # term to the band priority (slab
                                        # assignment fails hardest at
                                        # occlusion boundaries, which can
                                        # carry no luminance edge); value
                                        # scales it against the luminance
                                        # gradient
    cone_band_fused_dist: bool = True   # single-gather band trips: free
                                        # leaf cells of the dense mirror
                                        # carry their covering dist cell's
                                        # skip distance in the low byte
                                        # (mips.encode_free_dist — the
                                        # value sample doubles as the
                                        # empty-space lookup; the encode
                                        # re-runs only on frames that
                                        # changed occupancy). Bit-identical
                                        # framebuffers (tests/test_hybrid)
    cone_band_compact_after: int = 999  # >= band_iters DISABLES mid-march
                                        # compaction (the fixed-trip fast
                                        # path): grazers keep the live
                                        # count above any useful width
                                        # until the cap, and the per-trip
                                        # liveness reduce costs as much as
                                        # the gathers it hoped to save
    fov: float = 45.0                   # degrees (vertical), for pix footprint

    # --- Relocalization (relocalize.py; beyond-parity — the reference
    #     only prints "Camera tracking is lost", rgbd_camera.cpp:148-151) ---
    relocalize: bool = True             # the DRIVER runs tracking-loss
                                        # recovery (app.run_slam does):
                                        # pipeline.step then gates fusion
                                        # on the sticky diverged flag
                                        # until recovery clears it. Direct
                                        # pipeline.step drivers WITHOUT a
                                        # recovery loop must set False so
                                        # the gate is per-frame only (see
                                        # recovery_enabled)
    keypose_every: int = 10             # record an anchor every K frames
    reloc_candidates: int = 4           # most-recent keyposes per attempt
    reloc_min_inlier_frac: float = 0.05  # accept when full-res ICP inliers
                                         # exceed this fraction of pixels

    precompile_ahead: bool = True       # when the pool passes HALF full,
                                        # AOT-compile the post-growth step
                                        # in a background thread so the
                                        # 3/4 growth trigger swaps
                                        # executables instead of stalling
                                        # minutes in a remote recompile
                                        # (app.precompile_step)

    # --- Host tiering (map/tiering.py; the reference's CPU/GPU subtree
    #     tiering, pushToGPU/pullToCPU octree.cpp:41-111) ---
    host_spill: bool = False            # archive cold map regions to host
                                        # RAM when the pool fills, instead
                                        # of doubling HBM capacity
    tier_level: int = 3                 # morton level of spill/restore
                                        # cells (8^level cells per volume)
    spill_keep_radius: float = 12.0     # m: a cell with any leaf within
                                        # this camera distance stays in HBM
    restore_radius: float = 11.0        # m: archived cells entering this
                                        # radius are restored (should be
                                        # > max_range so a region is live
                                        # before it can be re-observed;
                                        # keep > restore for hysteresis)

    # --- Multi-chip map sharding (parallel/distributed.py; beyond-parity:
    #     the reference is single-GPU, SURVEY.md section 2.3) ---
    map_split_level: int = 1            # morton level of the shard-range
                                        # boundaries: device d owns keys in
                                        # [bounds[d], bounds[d+1]) of the
                                        # 8^level cell space. Level 1 with
                                        # equal bounds = the octant split;
                                        # level 2/3 gives 64/512 cells for
                                        # load-balanced rebalancing

    # --- Mesh voxelization (voxelization.cu:24-25: GRID_RES=8 -> 256^3) ---
    vox_log_n: int = 8                  # grid is (1<<vox_log_n)^3 voxels
    vox_tri_budget: int = 512           # static per-triangle candidate voxels

    @property
    def recovery_enabled(self) -> bool:
        """Relocalization can actually run (the single availability
        condition shared by app.run_slam's recovery loop and
        pipeline.step's sticky fusion gate — they must agree, or a
        transient tracking loss freezes fusion with nothing to clear it)."""
        return self.relocalize and self.reloc_candidates > 0

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def level_shape(self, level: int) -> Tuple[int, int]:
        """(height, width) of pyramid level `level` (0 = full res)."""
        return (self.height >> level, self.width >> level)


DEFAULT_CONFIG = SLAMConfig()
