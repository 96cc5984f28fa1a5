"""Host-side octree facade: resolution semantics, growth, checkpointing.

Mirrors the Octree host API (octree.cpp:251-385) over the static-shape node
pool. The reference's CPU/GPU hybrid tree (pushToGPU/pullToCPU,
octree.cpp:41-111) is unnecessary — the pool is the linear "GPU" form at all
times, which is also a complete snapshot (SURVEY.md section 5
checkpoint/resume: the linear SVO layout is the serialization format).

Growth semantics: Octree::expandBySize (octree.cpp:362-378) wraps the root
in new parent layers. With a static pool, growth is a host-triggered
re-root: double the half-size k times, extract the occupied leaves, and
re-insert them into a fresh pool at the same world resolution (depth grows
by k, capped by the 30-bit key budget — past that the map coarsens, which
the reference does too since its max_depth recomputation at octree.cpp:284
is bounded by the 32-bit key TODO at svo.cu:35).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.core.types import BoundingBox, VoxelGrid
from octree_slam_tpu.map import svo

MAX_KEY_DEPTH = 10  # 30-bit int32 morton keys


class Octree:
    """Dynamic-resolution octree over a fixed-capacity node pool."""

    def __init__(self, resolution: float, center, size: float,
                 capacity: int = 1 << 20, extract_capacity: int = 1 << 18):
        """resolution = target leaf half-edge ("scale"); size = root
        half-edge (root bbox is center +- size, octree.cpp:274-275)."""
        self.resolution = float(resolution)
        self.capacity = int(capacity)
        self.extract_capacity = int(extract_capacity)
        self.max_depth = self._depth_for(size)
        self.pool = svo.create(capacity, jnp.asarray(center, jnp.float32),
                               jnp.float32(size))

    def _depth_for(self, size: float) -> int:
        # max_depth = ceil(log2(edge / resolution)) (octree.cpp:284)
        d = max(1, math.ceil(math.log2(max(size / self.resolution, 2.0))))
        return min(d, MAX_KEY_DEPTH)

    # --- geometry ---

    @property
    def center(self) -> np.ndarray:
        return np.asarray(self.pool.center)

    @property
    def size(self) -> float:
        return float(self.pool.half_size)

    def bounding_box(self) -> BoundingBox:
        c = self.pool.center
        s = self.pool.half_size
        return BoundingBox(bbox0=c - s, bbox1=c + s)

    def contains(self, bbox: BoundingBox) -> bool:
        own = self.bounding_box()
        return bool(np.all(np.asarray(bbox.bbox0) >= np.asarray(own.bbox0))
                    and np.all(np.asarray(bbox.bbox1) <= np.asarray(own.bbox1)))

    # --- mutation ---

    def _insert_all(self, points, colors, valid) -> svo.InsertStats:
        """Insert with the sorted-remainder loop: frames with more than
        unique_cap distinct leaves page through in key order (each leaf
        still blends exactly once — fillNodes parity, svo.cu:642-696)."""
        self.pool, stats = svo.insert(self.pool, points, colors, valid,
                                      depth=self.max_depth)
        n_unique = stats.n_unique
        new_nodes = stats.new_nodes
        while bool(stats.unique_overflow):
            self.pool, stats = svo.insert(self.pool, points, colors, valid,
                                          depth=self.max_depth,
                                          min_key=stats.last_key)
            n_unique = n_unique + stats.n_unique
            new_nodes = new_nodes + stats.new_nodes
        return stats._replace(n_unique=n_unique, new_nodes=new_nodes)

    def add_cloud(self, points, colors, valid=None) -> svo.InsertStats:
        """svoFromPointCloud path (octree.cpp:269-291). colors in [0,1]."""
        return self._insert_all(points, colors, valid)

    def add_voxel_grid(self, grid: VoxelGrid) -> svo.InsertStats:
        """svoFromVoxelGrid path (octree.cpp:293-313)."""
        live = jnp.arange(grid.centers.shape[0]) < grid.count
        return self._insert_all(grid.centers, grid.colors[:, :3], live)

    def expand_by_size(self, add_size: float) -> None:
        """Grow the volume to cover `size + add_size` (octree.cpp:362-378)
        by doubling the half-size k times.

        Each doubling is a value-preserving in-pool remap
        (svo.reroot_double — the reference's expand() child-wrapping,
        octree.cpp:184-206): every existing leaf keeps its value and world
        position bit-for-bit, no extraction buffer involved. Only when the
        30-bit key budget is exhausted (depth would exceed MAX_KEY_DEPTH)
        does the map coarsen via extract + re-insert, like the reference's
        own bounded max_depth recomputation (octree.cpp:284, svo.cu:35)."""
        old_size = self.size
        k = max(1, math.ceil(math.log2((old_size + add_size) / old_size)))
        for _ in range(k):
            if self.max_depth + 1 > MAX_KEY_DEPTH:
                self._expand_coarsen(self.size * 2.0)
                continue
            # bridge = the 8^pre level-`pre` tiles reroot_double writes;
            # recompute after EVERY growth — crossing a prealloc boundary
            # (e.g. 1<<19 -> 1<<20 is now 5 -> 6 dense levels) changes it
            def _bridge():
                pre = svo.prealloc_levels(self.capacity)
                return svo._LEVEL_BASE[pre + 1] - svo._LEVEL_BASE[pre]
            while int(self.pool.n_nodes) + _bridge() > self.capacity:
                self.grow_capacity(2 * self.capacity)
            before = float(self.pool.half_size)
            self.pool = svo.reroot_double(self.pool)
            # reroot_double is a no-op (overflowed flag) if the bridge did
            # not fit; only count the level if the volume actually doubled,
            # else max_depth would disagree with half_size and every morton
            # encode/decode lands one level off
            if float(self.pool.half_size) > before:
                self.max_depth += 1
            else:  # pragma: no cover - headroom loop above prevents this
                raise RuntimeError(
                    "expand_by_size: reroot_double did not fit despite "
                    "headroom check (pool overflowed)")

    def grow_capacity(self, new_capacity: int) -> None:
        """Reallocate the node pool at a larger capacity (the reference's
        per-insert realloc, svo.cu:609-614, amortized to doublings).
        Growth that crosses a dense-prealloc level boundary (pools under
        9360 nodes) cannot be a pad — rebuild from the exact leaf set
        (svo.insert_exact), value-preserving."""
        if (svo.prealloc_levels(new_capacity)
                != svo.prealloc_levels(self.capacity)):
            from octree_slam_tpu.map import tiering
            ex, _ = svo.extract_all_leaves(
                self.pool, depth=self.max_depth,
                start_capacity=self.extract_capacity)
            n = int(ex.count)
            nodes = np.asarray(ex.nodes[:n])
            live = nodes >= 0
            keys = np.asarray(ex.keys[:n])[live]
            vals = np.asarray(self.pool.value)[np.maximum(nodes, 0)][live]
            fresh = svo.create(new_capacity, self.pool.center,
                               self.pool.half_size)
            fresh, _ = tiering.bulk_insert_exact(
                fresh, keys, vals, depth=self.max_depth,
                unique_cap=min(1 << 16, new_capacity), overwrite=True)
            self.pool = svo.refresh_interior(fresh, depth=self.max_depth)
        else:
            self.pool = svo.grow_capacity(self.pool, new_capacity)
        self.capacity = new_capacity

    def _expand_coarsen(self, new_size: float) -> None:
        """Depth-capped growth: the volume doubles but keys are exhausted,
        so leaves coarsen — content is resampled through extract+reinsert
        (lossy by necessity: 8 old leaves merge into 1)."""
        extracted = svo.extract_voxels(self.pool, depth=self.max_depth,
                                       capacity=self.extract_capacity)
        count = int(extracted.count)
        if count >= self.extract_capacity:
            import warnings
            warnings.warn(
                "Octree._expand_coarsen: map has >= extract_capacity "
                f"({self.extract_capacity}) occupied leaves; coarsening "
                "drops the excess — raise extract_capacity",
                RuntimeWarning)
        self.max_depth = self._depth_for(new_size)
        self.pool = svo.create(self.capacity, self.pool.center,
                               jnp.float32(new_size))
        if count:
            live = jnp.arange(extracted.centers.shape[0]) < extracted.count
            # re-observe enough times to restore occupancy (alpha > 127)
            for _ in range(2):
                self.pool, _ = svo.insert(
                    self.pool, extracted.centers, extracted.colors[:, :3],
                    valid=live, depth=self.max_depth)

    # --- extraction ---

    def extract_voxel_grid(self) -> VoxelGrid:
        """extractVoxelGridFromSVO at the octree's own resolution
        (octree.cpp:315-337)."""
        out = svo.extract_voxels(self.pool, depth=self.max_depth,
                                 capacity=self.extract_capacity)
        scale = self.size / (2 ** (self.max_depth - 1)) / 2.0
        return VoxelGrid(centers=out.centers, colors=out.colors,
                         count=out.count, scale=jnp.float32(scale),
                         bbox=self.bounding_box())

    def extract_svo(self) -> svo.SVONodePool:
        """Live pool view (Octree::extractSVO, octree.cpp:339-360).

        The reference descends to the smallest subtree containing a bbox;
        the pool's root IS the render volume here — renderers LOD-descend
        anyway, so subtree extraction buys nothing on TPU."""
        return self.pool

    # --- checkpoint / resume (SURVEY.md section 5) ---

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            child=np.asarray(self.pool.child),
            value=np.asarray(self.pool.value),
            n_nodes=np.asarray(self.pool.n_nodes),
            center=np.asarray(self.pool.center),
            half_size=np.asarray(self.pool.half_size),
            overflowed=np.asarray(self.pool.overflowed),
            resolution=self.resolution,
            max_depth=self.max_depth,
            # part of the pool's on-disk meaning: see load()
            prealloc=svo.prealloc_levels(self.capacity),
        )

    @classmethod
    def load(cls, path: str) -> "Octree":
        z = np.load(path)
        tree = cls.__new__(cls)
        tree.resolution = float(z["resolution"])
        tree.max_depth = int(z["max_depth"])
        tree.capacity = int(z["child"].shape[0])
        # the dense-prealloc layout is part of the file format: loading a
        # pool under a different prealloc_levels schedule would misindex
        # every shallow level (missing stamp = legacy schedule)
        cur = svo.prealloc_levels(tree.capacity)
        stored = (int(z["prealloc"]) if "prealloc" in z
                  else svo.prealloc_levels_legacy(tree.capacity))
        if stored != cur:
            raise ValueError(
                f"octree file {path!r} was written with {stored} "
                f"dense-preallocated levels but this build uses {cur} for "
                f"capacity {tree.capacity} — incompatible pool layout")
        tree.extract_capacity = 1 << 18
        tree.pool = svo.SVONodePool(
            child=jnp.asarray(z["child"]),
            value=jnp.asarray(z["value"]),
            n_nodes=jnp.asarray(z["n_nodes"]),
            center=jnp.asarray(z["center"]),
            half_size=jnp.asarray(z["half_size"]),
            overflowed=jnp.asarray(z["overflowed"]),
        )
        return tree
