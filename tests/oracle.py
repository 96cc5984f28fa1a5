"""Pure-Python/NumPy oracle implementations of the reference semantics.

Used as golden models for the JAX implementations. Each function mirrors a
specific reference kernel (cited) at small scale, with the documented
divergences (duplicate-key segment mean, correct mipmap occupancy test).
"""

from __future__ import annotations

import math

import numpy as np


def morton_key(point, center, half_size, depth):
    """computeKey (svo.cu:34-66) without the leading-1 sentinel."""
    if not np.all(np.isfinite(point)):
        return None
    c = np.array(center, np.float32).copy()
    e = float(half_size)
    key = 0
    for _ in range(depth):
        e /= 2.0
        gt = point > c
        octant = int(gt[0]) + 2 * int(gt[1]) + 4 * int(gt[2])
        key = (key << 3) | octant
        c += np.where(gt, e, -e).astype(np.float32)
    return key


def decode_center(key, center, half_size, depth):
    """voxelGridFromKeys center walk (svo.cu:553-571)."""
    c = np.array(center, np.float64).copy()
    e = float(half_size)
    for level in range(depth):
        octant = (key >> (3 * (depth - 1 - level))) & 7
        e /= 2.0
        c[0] += e if (octant & 1) else -e
        c[1] += e if (octant & 2) else -e
        c[2] += e if (octant & 4) else -e
    return c


class OracleOctree:
    """Dict-based octree with the reference's node-value semantics."""

    def __init__(self, center, half_size, depth):
        self.center = np.array(center, np.float32)
        self.half_size = float(half_size)
        self.depth = depth
        # node values keyed by (level, prefix); alpha starts at 127
        self.values = {}
        self.children = set()  # (level, prefix) that have children

    def _init_value(self):
        return [0.0, 0.0, 0.0, 127]

    def insert(self, points, colors):
        """svoFromPointCloud with segment-mean duplicate resolution."""
        groups = {}
        for p, c in zip(points, colors):
            key = morton_key(np.asarray(p, np.float32), self.center,
                             self.half_size, self.depth)
            if key is None:
                continue
            groups.setdefault(key, []).append(np.asarray(c, np.float64))

        touched_prefixes = set()
        for key, samples in groups.items():
            mean = np.mean(samples, axis=0)
            # ensure interior path exists
            for level in range(1, self.depth + 1):
                prefix = key >> (3 * (self.depth - level))
                node = (level, prefix)
                if node not in self.values:
                    self.values[node] = self._init_value()
                if level < self.depth:
                    self.children.add(node)
                touched_prefixes.add(node)
            # leaf blend (fillNodes, svo.cu:326-332)
            leaf = (self.depth, key)
            v = self.values[leaf]
            a = v[3]
            f2 = a / 256.0
            f1 = 1.0 - f2
            rgb = [int(mean[i] * 255.0 * f1 + v[i] * f2) for i in range(3)]
            self.values[leaf] = [rgb[0], rgb[1], rgb[2], min(255, a + 2)]

        # mipmap bottom-up along touched paths (svo.cu:450-465, intended
        # occupancy semantics)
        for level in range(self.depth - 1, 0, -1):
            for (lv, prefix) in sorted(touched_prefixes):
                if lv != level or (lv, prefix) not in self.children:
                    continue
                kid_vals = []
                for i in range(8):
                    kid = (level + 1, (prefix << 3) | i)
                    kid_vals.append(self.values.get(kid, self._init_value()))
                occ = [v for v in kid_vals if v[3] > 127]
                if occ:
                    rgb = [sum(v[i] for v in occ) / len(occ) for i in range(3)]
                else:
                    rgb = [0.0, 0.0, 0.0]
                max_a = max(v[3] for v in kid_vals)
                self.values[(level, prefix)] = [
                    int(rgb[0]), int(rgb[1]), int(rgb[2]), max_a]

    def occupied_leaves(self):
        """extractVoxelGridFromSVO semantics: leaves whose whole ancestor
        chain is occupied (alpha > 127)."""
        out = {}
        for (level, prefix), v in self.values.items():
            if level != self.depth or v[3] <= 127:
                continue
            chain_ok = all(
                self.values.get((l, prefix >> (3 * (self.depth - l))),
                                self._init_value())[3] > 127
                for l in range(1, self.depth)
            )
            if chain_ok:
                out[prefix] = v
        return out


def backproject(depth_mm, fx, fy, img_w, img_h, w, h):
    """generateVertexMap oracle (image_kernels.cu:24-53)."""
    out = np.zeros((h, w, 3), np.float32)
    for y in range(h):
        for x in range(w):
            d = int(depth_mm[y, x])
            if d == 0 or d > 15000:
                out[y, x] = np.inf
                continue
            out[y, x, 0] = ((img_w / w) * x - img_w / 2) * d / fx * 1e-3
            out[y, x, 1] = (img_h / 2 - (img_h / h) * y) * d / fy * 1e-3
            out[y, x, 2] = d * 1e-3
    return out


def normal_map(vertex):
    """generateNormalMap oracle (image_kernels.cu:104-134)."""
    h, w, _ = vertex.shape
    out = np.full((h, w, 3), np.inf, np.float32)
    for y in range(h - 1):
        for x in range(w - 1):
            c = vertex[y, x]
            v1 = vertex[y, x + 1] - c
            v2 = vertex[y + 1, x] - c
            n = -np.cross(v1, v2)
            norm = np.linalg.norm(n)
            out[y, x] = n / norm if norm > 0 else np.inf
    return out


def bilateral(depth_mm, ksize=7, sigma_spatial=4.5, sigma_depth=40.0):
    """bilateralKernel oracle with full symmetric window
    (image_kernels.cu:142-177; see image_ops.py for the documented
    edge-handling divergence)."""
    h, w = depth_mm.shape
    sig_s = 0.5 / (sigma_spatial * sigma_spatial)
    sig_d = 0.5 / (sigma_depth * sigma_depth)
    half = ksize // 2
    out = np.zeros_like(depth_mm)
    for y in range(h):
        for x in range(w):
            val = float(depth_mm[y, x])
            s1 = s2 = 0.0
            for cy in range(max(0, y - half), min(h, y + half + 1)):
                for cx in range(max(0, x - half), min(w, x + half + 1)):
                    d = float(depth_mm[cy, cx])
                    space2 = (x - cx) ** 2 + (y - cy) ** 2
                    color2 = (val - d) ** 2
                    wgt = math.exp(-(space2 * sig_s + color2 * sig_d))
                    s1 += d * wgt
                    s2 += wgt
            out[y, x] = int(round(s1 / s2))
    return out


def icp_normal_equations(v1, n1, v2, n2, dist_thresh=0.1, norm_thresh=0.87,
                         z_min=0.1, z_max=10.0):
    """Point-to-plane normal equations oracle with the correct Jacobian
    A = [v2 x n1; n1], b = n1.(v1 - v2) (gates from
    localization_kernels.cu:186-204; Jacobian per SURVEY.md section 7)."""
    A = np.zeros((6, 6))
    b = np.zeros(6)
    count = 0
    for i in range(v1.shape[0]):
        p1, nn1, p2, nn2 = v1[i], n1[i], v2[i], n2[i]
        if not (np.all(np.isfinite(p1)) and np.all(np.isfinite(p2))
                and np.all(np.isfinite(nn1)) and np.all(np.isfinite(nn2))):
            continue
        if p1[2] < z_min or p2[2] < z_min or p1[2] > z_max or p2[2] > z_max:
            continue
        if np.linalg.norm(p2 - p1) > dist_thresh:
            continue
        if np.dot(nn2, nn1) < norm_thresh:
            continue
        J = np.concatenate([np.cross(p2, nn1), nn1])
        r = np.dot(nn1, p1 - p2)
        A += np.outer(J, J)
        b += r * J
        count += 1
    return A, b, count
