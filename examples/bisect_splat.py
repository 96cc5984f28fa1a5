"""Bisect render_splat's cost on the real TPU (chain+sync timing)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.utils import runtime
runtime.setup()
from octree_slam_tpu.utils.timing import sync
from octree_slam_tpu.map import morton
from octree_slam_tpu.render import splat as sp

W, H, DEPTH = 640, 480, 9
LC = 1 << 19
MAX_RANGE = 10.0


def timeit(name, step, state0, n=4):
    state = step(state0)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(state)
        sync(state)
    ms = (time.perf_counter() - t0) / n * 1e3 - 30.5
    print(f"{name:42s} {ms:9.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    n_live = 400_000
    keys = jnp.asarray(
        np.concatenate([rng.integers(0, 1 << 27, n_live),
                        np.full(LC - n_live, -1)]), jnp.int32)
    nodes = jnp.asarray(rng.integers(0, 1 << 20, LC), jnp.int32)
    values = jnp.asarray(rng.integers(0, 2**31, 1 << 20), jnp.int32).view(jnp.uint32) | jnp.uint32(0xFF000000)
    center = jnp.zeros(3, jnp.float32)
    half = jnp.float32(5.12)
    pose0 = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-3.0)
    fx = fy = 532.0

    live = (jnp.arange(LC) < n_live) & (keys >= 0)

    @jax.jit
    def stage_decode(T):
        k = jnp.where(live, keys, 0)
        centers = morton.decode_centers(k, center, half, DEPTH)
        return T + 1e-9 * jnp.eye(4).at[0, 3].set(centers.sum() * 1e-12)
    timeit("decode_centers 512k", stage_decode, pose0)

    @jax.jit
    def stage_gather(T):
        vals = values[jnp.where(live, nodes, 0)]
        return T + 1e-9 * jnp.eye(4).at[0, 3].set(jnp.sum(vals & 1).astype(jnp.float32) * 1e-12)
    timeit("value gather 512k", stage_gather, pose0)

    @jax.jit
    def stage_project(T):
        k = jnp.where(live, keys, 0)
        centers = morton.decode_centers(k, center, half, DEPTH)
        R = T[:3, :3]; t = T[:3, 3]
        cam = (centers - t) @ R
        z = cam[:, 2]
        zs = jnp.where(z > 1e-3, z, 1.0)
        px = jnp.round(fx * cam[:, 0] / zs + W / 2.0).astype(jnp.int32)
        py = jnp.round(H / 2.0 - fy * cam[:, 1] / zs).astype(jnp.int32)
        return T + 1e-9 * jnp.eye(4).at[0, 3].set((px.sum() + py.sum()).astype(jnp.float32) * 1e-12)
    timeit("decode+project 512k", stage_project, pose0)

    @jax.jit
    def stage_scatter(T):
        k = jnp.where(live, keys, 0)
        centers = morton.decode_centers(k, center, half, DEPTH)
        R = T[:3, :3]; t = T[:3, 3]
        cam = (centers - t) @ R
        z = cam[:, 2]
        inb = live & (z > 1e-3) & (z < MAX_RANGE)
        zs = jnp.where(inb, z, 1.0)
        px = jnp.round(fx * cam[:, 0] / zs + W / 2.0).astype(jnp.int32)
        py = jnp.round(H / 2.0 - fy * cam[:, 1] / zs).astype(jnp.int32)
        inb = inb & (px >= 0) & (px < W) & (py >= 0) & (py < H)
        qz = jnp.clip(z * 3276.0, 0, 32766).astype(jnp.int32)
        word = (qz << 16) | 31
        idx = jnp.where(inb, py * W + px, W * H)
        buf = jnp.full((W * H,), sp.EMPTY, jnp.int32)
        buf = buf.at[idx].min(jnp.where(inb, word, sp.EMPTY), mode="drop")
        return T + 1e-9 * jnp.eye(4).at[0, 3].set(buf[0].astype(jnp.float32) * 1e-12)
    timeit("decode+project+scatter-min", stage_scatter, pose0)

    leaves = sp.LeafList(keys=keys, nodes=nodes,
                         count=jnp.int32(n_live), overflowed=jnp.bool_(False))
    from octree_slam_tpu.map.svo import SVONodePool
    pool = SVONodePool(child=jnp.zeros((1 << 20,), jnp.int32), value=values,
                       n_nodes=jnp.int32(8), center=center, half_size=half,
                       overflowed=jnp.bool_(False))

    for dil in (0, 1, 2):
        def mk(dil):
            @jax.jit
            def g(T):
                fb = sp.render_splat(pool, leaves, T, fx, fy, width=W,
                                     height=H, depth=DEPTH, dilate=dil)
                return T + 1e-9 * jnp.eye(4).at[0, 3].set(fb[0, 0, 0] * 1e-12)
            return g
        timeit(f"render_splat dilate={dil}", mk(dil), pose0)



if __name__ == "__main__":
    main()
