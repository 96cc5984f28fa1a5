"""Mesh -> voxel grid -> octree -> renders, end to end.

The reference's Scene::voxelizeMeshes demo path (scene.cpp:64-85 +
main.cpp:88-110's commented file-based mode): load an OBJ, voxelize it
(VoxelPipe analog), insert into the octree, then render the map through
every display path. Writes PNGs to --out.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime
runtime.setup()

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core import camera as cam_mod
from octree_slam_tpu.io.bmp import save_image
from octree_slam_tpu.render.renderer import Renderer
from octree_slam_tpu.scene import Scene

CUBE_OBJ = """
v -1 -1 -1\nv 1 -1 -1\nv 1 1 -1\nv -1 1 -1
v -1 -1 1\nv 1 -1 1\nv 1 1 1\nv -1 1 1
f 1 2 3 4\nf 5 8 7 6\nf 1 5 6 2\nf 2 6 7 3\nf 3 7 8 4\nf 5 1 4 8
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--obj", type=str, default=None,
                   help="OBJ file (default: built-in unit cube)")
    p.add_argument("--out", type=str, default="out_voxelize")
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--log-n", type=int, default=6,
                   help="voxel grid is (2^log_n)^3")
    args = p.parse_args()

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    obj_path = args.obj
    if obj_path is None:
        obj_path = str(out / "cube.obj")
        with open(obj_path, "w") as f:
            f.write(CUBE_OBJ)

    cfg = SLAMConfig(width=args.size, height=args.size * 3 // 4,
                     vox_log_n=args.log_n, use_dense_mips=True)
    scene = Scene(cfg)
    mesh = scene.load_obj_file(obj_path)
    print(f"mesh: {mesh.vertices.shape[0]} verts, {mesh.faces.shape[0]} tris")

    grid = scene.voxelize_meshes(octree=True)
    print(f"voxel grid: {int(grid.count)} occupied cells, "
          f"scale {float(grid.scale):.4f}")

    cam = cam_mod.make_camera([2.6, 2.0, 3.2], [0, 0, 0], [0, 1, 0], 50.0,
                              args.size / (args.size * 3 // 4))
    r = Renderer(cfg.width, cfg.height)

    save_image(str(out / "mesh_phong.png"),
               np.asarray(r.rasterize(mesh, cam, shading="phong")))
    save_image(str(out / "mesh_wireframe.png"),
               np.asarray(r.rasterize_wireframe(mesh, cam)))
    save_image(str(out / "voxels_splat.png"),
               np.asarray(r.rasterize_voxels(grid, cam)))
    save_image(str(out / "voxels_cubes.png"),
               np.asarray(r.rasterize_voxels(grid, cam, use_cubes=True)))

    # cone trace the octree built from the voxelization. The GL-style
    # look-at camera faces -z; the sensor/raycast convention faces +z with
    # x right, so flip the x and z basis columns of camera->world.
    pool = scene.svo()
    pose = np.linalg.inv(np.asarray(cam.view)).astype(np.float32)
    pose[:3, 0] *= -1.0
    pose[:3, 2] *= -1.0
    pose = jnp.asarray(pose)
    fx = cfg.height / 2.0 / np.tan(np.radians(50.0) / 2.0)
    fb = r.cone_trace_svo(pool, pose, fx, fx, max_depth=scene.tree.max_depth,
                          max_iters=64)
    save_image(str(out / "voxels_conetrace.png"), np.asarray(fb))
    print(f"wrote 5 renders to {out}/")


if __name__ == "__main__":
    main()
