from octree_slam_tpu.render import raycast, points

__all__ = ["raycast", "points"]
