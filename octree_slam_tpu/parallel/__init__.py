from octree_slam_tpu.parallel import distributed

__all__ = ["distributed"]
