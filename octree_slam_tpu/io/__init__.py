from octree_slam_tpu.io import obj, bmp

__all__ = ["obj", "bmp"]
