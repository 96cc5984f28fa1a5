from octree_slam_tpu.sensor import image_ops

__all__ = ["image_ops"]
