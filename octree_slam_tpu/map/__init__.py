from octree_slam_tpu.map import morton, svo
from octree_slam_tpu.map.svo import SVONodePool

__all__ = ["morton", "svo", "SVONodePool"]
