from freepose_tpu.geometry import boxes, camera, crop, pointcloud, rotation, se3

__all__ = ["rotation", "se3", "camera", "pointcloud", "boxes", "crop"]
