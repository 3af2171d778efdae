from . import camera, distortion, interpolate, losses, quaternion
from .camera import CameraModel, intrinsics_vector
from .losses import Loss

__all__ = [
    "camera", "distortion", "interpolate", "losses", "quaternion",
    "CameraModel", "intrinsics_vector", "Loss",
]
