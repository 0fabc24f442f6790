"""Scene data model + pipeline drivers (incremental SfM, SLAM-GPS, dense)."""
from .scene import Scene, CameraModel  # noqa: F401
