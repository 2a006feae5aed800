from stella_vslam_tpu.camera.base import (  # noqa: F401
    Camera,
    CameraModel,
    CameraParams,
    Setup,
    camera_from_yaml,
)
