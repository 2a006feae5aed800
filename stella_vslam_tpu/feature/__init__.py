from stella_vslam_tpu.feature.orb_params import OrbParams  # noqa: F401
from stella_vslam_tpu.feature.orb_extractor import OrbExtractor, FrameFeatures  # noqa: F401
