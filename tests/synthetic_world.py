"""Shim: the synthetic world generator moved into the package
(stella_vslam_tpu/util/synthetic.py) so the CLI runners can use it too."""
from stella_vslam_tpu.util.synthetic import (  # noqa: F401
    PlaneWorld, lateral_trajectory, umeyama_align,
)
