"""Native (C++) map-core bindings.

Builds native/mapcore.cpp on first import (g++ -O3 -shared, cached by source
hash) and exposes it via ctypes. If no compiler is available the import fails
loudly — the association store is part of the runtime, not an optional
accelerator (mirroring the reference, whose map core is C++).
"""
from stella_vslam_tpu.native.build import load_mapcore  # noqa: F401
