"""stella_vslam_tpu — TPU-native visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
stella_vslam (monocular / stereo / RGBD indirect visual SLAM): fixed-shape
batched device programs for the per-frame front-end and all nonlinear
optimization, with a host-side map store and asynchronous mapping / loop
closing. See SURVEY.md at the repo root for the blueprint.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/optimization correctness requires true f32 matmuls: on TPU the
# default matmul precision decomposes f32 into bfloat16 passes, which injects
# pixel-scale noise that triangulation and bundle adjustment amplify into
# centimeter-scale map error. Hot kernels that tolerate bf16 (e.g. descriptor
# distance matrices) opt in explicitly with precision=DEFAULT/bfloat16.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: first compile of the fused per-frame programs
# costs minutes over the tunneled backend; cached re-runs (tests, bench,
# dataset CLIs) start in seconds. Kept inside the repo dir (gitignored).
import os as _os

_cache_dir = _os.environ.get(
    "SVT_JAX_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
)
if _cache_dir and _cache_dir != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
        # cache EVERYTHING: on the tunneled backend even a trivial eager op
        # (add, iota, convert_element_type...) costs ~0.35 s to compile
        # remotely, and a cold process hits dozens of them before the first
        # frame — with the default 1.0 s threshold they were recompiled in
        # every process, ~10 s of pure startup overhead
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
