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
