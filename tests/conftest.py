"""Test configuration: run all unit tests on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax initializes its backends, so this lives at the top
of conftest (pytest imports conftest before test modules import jax).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env pins axon (TPU tunnel)
# no persistent compile cache under tests: XLA:CPU AOT artifacts record the
# COMPILE machine's feature flags and loading them on a different host warns
# of potential SIGILL; CPU compiles are cheap anyway
os.environ["SVT_JAX_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# warmup pre-compiles every device program variant at System.startup — wanted
# on the tunneled TPU runtime, pure overhead for the many tiny CPU test runs
os.environ.setdefault("SVT_WARMUP", "0")

import jax  # noqa: E402

# The baked axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which overrides the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
