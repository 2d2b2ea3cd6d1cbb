"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (SURVEY.md section 4, point 4).

Note: the environment's sitecustomize registers the 'axon' TPU backend before
pytest starts and pins JAX_PLATFORMS=axon, so env mutation alone is not
enough — we must override via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: the suite's wall time is dominated by XLA CPU
# compiles of the big fused programs; cache them across runs
from mesh2splat_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
