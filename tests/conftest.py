"""Test configuration: run everything on a virtual 8-device CPU mesh.

A pytest plugin imports jax before this file runs, so the JAX_PLATFORMS env
var is already captured into jax.config — override via config.update too
(the backend itself initializes lazily, on first device use, which is still
ahead of us).  All kernels are backend-portable; TPU-only fast paths fall
back to XLA reference implementations off-TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect the 8-device virtual CPU mesh"

# persistent compile cache: the render-graph tests compile multi-minute
# programs on a single host core — repeat runs must hit the disk cache
from vk_renderer_tpu.utils import jaxcache

jaxcache.enable()
