"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.  All kernels are written
to be backend-portable; TPU-only fast paths fall back to the XLA reference
implementations off-TPU.
"""

import os

# force CPU even when the shell points JAX at a TPU (e.g. JAX_PLATFORMS=axon)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
