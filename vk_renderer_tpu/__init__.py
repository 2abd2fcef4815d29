"""vk_renderer_tpu — a TPU-native rasterization engine in JAX/Pallas.

A ground-up rebuild of the capabilities of the ``mzwang34/vk_renderer``
("bamboo") Vulkan forward renderer, designed TPU-first:

- the Vulkan engine/pipeline/descriptor plumbing is replaced by a single
  jitted render function over HBM-resident arrays (``graph/``),
- the GLSL shader stages and the hardware rasterizer become fused
  Pallas/XLA kernels (``ops/``),
- glTF scenes load into SoA device arrays (``scene/``),
- multi-chip scaling shards the framebuffer tile grid over a
  ``jax.sharding.Mesh`` (``parallel/``).

Reference parity targets are documented in SURVEY.md; citations in
docstrings are ``path:line`` into the read-only reference checkout.
"""

__version__ = "0.1.0"
