"""The baked 3-state alpha-coverage pyramid (VERDICT r4 task 2).

Certainty contract: for EVERY sample the runtime can take, a cell state of
ACCEPT implies trilinear alpha >= 0.5 and REJECT implies < 0.5 — so the
masked pass's accept mask is bit-identical to the pure-trilinear path.
Verified here both at the sampler level (dense sweeps over uv/LOD against
the real sample_trilinear) and at the frame level (A/B render with the
state table stripped).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vk_renderer_tpu.graph import driver
from vk_renderer_tpu.graph.frame import FrameConfig
from vk_renderer_tpu.graph.scenedata import RenderSettings
from vk_renderer_tpu.ops import texture as tex
from vk_renderer_tpu.scene import procedural
from vk_renderer_tpu.scene.assembly import Material, Node, SceneBuilder
from vk_renderer_tpu.scene.camera import Camera
from vk_renderer_tpu.scene.textures import (TextureHeapBuilder,
                                            build_alpha_states)
from vk_renderer_tpu.scene.types import TextureTable


def _foliage_texture(size=64, seed=7):
    """Binary-ish alpha with soft edges — the foliage-atlas class."""
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size, 4), np.uint8)
    img[..., :3] = 60
    a = np.zeros((size, size), np.float32)
    for _ in range(6):
        cx, cy = rng.uniform(8, size - 8, 2)
        r = rng.uniform(4, 12)
        yy, xx = np.mgrid[0:size, 0:size]
        a = np.maximum(a, np.clip(1.5 - np.hypot(xx - cx, yy - cy) / r,
                                  0, 1))
    img[..., 3] = (np.clip(a, 0, 1) * 255).astype(np.uint8)
    return img


def _heap_with(img):
    b = TextureHeapBuilder()
    t = b.add(img, srgb=True, mipmapped=True)
    words, sbase = build_alpha_states(b, [t])
    table = b.build()
    table.alpha_states = words
    table.alpha_state_base = sbase
    return table, t


@pytest.mark.parametrize("seed", [1, 7])
def test_state_conservative_vs_trilinear(seed):
    """Dense sweep: for uv grids at several LODs, ACCEPT cells must have
    trilinear >= 0.5 and REJECT cells < 0.5 (the uncertain band carries
    no claim)."""
    table, t = _heap_with(_foliage_texture(seed=seed))
    dev = TextureTable(
        texels=jnp.asarray(table.texels),
        mip_offsets=jnp.asarray(table.mip_offsets),
        mip_sizes=jnp.asarray(table.mip_sizes),
        n_mips=jnp.asarray(table.n_mips),
        srgb_flags=jnp.asarray(table.srgb_flags),
        alpha_states=jnp.asarray(table.alpha_states.view(np.int32)),
        alpha_state_base=jnp.asarray(table.alpha_state_base))

    n = 160
    # uv grid crossing the REPEAT boundary (incl. negative u)
    us = np.linspace(-0.3, 1.4, n, dtype=np.float32)
    vs = np.linspace(-0.2, 1.3, n, dtype=np.float32)
    u, v = np.meshgrid(us, vs)
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    base, pack = tex.packed_meta_cols(dev)
    meta = tex.unpack_meta(base[t][None, None], pack[t][None, None])
    meta = tuple(jnp.broadcast_to(m, u.shape) if hasattr(m, "shape")
                 else m for m in meta)
    sbase = jnp.full(u.shape, int(table.alpha_state_base[t]), jnp.int32)

    # LODs spanning the chain, incl. fractional and beyond-max (clipped)
    for lod in [0.0, 0.4, 1.0, 1.6, 2.5, 3.9, 5.2, 20.0]:
        d = jnp.full(u.shape, (2.0 ** lod) / 64.0, jnp.float32)
        z = jnp.zeros_like(d)
        st = tex.alpha_state_lookup(dev.alpha_states, u, v, d, z, z, d,
                                    meta, sbase)
        (alpha,) = tex.sample_trilinear(dev, None, u, v, d, z, z, d,
                                        channels=(3,), meta=meta)
        st = np.asarray(st)
        alpha = np.asarray(alpha)
        acc = st == tex.ALPHA_STATE_ACCEPT
        rej = st == tex.ALPHA_STATE_REJECT
        assert not np.any(acc & (alpha < 0.5)), \
            f"lod {lod}: ACCEPT cell with trilinear < 0.5"
        assert not np.any(rej & (alpha >= 0.5)), \
            f"lod {lod}: REJECT cell with trilinear >= 0.5"
        # the table must be useful, not vacuously uncertain
        if lod <= 1.0:
            assert (acc | rej).mean() > 0.4, \
                f"lod {lod}: states mostly uncertain"


def test_state_half_quantization_boundary():
    """Mips of binary alpha hit EXACT half values ((255+255+0+0)/4 =
    127.5), which the heap stores round-half-UP as 128 (>= 0.5, accepts);
    the baked states must use the same rounding — np.round's half-to-even
    classified these certain-reject (the round-5 TPU A/B divergence)."""
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., :3] = 100
    img[:, 0::2, 3] = 255          # alternating columns -> 127.5 at mip 1
    table, t = _heap_with(img)
    # mip 1 must quantize to 128/255 (accept side)
    from vk_renderer_tpu.scene.textures import TextureHeapBuilder
    b = TextureHeapBuilder()
    b.add(img, srgb=True, mipmapped=True)
    m1 = b._textures[0][1][..., 3]
    assert np.any(np.abs(m1 * 255.0 - 127.5) < 1e-3), "fixture must hit .5"
    dev = TextureTable(
        texels=jnp.asarray(table.texels),
        mip_offsets=jnp.asarray(table.mip_offsets),
        mip_sizes=jnp.asarray(table.mip_sizes),
        n_mips=jnp.asarray(table.n_mips),
        srgb_flags=jnp.asarray(table.srgb_flags),
        alpha_states=jnp.asarray(table.alpha_states.view(np.int32)),
        alpha_state_base=jnp.asarray(table.alpha_state_base))
    n = 96
    u, v = np.meshgrid(np.linspace(0.01, 0.99, n, dtype=np.float32),
                       np.linspace(0.01, 0.99, n, dtype=np.float32))
    u, v = jnp.asarray(u), jnp.asarray(v)
    base, pack = tex.packed_meta_cols(dev)
    meta = tex.unpack_meta(base[t][None, None], pack[t][None, None])
    meta = tuple(jnp.broadcast_to(m, u.shape) if hasattr(m, "shape")
                 else m for m in meta)
    sbase = jnp.full(u.shape, int(table.alpha_state_base[t]), jnp.int32)
    for lod in [1.0, 1.5, 2.0]:       # the half-valued mip levels
        d = jnp.full(u.shape, (2.0 ** lod) / 8.0, jnp.float32)
        z = jnp.zeros_like(d)
        st = np.asarray(tex.alpha_state_lookup(
            dev.alpha_states, u, v, d, z, z, d, meta, sbase))
        (alpha,) = tex.sample_trilinear(dev, None, u, v, d, z, z, d,
                                        channels=(3,), meta=meta)
        alpha = np.asarray(alpha)
        assert not np.any((st == tex.ALPHA_STATE_ACCEPT) & (alpha < 0.5))
        assert not np.any((st == tex.ALPHA_STATE_REJECT) & (alpha >= 0.5))


def _foliage_scene():
    """Stacked masked quads (reject chains) over an opaque wall."""
    b = SceneBuilder()
    img = _foliage_texture()
    ft = b.heap.add(img, srgb=True, mipmapped=True)
    m_leaf = b.add_material(Material(
        color_factors=np.ones(4, np.float32),
        metal_rough_factors=np.array([0, 1, 0, 0], np.float32),
        albedo_id=ft, can_discard=True))
    m_wall = b.add_material(Material(
        color_factors=np.array([1, 0.2, 0.1, 1], np.float32),
        metal_rough_factors=np.array([0, 1, 0, 0], np.float32),
        albedo_id=b.default_ids["white"]))

    def quad(z, s=2.0):
        pos = np.array([[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]],
                       np.float32)
        nrm = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
        uv = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        return (pos, nrm, uv, tris)

    b.root.add_child(Node(mesh=procedural.make_mesh(
        "wall", [quad(-9.0, 3.0)], [m_wall])))
    for i in range(4):
        b.root.add_child(Node(mesh=procedural.make_mesh(
            f"leaf{i}", [quad(-4.0 - i * 0.8)], [m_leaf])))
    return b.build()


def test_masked_pass_ab_state_vs_trilinear():
    """Frame-level A/B: rendering with the baked state table must be
    BIT-IDENTICAL to the pure-trilinear path (state table stripped)."""
    host = _foliage_scene()
    assert host.textures.alpha_states is not None
    scene_on = host.device_put()
    # strip the states -> the masked pass compiles the legacy path
    import dataclasses
    tex_off = dataclasses.replace(scene_on.textures, alpha_states=None,
                                  alpha_state_base=None, alpha_quads=None,
                                  alpha_quad_base=None)
    scene_off = dataclasses.replace(scene_on, textures=tex_off)

    cfg = FrameConfig(width=256, height=128, cap_opaque=64, cap_masked=64,
                      cap_transparent=64, raster_chunk=32, masked_chunk=8,
                      shadow_size=256, shadow_cap=256, masked_peels=3,
                      masked_tail_rounds=1, masked_tail_peels=2,
                      shading="flat", use_skybox=False,
                      alpha_state_accept=True)
    s = RenderSettings()
    s.sunlight_color = np.array([1, 1, 1, 1], np.float32)
    out_on = driver.render(scene_on, Camera(), s, cfg)
    out_off = driver.render(scene_off, Camera(), s, cfg)
    c_on = np.asarray(out_on["color"])
    c_off = np.asarray(out_off["color"])
    assert np.array_equal(c_on, c_off), \
        f"state path deviates: max |d| = {np.abs(c_on - c_off).max()}"
    assert np.array_equal(np.asarray(out_on["depth"]),
                          np.asarray(out_off["depth"]))
    # the wall must be visible through rejected foliage texels somewhere
    assert (c_on[0] > 0.3).any()
