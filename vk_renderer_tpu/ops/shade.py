"""Fragment shading: Cook-Torrance PBR, flat shading, shadow filter library.

Exact ports of the reference GLSL:
- shaders/mesh_pbr.frag:159-226 — GGX distribution, Schlick-GGX geometry
  (k=(r+1)^2/8), Schlick Fresnel, F0=mix(0.04, albedo, metallic),
  kD scaled by (1-metallic), out = ambient*albedo + Lo*(1-shadow).
- shaders/mesh.frag:124-182  — Lambert diffuse + ambient variant
  (BASELINE config 2 "flat" shading).
- shaders/mesh_pbr.frag:37-156 — shadow filters: Hard 1-tap, PCF 3x3,
  PCSS (16-tap Poisson blocker search + 16-tap Poisson PCF), CSM =
  cascade-select + PCSS.  Bias 5e-4, biasMat NDC->UV remap.

All functions are dense per-pixel math over [H, W] arrays — pure VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import einsum

from . import texture as tex

PI = 3.14159265359
SHADOW_BIAS = 0.0005                 # mesh_pbr.frag:38
NUM_SAMPLES_BLOCKER_SEARCH = 16
NUM_SAMPLES_PCF = 16
NEAR_PLANE = 0.1                     # mesh_pbr.frag:63
LIGHT_WORLD_SIZE = 2.0
LIGHT_FRUSTUM_WIDTH = 200.0
LIGHT_SIZE_UV = LIGHT_WORLD_SIZE / LIGHT_FRUSTUM_WIDTH

# mesh_pbr.frag:68-85, verbatim
POISSON_DISK = jnp.array([
    [-0.94201624, -0.39906216], [0.94558609, -0.76890725],
    [-0.094184101, -0.92938870], [0.34495938, 0.29387760],
    [-0.91588581, 0.45771432], [-0.81544232, -0.87912464],
    [-0.38277543, 0.27676845], [0.97484398, 0.75648379],
    [0.44323325, -0.97511554], [0.53742981, -0.47373420],
    [-0.26496911, -0.41893023], [0.79197514, 0.19090188],
    [-0.24188840, 0.99706507], [-0.81409955, 0.91437590],
    [0.19984126, 0.78641367], [0.14383161, -0.14100790]], dtype=jnp.float32)


# ----------------------------------------------------------------------------
# shadow filter library
# ----------------------------------------------------------------------------

def _shadow_hard(shadow_maps, coord, layer):
    """compute_shadow (mesh_pbr.frag:39-46): 1 tap."""
    depth = tex.sample_shadow(shadow_maps, coord[..., :2], layer)
    return jnp.where(depth + SHADOW_BIAS < coord[..., 2], 1.0, 0.0)


def _shadow_pcf(shadow_maps, coord, layer):
    """PCF 3x3 (mesh_pbr.frag:48-59)."""
    size = shadow_maps.shape[-1]
    texel = 1.0 / size
    acc = 0.0
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            uv = coord[..., :2] + jnp.array([i * texel, j * texel], jnp.float32)
            d = tex.sample_shadow(shadow_maps, uv, layer)
            acc = acc + jnp.where(coord[..., 2] - SHADOW_BIAS > d, 1.0, 0.0)
    return acc / 9.0


def _shadow_pcss(shadow_maps, coord, layer):
    """PCSS (mesh_pbr.frag:87-121)."""
    z_receiver = coord[..., 2]
    search_w = LIGHT_SIZE_UV * (z_receiver - NEAR_PLANE) / z_receiver
    blocker_sum = jnp.zeros_like(z_receiver)
    n_blockers = jnp.zeros_like(z_receiver)
    for k in range(NUM_SAMPLES_BLOCKER_SEARCH):
        uv = coord[..., :2] + POISSON_DISK[k] * search_w[..., None]
        z = tex.sample_shadow(shadow_maps, uv, layer)
        hit = z + SHADOW_BIAS < z_receiver
        blocker_sum = blocker_sum + jnp.where(hit, z, 0.0)
        n_blockers = n_blockers + hit.astype(jnp.float32)
    z_blocker = jnp.where(n_blockers > 0, blocker_sum / jnp.maximum(n_blockers, 1), -1.0)

    penumbra = (z_receiver - z_blocker) / z_blocker
    radius = penumbra * LIGHT_SIZE_UV * NEAR_PLANE / z_receiver
    acc = jnp.zeros_like(z_receiver)
    for k in range(NUM_SAMPLES_PCF):
        uv = coord[..., :2] + POISSON_DISK[k] * radius[..., None]
        d = tex.sample_shadow(shadow_maps, uv, layer)
        acc = acc + jnp.where(z_receiver - SHADOW_BIAS > d, 1.0, 0.0)
    pcf = acc / NUM_SAMPLES_PCF
    return jnp.where(z_blocker < 0, 0.0, pcf)


def compute_shadow_factor(shadow_maps, frag_world, frag_view_z, scene_data,
                          shadow_mode: int, enable_shadows: bool):
    """calcShadow (mesh_pbr.frag:127-156).  shadow_mode/enable static."""
    if not enable_shadows:
        return jnp.zeros_like(frag_view_z)

    # cascade selection: first i with |viewZ| < cascadeDistances[i]
    view_depth = jnp.abs(frag_view_z)
    dists = scene_data["cascade_distances"]
    n = dists.shape[0]
    layer = jnp.full(view_depth.shape, n - 1, jnp.int32)
    for i in range(n - 1, -1, -1):
        layer = jnp.where(view_depth < dists[i], i, layer)
    if shadow_mode < 3:
        layer = jnp.zeros_like(layer)

    # shadowCoord = biasMat @ lightViewproj[layer] @ fragWorld
    lvp = scene_data["light_viewproj"][layer]            # [H, W, 4, 4]
    hom = jnp.concatenate([frag_world, jnp.ones_like(frag_world[..., :1])], -1)
    sc = einsum("hwij,hwj->hwi", lvp, hom)
    coord = jnp.stack([sc[..., 0] * 0.5 + sc[..., 3] * 0.5,
                       sc[..., 1] * 0.5 + sc[..., 3] * 0.5,
                       sc[..., 2]], axis=-1)             # biasMat, ortho w=1

    if shadow_mode == 0:
        return _shadow_hard(shadow_maps, coord, layer)
    if shadow_mode == 1:
        return _shadow_pcf(shadow_maps, coord, layer)
    return _shadow_pcss(shadow_maps, coord, layer)       # PCSS and CSM


# ----------------------------------------------------------------------------
# BRDF
# ----------------------------------------------------------------------------

def _distribution_ggx(n_dot_h, roughness):
    a = roughness * roughness
    a2 = a * a
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def _geometry_schlick_ggx(n_dot_v, roughness):
    r = roughness + 1.0
    k = r * r / 8.0
    return n_dot_v / (n_dot_v * (1.0 - k) + k)


def _fresnel_schlick(cos_theta, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)


def shade_pbr(gbuf: dict, scene, scene_data: dict, shadow_maps,
              shadow_mode: int, enable_shadows: bool):
    """mesh_pbr.frag main (185-226) over the G-buffer.

    gbuf keys: normal[H,W,3] (unnormalized), color[H,W,3] (vertex rgb),
    uv[H,W,2], duvdx, duvdy, world[H,W,3], view_z[H,W], mat_id[H,W] (i32),
    covered[H,W] (bool).
    Returns (rgb f32[H,W,3], albedo_alpha f32[H,W] for the caller's
    discard handling).
    """
    normal = gbuf["normal"]
    n = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20)
    cam_pos = scene_data["cam_pos"]
    v = cam_pos - gbuf["world"]
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    sun = scene_data["sunlight_direction"][:3]
    l = -sun / jnp.maximum(jnp.linalg.norm(sun), 1e-20)
    h = v + l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)

    mat_id = gbuf["mat_id"]
    tex_ids = scene.mat_tex_ids[mat_id]                  # [H, W, 3]
    color_factors = scene.mat_color_factors[mat_id]
    mr_factors = scene.mat_metal_rough[mat_id]

    albedo_tex = tex.sample_trilinear(scene.textures, tex_ids[..., 0],
                                      gbuf["uv"], gbuf["duvdx"], gbuf["duvdy"])
    albedo = color_factors[..., :3] * albedo_tex[..., :3] * gbuf["color"]
    mr_tex = tex.sample_trilinear(scene.textures, tex_ids[..., 2],
                                  gbuf["uv"], gbuf["duvdx"], gbuf["duvdy"])
    metallic = mr_factors[..., 0] * mr_tex[..., 2]       # factor * tex.b
    roughness = mr_factors[..., 1] * mr_tex[..., 1]      # factor * tex.g

    f0 = jnp.full_like(albedo, 0.04)
    f0 = f0 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]

    n_dot_v = jnp.maximum(jnp.sum(n * v, -1), 0.0)
    n_dot_l = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    n_dot_h = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    h_dot_v = jnp.maximum(jnp.sum(h * v, -1), 0.0)

    ndf = _distribution_ggx(n_dot_h, roughness)
    g = (_geometry_schlick_ggx(n_dot_v, roughness)
         * _geometry_schlick_ggx(n_dot_l, roughness))
    f = _fresnel_schlick(h_dot_v[..., None], f0)

    k_d = (1.0 - f) * (1.0 - metallic[..., None])
    numerator = ndf[..., None] * g[..., None] * f
    denominator = 4.0 * n_dot_v * n_dot_l + 0.0001
    specular = numerator / denominator[..., None]

    radiance = scene_data["sunlight_color"][:3]
    lo = (k_d * albedo / PI + specular) * (n_dot_l[..., None] * radiance)

    ambient = scene_data["ambient_color"][:3] * albedo

    shadow = compute_shadow_factor(shadow_maps, gbuf["world"], gbuf["view_z"],
                                   scene_data, shadow_mode, enable_shadows)
    rgb = ambient + lo * (1.0 - shadow[..., None])
    return rgb, albedo_tex[..., 3]


def shade_flat(gbuf: dict, scene, scene_data: dict, shadow_maps,
               shadow_mode: int, enable_shadows: bool):
    """mesh.frag main (124-182): Lambert + ambient with the same shadow
    library and alpha handling."""
    mat_id = gbuf["mat_id"]
    tex_ids = scene.mat_tex_ids[mat_id]
    color_factors = scene.mat_color_factors[mat_id]
    albedo_tex = tex.sample_trilinear(scene.textures, tex_ids[..., 0],
                                      gbuf["uv"], gbuf["duvdx"], gbuf["duvdy"])
    color = gbuf["color"] * albedo_tex[..., :3] * color_factors[..., :3]

    normal = gbuf["normal"]
    n = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20)
    sun = scene_data["sunlight_direction"][:3]
    l = -sun / jnp.maximum(jnp.linalg.norm(sun), 1e-20)
    n_dot_l = jnp.maximum(jnp.sum(n * l, -1), 0.0)

    shadow = compute_shadow_factor(shadow_maps, gbuf["world"], gbuf["view_z"],
                                   scene_data, shadow_mode, enable_shadows)
    diffuse = n_dot_l[..., None] * color * scene_data["sunlight_color"][:3]
    ambient = scene_data["ambient_color"][:3] * color
    rgb = diffuse * (1.0 - shadow[..., None]) + ambient
    return rgb, albedo_tex[..., 3]
