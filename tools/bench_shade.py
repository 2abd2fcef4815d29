"""Dissect the shade stage (PBR + classified shadow filtering) on the
replica bench camera: stage time + compiled temp footprint for config
variants, hunting the same cond-branch gather-operand re-layouts that
cost the masked pass ~40 ms/layer (tools/bench_masked2.py).

Run: python tools/bench_shade.py
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    from vk_renderer_tpu.utils import jaxcache
    jaxcache.enable()

    import jax
    import jax.numpy as jnp

    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph import frame as F
    from vk_renderer_tpu.graph.profiler import _timed
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.ops import interp, raster, shade
    from vk_renderer_tpu.ops import setup as rsetup
    from vk_renderer_tpu.ops import texture as tex
    from vk_renderer_tpu.scene import ktx, sponza_replica
    from vk_renderer_tpu.scene.assembly import SceneBuilder
    from vk_renderer_tpu.scene.camera import Camera

    w, h = 1920, 1080
    glb, kx = sponza_replica.ensure_assets()
    b = SceneBuilder()
    b.load_gltf(glb, "sponza")
    b.cubemap = ktx.load_cubemap(kx)
    scene = b.build().device_put()
    settings = RenderSettings(enable_shadows=True, shadow_mode=3,
                              enable_postprocess=True)
    cfg = driver.config_from_settings(settings, w, h)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2
    sd = driver.scene_data_pytree(cam, settings, cfg)

    def stage_setup(scene, sd):
        planes = F._frustum_planes(sd["viewproj"])
        visible = rsetup.cull_objects(scene.obj_world, scene.obj_bounds,
                                      planes)
        tri_visible = jnp.take(visible,
                               jnp.take(scene.vert_obj, scene.tris[0]))
        world_pos, clip = rsetup.transform_vertices(
            scene.positions, scene.vert_obj, scene.obj_world,
            sd["viewproj"])
        world_nrm = rsetup.transform_normals(scene.normals, scene.vert_obj,
                                             scene.obj_world)
        st = rsetup.triangle_setup(clip, scene.tris, tri_visible, w, h,
                                   cull=rsetup.CULL_BACK)
        padded = raster.pad_setup(st)
        zero_i = jnp.zeros((1,), jnp.int32)
        tris_p = tuple(jnp.concatenate([t, zero_i]) for t in scene.tris)
        tri_mat_p = jnp.concatenate([scene.tri_material, zero_i])
        rows = interp.build_tri_rows(padded, tris_p, tri_mat_p)
        vattr, vpos = F._build_vertex_rows(scene, world_pos, world_nrm)
        ptbl = F.build_ptbl(scene, cfg, padded, tris_p, tri_mat_p, vattr,
                            vpos)
        n_tris = scene.tris[0].shape[0]
        (plan_o,) = raster.plan_view_buckets(
            st, ((0, scene.n_opaque),), w, h, cfg.tile_w, cfg.tile_h,
            (cfg.cap_opaque,), (cfg.rec_opaque,), big_cap=cfg.big_cap,
            max_span=cfg.max_span, pair_cap=0)
        plan_o = raster.prepare_records(plan_o, padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        depth, tid = raster.rasterize_plan(
            plan_o, padded, w, h, n_tris, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, chunk=cfg.raster_chunk)
        shadow_packed, _, _ = F.render_shadow_maps(
            scene, world_pos, tri_visible, sd["light_viewproj"], cfg)
        gbuf = F._build_gbuffer(scene, sd, tid, rows, vattr, vpos,
                                ptbl=ptbl)
        return gbuf, shadow_packed

    _, (gbuf, shadow_packed) = _timed(jax.jit(stage_setup), scene, sd,
                                      iters=1)

    classify_cap = F._resolve_classify_cap(cfg)

    def shade_with(quad_lit, fine, rows_form, shadows_on=True,
                   mr_nearest=False, barrier=False, static_mode=None):
        def f(gbuf, scene, sd, shadow_packed):
            if fine:
                coarse = tex.make_coarse_rows(
                    tex.build_shadow_coarse(shadow_packed))
                size = shadow_packed.shape[-1]
                fine_t = tex.make_coarse_rows(tex.build_shadow_coarse(
                    shadow_packed, block=tex.fine_block_for(size)))
                shadow_coarse = (coarse, fine_t)
            else:
                shadow_coarse = tex.make_coarse_rows(
                    tex.build_shadow_coarse(shadow_packed))
            sm = (tex.make_shadow_rows(shadow_packed) if rows_form
                  else shadow_packed)
            if barrier:
                # pin the per-frame row tables to ONE materialization so
                # every cond/switch branch gathers from the same buffer
                # (hazard #1, docs/PERF.md: in-program gather operands can
                # be re-materialized padded per branch)
                sm, shadow_coarse = jax.lax.optimization_barrier(
                    (sm, shadow_coarse))
            if not shadows_on:
                rgb, a = shade.shade_pbr(
                    gbuf, scene, sd, sm, 3, False,
                    mr_nearest_mip=mr_nearest)
                return rgb, a, jnp.int32(0)
            mode = (static_mode if static_mode is not None
                    else sd["sunlight_direction"][3])
            enable = (True if static_mode is not None
                      else sd["sunlight_color"][3])
            return shade.shade_pbr(
                gbuf, scene, sd, sm, mode, enable,
                shadow_sparse_cap=classify_cap,
                shadow_coarse=shadow_coarse,
                shadow_quad_lit=quad_lit,
                mr_nearest_mip=mr_nearest)
        return jax.jit(f)

    # variant scenes: the texel heap pre-reshaped [N, 4] on DEVICE (the
    # layout XLA assigns it decides whether the 6 GB padded temp and the
    # per-use repacks disappear)
    tex_q = dataclasses.replace(
        scene.textures, texels=jnp.reshape(scene.textures.texels, (-1, 4)))
    scene_q = dataclasses.replace(scene, textures=tex_q)
    jax.block_until_ready(scene_q.textures.texels)

    variants = [
        ("classified+fine, ShadowRows", dict(), scene),
        ("opt-barrier pinned tables", dict(barrier=True), scene),
        ("static mode 3 (no lax.switch)", dict(static_mode=3), scene),
        ("static mode 3 + barrier", dict(static_mode=3, barrier=True),
         scene),
        ("no shadow filtering at all", dict(shadows_on=False), scene),
        ("no quad-lit receiver probe", dict(quad_lit=False), scene),
        ("coarse-only classifier", dict(quad_lit=False, fine=False), scene),
    ]
    for name, kw, sc in variants:
        fn = shade_with(kw.pop("quad_lit", True), kw.pop("fine", True),
                        True, kw.pop("shadows_on", True),
                        kw.pop("mr_nearest", False), **kw)
        try:
            mem = fn.lower(gbuf, sc, sd, shadow_packed).compile() \
                .memory_analysis()
            print(f"{name:<34} temp={mem.temp_size_in_bytes/2**20:8.1f}MB "
                  f"args={mem.argument_size_in_bytes/2**20:8.1f}MB",
                  flush=True)
        except Exception as e:
            print(f"{name:<34} memory_analysis failed: {e}", flush=True)
        ms, out = _timed(fn, gbuf, sc, sd, shadow_packed, iters=3)
        print(f"{name:<34} {ms:8.2f} ms  ovf={int(np.asarray(out[2]))}",
              flush=True)


if __name__ == "__main__":
    main()
