"""Bisect the CSM shadow stage (4 cascades x setup/bin/records/raster)
on the replica bench camera, chained where needed to cancel dispatch
overhead.

Run: python tools/bench_shadow.py
"""

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
    from vk_renderer_tpu.ops import raster
    from vk_renderer_tpu.ops import setup as rsetup
    from vk_renderer_tpu.ops.common import cdiv
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
    s = cfg.shadow_size
    n_tris = scene.tris[0].shape[0]

    @jax.jit
    def prep(scene, sd):
        planes = F._frustum_planes(sd["viewproj"])
        visible = rsetup.cull_objects(scene.obj_world, scene.obj_bounds,
                                      planes)
        tri_visible = jnp.take(visible,
                               jnp.take(scene.vert_obj, scene.tris[0]))
        world_pos, _ = rsetup.transform_vertices(
            scene.positions, scene.vert_obj, scene.obj_world,
            sd["viewproj"])
        cw = rsetup.gather_corner_positions(world_pos, scene.tris)
        return tri_visible, cw

    tri_visible, cw = jax.block_until_ready(prep(scene, sd))
    float(jnp.zeros(()) + 1)
    lvp = sd["light_viewproj"]
    sh_pair_cap = F._resolve_pair_cap(
        cfg.shadow_pair_cap, n_tris, cfg.shadow_max_span,
        cfg.shadow_big_cap, cdiv(s, cfg.tile_w) * cdiv(s, cfg.tile_h))

    def casc_setup(lvp_i, tri_visible, cw):
        corn = tuple([lvp_i[r, 0] * cw[0][k] + lvp_i[r, 1] * cw[1][k]
                      + lvp_i[r, 2] * cw[2][k] + lvp_i[r, 3]
                      for k in range(3)] for r in range(4))
        return rsetup.triangle_setup(None, None, tri_visible, s, s,
                                     cull=rsetup.CULL_FRONT, corners=corn)

    def casc_bin(st):
        (plan,) = raster.plan_view_buckets(
            st, ((0, n_tris),), s, s, cfg.tile_w, cfg.tile_h,
            (cfg.shadow_cap,), (cfg.rec_shadow,),
            big_cap=cfg.shadow_big_cap, max_span=cfg.shadow_max_span,
            pair_cap=sh_pair_cap)
        return plan

    def casc_records(plan, padded, st):
        return raster.prepare_records(plan, padded, st["bbox"], s,
                                      cfg.tile_w, cfg.tile_h)

    def casc_raster(plan, padded):
        return raster.rasterize_plan(plan, padded, s, s, n_tris,
                                     tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                                     chunk=cfg.raster_chunk)

    ms, st = _timed(jax.jit(casc_setup), lvp[0], tri_visible, cw, iters=3)
    print(f"cascade setup:   {ms:8.2f} ms", flush=True)
    padded = jax.jit(raster.pad_setup)(st)
    ms, plan = _timed(jax.jit(casc_bin), st, iters=3)
    print(f"cascade bin:     {ms:8.2f} ms", flush=True)
    ms, plan = _timed(jax.jit(casc_records), plan, padded, st, iters=3)
    print(f"cascade records: {ms:8.2f} ms", flush=True)
    ms, _ = _timed(jax.jit(casc_raster), plan, padded, iters=3)
    print(f"cascade raster:  {ms:8.2f} ms", flush=True)

    # the full 4-cascade stage (one dispatch)
    def full(scene, sd, tri_visible, cw_unused):
        planes = F._frustum_planes(sd["viewproj"])
        visible = rsetup.cull_objects(scene.obj_world, scene.obj_bounds,
                                      planes)
        tv = jnp.take(visible, jnp.take(scene.vert_obj, scene.tris[0]))
        world_pos, _ = rsetup.transform_vertices(
            scene.positions, scene.vert_obj, scene.obj_world,
            sd["viewproj"])
        return F.render_shadow_maps(scene, world_pos, tv,
                                    sd["light_viewproj"], cfg)

    ms, _ = _timed(jax.jit(full), scene, sd, tri_visible, cw, iters=3)
    print(f"full 4-cascade stage: {ms:8.2f} ms", flush=True)

    # chained sort cost at the shadow emission length
    import time

    emission = n_tris * cfg.shadow_max_span + cfg.shadow_big_cap * \
        cdiv(s, cfg.tile_w) * cdiv(s, cfg.tile_h)
    print(f"full emission length: {emission}  pair_cap: {sh_pair_cap}",
          flush=True)
    key = jax.random.PRNGKey(1)
    ks = jax.device_put(jax.random.randint(key, (sh_pair_cap,), 0, 1 << 30,
                                           jnp.int32))

    def chain_sort(k_iters):
        @jax.jit
        def f(x):
            for i in range(k_iters):
                x = jax.lax.sort(x ^ i)
            return x
        out = jax.block_until_ready(f(ks))
        _ = np.asarray(out[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(ks))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return 1e3 * ts[1]

    t1, t8 = chain_sort(1), chain_sort(8)
    print(f"lax.sort {sh_pair_cap} keys: {(t8 - t1) / 7:8.2f} ms/op",
          flush=True)


if __name__ == "__main__":
    main()
