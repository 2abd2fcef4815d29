"""Dissect the masked (alpha-cutoff) stage on the attached TPU.

The round-4 table says masked = 912 ms while its k-raster is 40 ms — so
~870 ms lives in the accept machinery (compactions, per-layer evals,
tail rounds).  This tool times each ingredient standalone on the replica
bench camera, and A/Bs the baked alpha-coverage state path against the
pure-trilinear path (bit-exactness + speed), to direct the optimization
instead of guessing (VERDICT r4 tasks 1-3).

Run: python tools/bench_masked.py  (TPU; ~5 min incl. compiles)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from vk_renderer_tpu.utils import jaxcache
    jaxcache.enable()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vk_renderer_tpu.graph import driver
    from vk_renderer_tpu.graph import frame as F
    from vk_renderer_tpu.graph.profiler import _timed
    from vk_renderer_tpu.graph.scenedata import RenderSettings
    from vk_renderer_tpu.ops import interp, raster
    from vk_renderer_tpu.ops import setup as rsetup
    from vk_renderer_tpu.ops.common import compact_mask
    from vk_renderer_tpu.scene import ktx, sponza_replica
    from vk_renderer_tpu.scene.assembly import SceneBuilder
    from vk_renderer_tpu.scene.camera import Camera

    w, h = 1920, 1080
    glb, kx = sponza_replica.ensure_assets()
    b = SceneBuilder()
    b.load_gltf(glb, "sponza")
    b.cubemap = ktx.load_cubemap(kx)
    scene = b.build().device_put()
    print(f"scene: {scene.num_triangles} tris, masked_vis="
          f"{scene.n_masked_vis}/{scene.n_masked}, "
          f"states={'yes' if scene.textures.alpha_states is not None else 'no'}",
          flush=True)

    settings = RenderSettings(enable_shadows=True, shadow_mode=3,
                              enable_postprocess=True)
    cfg = driver.config_from_settings(settings, w, h)
    cam = Camera(position=np.array([9.0, 1.8, 0.3], np.float32))
    cam.yaw = np.pi / 2
    sd = driver.scene_data_pytree(cam, settings, cfg)

    # ---- setup products (mirrors profiler.stage_setup)
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
        ptbl_a = F.build_alpha_ptbl(scene, padded, tris_p, tri_mat_p, vattr)
        return st, padded, rows, vattr, ptbl, ptbl_a

    _, (st, padded, rows, vattr, ptbl, ptbl_a) = _timed(
        jax.jit(stage_setup), scene, sd, iters=1)
    n_tris = scene.tris[0].shape[0]
    n_mvis = scene.n_masked_vis

    def stage_bin(st):
        (plan_o, plan_m) = raster.plan_view_buckets(
            st, ((0, scene.n_opaque),
                 (scene.n_opaque, scene.n_opaque + n_mvis)),
            w, h, cfg.tile_w, cfg.tile_h,
            (cfg.cap_opaque, cfg.cap_masked),
            (cfg.rec_opaque, cfg.rec_masked), big_cap=cfg.big_cap,
            max_span=cfg.max_span,
            pair_cap=F._resolve_pair_cap(
                cfg.pair_cap, n_tris, cfg.max_span, cfg.big_cap,
                (w // cfg.tile_w) * ((h + cfg.tile_h - 1) // cfg.tile_h)))
        plan_o = raster.prepare_records(plan_o, padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        plan_m = raster.prepare_records(plan_m, padded, st["bbox"], w,
                                        cfg.tile_w, cfg.tile_h)
        return plan_o, plan_m

    _, (plan_o, plan_m) = _timed(jax.jit(stage_bin), st, iters=1)

    def stage_opaque(plan_o, padded):
        return raster.rasterize_plan(plan_o, padded, w, h, n_tris,
                                     tile_w=cfg.tile_w, tile_h=cfg.tile_h,
                                     chunk=cfg.raster_chunk)

    _, (depth, tid) = _timed(jax.jit(stage_opaque), plan_o, padded, iters=1)

    # ---- ingredient: the k-raster round 0
    def kraster0(plan_m, padded, depth):
        return raster.rasterize_plan_k(
            plan_m, padded, w, h, n_tris, cfg.masked_peels + 0, depth,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h, chunk=cfg.masked_chunk)

    ms, layers = _timed(jax.jit(kraster0), plan_m, padded, depth, iters=3)
    print(f"kraster0 ({cfg.masked_peels} layers): {ms:8.2f} ms", flush=True)

    # per-layer found counts (context for the tier caps)
    found = [int(np.asarray(jnp.sum((lt >= 0).astype(jnp.int32))))
             for _, lt in layers]
    print(f"layer found counts: {found}", flush=True)

    # ---- ingredient: compact_mask alone at the big cap
    t2_0 = layers[0][1]
    cap_huge = (w * h * 2) // 3

    def compact_only(t2):
        sel, ov = compact_mask(t2 >= 0, cap_huge)
        return sel.sum() + ov

    ms, _ = _timed(jax.jit(compact_only), t2_0, iters=3)
    print(f"compact_mask @ {cap_huge}: {ms:8.2f} ms", flush=True)

    # ---- ingredient: one accept layer at cap_huge — trilinear vs state
    def accept_tri(t2):
        sel, _ = compact_mask(t2 >= 0, cap_huge)
        selc, t2_s, px, py = F._sparse_pixels(sel, t2, w)
        alpha = F._winner_alpha(scene, t2_s, rows, vattr, px, py,
                                ptbl_a=ptbl_a)
        tgt = jnp.where(sel >= 0, sel, w * h)
        return jnp.zeros((w * h,), bool).at[tgt].set(alpha >= 0.5,
                                                     mode="drop")

    ms, acc_ref = _timed(jax.jit(accept_tri), t2_0, iters=3)
    print(f"accept layer0 trilinear @ {cap_huge}: {ms:8.2f} ms", flush=True)

    if scene.textures.alpha_states is not None:
        def accept_state(t2):
            sel, _ = compact_mask(t2 >= 0, cap_huge)
            selc, t2_s, px, py = F._sparse_pixels(sel, t2, w)
            acc, over = F._masked_accept_state(
                scene, t2_s, px, py, ptbl_a,
                min(cap_huge, max(8192, cap_huge // 4)))
            tgt = jnp.where(sel >= 0, sel, w * h)
            return (jnp.zeros((w * h,), bool).at[tgt].set(acc, mode="drop"),
                    over)

        ms, (acc_st, over) = _timed(jax.jit(accept_state), t2_0, iters=3)
        same = bool(np.array_equal(np.asarray(acc_ref), np.asarray(acc_st)))
        # uncertain fraction at this camera/layer
        print(f"accept layer0 state     @ {cap_huge}: {ms:8.2f} ms  "
              f"bitexact={same} unc_overflow={int(np.asarray(over))}",
              flush=True)

    # ---- the full masked pass: state path vs stripped
    def masked_full(scene, plan_m, padded, depth, tid, ptbl_a):
        return F._masked_pass(scene, cfg, plan_m, padded, rows, vattr,
                              depth, tid, ptbl=ptbl, ptbl_a=ptbl_a)

    ms, out_state = _timed(jax.jit(masked_full), scene, plan_m, padded,
                           depth, tid, ptbl_a, iters=3)
    print(f"masked full (state path): {ms:8.2f} ms", flush=True)

    tex_off = dataclasses.replace(scene.textures, alpha_states=None,
                                  alpha_state_base=None, alpha_quads=None,
                                  alpha_quad_base=None)
    scene_off = dataclasses.replace(scene, textures=tex_off)
    ptbl_a_off = jnp.concatenate(
        [ptbl_a[:, :19], jnp.zeros_like(ptbl_a[:, 19:])], axis=1)
    ms, out_tri = _timed(jax.jit(masked_full), scene_off, plan_m, padded,
                         depth, tid, ptbl_a_off, iters=3)
    print(f"masked full (trilinear):  {ms:8.2f} ms", flush=True)
    d_same = bool(np.array_equal(np.asarray(out_state[0]),
                                 np.asarray(out_tri[0])))
    t_same = bool(np.array_equal(np.asarray(out_state[1]),
                                 np.asarray(out_tri[1])))
    print(f"A/B bit-exact: depth={d_same} tid={t_same} "
          f"peel_ovf={int(np.asarray(out_state[2]))} "
          f"fallback={int(np.asarray(out_state[3]))}", flush=True)


if __name__ == "__main__":
    main()
