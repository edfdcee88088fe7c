"""Whitted-style deterministic ray tracer.

The reference began life as a Whitted raytracer before its path-tracer
conversion (``README.md:11-14``); the Whitted machinery survives only
as commented-out materials and the never-shaded point/spot/directional
lights (``src/scenes.rs:113-130``, ``src/graphics/lights/``).
BASELINE.json configs 1-2 name "1-bounce Whitted" and "4-bounce Whitted
with reflect/refract/Fresnel + textures", so this module restores the
capability TPU-natively:

- the recursion tree (reflect + refract branches) is **unrolled at
  trace time** to the configured depth — each level is one fully masked
  wavefront over the whole ray batch, and XLA sees a static DAG;
- both Fresnel branches of a dielectric are evaluated (true Whitted
  branching, weighted by Schlick's approximation) with Beer-Lambert
  absorption along interior segments;
- direct lighting: point/spot/directional lights with hard shadows,
  plus area lights sampled at their centroid (deterministic).

Everything is differentiable w.r.t. materials, lights and camera.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wasm_pathtracer_tpu.config import RenderSettings
from wasm_pathtracer_tpu.models.camera import Camera, primary_rays
from wasm_pathtracer_tpu.models.scene import (
    EXTRA_ABSORB_B, EXTRA_ABSORB_R, EXTRA_IOR, EXTRA_REFLECTIVITY,
    MatKind, SceneData,
)
from wasm_pathtracer_tpu.ops import intersect as isx
from wasm_pathtracer_tpu.ops import trace as tr
from wasm_pathtracer_tpu.ops.integrator import _refract_dir, _schlick
from wasm_pathtracer_tpu.utils import vecmath as vm


def _direct_light(prep, scene: SceneData, p, n, albedo, eps,
                  light_chunk: int = 16):
    """Direct illumination at a diffuse surface point (hard shadows).

    Whitted shading is deterministic, so EVERY area light contributes
    (centroid-sampled).  The occlusion queries are batched TPU-style:
    lights are processed in chunks of ``light_chunk`` under ``lax.scan``,
    each chunk ONE wavefront shadow trace over (R * chunk) rays — the
    museum's 108 lights cost 7 batched traces per recursion level
    instead of 108 sequential full-batch dispatches.
    """
    R = p.shape[0]
    out = jnp.zeros((R, 3), jnp.float32)
    brdf = albedo / jnp.pi

    # area lights, centroid-sampled
    L = scene.num_lights
    if L > 0:
        lrows = scene.params[scene.light_shape]            # (L, 9)
        v0, v1, v2 = lrows[:, 0:3], lrows[:, 3:6], lrows[:, 6:9]
        centroid = (v0 + v1 + v2) / 3.0                    # (L, 3)
        n_l = vm.normalize(jnp.cross(v1 - v0, v2 - v0))    # (L, 3)
        area = isx.triangle_area(v0, v1, v2)               # (L,)
        emit = scene.emission[scene.light_shape]           # (L, 3)

        Lc = min(light_chunk, L)
        pad = (-L) % Lc
        # padded lights get zero area (-> masked) and sid -2 (matches no
        # occluder); their garbage geometry never reaches the output
        cent_p = jnp.pad(centroid, ((0, pad), (0, 0))).reshape(-1, Lc, 3)
        nl_p = jnp.pad(n_l, ((0, pad), (0, 0))).reshape(-1, Lc, 3)
        area_p = jnp.pad(area, (0, pad)).reshape(-1, Lc)
        emit_p = jnp.pad(emit, ((0, pad), (0, 0))).reshape(-1, Lc, 3)
        sid_p = jnp.pad(scene.light_shape, (0, pad),
                        constant_values=-2).reshape(-1, Lc)

        def chunk_body(acc, ch):
            cent, nl, ar, em, sid = ch
            to_l = cent[None, :, :] - p[:, None, :]        # (R, Lc, 3)
            dis_sq = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-12)
            to_l = to_l / jnp.sqrt(dis_sq)[..., None]
            cos_i = jnp.sum(to_l * n[:, None, :], -1)
            cos_o = jnp.abs(jnp.sum(-to_l * nl[None, :, :], -1))  # 2-sided
            vis = (cos_i > 0.0) & (ar[None, :] > 0.0)
            # one batched occlusion trace for the whole chunk
            p_f = jnp.broadcast_to(p[:, None, :], (R, Lc, 3)).reshape(-1, 3)
            t_f = jnp.broadcast_to(cent[None, :, :],
                                   (R, Lc, 3)).reshape(-1, 3)
            s_f = jnp.broadcast_to(sid[None, :], (R, Lc)).reshape(-1)
            occ, _ = tr.shadow_ray(prep, scene, p_f, t_f, s_f, eps)
            w = ar[None, :] * cos_o / dis_sq * cos_i
            w = jnp.where(vis & ~occ.reshape(R, Lc), w, 0.0)
            return acc + jnp.sum(w[..., None] * em[None, :, :], axis=1), None

        acc, _ = jax.lax.scan(chunk_body, jnp.zeros((R, 3), jnp.float32),
                              (cent_p, nl_p, area_p, emit_p, sid_p))
        out = out + brdf * acc

    # 0-sized lights
    for li in range(scene.num_plights):
        kind = int(scene.plight_kind[li])
        color = scene.plight_color[li]
        if kind == 2:   # directional: constant direction, no falloff
            to_l = -vm.normalize(scene.plight_dir[li])[None, :]
            to_l = jnp.broadcast_to(to_l, p.shape)
            cos_i = vm.dot(to_l, n)
            far = p + to_l * 1e4
            occ, _ = tr.shadow_ray(prep, scene, p, far,
                                   jnp.int32(-1), eps)
            w = jnp.where((cos_i > 0.0) & ~occ, cos_i, 0.0)
            out = out + brdf * color * w[..., None]
        else:           # point / spot: inverse-square falloff
            lp = scene.plight_pos[li]
            to_l = lp[None, :] - p
            dis_sq = jnp.maximum(vm.length_sq(to_l), 1e-12)
            to_l = to_l / jnp.sqrt(dis_sq)[..., None]
            cos_i = vm.dot(to_l, n)
            vis = cos_i > 0.0
            if kind == 1:  # spot cone test
                cos_cone = jnp.cos(scene.plight_angle[li])
                spot_dir = vm.normalize(scene.plight_dir[li])
                in_cone = vm.dot(-to_l, spot_dir[None, :]) >= cos_cone
                vis = vis & in_cone
            occ, _ = tr.shadow_ray(prep, scene, p,
                                   jnp.broadcast_to(lp, p.shape),
                                   jnp.int32(-1), eps)
            w = jnp.where(vis & ~occ, cos_i / dis_sq, 0.0)
            out = out + brdf * color * w[..., None]

    return out


def trace_whitted(prep, scene: SceneData, settings: RenderSettings,
                  o, d, depth: int, absorb=None):
    """Trace one wavefront level of the Whitted tree; recursion on
    ``depth`` is a Python-level unroll (static graph)."""
    R = o.shape[0]
    eps = settings.epsilon
    if absorb is None:
        absorb = jnp.zeros((R, 3), jnp.float32)

    t, sid, hit, _ = tr.trace_scene(prep, scene, o, d)
    t_safe = jnp.where(hit, t, 1.0)
    sid_c = jnp.maximum(sid, 0)
    info = tr.hit_info(scene, o, d, t_safe, sid_c)
    p = o + d * t_safe[..., None]
    n = info["n"]
    kind = info["kind"]

    seg = jnp.where(hit, t, 0.0)
    beer = jnp.exp(-absorb * seg[..., None])

    bg = jnp.broadcast_to(scene.background[None, :], (R, 3))
    color = jnp.where(hit[..., None], 0.0, bg)

    # emissive
    emis = hit & (kind == int(MatKind.EMISSIVE))
    color = jnp.where(emis[..., None], info["emission"], color)

    # diffuse component (diffuse shapes fully; reflect shapes partially)
    diffuse_w = jnp.where(kind == int(MatKind.DIFFUSE), 1.0,
                          jnp.where(kind == int(MatKind.REFLECT),
                                    1.0 - info["extra"][:, EXTRA_REFLECTIVITY],
                                    0.0))
    need_diffuse = hit & (diffuse_w > 0.0)
    direct = _direct_light(prep, scene, p, n, info["albedo"], eps)
    color = color + jnp.where(need_diffuse[..., None],
                              diffuse_w[..., None] * direct, 0.0)

    if depth > 0:
        wo = -d
        # mirror branch (REFLECT shapes and the Fresnel-reflect of REFRACT)
        wi_m = vm.reflect(wo, n)
        refl_w = jnp.where(kind == int(MatKind.REFLECT),
                           info["extra"][:, EXTRA_REFLECTIVITY], 0.0)

        ent = info["is_entering"]
        ior = info["extra"][:, EXTRA_IOR]
        n1 = jnp.where(ent, 1.0, ior)
        n2 = jnp.where(ent, ior, 1.0)
        eta = n1 / jnp.maximum(n2, 1e-12)
        cos_i = jnp.clip(-vm.dot(d, n), 0.0, 1.0)
        wi_t, tir = _refract_dir(d, n, eta)
        fres = jnp.where(tir, 1.0, _schlick(cos_i, n1, n2))
        is_refr = kind == int(MatKind.REFRACT)
        refl_w = refl_w + jnp.where(is_refr, fres, 0.0)
        trans_w = jnp.where(is_refr, 1.0 - fres, 0.0)

        any_refl = hit & (refl_w > 0.0)
        any_trans = hit & (trans_w > 0.0) & ~tir

        # next-medium absorption for the transmitted branch
        absorb_in = info["extra"][:, EXTRA_ABSORB_R:EXTRA_ABSORB_B + 1]
        absorb_t = jnp.where(ent[..., None], absorb_in, 0.0)

        sub_r = trace_whitted(prep, scene, settings,
                              p + wi_m * eps, wi_m, depth - 1, absorb)
        color = color + jnp.where(any_refl[..., None],
                                  refl_w[..., None] * info["albedo"] * sub_r,
                                  0.0)
        sub_t = trace_whitted(prep, scene, settings,
                              p + wi_t * eps, wi_t, depth - 1, absorb_t)
        color = color + jnp.where(any_trans[..., None],
                                  trans_w[..., None] * sub_t, 0.0)

    return color * beer


def render_whitted(prep, scene: SceneData, settings: RenderSettings,
                   camera: Camera, px, py, width: int, height: int,
                   depth: int = 4):
    """Whitted render through pixel centers (deterministic, no jitter)."""
    jx = jnp.full(px.shape, 0.5, jnp.float32)
    jy = jnp.full(py.shape, 0.5, jnp.float32)
    o, d = primary_rays(camera, px, py, jx, jy, width, height,
                        settings.screen_z)
    return trace_whitted(prep, scene, settings, o, d, depth)
