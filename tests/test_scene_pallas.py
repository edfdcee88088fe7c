"""Fused whole-scene Pallas megakernel tests (interpreter mode on CPU).

The fused kernel (``ops/scene_pallas.py``) must agree with the XLA
dense path (``ops/trace.py``) — same nearest hit, same shape id — on
every scene family mix, since the session enables it for all forward
rendering on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.scene import SceneBuilder, Material
from wasm_pathtracer_tpu.ops import trace, scene_pallas as sp


def _rays(n, seed=0):
    r = np.random.default_rng(seed)
    o = r.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check_scene(scene, n_rays=1024, seed=3):
    prep = trace.prepare(scene)
    o, d = _rays(n_rays, seed)
    t0, sid0, hit0, _ = trace.trace_scene(prep, scene, o, d)
    with pltpu.force_tpu_interpret_mode():
        t1, sid1, hit1, cost = sp.trace_scene_fused(prep, scene, o, d)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    hit0, hit1 = np.asarray(hit0), np.asarray(hit1)
    assert (hit0 == hit1).mean() > 0.999
    both = hit0 & hit1
    assert np.allclose(t0[both], t1[both], rtol=1e-5, atol=1e-4)
    assert (np.asarray(sid0)[both] == np.asarray(sid1)[both]).mean() > 0.995
    assert (np.asarray(cost) > 0).all()


def test_fused_matches_dense_museum():
    """Tori + triangles + aarects + plane (the flagship scene)."""
    _check_scene(scenes.museum())


def test_fused_matches_dense_whitted():
    """Spheres + squares + textured materials scene."""
    _check_scene(scenes.whitted())


def test_fused_matches_dense_sphere_plane():
    _check_scene(scenes.sphere_plane())


def test_fused_matches_dense_all_families():
    """A synthetic scene exercising every primitive family at once,
    with sizes that are not multiples of the 8-sublane padding."""
    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    r = np.random.default_rng(11)
    for i in range(3):
        b.add_sphere(r.uniform(-2, 2, 3), 0.5, Material.diffuse(0.6, 0.4, 0.3))
    b.add_plane((0, -2, 0), (0, 1, 0), Material.diffuse(0.5, 0.5, 0.5))
    for i in range(2):
        b.add_torus(r.uniform(-2, 2, 3), 0.8, 0.25,
                    Material.diffuse(0.7, 0.7, 0.2))
    lo = r.uniform(-2, 0, (2, 3)); hi = lo + r.uniform(0.2, 1.0, (2, 3))
    for j in range(2):
        b.add_aarect(lo[j][0], hi[j][0], lo[j][1], hi[j][1],
                     lo[j][2], hi[j][2], Material.diffuse(0.2, 0.6, 0.7))
    b.add_square((0.5, -1.0, 0.5), 1.5, Material.diffuse(0.9, 0.2, 0.2))
    tris = scenes.triangle_cloud(5, seed=4)
    b.add_triangles(tris, Material.emissive(4.0, 4.0, 4.0))
    _check_scene(b.build(), n_rays=2048, seed=5)


def test_trace_scene_routes_through_fused_flag():
    """prepare(use_fused=True) must produce identical results through
    the public trace_scene entry point."""
    scene = scenes.sphere_plane()
    o, d = _rays(512, seed=7)
    prep0 = trace.prepare(scene)
    prep1 = trace.prepare(scene, use_fused=True)
    t0, sid0, hit0, _ = trace.trace_scene(prep0, scene, o, d)
    with pltpu.force_tpu_interpret_mode():
        t1, sid1, hit1, _ = trace.trace_scene(prep1, scene, o, d)
    both = np.asarray(hit0) & np.asarray(hit1)
    assert (np.asarray(hit0) == np.asarray(hit1)).all()
    assert np.allclose(np.asarray(t0)[both], np.asarray(t1)[both],
                       rtol=1e-5, atol=1e-5)


def _all_family_light_scene():
    """Every primitive family plus emissive squares AND an emissive
    sphere — the light-exclusion path must hold for every family the
    excluded shape can belong to."""
    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    r = np.random.default_rng(13)
    for i in range(3):
        b.add_sphere(r.uniform(-2, 2, 3), 0.5,
                     Material.diffuse(0.6, 0.4, 0.3))
    b.add_sphere((0.0, 2.5, 1.0), 0.4, Material.emissive(5.0, 5.0, 5.0))
    b.add_plane((0, -2, 0), (0, 1, 0), Material.diffuse(0.5, 0.5, 0.5))
    for i in range(2):
        b.add_torus(r.uniform(-2, 2, 3), 0.8, 0.25,
                    Material.diffuse(0.7, 0.7, 0.2))
    lo = r.uniform(-2, 0, (2, 3))
    hi = lo + r.uniform(0.2, 1.0, (2, 3))
    for j in range(2):
        b.add_aarect(lo[j][0], hi[j][0], lo[j][1], hi[j][1],
                     lo[j][2], hi[j][2], Material.diffuse(0.2, 0.6, 0.7))
    b.add_square((0.5, 3.0, 0.5), 1.5, Material.emissive(6.0, 6.0, 6.0))
    tris = scenes.triangle_cloud(5, seed=4)
    b.add_triangles(tris, Material.emissive(4.0, 4.0, 4.0))
    return b.build()


def _check_anyhit(scene, seed):
    import wasm_pathtracer_tpu.utils.vecmath as vm
    prep = trace.prepare(scene)
    r = np.random.default_rng(seed)
    n = 512
    p = jnp.asarray(r.uniform(-4, 4, (n, 3)).astype(np.float32))
    lsid = jnp.asarray(r.choice(np.asarray(scene.light_shape),
                                n).astype(np.int32))
    p_l = scene.params[lsid][:, 0:3]
    to_l = p_l - p
    dl = vm.length(to_l)
    dd = to_l / jnp.maximum(dl, 1e-30)[..., None]
    o = p + dd * 1e-4
    t, sid, hit, _ = trace.trace_scene(prep, scene, o, dd)
    ref = np.asarray(hit & (t < dl) & (sid != lsid))
    with pltpu.force_tpu_interpret_mode():
        occ, cost = sp.occluded_fused(prep, scene, o, dd, dl, lsid)
    np.testing.assert_array_equal(np.asarray(occ), ref)
    assert (np.asarray(cost) > 0).all()


def test_anyhit_occlusion_all_families():
    """Any-hit verdict parity on a scene with EVERY family present,
    including an emissive sphere and square as excluded lights."""
    _check_anyhit(_all_family_light_scene(), seed=17)


def test_anyhit_occlusion_matches_trace_predicate():
    """The any-hit shadow kernel (r05) equals the trace-based
    predicate ``hit & (t < dist) & (sid != light)`` exactly — the
    reference's distinct cheaper shadow query (``scene.rs:104-133``)
    with identical verdicts."""
    import wasm_pathtracer_tpu.utils.vecmath as vm
    scene = scenes.museum()
    prep = trace.prepare(scene)
    r = np.random.default_rng(11)
    n = 512
    p = jnp.asarray(r.uniform(-4, 4, (n, 3)).astype(np.float32))
    lsid = jnp.asarray(r.choice(np.asarray(scene.light_shape),
                                n).astype(np.int32))
    p_l = scene.params[lsid][:, 0:3]
    to_l = p_l - p
    dl = vm.length(to_l)
    dd = to_l / jnp.maximum(dl, 1e-30)[..., None]
    o = p + dd * 1e-4
    t, sid, hit, _ = trace.trace_scene(prep, scene, o, dd)
    ref = np.asarray(hit & (t < dl) & (sid != lsid))
    with pltpu.force_tpu_interpret_mode():
        occ, cost = sp.occluded_fused(prep, scene, o, dd, dl, lsid)
    np.testing.assert_array_equal(np.asarray(occ), ref)
    assert (np.asarray(cost) > 0).all()
