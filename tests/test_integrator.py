"""Forward-render acceptance tests: JAX integrator vs the NumPy oracle.

The north-star correctness criterion (BASELINE.md): forward renders
allclose to the reference tracer.  Both implementations consume the same
counter-based RNG streams, so per-sample radiance matches except where a
float-borderline discrete decision (RR cutoff, occlusion at an edge)
flips — those are a tiny fraction of samples.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.ops import integrator, trace
from tests import reference_cpu as oracle


def _render_jax(scene, cam, W, H, settings, seed):
    prep = trace.prepare(scene)
    yy, xx = jnp.mgrid[0:H, 0:W]
    px, py = xx.ravel(), yy.ravel()
    col, _ = integrator.render_pixels(prep, scene, settings, cam, px, py,
                                      W, H, jnp.uint32(seed))
    return np.asarray(col).reshape(H, W, 3)


def _compare(scene, cam, has_nee, seed=11, W=24, H=24, max_bounces=8):
    st = RenderSettings(
        render_type=RenderType.NORMAL_NEE if has_nee else RenderType.NO_NEE,
        max_bounces=max_bounces)
    img_jax = _render_jax(scene, cam, W, H, st, seed)
    img_ref = oracle.render(scene, cam, W, H, seed, has_nee=has_nee,
                            max_bounces=max_bounces)
    close = np.isclose(img_jax, img_ref, rtol=1e-3, atol=2e-3).all(axis=-1)
    frac = close.mean()
    assert frac > 0.98, f"only {frac:.3f} of samples match"
    # means agree tightly (mismatches are RR/occlusion borderline flips)
    assert np.allclose(img_jax.mean((0, 1)), img_ref.mean((0, 1)), atol=0.05)


def test_sphere_plane_nee_matches_oracle():
    _compare(scenes.sphere_plane(), Camera.create((0.0, 1.5, -2.0), 0.25, 0.0),
             has_nee=True)


def test_sphere_plane_no_nee_matches_oracle():
    _compare(scenes.sphere_plane(), Camera.create((0.0, 1.5, -2.0), 0.25, 0.0),
             has_nee=False)


def test_whitted_diffuse_parts_match_oracle():
    # oracle handles only diffuse/emissive; use a diffuse-only scene with
    # square + aarect + plane coverage
    from wasm_pathtracer_tpu.models.scene import SceneBuilder, Material
    b = SceneBuilder(background=(0.2, 0.3, 0.4))
    b.add_plane((0.0, -1.0, 0.0), (0.0, 1.0, 0.0), Material.diffuse(0.7, 0.7, 0.7))
    b.add_square((0.0, -0.99, 4.0), 4.0, Material.diffuse(0.9, 0.1, 0.1))
    b.add_aarect(-2.0, -1.0, -1.0, 1.0, 3.0, 4.0, Material.diffuse(0.2, 0.8, 0.2))
    b.add_sphere((1.0, 0.0, 4.0), 0.8, Material.diffuse(0.2, 0.2, 0.9))
    light = Material.emissive(10.0, 10.0, 10.0)
    b.add_triangle((1.0, 5.0, 5.0), (1.0, 5.0, 3.0), (-1.0, 5.0, 3.0), light)
    scene = b.build()
    _compare(scene, Camera.create((0.0, 1.0, -2.0), 0.15, 0.0), has_nee=True)


def test_museum_torus_scene_matches_oracle():
    # the museum is heavy for the oracle; use a single torus + light slice
    from wasm_pathtracer_tpu.models.scene import SceneBuilder, Material
    b = SceneBuilder()
    b.add_plane((0.0, -1.0, 0.0), (0.0, 1.0, 0.0), Material.diffuse(0.7, 0.7, 0.7))
    b.add_torus((0.0, -0.5, 0.0), 1.3, 0.3, Material.diffuse(1.0, 1.0, 1.0))
    light = Material.emissive(2.5, 0.75, 0.75)
    b.add_triangle((1.0, 1.0, 2.5), (1.0, 0.0, 2.8), (-1.0, 0.0, 2.8), light)
    scene = b.build()
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=6)
    W = H = 20
    cam = Camera.create((0.0, 1.5, -4.0), 0.3, 0.0)
    img_jax = _render_jax(scene, cam, W, H, st, 5)
    img_ref = oracle.render(scene, cam, W, H, 5, has_nee=True, max_bounces=6)
    # torus hit distances differ slightly (marcher vs quartic) — compare
    # loosely per-pixel and tightly on the mean
    close = np.isclose(img_jax, img_ref, rtol=0.05, atol=0.05).all(axis=-1)
    assert close.mean() > 0.9, f"only {close.mean():.3f} match"
    assert np.allclose(img_jax.mean((0, 1)), img_ref.mean((0, 1)), atol=0.1)


def test_render_is_jittable_and_deterministic():
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    st = RenderSettings(max_bounces=4)
    W = H = 16
    yy, xx = jnp.mgrid[0:H, 0:W]
    px, py = xx.ravel(), yy.ravel()
    f = jax.jit(lambda s: integrator.render_pixels(
        prep, scene, st, cam, px, py, W, H, s)[0])
    a = np.asarray(f(jnp.uint32(3)))
    b = np.asarray(f(jnp.uint32(3)))
    c = np.asarray(f(jnp.uint32(4)))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


# ---------------------------------------------------------------------------
# Persistent wavefront with path regeneration (integrator.render_queue)
# ---------------------------------------------------------------------------

def _queue_render(scene, settings, cam, pix, W, H, seed, n_lanes):
    prep = trace.prepare(scene)
    return jax.jit(lambda s: integrator.render_queue(
        prep, scene, settings, cam, pix, W, H, s, n_lanes))(jnp.uint32(seed))


def test_render_queue_conserves_samples():
    scene = scenes.sphere_plane()
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=6)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    W = H = 16
    spp = 5
    pix = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), spp)
    acc, cnt, cost = _queue_render(scene, st, cam, pix, W, H, 7, 256)
    assert int(cnt.sum()) == W * H * spp
    assert bool((cnt == spp).all())
    assert np.isfinite(np.asarray(acc)).all()
    assert int(np.asarray(cost, dtype=np.int64).sum()) > 0


def test_render_queue_invariant_to_lane_count():
    # the result is a pure function of (queue, seed): each path's RNG is
    # keyed by its queue index, so lane count / scheduling cannot matter
    scene = scenes.sphere_plane()
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=6)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    W = H = 16
    pix = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), 4)
    a, ca, _ = _queue_render(scene, st, cam, pix, W, H, 9, 64)
    b, cb, _ = _queue_render(scene, st, cam, pix, W, H, 9, 1024)
    assert np.array_equal(np.asarray(ca), np.asarray(cb))
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_render_queue_matches_lockstep_statistically():
    # same estimator as trace_paths, different RNG keying: converged
    # means must agree
    scene = scenes.sphere_plane()
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=6)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    W = H = 16
    spp = 64
    pix = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), spp)
    acc, cnt, _ = _queue_render(scene, st, cam, pix, W, H, 21, 2048)
    img_q = np.asarray(acc / jnp.maximum(cnt, 1)[:, None]).reshape(H, W, 3)

    prep = trace.prepare(scene)
    yy, xx = jnp.mgrid[0:H, 0:W]
    px, py = xx.ravel(), yy.ravel()
    f = jax.jit(lambda s: integrator.render_pixels(
        prep, scene, st, cam, px, py, W, H, s)[0])
    img_l = np.stack([np.asarray(f(jnp.uint32(1000 + r)))
                      for r in range(spp)]).mean(0).reshape(H, W, 3)
    # 64-spp Monte Carlo noise: compare means tightly, pixels loosely
    assert np.allclose(img_q.mean((0, 1)), img_l.mean((0, 1)), atol=0.02)
    assert np.abs(img_q - img_l).mean() < 0.03


def test_render_queue_respects_bounce_cap():
    # max_bounces=1 over pix=arange at 1 spp: the queue keys path i's
    # RNG by its queue index == pixel id, exactly render_pixels' ray_id
    # keying — so the queue image must EQUAL the lockstep single-bounce
    # render per pixel, not just statistically
    scene = scenes.sphere_plane()
    st = RenderSettings(render_type=RenderType.NO_NEE, max_bounces=1)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    W = H = 8
    pix = jnp.arange(W * H, dtype=jnp.int32)
    acc, cnt, _ = _queue_render(scene, st, cam, pix, W, H, 3, 32)
    assert int(cnt.sum()) == W * H
    assert bool((cnt == 1).all())

    prep = trace.prepare(scene)
    col, _ = jax.jit(lambda s: integrator.render_pixels(
        prep, scene, st, cam, pix % W, pix // W, W, H, s))(jnp.uint32(3))
    assert np.allclose(np.asarray(acc), np.asarray(col), atol=1e-6)


def test_render_queue_empty_and_zero_bounce():
    # degenerate inputs: S == 0 returns zeros; max_bounces == 0 matches
    # trace_paths' zero-step scan (black) while still counting samples
    scene = scenes.sphere_plane()
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    W = H = 8
    st = RenderSettings(render_type=RenderType.NO_NEE, max_bounces=4)
    empty = jnp.zeros((0,), jnp.int32)
    acc, cnt, cost = _queue_render(scene, st, cam, empty, W, H, 3, 32)
    assert int(cnt.sum()) == 0 and float(jnp.abs(acc).sum()) == 0.0

    st0 = RenderSettings(render_type=RenderType.NO_NEE, max_bounces=0)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    acc, cnt, cost = _queue_render(scene, st0, cam, pix, W, H, 3, 32)
    assert bool((cnt == 1).all())
    assert float(jnp.abs(acc).sum()) == 0.0
    assert int(np.asarray(cost, dtype=np.int64).sum()) == 0
