"""Multi-device sharding tests on the virtual 8-device CPU mesh.

SURVEY §4(d): multi-host behavior validated with the same
single-controller code over fake devices.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.ops import integrator, trace
from wasm_pathtracer_tpu.parallel import (
    make_ray_mesh, make_train_step, render_image_sharded)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup():
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                        early_exit=False)
    return scene, prep, cam, st


@pytest.mark.slow
def test_sharded_render_matches_single_device():
    scene, prep, cam, st = _setup()
    W = H = 32
    mesh8 = make_ray_mesh(jax.devices()[:8])
    mesh1 = make_ray_mesh(jax.devices()[:1])
    img8 = np.asarray(render_image_sharded(mesh8, prep, scene, st, cam,
                                           W, H, jnp.uint32(3)))
    img1 = np.asarray(render_image_sharded(mesh1, prep, scene, st, cam,
                                           W, H, jnp.uint32(3)))
    # counter-based RNG: identical result regardless of device count
    assert np.array_equal(img8, img1)


def test_sharded_render_matches_unsharded_integrator():
    scene, prep, cam, st = _setup()
    W = H = 16
    mesh = make_ray_mesh(jax.devices()[:8])
    img = np.asarray(render_image_sharded(mesh, prep, scene, st, cam,
                                          W, H, jnp.uint32(9)))
    pix = jnp.arange(W * H, dtype=jnp.int32)
    col, _ = integrator.render_pixels(prep, scene, st, cam,
                                      pix % W, pix // W, W, H, jnp.uint32(9))
    ref = np.asarray(col).reshape(H, W, 3)
    assert np.allclose(img, ref, atol=1e-6)


@pytest.mark.slow
def test_train_step_reduces_loss():
    scene, prep, cam, st = _setup()
    W = H = 24
    mesh = make_ray_mesh(jax.devices()[:8])
    # target: the scene rendered with the TRUE albedo; start from a
    # perturbed albedo and recover
    target = render_image_sharded(mesh, prep, scene, st, cam, W, H,
                                  jnp.uint32(100), spp=4)
    wrong = scene.with_materials(albedo=jnp.clip(scene.albedo + 0.15, 0, 1))
    step = make_train_step(mesh, prep, st, W, H, lr=0.5)
    losses = []
    cur, cc = wrong, cam
    for i in range(6):
        loss, cur, cc = step(cur, cc, target, jnp.uint32(200 + i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, f"no progress: {losses}"


def test_gradients_flow_to_materials_and_camera():
    scene, prep, cam, st = _setup()
    W = H = 8
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def loss(albedo, camera):
        sc = scene.with_materials(albedo=albedo)
        col, _ = integrator.render_pixels(prep, sc, st, camera,
                                          pix % W, pix // W, W, H,
                                          jnp.uint32(5))
        return jnp.mean(col ** 2)

    g_alb, g_cam = jax.grad(loss, argnums=(0, 1))(scene.albedo, cam)
    assert np.isfinite(np.asarray(g_alb)).all()
    assert float(jnp.abs(g_alb).sum()) > 0
    assert np.isfinite(float(g_cam.rot_x))


@pytest.mark.slow
def test_queue_renderer_sharded_matches_unsharded():
    """The PRODUCTION path (persistent regenerating wavefront) under
    shard_map: sample counts must be EXACT across device counts; the
    radiance sums agree to float-reassociation noise (per-path values
    are bit-identical — RNG is keyed by global queue index — only the
    per-pixel accumulation order differs between partitions)."""
    from wasm_pathtracer_tpu.parallel import render_queue_sharded
    scene, prep, cam, _ = _setup()
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=6)
    W = H = 16
    spp = 3
    pix = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), spp)

    acc0, cnt0, _ = jax.jit(lambda s: integrator.render_queue(
        prep, scene, st, cam, pix, W, H, s, 128))(jnp.uint32(5))

    mesh8 = make_ray_mesh(jax.devices()[:8])
    mesh1 = make_ray_mesh(jax.devices()[:1])
    acc8, cnt8, _ = render_queue_sharded(mesh8, prep, scene, st, cam,
                                         pix, W, H, jnp.uint32(5), 128)
    acc1, cnt1, _ = render_queue_sharded(mesh1, prep, scene, st, cam,
                                         pix, W, H, jnp.uint32(5), 128)

    assert np.array_equal(np.asarray(cnt0), np.asarray(cnt8))
    assert np.array_equal(np.asarray(cnt1), np.asarray(cnt8))
    assert int(np.asarray(cnt8).sum()) == W * H * spp
    a0, a1, a8 = (np.asarray(x) for x in (acc0, acc1, acc8))
    assert np.allclose(a0, a8, rtol=1e-5, atol=1e-6)
    assert np.allclose(a1, a8, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_flat_wavefront_sharded_matches_unsharded():
    """The MESH-production path (flat wavefront with fused cluster
    traversal, ``ops/wavefront.py``) under shard_map on a cloud scene:
    exact sample counts across device counts, radiance to
    float-reassociation noise — the sharded realization of the
    reference's largest workload class (``index.ts:224-226``)."""
    from wasm_pathtracer_tpu.ops import bvh, wavefront
    from wasm_pathtracer_tpu.parallel import render_queue_flat_sharded
    scene = scenes.cloud(96)
    prep = bvh.attach_clusters(trace.prepare(scene), scene, group=64,
                               min_count=64)
    cam = Camera.create((0.0, 0.5, -2.0), 0.05, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=5)
    W = H = 16
    spp = 2
    pix = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), spp)

    acc0, cnt0, _ = jax.jit(lambda s: wavefront.render_queue_flat(
        prep, scene, st, cam, pix, W, H, s, 128))(jnp.uint32(11))

    mesh8 = make_ray_mesh(jax.devices()[:8])
    mesh1 = make_ray_mesh(jax.devices()[:1])
    acc8, cnt8, _ = render_queue_flat_sharded(mesh8, prep, scene, st, cam,
                                              pix, W, H, jnp.uint32(11), 64)
    acc1, cnt1, _ = render_queue_flat_sharded(mesh1, prep, scene, st, cam,
                                              pix, W, H, jnp.uint32(11), 64)

    assert np.array_equal(np.asarray(cnt0), np.asarray(cnt8))
    assert np.array_equal(np.asarray(cnt1), np.asarray(cnt8))
    assert int(np.asarray(cnt8).sum()) == W * H * spp
    a0, a1, a8 = (np.asarray(x) for x in (acc0, acc1, acc8))
    assert np.allclose(a0, a8, rtol=1e-5, atol=1e-6)
    assert np.allclose(a1, a8, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_queue_renderer_sharded_ragged_queue():
    """Queue length not divisible by the device count: the pad sentinel
    must not leak samples into any pixel."""
    from wasm_pathtracer_tpu.parallel import render_queue_sharded
    scene, prep, cam, _ = _setup()
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4)
    W = H = 8
    pix = jnp.arange(37, dtype=jnp.int32)    # 37 % 8 != 0
    mesh8 = make_ray_mesh(jax.devices()[:8])
    acc, cnt, _ = render_queue_sharded(mesh8, prep, scene, st, cam,
                                       pix, W, H, jnp.uint32(2), 32)
    cnt = np.asarray(cnt)
    assert cnt.sum() == 37
    assert (cnt[:37] == 1).all() and (cnt[37:] == 0).all()
