"""Whitted integrator tests (restored pre-conversion capability)."""

import numpy as np
import jax.numpy as jnp

from wasm_pathtracer_tpu.config import RenderSettings
from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.scene import SceneBuilder, Material
from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.ops import trace, whitted

ST = RenderSettings()


def _render(scene, cam, W=32, H=32, depth=3):
    prep = trace.prepare(scene)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    img = whitted.render_whitted(prep, scene, ST, cam, pix % W, pix // W,
                                 W, H, depth=depth)
    return np.asarray(img).reshape(H, W, 3)


def test_whitted_scene_renders():
    img = _render(scenes.whitted(), Camera.create((0.0, 1.0, -4.0), 0.1, 0.0))
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    # sky background present somewhere (top rows)
    sky = np.array([135, 206, 250], np.float32) / 255.0
    assert np.allclose(img[0, 0], sky, atol=0.2)


def test_point_light_hard_shadow():
    b = SceneBuilder(background=(0.0, 0.0, 0.0))
    b.add_plane((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), Material.diffuse(1.0, 1.0, 1.0))
    b.add_sphere((0.0, 1.0, 0.0), 0.5, Material.diffuse(0.5, 0.5, 0.5))
    b.add_point_light((0.0, 3.0, 0.0), (1.0, 1.0, 1.0), 10.0)
    scene = b.build()
    assert scene.num_plights == 1
    img = _render(scene, Camera.create((0.0, 2.0, -4.0), 0.35, 0.0), depth=1)
    assert img.max() > 0.01
    # the point directly under the sphere is shadowed: scan the floor row
    # through the image center for a dark gap surrounded by light
    prep = trace.prepare(scene)
    p = jnp.asarray([[0.0, 0.0, 0.0], [2.5, 0.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 2, jnp.float32)
    alb = jnp.ones((2, 3), jnp.float32)
    out = np.asarray(whitted._direct_light(prep, scene, p, n, alb, 2e-4))
    assert out[0].max() == 0.0, "under-sphere point should be shadowed"
    assert out[1].max() > 0.0, "offset point should be lit"


def test_directional_and_spot_lights():
    b = SceneBuilder()
    b.add_plane((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), Material.diffuse(1.0, 1.0, 1.0))
    b.add_directional_light((0.0, -1.0, 0.0), (0.5, 0.5, 0.5))
    b.add_spot_light((0.0, 2.0, 0.0), (0.0, -1.0, 0.0), 0.3,
                     (1.0, 0.0, 0.0), 5.0)
    scene = b.build()
    prep = trace.prepare(scene)
    # directly under the spot: lit by both; far away: directional only
    p = jnp.asarray([[0.0, 0.0, 0.0], [50.0, 0.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 2, jnp.float32)
    alb = jnp.ones((2, 3), jnp.float32)
    out = np.asarray(whitted._direct_light(prep, scene, p, n, alb, 2e-4))
    assert out[0, 0] > out[0, 2], "spot adds red under the cone"
    assert np.isclose(out[1, 0], out[1, 2], atol=1e-5), \
        "outside the cone only the white directional light remains"


def test_mirror_reflection_shows_sky():
    b = SceneBuilder(background=(0.0, 0.0, 1.0))   # blue sky
    b.add_sphere((0.0, 0.0, 3.0), 1.0, Material.reflect(1.0, 1.0, 1.0, 1.0))
    scene = b.build()
    img = _render(scene, Camera.create((0.0, 0.0, 0.0), 0.0, 0.0), depth=2)
    # center pixel reflects the sky
    c = img[16, 16]
    assert c[2] > 0.5 and c[0] < 0.2, c


def test_refract_sphere_transmits():
    b = SceneBuilder(background=(1.0, 1.0, 1.0))
    b.add_sphere((0.0, 0.0, 3.0), 1.0, Material.refract((0.0, 0.0, 0.0), 1.0))
    scene = b.build()
    # ior=1: straight transmission, center pixel ~= background
    img = _render(scene, Camera.create((0.0, 0.0, 0.0), 0.0, 0.0), depth=4)
    assert np.allclose(img[16, 16], 1.0, atol=0.05), img[16, 16]


def test_beer_absorption_darkens():
    def scene_with(absorb):
        b = SceneBuilder(background=(1.0, 1.0, 1.0))
        b.add_sphere((0.0, 0.0, 3.0), 1.0, Material.refract(absorb, 1.0))
        return b.build()

    clear = _render(scene_with((0.0, 0.0, 0.0)),
                    Camera.create((0.0, 0.0, 0.0), 0.0, 0.0), depth=4)
    tinted = _render(scene_with((0.0, 2.0, 2.0)),   # absorbs G,B -> red
                     Camera.create((0.0, 0.0, 0.0), 0.0, 0.0), depth=4)
    c0, c1 = clear[16, 16], tinted[16, 16]
    assert c1[0] > 0.9 * c0[0]
    assert c1[1] < 0.5 * c0[1]


def test_textured_floor_checker():
    img = _render(scenes.whitted(), Camera.create((0.0, 2.0, -4.0), 0.45, 0.0),
                  depth=1)
    # floor area shows at least two distinct colors (red/yellow checker)
    floor = img[20:, :, :]
    reds = (floor[..., 0] > 0.05) & (floor[..., 1] < floor[..., 0] * 0.5)
    yellows = (floor[..., 0] > 0.05) & \
        (floor[..., 1] > floor[..., 0] * 0.5)
    assert reds.any() and yellows.any()
