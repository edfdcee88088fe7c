"""Gradient correctness: analytic pixel gradients vs finite differences.

The BASELINE.md acceptance criterion: "analytic pixel gradients
allclose vs. finite differences".  Finite differences use common random
numbers (same counter RNG seed on both sides), so continuous terms
cancel exactly and only discrete borderline flips (RR survival,
occlusion edges) add noise — emission is exactly linear in the
radiance, albedo nearly so, and both match FD tightly on aggregate.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.ops import integrator, trace

W = H = 16
SEEDS = (3, 17, 91, 222)


def _setup():
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=5,
                        early_exit=False)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    px, py = pix % W, pix // W

    def render_mean(scene_, cam_, seed):
        col, _ = integrator.render_pixels(prep, scene_, st, cam_, px, py,
                                          W, H, jnp.uint32(seed))
        return jnp.mean(col)

    return scene, cam, render_mean


def _fd_vs_grad(loss, x0, direction, h):
    """Directional derivative: analytic vs central finite difference,
    averaged over seeds (common random numbers)."""
    ana, fd = 0.0, 0.0
    for s in SEEDS:
        g = jax.grad(lambda x: loss(x, s))(x0)
        ana += float(jnp.sum(g * direction))
        fd += (float(loss(x0 + h * direction, s))
               - float(loss(x0 - h * direction, s))) / (2 * h)
    return ana / len(SEEDS), fd / len(SEEDS)


def test_emission_gradient_matches_fd():
    scene, cam, render_mean = _setup()

    def loss(emission, seed):
        return render_mean(scene.with_materials(emission=emission), cam, seed)

    direction = jnp.zeros_like(scene.emission).at[2:4].set(1.0)  # the light
    ana, fd = _fd_vs_grad(loss, scene.emission, direction, h=0.05)
    assert abs(ana - fd) <= 0.02 * max(abs(fd), 1e-6) + 1e-5, (ana, fd)
    assert ana > 0  # brighter light -> brighter image


def test_albedo_gradient_matches_fd():
    """With the RR keep-chance pinned (rr_min == rr_max) the survival
    decision no longer depends on albedo, so no discrete boundary terms
    enter the finite difference and the comparison is tight.  (With
    adaptive RR both sides still agree in expectation — the boundary
    term cancels against the 1/keep reweighting derivative — but the FD
    variance from rare flips is O(1/h) per sample; see the statistical
    test below.)"""
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=5,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def loss(albedo, seed):
        sc = scene.with_materials(albedo=albedo)
        col, _ = integrator.render_pixels(prep, sc, st, cam, pix % W,
                                          pix // W, W, H, jnp.uint32(seed))
        return jnp.mean(col)

    r = np.random.default_rng(0)
    direction = jnp.asarray(r.uniform(-1, 1, scene.albedo.shape), jnp.float32)
    ana, fd = _fd_vs_grad(loss, scene.albedo, direction, h=5e-3)
    assert abs(ana - fd) <= 0.03 * max(abs(fd), 1e-5) + 1e-4, (ana, fd)


def test_albedo_gradient_with_rr_statistically_consistent():
    """Full estimator (adaptive RR): analytic and FD agree in sign and
    magnitude; exact agreement needs many samples because FD picks up
    RR boundary flips."""
    scene, cam, render_mean = _setup()

    def loss(albedo, seed):
        return render_mean(scene.with_materials(albedo=albedo), cam, seed)

    r = np.random.default_rng(0)
    direction = jnp.asarray(r.uniform(-1, 1, scene.albedo.shape), jnp.float32)
    ana, fd = _fd_vs_grad(loss, scene.albedo, direction, h=5e-3)
    assert np.sign(ana) == np.sign(fd), (ana, fd)
    assert 0.5 < abs(ana / fd) < 2.0, (ana, fd)


def test_camera_gradient_is_finite_and_correlates_with_fd():
    scene, cam, render_mean = _setup()

    def loss(rx, seed):
        c = Camera(location=cam.location, rot_x=rx, rot_y=cam.rot_y)
        return render_mean(scene, c, seed)

    ana, fd = 0.0, 0.0
    for s in SEEDS:
        g = jax.grad(lambda x: loss(x, s))(cam.rot_x)
        ana += float(g)
        fd += (float(loss(cam.rot_x + 1e-3, s))
               - float(loss(cam.rot_x - 1e-3, s))) / 2e-3
    ana /= len(SEEDS)
    fd /= len(SEEDS)
    # The analytic camera gradient is the *interior* (shading) term;
    # finite differences additionally pick up silhouette terms (rays
    # crossing object edges produce O(1)/h jumps), which dominate at
    # this resolution.  Edge-aware reparameterization is the planned
    # fix (SURVEY §7 hard part (b)); until then the contract is:
    # finite, non-zero, and sign-consistent with FD.
    assert np.isfinite(ana)
    assert ana != 0.0
    if abs(fd) > 1e-3:
        assert np.sign(ana) == np.sign(fd), (ana, fd)


def _light_scene():
    """Plane + area-light quad, NO occluders, camera pitched down so the
    light is outside the frustum: the radiance has no visibility
    discontinuity in the light vertices — FD isolates the smooth NEE
    estimator terms (area, cos_o, cos_i, 1/d^2, sampled point)."""
    from wasm_pathtracer_tpu.models.scene import SceneBuilder, Material
    b = SceneBuilder(background=(0.1, 0.1, 0.1))
    b.add_plane((0.0, -1.0, 0.0), (0.0, 1.0, 0.0),
                Material.diffuse(0.8, 0.8, 0.8))
    light = Material.emissive(8.0, 8.0, 8.0)
    b.add_triangle((1.0, 4.0, 6.0), (1.0, 4.0, 4.0), (-1.0, 4.0, 4.0), light)
    b.add_triangle((-1.0, 4.0, 6.0), (1.0, 4.0, 6.0), (-1.0, 4.0, 4.0), light)
    scene = b.build()
    cam = Camera.create((0.0, 1.5, -2.0), 0.6, 0.0)
    return scene, cam


def test_light_vertex_gradient_matches_fd():
    """Light-GEOMETRY gradients (BASELINE config 4): the NEE solid-angle
    estimator area*cos_o/d^2*cos_i and the sampled point are
    differentiable in the light triangle vertices.  Occluder-free scene:
    with an occluder, lifting the light sweeps its shadow boundary
    across the image — a VISIBILITY derivative the interior-term
    gradient does not carry (the silhouette problem, SURVEY §7(b));
    without one, FD isolates the smooth terms and matches tightly."""
    scene, cam = _light_scene()
    prep = trace.prepare(scene)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def loss(light_rows, seed):
        sc = scene.with_light_rows(light_rows)
        col, _ = integrator.render_pixels(prep, sc, st, cam, pix % W,
                                          pix // W, W, H, jnp.uint32(seed))
        return jnp.mean(col)

    rows0 = scene.params[scene.light_shape]
    # lift the whole light quad vertically (a smooth geometric change
    # that moves distance, solid angle and incident cosines together)
    direction = jnp.zeros_like(rows0).at[:, 1::3].set(1.0)
    ana, fd = _fd_vs_grad(loss, rows0, direction, h=2e-2)
    assert np.isfinite(ana) and ana != 0.0
    assert np.sign(ana) == np.sign(fd), (ana, fd)
    assert abs(ana - fd) <= 0.10 * max(abs(fd), 1e-5), (ana, fd)


def test_light_vertex_gradient_sign_with_occluder():
    """With an occluder (sphere_plane), FD additionally carries the
    shadow-boundary sweep; the interior-term analytic gradient must
    still be finite and sign-consistent (the silhouette term is
    VERDICT/SURVEY's named open hard part for geometry)."""
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def loss(light_rows, seed):
        sc = scene.with_light_rows(light_rows)
        col, _ = integrator.render_pixels(prep, sc, st, cam, pix % W,
                                          pix // W, W, H, jnp.uint32(seed))
        return jnp.mean(col)

    rows0 = scene.params[scene.light_shape]
    direction = jnp.zeros_like(rows0).at[:, 1::3].set(1.0)
    ana, fd = _fd_vs_grad(loss, rows0, direction, h=2e-2)
    assert np.isfinite(ana) and ana != 0.0
    assert np.sign(ana) == np.sign(fd), (ana, fd)


def _pnee_setup():
    from wasm_pathtracer_tpu.ops import photon
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    st = RenderSettings(render_type=RenderType.PNEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    lo, hi = photon.grid_bounds_for_scene(scene, st)
    grid = photon.PhotonGrid.create(scene.num_lights, lo, hi,
                                    st.photon_grid_res)
    for k in range(4):
        grid = photon.emit_photons(grid, prep, scene, st,
                                   jnp.uint32(900 + k), 2048)
    assert int(grid.num_photons) > 0
    return scene, prep, cam, st, grid


def test_pnee_emission_gradient_matches_fd():
    """Config 4: gradients THROUGH the PNEE estimator.  The photon grid
    is a detached importance distribution (ops.photon.sample
    stop-gradients the selection pdf — unbiased for any fixed
    distribution), so emission stays exactly linear in the radiance and
    the FD comparison is tight."""
    scene, prep, cam, st, grid = _pnee_setup()
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def loss(emission, seed):
        sc = scene.with_materials(emission=emission)
        col, _ = integrator.render_pixels(prep, sc, st, cam, pix % W,
                                          pix // W, W, H, jnp.uint32(seed),
                                          photon_grid=grid)
        return jnp.mean(col)

    direction = jnp.zeros_like(scene.emission).at[2:4].set(1.0)
    ana, fd = _fd_vs_grad(loss, scene.emission, direction, h=0.05)
    assert ana > 0
    assert abs(ana - fd) <= 0.02 * max(abs(fd), 1e-6) + 1e-5, (ana, fd)


def test_pnee_light_vertex_gradient_matches_fd():
    """Config 4's hardest named leaf: light geometry under PNEE.
    Occluder-free scene for the same reason as the NEE twin above."""
    from wasm_pathtracer_tpu.ops import photon
    scene, cam = _light_scene()
    prep = trace.prepare(scene)
    st = RenderSettings(render_type=RenderType.PNEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    lo, hi = photon.grid_bounds_for_scene(scene, st)
    grid = photon.PhotonGrid.create(scene.num_lights, lo, hi,
                                    st.photon_grid_res)
    for k in range(4):
        grid = photon.emit_photons(grid, prep, scene, st,
                                   jnp.uint32(900 + k), 2048)
    pix = jnp.arange(W * H, dtype=jnp.int32)

    def loss(light_rows, seed):
        sc = scene.with_light_rows(light_rows)
        col, _ = integrator.render_pixels(prep, sc, st, cam, pix % W,
                                          pix // W, W, H, jnp.uint32(seed),
                                          photon_grid=grid)
        return jnp.mean(col)

    rows0 = scene.params[scene.light_shape]
    direction = jnp.zeros_like(rows0).at[:, 1::3].set(1.0)
    ana, fd = _fd_vs_grad(loss, rows0, direction, h=2e-2)
    assert np.isfinite(ana) and ana != 0.0
    assert np.sign(ana) == np.sign(fd), (ana, fd)
    assert abs(ana - fd) <= 0.10 * max(abs(fd), 1e-5), (ana, fd)


def test_train_step_recovers_light_height():
    """Inverse rendering with light-geometry leaves: gradient descent
    moves a mis-placed area light toward the target height."""
    from wasm_pathtracer_tpu.parallel import make_ray_mesh, make_train_step
    scene, cam = _light_scene()
    prep = trace.prepare(scene)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    mesh = make_ray_mesh(jax.devices()[:1])
    from wasm_pathtracer_tpu.parallel import render_image_sharded
    target = render_image_sharded(mesh, prep, scene, st, cam, W, H,
                                  jnp.uint32(77), spp=4)
    # perturb the light: lift it by +0.6
    rows0 = scene.params[scene.light_shape]
    wrong = scene.with_light_rows(rows0.at[:, 1::3].add(0.6))
    step = make_train_step(mesh, prep, st, W, H, lr=2.0, spp=2,
                           train_lights=True)
    cur = wrong
    h0 = float(cur.params[scene.light_shape][:, 1].mean())
    for i in range(8):
        loss, cur, cam2 = step(cur, cam, target, jnp.uint32(400 + i))
    h1 = float(cur.params[scene.light_shape][:, 1].mean())
    h_true = float(rows0[:, 1].mean())
    assert np.isfinite(float(loss))
    assert abs(h1 - h_true) < abs(h0 - h_true), (h0, h1, h_true)
