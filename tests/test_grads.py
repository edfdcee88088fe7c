"""Gradient correctness: analytic pixel gradients vs finite differences.

The BASELINE.md acceptance criterion: "analytic pixel gradients
allclose vs. finite differences".  Finite differences use common random
numbers (same counter RNG seed on both sides), so continuous terms
cancel exactly and only discrete borderline flips (RR survival,
occlusion edges) add noise — emission is exactly linear in the
radiance, albedo nearly so, and both match FD tightly on aggregate.
"""

import pytest
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


@pytest.mark.slow
def test_emission_gradient_matches_fd():
    scene, cam, render_mean = _setup()

    def loss(emission, seed):
        return render_mean(scene.with_materials(emission=emission), cam, seed)

    direction = jnp.zeros_like(scene.emission).at[2:4].set(1.0)  # the light
    ana, fd = _fd_vs_grad(loss, scene.emission, direction, h=0.05)
    assert abs(ana - fd) <= 0.02 * max(abs(fd), 1e-6) + 1e-5, (ana, fd)
    assert ana > 0  # brighter light -> brighter image


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_camera_gradient_matches_fd_edgeaware():
    """Camera gradients with SILHOUETTE terms (SURVEY §7 hard part (b),
    BASELINE.json "reparameterized edge-aware sampling"): the
    warped-area estimator (``ops/edges.py``) carries the
    primary-visibility boundary flux that the interior-only gradient
    misses, upgrading this test's round-1/2 sign-consistency contract
    to FD-allclose.

    Geometry note: the camera is pitched so the emissive quad is OUT
    of frame — with it clipping the window border, the derivative is
    dominated by bright content crossing the FIXED pixel window inside
    the warp's damping margin, a window artifact rather than
    silhouette physics.  FD uses h large enough that per-seed
    visibility-flip noise (variance ~ 1/h) is bounded, and the
    tolerance budgets the remaining FD standard error explicitly.
    """
    from wasm_pathtracer_tpu.ops import edges
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.45, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    px, py = pix % W, pix // W

    @jax.jit
    def loss_plain(rx, seed):
        c = Camera(location=cam.location, rot_x=rx, rot_y=cam.rot_y)
        col, _ = integrator.render_pixels(prep, scene, st, c, px, py,
                                          W, H, seed)
        return jnp.mean(col)

    @jax.jit
    def g_edge(rx, seed):
        def f(r):
            c = Camera(location=cam.location, rot_x=r, rot_y=cam.rot_y)
            col, _ = edges.render_pixels_edgeaware(
                prep, scene, st, c, px, py, W, H, seed,
                window_margin=0.75)
            return jnp.mean(col)
        return jax.grad(f)(rx)

    h = 0.05
    fd, ana = [], []
    for s in range(64):
        sd = jnp.uint32(11 + 97 * s)
        fd.append((float(loss_plain(jnp.float32(cam.rot_x + h), sd))
                   - float(loss_plain(jnp.float32(cam.rot_x - h), sd)))
                  / (2 * h))
        ana.append(float(g_edge(cam.rot_x, sd)))
    fd, ana = np.array(fd), np.array(ana)
    sem = fd.std() / np.sqrt(len(fd)) + ana.std() / np.sqrt(len(ana))
    assert np.isfinite(ana).all()
    assert np.sign(ana.mean()) == np.sign(fd.mean()), (ana.mean(), fd.mean())
    # FD-allclose: within 10% of the converged FD plus the measured
    # statistical uncertainty of the comparison itself
    assert abs(ana.mean() - fd.mean()) <= \
        0.10 * abs(fd.mean()) + 2.5 * sem, \
        (ana.mean(), fd.mean(), sem)


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


@pytest.mark.slow
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


@pytest.mark.slow
def test_light_vertex_gradient_with_occluder_matches_fd():
    """Light-geometry gradients UNDER OCCLUSION: lifting the light
    sweeps the sphere's penumbra across the receiving plane — a
    visibility derivative the interior terms do not carry.  With the
    edge-aware NEE warp (``edge_aware_nee``: warped-area
    reparameterization of the light-sample uniforms, ``ops/edges.py``)
    the analytic gradient gains that flux, upgrading round-1/2's
    sign-only contract to a magnitude bound against converged FD.
    Camera pitched down so the emissive quad is out of frame (see the
    camera test's geometry note)."""
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.55, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False, edge_aware_nee=True)
    st_plain = st.replace(edge_aware_nee=False)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    rows0 = scene.params[scene.light_shape]
    direction = jnp.zeros_like(rows0).at[:, 1::3].set(1.0)

    @jax.jit
    def loss_plain(light_rows, seed):
        sc = scene.with_light_rows(light_rows)
        col, _ = integrator.render_pixels(prep, sc, st_plain, cam,
                                          pix % W, pix // W, W, H, seed)
        return jnp.mean(col)

    @jax.jit
    def g_edge(light_rows, seed):
        def f(rows):
            sc = scene.with_light_rows(rows)
            col, _ = integrator.render_pixels(prep, sc, st, cam, pix % W,
                                              pix // W, W, H, seed)
            return jnp.mean(col)
        return jnp.sum(jax.grad(f)(light_rows) * direction)

    h = 0.05
    fd, ana = [], []
    for s in range(24):
        sd = jnp.uint32(11 + 97 * s)
        fd.append((float(loss_plain(rows0 + h * direction, sd))
                   - float(loss_plain(rows0 - h * direction, sd))) / (2 * h))
        ana.append(float(g_edge(rows0, sd)))
    fd, ana = np.array(fd), np.array(ana)
    sem = fd.std() / np.sqrt(len(fd)) + ana.std() / np.sqrt(len(ana))
    assert np.isfinite(ana).all()
    assert np.sign(ana.mean()) == np.sign(fd.mean()), (ana.mean(), fd.mean())
    # magnitude bound: within 20% of converged FD plus measured noise
    assert abs(ana.mean() - fd.mean()) <= \
        0.20 * abs(fd.mean()) + 2.5 * sem, \
        (ana.mean(), fd.mean(), sem)
    assert 0.5 < ana.mean() / fd.mean() < 2.0, (ana.mean(), fd.mean())


def _occluder_grad_vs_fd(scene, n_seeds=24, h=0.05):
    """Shared harness for the occluder-family warp tests: edge-aware
    analytic gradient of mean radiance w.r.t. a vertical light lift,
    vs converged plain-forward central FD over common seeds."""
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.55, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False, edge_aware_nee=True)
    st_plain = st.replace(edge_aware_nee=False)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    rows0 = scene.params[scene.light_shape]
    direction = jnp.zeros_like(rows0).at[:, 1::3].set(1.0)

    @jax.jit
    def loss_plain(light_rows, seed):
        sc = scene.with_light_rows(light_rows)
        col, _ = integrator.render_pixels(prep, sc, st_plain, cam,
                                          pix % W, pix // W, W, H, seed)
        return jnp.mean(col)

    @jax.jit
    def g_edge(light_rows, seed):
        def f(rows):
            sc = scene.with_light_rows(rows)
            col, _ = integrator.render_pixels(prep, sc, st, cam, pix % W,
                                              pix // W, W, H, seed)
            return jnp.mean(col)
        return jnp.sum(jax.grad(f)(light_rows) * direction)

    fd, ana = [], []
    for s in range(n_seeds):
        sd = jnp.uint32(11 + 97 * s)
        fd.append((float(loss_plain(rows0 + h * direction, sd))
                   - float(loss_plain(rows0 - h * direction, sd))) / (2 * h))
        ana.append(float(g_edge(rows0, sd)))
    return np.array(ana), np.array(fd)


@pytest.mark.slow
def test_light_vertex_gradient_with_torus_occluder_matches_fd():
    """The FLAGSHIP occluder family: the museum scene's only occluders
    are tori (27 of them under 108 area lights,
    ``src/scenes.rs:15-52``), so the NEE warp must carry
    shadow-boundary flux for torus silhouettes — round 3 skipped the
    family entirely, leaving interior-only light-geometry gradients
    exactly where the flagship workload lives.  The torus clearance is
    the signed minimum of its SDF along the shadow segment
    (``edges._torus_segment_clearance``); the contract is the same
    magnitude bound the sphere version passes."""
    b = scenes.SceneBuilder(background=(0.1, 0.1, 0.1))
    b.add_plane((0.0, -1.0, 0.0), (0.0, 1.0, 0.0),
                scenes.Material.diffuse(0.8, 0.8, 0.8))
    b.add_torus((0.0, 0.0, 5.0), 0.8, 0.35,
                scenes.Material.diffuse(0.8, 0.2, 0.2))
    light = scenes.Material.emissive(8.0, 8.0, 8.0)
    b.add_triangle((1.0, 4.0, 6.0), (1.0, 4.0, 4.0), (-1.0, 4.0, 4.0), light)
    b.add_triangle((-1.0, 4.0, 6.0), (1.0, 4.0, 6.0), (-1.0, 4.0, 4.0), light)
    ana, fd = _occluder_grad_vs_fd(b.build())
    sem = fd.std() / np.sqrt(len(fd)) + ana.std() / np.sqrt(len(ana))
    assert np.isfinite(ana).all()
    assert np.sign(ana.mean()) == np.sign(fd.mean()), (ana.mean(), fd.mean())
    assert abs(ana.mean() - fd.mean()) <= \
        0.20 * abs(fd.mean()) + 2.5 * sem, \
        (ana.mean(), fd.mean(), sem)
    assert 0.5 < ana.mean() / fd.mean() < 2.0, (ana.mean(), fd.mean())


@pytest.mark.slow
def test_light_vertex_gradient_with_aarect_occluder_improves_on_plain():
    """AARect occluders also get warp clearance now (12 box edges,
    ``edges._box_edges``).  Bound is looser than the torus/sphere
    contracts — a box's shadow boundary is piecewise straight and the
    small image sees few boundary pixels — but the edge-aware gradient
    must be finite, sign-correct, and strictly closer to converged FD
    than the interior-only gradient."""
    b = scenes.SceneBuilder(background=(0.1, 0.1, 0.1))
    b.add_plane((0.0, -1.0, 0.0), (0.0, 1.0, 0.0),
                scenes.Material.diffuse(0.8, 0.8, 0.8))
    b.add_aarect(-0.8, 0.8, -0.4, 0.4, 4.7, 5.3,
                 scenes.Material.diffuse(0.8, 0.2, 0.2))
    light = scenes.Material.emissive(8.0, 8.0, 8.0)
    b.add_triangle((1.0, 4.0, 6.0), (1.0, 4.0, 4.0), (-1.0, 4.0, 4.0), light)
    b.add_triangle((-1.0, 4.0, 6.0), (1.0, 4.0, 6.0), (-1.0, 4.0, 4.0), light)
    scene = b.build()
    ana, fd = _occluder_grad_vs_fd(scene)
    # interior-only gradients for the same seeds, via the shared
    # harness with the warp off on the ANALYTIC side: rebuild by hand
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.55, 0.0)
    st_plain = RenderSettings(render_type=RenderType.NORMAL_NEE,
                              max_bounces=4, rr_clamp_min=0.9,
                              rr_clamp_max=0.9, early_exit=False)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    rows0 = scene.params[scene.light_shape]
    direction = jnp.zeros_like(rows0).at[:, 1::3].set(1.0)

    @jax.jit
    def g_plain(light_rows, seed):
        def f(rows):
            sc = scene.with_light_rows(rows)
            col, _ = integrator.render_pixels(prep, sc, st_plain, cam,
                                              pix % W, pix // W, W, H, seed)
            return jnp.mean(col)
        return jnp.sum(jax.grad(f)(light_rows) * direction)

    plain = np.array([float(g_plain(rows0, jnp.uint32(11 + 97 * s)))
                      for s in range(24)])
    assert np.isfinite(ana).all()
    assert np.sign(ana.mean()) == np.sign(fd.mean()), (ana.mean(), fd.mean())
    assert abs(ana.mean() - fd.mean()) < abs(plain.mean() - fd.mean()), \
        (ana.mean(), plain.mean(), fd.mean())


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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_train_step_recovers_light_height():
    """Inverse rendering with light-geometry leaves: stochastic descent
    on a mis-placed area light RECOVERS the target height (BASELINE
    config 4's flagship contract — |h - h_true| < 0.1, not merely
    monotone progress).

    Recipe (each piece is load-bearing, tuned by measuring the loss
    landscape on this scene):
    - geometry-only leaves: materials/camera frozen (the emission x
      1/d^2 ambiguity, see make_train_step's docstring), and the
      optimizer masked to the y-coordinates — the height workload's
      descent direction is the shared vertical lift; letting x/z
      noise-walk only corrupts the target match;
    - light close to the receiver (d ~ 3.5): brightness sensitivity
      d(loss)/dh scales as 1/d, and at the original d ~ 5 the
      curvature near the optimum is too shallow to localize the
      minimum to 0.1 against MC gradient noise in reasonable steps;
    - direct lighting only (max_bounces=2): the height signal lives
      in the NEE term; indirect bounces only add variance;
    - a converged target (spp=32): the fixed target's own MC noise
      displaces the empirical minimizer by ~sigma_t / |dE/dh|;
    - Polyak-Ruppert tail averaging: with constant-lr SGD the iterate
      is an Ornstein-Uhlenbeck walk around the minimizer; the tail
      mean is the standard stochastic-approximation estimator and
      converges ~3x tighter than the last iterate.
    """
    import optax
    from wasm_pathtracer_tpu.parallel import (make_ray_mesh,
                                              make_train_step,
                                              render_image_sharded)
    b = scenes.SceneBuilder(background=(0.1, 0.1, 0.1))
    b.add_plane((0.0, -1.0, 0.0), (0.0, 1.0, 0.0),
                scenes.Material.diffuse(0.8, 0.8, 0.8))
    light = scenes.Material.emissive(8.0, 8.0, 8.0)
    b.add_triangle((1.0, 2.5, 6.0), (1.0, 2.5, 4.0), (-1.0, 2.5, 4.0), light)
    b.add_triangle((-1.0, 2.5, 6.0), (1.0, 2.5, 6.0), (-1.0, 2.5, 4.0), light)
    scene = b.build()
    cam = Camera.create((0.0, 1.5, -2.0), 0.6, 0.0)
    prep = trace.prepare(scene)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=2,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    mesh = make_ray_mesh(jax.devices()[:1])
    target = render_image_sharded(mesh, prep, scene, st, cam, W, H,
                                  jnp.uint32(77), spp=32)
    # perturb the light: lift it by +0.6
    rows0 = scene.params[scene.light_shape]
    wrong = scene.with_light_rows(rows0.at[:, 1::3].add(0.6))
    ymask = jnp.zeros_like(rows0).at[:, 1::3].set(1.0)
    sgd = optax.sgd(4.0)
    opt = optax.GradientTransformation(
        sgd.init,
        lambda g, s, p=None: ((lambda u, s2:
            ({"light_rows": u["light_rows"] * ymask}, s2))
            (*sgd.update(g, s, p))))
    step = make_train_step(mesh, prep, st, W, H, spp=4,
                           train_lights=True, train_materials=False,
                           train_camera=False, optimizer=opt)
    cur = wrong
    h0 = float(cur.params[scene.light_shape][:, 1].mean())
    h_true = float(rows0[:, 1].mean())
    opt_state = step.init(cur, cam)
    hs = []
    for i in range(320):
        loss, cur, _, opt_state = step(cur, cam, target,
                                       jnp.uint32(400 + i), opt_state)
        hs.append(float(cur.params[scene.light_shape][:, 1].mean()))
    h1 = float(np.mean(hs[-260:]))          # Polyak tail average
    assert np.isfinite(float(loss))
    assert abs(h1 - h_true) < abs(h0 - h_true), (h0, h1, h_true)
    assert abs(h1 - h_true) < 0.1, (h0, h1, h_true)


@pytest.mark.slow
def test_train_step_camera_pose_needs_screen_warp():
    """Pose-from-image NEEDS the screen-space silhouette warp
    (``make_train_step(edge_aware_screen=True)``): a uniform EMISSIVE
    sphere on a black background is piecewise constant in the camera —
    interior-term gradients are exactly zero (diffuse/emissive
    radiance is view-independent; only WHICH pixels cover the sphere
    changes), so plain descent provably stalls while the warped loss
    recovers the camera pitch from the silhouette flux alone.

    The optimizer is masked to ``rot_x``: pitching up and translating
    down move the silhouette near-identically at this distance, so the
    full 5-DoF pose is ambiguous from one view — masking makes the
    contract crisp.  Recovery is asserted to SUB-PIXEL accuracy: one
    pixel at 16x16 is ~0.07 rad of pitch (2*atan(0.5/screen_z)/H), and
    the warp's boundary flux is smoothed over aux_radius ~ 1.25 px, so
    ~half a pixel is the information limit of this target."""
    import optax
    from wasm_pathtracer_tpu.parallel import (make_ray_mesh,
                                              make_train_step,
                                              render_image_sharded)
    b = scenes.SceneBuilder(background=(0.0, 0.0, 0.0))
    b.add_sphere((0.0, 0.0, 5.0), 1.0,
                 scenes.Material.emissive(1.0, 1.0, 1.0))
    scene = b.build()
    prep = trace.prepare(scene)
    st = RenderSettings(render_type=RenderType.NO_NEE, max_bounces=2,
                        early_exit=False)
    mesh = make_ray_mesh(jax.devices()[:1])
    rot_true = 0.12
    cam_true = Camera.create((0.0, 0.0, 0.0), rot_true, 0.0)
    target = render_image_sharded(mesh, prep, scene, st, cam_true, W, H,
                                  jnp.uint32(5), spp=2)
    cam0 = Camera.create((0.0, 0.0, 0.0), 0.0, 0.0)

    def masked_rotx(inner):
        def update(g, s, p=None):
            u, s2 = inner.update(g, s, p)
            cam_u = u["camera"]
            u = dict(u)
            u["camera"] = Camera(location=jnp.zeros_like(cam_u.location),
                                 rot_x=cam_u.rot_x,
                                 rot_y=jnp.zeros_like(cam_u.rot_y))
            return u, s2
        return optax.GradientTransformation(inner.init, update)

    def run(edge_aware):
        step = make_train_step(mesh, prep, st, W, H, spp=1,
                               train_materials=False, train_camera=True,
                               optimizer=masked_rotx(optax.sgd(0.08)),
                               edge_aware_screen=edge_aware)
        cam = cam0
        opt_state = step.init(scene, cam)
        losses = []
        for i in range(60):
            loss, _, cam, opt_state = step(scene, cam, target,
                                           jnp.uint32(50 + i), opt_state)
            losses.append(float(loss))
        return cam, losses

    cam_w, loss_w = run(True)
    cam_p, loss_p = run(False)
    # plain: interior gradient is identically zero -> the camera never
    # moves and the loss never changes
    assert abs(float(cam_p.rot_x) - 0.0) < 1e-6, float(cam_p.rot_x)
    assert abs(loss_p[-1] - loss_p[0]) < 1e-6 * max(abs(loss_p[0]), 1e-9)
    # warped: silhouette flux recovers the pitch to sub-pixel accuracy
    # and drives the loss well below the stalled plain value
    assert np.isfinite(loss_w).all()
    assert abs(float(cam_w.rot_x) - rot_true) < 0.05, float(cam_w.rot_x)
    assert loss_w[-1] < 0.5 * loss_w[0], (loss_w[0], loss_w[-1])


# ---------------------------------------------------------------------------
# Mesh-scale differentiable lights (r05): the reference's bunny scene IS
# a mesh scene with one two-triangle area light (``scenes.rs:71-111``),
# so light-geometry gradients must coexist with an acceleration
# structure.  Built with ``attach_clusters(..., exclude_lights=True)``
# the emissive shapes stay in the LIVE dense remainder (params read
# per-trace, gradients flow), the frozen mesh keeps its baked blocks,
# and the cluster walk's pruning bound is detached
# (``ops/trace.py::_merge_cluster``) so its while_loop stays off the AD
# path.
# ---------------------------------------------------------------------------

def _cluster_light_scene():
    from wasm_pathtracer_tpu.ops import bvh
    tris = scenes.surface_mesh(24)          # ~1.1k tris -> clustered
    scene = scenes.mesh_scene(tris)
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               min_count=64, exclude_lights=True)
    assert prep.cluster is not None
    assert not prep.cluster.has_baked_lights
    cam = Camera.create((0.0, 1.0, -6.0), 0.1, 0.0)
    return scene, prep, cam


def test_train_lights_cluster_prep_guard_and_step():
    """The guard rejects cluster preps with BAKED lights and accepts
    the exclude_lights build; one training step runs and is finite."""
    import jax.numpy as jnp
    from wasm_pathtracer_tpu.ops import bvh
    from wasm_pathtracer_tpu.parallel import make_ray_mesh, make_train_step

    tris = scenes.surface_mesh(24)
    scene = scenes.mesh_scene(tris)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=3,
                        early_exit=False)
    mesh = make_ray_mesh(jax.devices()[:2])

    baked = bvh.attach_clusters(trace.prepare(scene), scene, min_count=64)
    assert baked.cluster.has_baked_lights
    with pytest.raises(ValueError, match="exclude_lights"):
        make_train_step(mesh, baked, st, W, H, train_lights=True,
                        train_materials=False, train_camera=False)

    scene2, prep, cam = _cluster_light_scene()
    step = make_train_step(mesh, prep, st, W, H, lr=0.01,
                           train_lights=True, train_materials=False,
                           train_camera=False)
    target = jnp.zeros((H, W, 3), jnp.float32) + 0.2
    loss, scene3, _ = step(scene2, cam, target, jnp.uint32(5))
    assert np.isfinite(float(loss))
    rows = scene3.params[scene3.light_shape]
    assert np.isfinite(np.asarray(rows)).all()


@pytest.mark.slow
def test_light_vertex_gradient_cluster_prep_matches_fd():
    """Light-vertex gradients through a CLUSTER prep match finite
    differences — the bunny-scene capability the dense-only guard
    previously blocked (r04 VERDICT missing #3)."""
    scene, prep, cam = _cluster_light_scene()
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=3,
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
    assert abs(ana - fd) <= 0.15 * max(abs(fd), 1e-5), (ana, fd)
