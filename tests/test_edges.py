"""Edge-aware gradient machinery (``ops/edges.py``) unit tests.

The FD-level acceptance tests live in test_grads.py (camera
FD-allclose, occluded-light magnitude bound); these pin the warp's
mechanical invariants: exact value-neutrality (forward renders are
unchanged), projection inversion, and the occluder clearance geometry.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.camera import Camera, primary_rays
from wasm_pathtracer_tpu.ops import edges, integrator, trace

W = H = 12


def _setup():
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    cam = Camera.create((0.0, 1.5, -2.0), 0.45, 0.0)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                        rr_clamp_min=0.9, rr_clamp_max=0.9,
                        early_exit=False)
    return scene, prep, cam, st


def test_forward_value_preserved():
    """The warp must not change the forward render: T(u) == u and
    J == 1 in value, so radiance matches the plain integrator."""
    scene, prep, cam, st = _setup()
    pix = jnp.arange(W * H, dtype=jnp.int32)
    px, py = pix % W, pix // W
    col_e, _ = edges.render_pixels_edgeaware(prep, scene, st, cam, px, py,
                                             W, H, jnp.uint32(5))
    col_p, _ = integrator.render_pixels(prep, scene, st, cam, px, py,
                                        W, H, jnp.uint32(5))
    assert np.allclose(np.asarray(col_e), np.asarray(col_p),
                       rtol=1e-5, atol=1e-6)


def test_nee_warp_value_preserved():
    scene, prep, cam, st = _setup()
    st = st.replace(edge_aware_nee=True)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    px, py = pix % W, pix // W
    col_e, _ = integrator.render_pixels(prep, scene, st, cam, px, py,
                                        W, H, jnp.uint32(5))
    col_p, _ = integrator.render_pixels(
        prep, scene, st.replace(edge_aware_nee=False), cam, px, py,
        W, H, jnp.uint32(5))
    assert np.allclose(np.asarray(col_e), np.asarray(col_p),
                       rtol=1e-5, atol=1e-6)


def test_warp_jacobian_value_is_one():
    scene, prep, cam, st = _setup()
    u = jnp.asarray([[3.2, 4.7], [0.4, 11.2], [6.0, 6.0]], jnp.float32)
    T_fn = lambda uu: edges._screen_warp_T(prep, scene, st, cam, uu,
                                           W, H, 8, 1.25, 1.0)
    T, J = edges.warp_jacobian(T_fn, u)
    assert np.allclose(np.asarray(T), np.asarray(u))
    assert np.array_equal(np.asarray(J), np.ones(3, np.float32))


def test_project_screen_inverts_primary_rays():
    _, _, cam, st = _setup()
    px = jnp.asarray([2, 7, 11], jnp.int32)
    py = jnp.asarray([0, 5, 9], jnp.int32)
    jx = jnp.asarray([0.3, 0.8, 0.1], jnp.float32)
    jy = jnp.asarray([0.6, 0.2, 0.9], jnp.float32)
    o, d = primary_rays(cam, px, py, jx, jy, W, H, st.screen_z)
    # any point along the ray projects back to the launch coordinate
    x = o + d * jnp.asarray([2.0, 5.0, 9.0])[:, None]
    u = edges.project_screen(cam, x, W, H, st.screen_z)
    want = np.stack([np.asarray(px) + np.asarray(jx),
                     np.asarray(py) + np.asarray(jy)], -1)
    assert np.allclose(np.asarray(u), want, atol=1e-3)


def test_segment_clearance_sphere():
    """Clearance -> 0 at grazing, nearest silhouette point on the
    sphere surface; valid from the blocked AND the clear side."""
    scene, prep, _, _ = _setup()
    scene0 = jax.tree.map(jax.lax.stop_gradient, scene)
    # sphere at (0,0,5) r=1; segments from (3,0,5) toward (-3, y, 5)
    x0 = jnp.tile(jnp.asarray([[3.0, 0.0, 5.0]], jnp.float32), (3, 1))
    targets = jnp.asarray([[-3.0, 0.0, 5.0],     # straight through center
                           [-3.0, 2.05, 5.0],    # just grazing above
                           [-3.0, 6.0, 5.0]],    # far above
                          jnp.float32)
    nu = targets - x0
    seg_len = jnp.sqrt(jnp.sum(nu ** 2, -1))
    nu = nu / seg_len[:, None]
    lsid = jnp.full((3,), -7, jnp.int32)   # no light exclusion
    B, z = edges._segment_clearance(prep, scene0, lsid, x0, nu, seg_len)
    B = np.asarray(B)
    z = np.asarray(z)
    assert B[0] > 0.1          # center hit: |dist - r| = r, far from edge
    assert B[1] < 0.02         # grazing
    assert B[2] > B[1]         # clear side increases with distance
    # grazing silhouette point lies on the sphere
    assert abs(np.linalg.norm(z[1] - np.array([0, 0, 5.0])) - 1.0) < 1e-5


@pytest.mark.slow
def test_nee_warp_values_and_gradient_gate():
    """nee_warp preserves values exactly and produces a nonzero
    light-geometry velocity only for samples near the occlusion
    boundary."""
    scene, prep, _, _ = _setup()
    rows = scene.params[scene.light_shape]
    lv = jnp.broadcast_to(rows[0][None], (4, 9))
    lsid = jnp.full((4,), int(scene.light_shape[0]), jnp.int32)
    # shading points: two in the penumbra region, two with segments
    # well clear of the sphere (above its top, looking straight up at
    # the light)
    x = jnp.asarray([[1.2, -1.0, 5.2], [1.3, -1.0, 5.0],
                     [0.0, 2.8, 5.0], [2.5, 3.0, 5.0]], jnp.float32)
    s1 = jnp.asarray([0.4, 0.5, 0.4, 0.5], jnp.float32)
    s2 = jnp.asarray([0.5, 0.3, 0.5, 0.3], jnp.float32)

    def warped(delta):
        sc = scene.with_light_rows(rows.at[:, 1::3].add(delta))
        lvd = jnp.broadcast_to(sc.params[scene.light_shape][0][None],
                               (4, 9))
        w1, w2, J = edges.nee_warp(prep, sc, lvd, lsid, x, s1, s2)
        return w1, w2, J

    w1, w2, J = warped(jnp.float32(0.0))
    assert np.allclose(np.asarray(w1), np.asarray(s1))
    assert np.allclose(np.asarray(w2), np.asarray(s2))
    assert np.array_equal(np.asarray(J), np.ones(4, np.float32))

    vel = jax.jacfwd(lambda d: warped(d)[0])(jnp.float32(0.0))
    vel = np.asarray(vel)
    assert np.isfinite(vel).all()
    assert np.abs(vel[:2]).max() > 1e-3     # near-boundary: warp moves
    assert np.abs(vel[2:]).max() < 2e-3     # clear segments: gated down


def test_segment_clearance_torus():
    """Torus clearance (signed SDF minimum along the segment,
    ``edges._torus_segment_clearance``): -> 0 at grazing from BOTH
    sides, nearest silhouette point on the torus surface.  Flat-lying
    torus at (0,0,5), R=1, r=0.25: outer equator at radius 1.25, top
    of the tube at y=0.25."""
    b = scenes.SceneBuilder(background=(0.0, 0.0, 0.0))
    b.add_torus((0.0, 0.0, 5.0), 1.0, 0.25,
                scenes.Material.diffuse(0.5, 0.5, 0.5))
    scene = b.build()
    prep = trace.prepare(scene)
    scene0 = jax.tree.map(jax.lax.stop_gradient, scene)
    # the segment from (3, 0) to (-3, y_t) sits at height y_t/3 when
    # it crosses the NEAR tube ring (x = +1), so grazing its top
    # (y = 0.25) needs y_t ~ 0.76 — anchoring the graze height at the
    # segment END would instead pass through the tube interior
    x0 = jnp.tile(jnp.asarray([[3.0, 0.0, 5.0]], jnp.float32), (4, 1))
    targets = jnp.asarray([[-3.0, 0.0, 5.0],     # through the tube
                           [-3.0, 0.76, 5.0],    # grazing the tube top
                           [-3.0, 3.0, 5.0],     # far above
                           [0.0, 3.0, 5.0]],     # up over the near rim
                          jnp.float32)
    nu = targets - x0
    seg_len = jnp.sqrt(jnp.sum(nu ** 2, -1))
    nu = nu / seg_len[:, None]
    lsid = jnp.full((4,), -7, jnp.int32)
    B, z = edges._segment_clearance(prep, scene0, lsid, x0, nu, seg_len)
    B = np.asarray(B)
    z = np.asarray(z)
    assert B[0] > 0.03         # blocked through the tube: penetration
    assert B[1] < 0.02         # grazing
    assert B[2] > B[1]         # clear side increases with distance
    # grazing silhouette point lies on the torus surface (sdf ~ 0)
    from wasm_pathtracer_tpu.ops.intersect import _torus_sdf
    sdf_z = float(_torus_sdf(jnp.asarray(z[1]) -
                             jnp.asarray([0.0, 0.0, 5.0]), 1.0, 0.25))
    assert abs(sdf_z) < 5e-3, sdf_z


def test_boundary_test_aarect_per_axis_normalization():
    """Elongated aarect boxes (museum divider rails are 0.2 x 3 x 40)
    must read B ~ 0 only NEAR outline edges — a shared max-extent
    normalization saturated the whole face at B < 0.04 and made the
    screen warp treat entire faces as silhouettes."""
    b = scenes.SceneBuilder(background=(0.0, 0.0, 0.0))
    b.add_aarect(-0.1, 0.1, -1.0, 2.0, -20.0, 20.0,
                 scenes.Material.diffuse(0.5, 0.5, 0.5))
    scene = b.build()
    scene0 = jax.tree.map(jax.lax.stop_gradient, scene)
    # hits ON the x = +0.1 face: one at the face center, one near the
    # y = 2 outline edge, one near the z = 20 outline edge
    x0 = jnp.asarray([[0.1, 0.5, 0.0],
                      [0.1, 1.98, 0.0],
                      [0.1, 0.5, 19.9]], jnp.float32)
    d0 = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32), (3, 1))
    n0 = -d0
    sid = jnp.zeros((3,), jnp.int32)
    B = np.asarray(edges._boundary_test(scene0, sid, x0, d0, n0))
    assert B[0] > 0.15, B      # face interior: far from any edge
    assert B[1] < 0.02, B      # near the y-edge
    assert B[2] < 0.02, B      # near the z-edge
