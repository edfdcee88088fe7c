"""Ray-primitive intersection unit tests with known geometry.

Promotes the reference's implicit expectations (each primitive's Rust
``trace``/``trace_simple``) to explicit unit tests, and cross-checks the
batch JAX kernels against the scalar NumPy oracle on random rays.
"""

import numpy as np
import jax.numpy as jnp

from wasm_pathtracer_tpu.ops import intersect as isx
from wasm_pathtracer_tpu.models.scene import PrimType
from tests import reference_cpu as oracle


def _rays(n, seed=0, origin_box=3.0):
    r = np.random.default_rng(seed)
    o = r.uniform(-origin_box, origin_box, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_sphere_known_hits():
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, 0.0], [0.0, 5.0, -3.0]],
                    jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3, jnp.float32)
    t = isx.rays_vs_spheres(o, d, jnp.zeros((1, 3)), jnp.ones((1,)))
    t = np.asarray(t)[:, 0]
    assert np.isclose(t[0], 2.0, atol=1e-5)       # outside hit
    assert np.isclose(t[1], 1.0, atol=1e-5)       # inside: far root
    assert np.isinf(t[2])                          # miss


def test_sphere_normal_inside_outside():
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2, jnp.float32)
    t = jnp.asarray([2.0, 1.0])
    n, ent = isx.sphere_normal(o, d, t, jnp.zeros((2, 3)), jnp.ones((2,)))
    n = np.asarray(n)
    assert np.allclose(n[0], [0, 0, -1], atol=1e-5) and bool(ent[0])
    assert np.allclose(n[1], [0, 0, -1], atol=1e-5) and not bool(ent[1])


def test_plane_hit_and_normal_flip():
    o = jnp.asarray([[0.0, 2.0, 0.0], [0.0, -2.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    loc = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    nrm = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    t = np.asarray(isx.rays_vs_planes(o, d, loc, nrm))
    assert np.allclose(t[:, 0], 2.0, atol=1e-5)
    n, _ = isx.plane_normal(d, jnp.broadcast_to(nrm, (2, 3)))
    n = np.asarray(n)
    assert np.allclose(n[0], [0, 1, 0])   # from above: unchanged
    assert np.allclose(n[1], [0, -1, 0])  # from below: flipped toward ray


def test_triangle_hit_miss_and_t_junction_slack():
    v0 = jnp.asarray([[0.0, 0.0, 5.0]])
    v1 = jnp.asarray([[2.0, 0.0, 5.0]])
    v2 = jnp.asarray([[0.0, 2.0, 5.0]])
    o = jnp.asarray([[0.5, 0.5, 0.0], [1.9, 1.9, 0.0], [0.0, 0.0, 0.0]],
                    jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3, jnp.float32)
    t = np.asarray(isx.rays_vs_triangles(o, d, v0, v1, v2))[:, 0]
    assert np.isclose(t[0], 5.0, atol=1e-5)
    assert np.isinf(t[1])
    # exactly on the corner: epsilon slack keeps it a hit (triangle.rs:41-45)
    assert np.isfinite(t[2])


def test_aarect_normals_outside_and_inside():
    bmin = jnp.asarray([[-1.0, -1.0, -1.0]])
    bmax = jnp.asarray([[1.0, 1.0, 1.0]])
    o = jnp.asarray([[-3.0, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    t = np.asarray(isx.rays_vs_aarects(o, d, bmin, bmax))[:, 0]
    assert np.isclose(t[0], 2.0, atol=1e-5)
    assert np.isclose(t[1], 1.0, atol=1e-5)
    n, ent = isx.aarect_normal(o, d, jnp.asarray(t), bmin[0], bmax[0])
    n = np.asarray(n)
    assert np.allclose(n[0], [-1, 0, 0]) and bool(ent[0])
    assert np.allclose(n[1], [-1, 0, 0]) and not bool(ent[1])


def test_square_hit():
    center = jnp.asarray([[0.0, -1.0, 4.0]])
    size = jnp.asarray([8.0])
    o = jnp.asarray([[0.0, 1.0, 4.0], [10.0, 1.0, 4.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]] * 2, jnp.float32)
    t = np.asarray(isx.rays_vs_squares(o, d, center, size))[:, 0]
    assert np.isclose(t[0], 2.0, atol=1e-5)
    assert np.isinf(t[1])


def test_torus_vs_quartic_oracle():
    """Sphere-marched torus distances match the f64 quartic solver."""
    center = np.array([[0.0, 0.0, 0.0]], np.float32)
    big_r, small_r = np.float32(1.3), np.float32(0.3)
    o, d = _rays(512, seed=3)
    t_jax = np.asarray(isx.rays_vs_tori(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(center),
        jnp.asarray([big_r]), jnp.asarray([small_r])))[:, 0]

    params = np.zeros(9, np.float32)
    params[3], params[4] = big_r, small_r
    t_ref = np.array([oracle._isect(PrimType.TORUS, params, o[i], d[i])
                      for i in range(o.shape[0])])

    both_hit = np.isfinite(t_jax) & np.isfinite(t_ref)
    agree = np.isfinite(t_jax) == np.isfinite(t_ref)
    # sphere marching may miss extreme grazing rays; require 97% agreement
    assert agree.mean() > 0.97, f"hit/miss agreement {agree.mean()}"
    assert np.allclose(t_jax[both_hit], t_ref[both_hit], atol=5e-3)


def test_batch_kernels_match_scalar_oracle():
    """Random rays against every finite primitive type."""
    o, d = _rays(256, seed=1)
    cases = [
        (PrimType.SPHERE, [0.3, -0.2, 0.5, 1.2]),
        (PrimType.TRIANGLE, [-1, -1, 1, 1, -1, 1.5, 0, 1, 1.2]),
        (PrimType.AARECT, [-1, -0.5, -1, 0.8, 0.7, 1.1]),
        (PrimType.SQUARE, [0.1, -0.3, 0.2, 2.5]),
    ]
    for ptype, plist in cases:
        params = np.zeros(9, np.float32)
        params[: len(plist)] = plist
        t_ref = np.array([oracle._isect(ptype, params, o[i], d[i])
                          for i in range(o.shape[0])])
        jo, jd = jnp.asarray(o), jnp.asarray(d)
        p = jnp.asarray(params)[None]
        if ptype == PrimType.SPHERE:
            t = isx.rays_vs_spheres(jo, jd, p[:, 0:3], p[:, 3])
        elif ptype == PrimType.TRIANGLE:
            t = isx.rays_vs_triangles(jo, jd, p[:, 0:3], p[:, 3:6], p[:, 6:9])
        elif ptype == PrimType.AARECT:
            t = isx.rays_vs_aarects(jo, jd, p[:, 0:3], p[:, 3:6])
        else:
            t = isx.rays_vs_squares(jo, jd, p[:, 0:3], p[:, 3])
        t = np.asarray(t)[:, 0]
        both = np.isfinite(t) & np.isfinite(t_ref)
        assert (np.isfinite(t) == np.isfinite(t_ref)).mean() > 0.995, ptype
        assert np.allclose(t[both], t_ref[both], rtol=1e-4, atol=1e-4), ptype


def test_triangle_area_and_pick_random():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[2.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 2.0, 0.0]])
    a = float(isx.triangle_area(v0, v1, v2)[0])
    assert np.isclose(a, 2.0, atol=1e-6)

    r = np.random.default_rng(0)
    n = 4096
    r1 = jnp.asarray(r.uniform(size=n), jnp.float32)
    r2 = jnp.asarray(r.uniform(size=n), jnp.float32)
    r3 = jnp.asarray(r.uniform(size=n), jnp.float32)
    p, nrm = isx.triangle_pick_random(
        jnp.broadcast_to(v0, (n, 3)), jnp.broadcast_to(v1, (n, 3)),
        jnp.broadcast_to(v2, (n, 3)), r1, r2, r3)
    p = np.asarray(p)
    # all points inside the triangle
    assert (p[:, 0] >= -1e-5).all() and (p[:, 1] >= -1e-5).all()
    assert (p[:, 0] + p[:, 1] <= 2 + 1e-4).all()
    assert np.allclose(p[:, 2], 0.0, atol=1e-6)
    # uniform: mean is the centroid
    assert np.allclose(p.mean(0), [2 / 3, 2 / 3, 0.0], atol=0.05)
    # random-sign normals: about half flipped
    nz = np.asarray(nrm)[:, 2]
    assert 0.4 < (nz > 0).mean() < 0.6
