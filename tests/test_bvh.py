"""BVH builder + traversal tests.

Promotes the reference's structural verifiers (``bvh.rs:128-194``,
``bvh4.rs:300-376``, run in production at ``scene.rs:84-87``) to unit
tests, and checks BVH-traversal hits equal dense brute-force hits.
"""

import numpy as np
import jax.numpy as jnp

from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.scene import SceneBuilder, Material
from wasm_pathtracer_tpu.ops import bvh, trace


def _tri_soup(n, seed=0):
    return scenes.triangle_cloud(n, seed=seed)


def _aabbs(tris):
    pad = np.float32(0.1 * 2e-4)
    return tris.min(1) - pad, tris.max(1) + pad


def test_bvh2_structure_and_coverage():
    tris = _tri_soup(500)
    lo, hi = _aabbs(tris)
    nodes, order = bvh.build_bvh2(lo, hi)
    assert sorted(order.tolist()) == list(range(500))
    # every leaf within bounds, counts bounded
    for nd in nodes:
        if nd.is_leaf:
            assert nd.count <= bvh.LEAF_MAX
            for t in order[nd.first:nd.first + nd.count]:
                assert (lo[t] >= nd.lo - 1e-4).all()
                assert (hi[t] <= nd.hi + 1e-4).all()


def test_bvh4_verify():
    tris = _tri_soup(2000, seed=1)
    lo, hi = _aabbs(tris)
    bounds4, child4, order = bvh.build(lo, hi)
    assert bvh.verify(bounds4, child4, order, lo, hi)
    assert bvh.depth(bounds4, child4) < 20


def test_leaf_encoding_roundtrip():
    for first, count in [(0, 1), (5, 4), (123456, 3)]:
        v = bvh.encode_leaf(first, count)
        assert v < 0
        f, c = bvh.decode_leaf(v)
        assert (f, c) == (first, count)
    f, c = bvh.decode_leaf(bvh.EMPTY)
    assert c == 0


def _scene_with_cloud(n, seed=2):
    b = SceneBuilder(background=(0.1, 0.2, 0.3))
    b.add_triangles(_tri_soup(n, seed=seed), Material.diffuse(0.8, 0.5, 0.2))
    return b.build()


def test_bvh_trace_matches_dense():
    scene = _scene_with_cloud(800)
    prep_dense = trace.prepare(scene)
    prep_bvh = bvh.attach_bvh(trace.prepare(scene), scene)
    assert prep_bvh.has_bvh

    r = np.random.default_rng(5)
    R = 512
    o = jnp.asarray(r.uniform(-4, 4, (R, 3)), jnp.float32)
    d = r.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    t0, sid0, hit0, _ = trace.trace_scene(prep_dense, scene, o, d)
    t1, sid1, hit1, visits = trace.trace_scene(prep_bvh, scene, o, d)

    t0, t1 = np.asarray(t0), np.asarray(t1)
    hit0, hit1 = np.asarray(hit0), np.asarray(hit1)
    assert (hit0 == hit1).mean() > 0.999, "hit masks differ"
    both = hit0 & hit1
    assert np.allclose(t0[both], t1[both], rtol=1e-5, atol=1e-5)
    # same shape chosen except at exact-tie distances
    sid_match = (np.asarray(sid0)[both] == np.asarray(sid1)[both])
    assert sid_match.mean() > 0.99
    # traversal actually prunes: far fewer node visits than triangles
    assert np.asarray(visits).mean() < 800 / 2


def test_bvh_cost_counter_nonzero():
    scene = _scene_with_cloud(600, seed=3)
    prep = bvh.attach_bvh(trace.prepare(scene), scene)
    o = jnp.asarray([[0.0, 0.0, -10.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    _, _, _, cost = trace.trace_scene(prep, scene, o, d)
    assert int(cost[0]) > 0


def test_bvh4_dp_collapse_beats_greedy():
    """The DP collapse (``bvh4.rs:244-281`` exactly) must verify and
    never need more 4-wide nodes (= per-visit AABB tests) than the
    greedy surface-area expansion it replaced."""
    tris = _tri_soup(3000, seed=7)
    lo, hi = _aabbs(tris)
    nodes, order = bvh.build_bvh2(lo, hi)
    b_dp, ch_dp = bvh.collapse_bvh4(nodes)
    b_gr, ch_gr = bvh.collapse_bvh4_greedy(nodes)
    assert bvh.verify(b_dp, ch_dp, order, lo, hi)
    assert bvh.verify(b_gr, ch_gr, order, lo, hi)
    assert ch_dp.shape[0] <= ch_gr.shape[0]


def test_bvh4_dp_native_matches_python_node_count():
    """The C++ builder implements the same DP; leaf order may differ
    (unstable partition) but the collapse quality must match."""
    try:
        from wasm_pathtracer_tpu.ops import bvh_native
        tris = _tri_soup(2500, seed=9)
        lo, hi = _aabbs(tris)
        b_n, ch_n, ord_n = bvh_native.build(lo, hi)
    except Exception:
        import pytest
        pytest.skip("native builder unavailable")
    assert bvh.verify(b_n, ch_n, ord_n, lo, hi)
    nodes, _ = bvh.build_bvh2(lo, hi)
    _, ch_p = bvh.collapse_bvh4(nodes)
    assert ch_n.shape[0] == ch_p.shape[0]
