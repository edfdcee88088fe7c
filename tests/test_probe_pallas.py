"""Pallas probe-kernel tests (interpreter mode on CPU).

``ops/probe_pallas.py`` must agree with the XLA per-lane block test
(``jnp.take`` + ``ops.cluster._block_test``) on every family mix, since
the flat wavefront substitutes it whenever the cluster table fits VMEM.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.models.scene import SceneBuilder, Material
from wasm_pathtracer_tpu.ops import bvh, cluster as cl, trace
from wasm_pathtracer_tpu.ops import probe_pallas as pp
from wasm_pathtracer_tpu.ops import wavefront, integrator


def _mixed_scene(n_tri=200, n_sphere=60, n_torus=8, n_aarect=20,
                 n_square=12, seed=11):
    r = np.random.default_rng(seed)
    b = SceneBuilder(background=(0.05, 0.05, 0.1))
    mat = Material.diffuse(0.7, 0.5, 0.4)
    if n_tri:
        c = r.uniform(-3, 3, (n_tri, 1, 3)) + np.array([0, 0, 6.0])
        o = r.uniform(-0.3, 0.3, (n_tri, 3, 3))
        b.add_triangles((c + o).astype(np.float32), mat)
    for i in range(n_sphere):
        p = r.uniform(-3, 3, 3) + np.array([0, 0, 6.0])
        b.add_sphere(tuple(p), float(r.uniform(0.1, 0.4)), mat)
    for i in range(n_torus):
        p = r.uniform(-2, 2, 3) + np.array([0, 0, 6.0])
        b.add_torus(tuple(p), float(r.uniform(0.4, 0.8)),
                    float(r.uniform(0.1, 0.25)), mat)
    for i in range(n_aarect):
        lo = r.uniform(-3, 3, 3) + np.array([0, 0, 6.0])
        hi = lo + r.uniform(0.2, 0.8, 3)
        b.add_aarect(lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], mat)
    for i in range(n_square):
        p = r.uniform(-3, 3, 3) + np.array([0, 0, 6.0])
        b.add_square(tuple(p), float(r.uniform(0.3, 1.0)), mat)
    light = Material.emissive(10.0, 10.0, 10.0)
    b.add_triangle((1.5, 7.0, 7.5), (1.5, 7.0, 4.5), (-1.5, 7.0, 4.5), light)
    b.add_triangle((-1.5, 7.0, 7.5), (1.5, 7.0, 7.5), (-1.5, 7.0, 4.5), light)
    return b.build()


def _rays(n, seed=0):
    r = np.random.default_rng(seed)
    o = r.uniform(-4, 4, (n, 3)).astype(np.float32)
    o[:, 2] -= 2.0
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(scene, n=128, seed=1, group=128):
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=group, min_count=32)
    cs = prep.cluster
    assert cs is not None
    C = cs.blocks.shape[0]
    o, d = _rays(n, seed)
    cidx = (jnp.arange(n, dtype=jnp.int32) * 13) % C
    blk = jnp.take(cs.blocks, cidx, axis=0)
    bt = jnp.take(cs.btype, cidx, axis=0)
    t_xla = np.asarray(cl._block_test(o, d, blk, bt, cs.families))
    with pltpu.force_tpu_interpret_mode():
        table = pp.pack_table(cs)
        t_pl = np.asarray(pp.probe_blocks(cs, table, o, d, cidx))
    fin = np.isfinite(t_xla)
    assert (np.isfinite(t_pl) == fin).all()
    np.testing.assert_allclose(t_pl[fin], t_xla[fin], rtol=1e-5, atol=1e-5)


def test_probe_matches_xla_triangles():
    _check(_mixed_scene(n_tri=300, n_sphere=0, n_torus=0, n_aarect=0,
                        n_square=0))


def test_probe_matches_xla_all_families():
    _check(_mixed_scene())


def test_probe_ragged_lanes():
    """Lane count not a multiple of the 8-lane group."""
    _check(_mixed_scene(n_tri=150, n_sphere=40, n_torus=0, n_aarect=0,
                        n_square=0), n=101)


def test_fits_vmem_gate():
    scene = _mixed_scene(n_tri=300, n_sphere=0, n_torus=0, n_aarect=0,
                         n_square=0)
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=32)
    assert pp.fits_vmem(prep.cluster)
    assert pp.kernel_ok(prep.cluster)
    prep64 = bvh.attach_clusters(trace.prepare(scene), scene,
                                 group=64, min_count=32)
    assert not pp.fits_vmem(prep64.cluster)   # kernel requires G == 128
    assert not pp.kernel_ok(prep64.cluster)


def test_probe_min_streamed_matches_vmem():
    """The HBM-streamed probe body (per-lane tile DMA into scratch)
    must agree exactly with the VMEM-resident body — it is the
    >131k-primitive path (``kernel_ok`` without ``fits_vmem``)."""
    scene = _mixed_scene()
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=32)
    cs = prep.cluster
    C = cs.blocks.shape[0]
    n = 101
    o, d = _rays(n, 5)
    cidx = (jnp.arange(n, dtype=jnp.int32) * 11) % C
    with pltpu.force_tpu_interpret_mode():
        table = pp.pack_table(cs)
        t_v, sid_v = pp.probe_blocks_min(cs, table, o, d, cidx,
                                         stream=False)
        t_s, sid_s = pp.probe_blocks_min(cs, table, o, d, cidx,
                                         stream=True)
    np.testing.assert_array_equal(np.asarray(t_v), np.asarray(t_s))
    np.testing.assert_array_equal(np.asarray(sid_v), np.asarray(sid_s))


def test_probe_min_matches_xla_reduction():
    """probe_blocks_min's in-kernel (min, argmin-sid) must equal the
    XLA fallback's ``argmin`` + ``sid_grid`` gather, including the
    first-slot tie-break, on every family mix."""
    scene = _mixed_scene()
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=32)
    cs = prep.cluster
    C, G = cs.blocks.shape[0], cs.blocks.shape[1]
    n = 101   # ragged lane count
    o, d = _rays(n, 3)
    cidx = (jnp.arange(n, dtype=jnp.int32) * 7) % C
    blk = jnp.take(cs.blocks, cidx, axis=0)
    bt = jnp.take(cs.btype, cidx, axis=0)
    t_blk = cl._block_test(o, d, blk, bt, cs.families)
    jloc = jnp.argmin(t_blk, axis=1)
    t_ref = np.asarray(jnp.min(t_blk, axis=1))
    sid_grid = cs.slot_to_sid.reshape(C, G)
    sid_ref = np.asarray(jnp.take(sid_grid, cidx, axis=0)[
        jnp.arange(n), jloc])
    with pltpu.force_tpu_interpret_mode():
        table = pp.pack_table(cs)
        t_pl, sid_pl = pp.probe_blocks_min(cs, table, o, d, cidx)
    t_pl, sid_pl = np.asarray(t_pl), np.asarray(sid_pl)
    fin = np.isfinite(t_ref)
    assert (np.isfinite(t_pl) == fin).all()
    np.testing.assert_allclose(t_pl[fin], t_ref[fin], rtol=1e-5,
                               atol=1e-5)
    assert (sid_pl[fin] == sid_ref[fin]).all()


def test_flat_wavefront_with_pallas_probe_end_to_end():
    """The flat wavefront with the Pallas select+probe kernels enabled
    (interpret mode) must match the XLA-path flat wavefront exactly in
    counts and tightly in radiance.  Kept tiny: interpret mode executes
    the kernels in Python once per while_loop iteration."""
    import dataclasses
    scene = _mixed_scene(n_tri=150, n_sphere=0, n_torus=0, n_aarect=0,
                         n_square=0)
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=32)
    settings = RenderSettings(render_type=RenderType.NORMAL_NEE,
                              max_bounces=2)
    camera = Camera.create((0.0, 0.5, -2.0), 0.15, 0.0)
    W = H = 8
    pix = jnp.arange(W * H, dtype=jnp.int32)
    a0, c0, _ = wavefront.render_queue_flat(
        prep, scene, settings, camera, pix, W, H, jnp.uint32(4), 64)
    # use_fused=True turns on the fused megakernel (dense families) AND
    # the Pallas select+probe pair; run under the interpreter on CPU
    prep_f = dataclasses.replace(prep, use_fused=True)
    with pltpu.force_tpu_interpret_mode():
        a1, c1, _ = wavefront.render_queue_flat(
            prep_f, scene, settings, camera, pix, W, H, jnp.uint32(4), 64)
    assert (np.asarray(c0) == np.asarray(c1)).all()
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=1e-4, atol=1e-4)


def test_select_matches_xla():
    """select_blocks must reproduce the XLA slab + lex-cursor filter +
    reductions exactly (same first/second candidates and the entry
    after both)."""
    scene = _mixed_scene()
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=32)
    cs = prep.cluster
    C = cs.blocks.shape[0]
    n = 96
    o, d = _rays(n, seed=7)
    r = np.random.default_rng(0)
    # random cursors including fresh (-inf, -1)
    skip_e = jnp.asarray(np.where(r.random(n) < 0.5, -np.inf,
                                  r.uniform(0, 5, n)).astype(np.float32))
    skip_c = jnp.asarray(r.integers(-1, C, n).astype(np.int32))

    ent = cl._rays_vs_boxes(o, d, cs.lo, cs.hi)
    cid = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 1)
    unvis = (ent > skip_e[:, None]) | ((ent == skip_e[:, None])
                                       & (cid > skip_c[:, None]))
    ent = jnp.where(unvis, ent, jnp.inf)

    def lexmin(ent):
        e = jnp.min(ent, axis=1)
        c = jnp.minimum(jnp.min(jnp.where(ent == e[:, None], cid, C),
                                axis=1), C - 1)
        rest = jnp.where((ent > e[:, None]) |
                         ((ent == e[:, None]) & (cid > c[:, None])),
                         ent, jnp.inf)
        return e, c, rest

    e0, c0, ent1 = lexmin(ent)
    eb0, cb0, ent2 = lexmin(ent1)
    ea0 = jnp.min(ent2, axis=1)
    with pltpu.force_tpu_interpret_mode():
        aabbs = pp.pack_aabbs(cs)
        e1, c1, eb1, cb1, ea1 = pp.select_blocks(cs, aabbs, o, d,
                                                 skip_e, skip_c, C)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    fin = np.isfinite(np.asarray(e0))
    np.testing.assert_array_equal(np.asarray(c0)[fin], np.asarray(c1)[fin])
    np.testing.assert_array_equal(np.asarray(eb0), np.asarray(eb1))
    finb = np.isfinite(np.asarray(eb0))
    np.testing.assert_array_equal(np.asarray(cb0)[finb],
                                  np.asarray(cb1)[finb])
    np.testing.assert_array_equal(np.asarray(ea0), np.asarray(ea1))


# ---------------------------------------------------------------------------
# r05 kernels: fused select+scan, stateless probe pair
# ---------------------------------------------------------------------------

def test_select_scan_matches_select_plus_dense():
    """The fused select+dense-scan kernel returns the same candidates
    as select_blocks AND the same dense-remainder nearest hit as the
    XLA dense trace."""
    import dataclasses
    from wasm_pathtracer_tpu.models import scenes
    scene = scenes.mesh_scene(scenes.surface_mesh(14))
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=64)
    cs = prep.cluster
    C = cs.blocks.shape[0]
    n = 192
    o, d = _rays(n, 5)
    r = np.random.default_rng(7)
    skip_e = jnp.asarray(np.where(r.random(n) < 0.5, -np.inf,
                                  r.uniform(0, 5, n)).astype(np.float32))
    skip_c = jnp.asarray(r.integers(-1, C, n).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        aabbs = pp.pack_aabbs(cs)
        fams, tabs = pp.pack_dense_tables(prep, scene)
        e1, c1, eb1, cb1, ea1 = pp.select_blocks(cs, aabbs, o, d,
                                                 skip_e, skip_c, C)
        e2, c2, eb2, cb2, ea2, t_d, sid_d, row_d = pp.select_scan(
            cs, aabbs, fams, tabs, o, d, skip_e, skip_c, C)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(eb1), np.asarray(eb2))
    np.testing.assert_array_equal(np.asarray(ea1), np.asarray(ea2))
    fin = np.isfinite(np.asarray(e1))
    np.testing.assert_array_equal(np.asarray(c1)[fin], np.asarray(c2)[fin])
    # dense remainder vs the XLA dense trace
    prep_nc = dataclasses.replace(prep, cluster=None)
    t_x, sid_x, hit_x, _ = trace.trace_scene(prep_nc, scene, o, d)
    hx = np.asarray(hit_x)
    assert (np.isfinite(np.asarray(t_d)) == hx).all()
    np.testing.assert_allclose(np.asarray(t_d)[hx], np.asarray(t_x)[hx],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sid_d)[hx],
                                  np.asarray(sid_x)[hx])
    assert (np.asarray(sid_d)[~hx] == -1).all()


def test_probe_pair_matches_two_calls():
    """probe_pair_raw == two probe_blocks_min calls, per round."""
    from wasm_pathtracer_tpu.models import scenes
    scene = scenes.mesh_scene(scenes.surface_mesh(14))
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=64)
    cs = prep.cluster
    C = cs.blocks.shape[0]
    n = 192
    o, d = _rays(n, 9)
    c1 = (jnp.arange(n, dtype=jnp.int32) * 13) % C
    c2 = (c1 * 7 + 3) % C
    with pltpu.force_tpu_interpret_mode():
        table = pp.pack_table(cs)
        pr1, pr2 = pp.probe_pair_raw(cs, table, o, d, c1, c2)
        tp1, sp1 = pr1[:, 0], pr1[:, 1].astype(jnp.int32)
        tp2, sp2 = pr2[:, 0], pr2[:, 1].astype(jnp.int32)
        tr1, sr1 = pp.probe_blocks_min(cs, table, o, d, c1, stream=False)
        tr2, sr2 = pp.probe_blocks_min(cs, table, o, d, c2, stream=False)
    for (ta, sa), (tb, sb) in (((tp1, sp1), (tr1, sr1)),
                               ((tp2, sp2), (tr2, sr2))):
        fin = np.isfinite(np.asarray(tb))
        np.testing.assert_array_equal(np.asarray(ta)[fin],
                                      np.asarray(tb)[fin])
        np.testing.assert_array_equal(np.asarray(sa)[fin],
                                      np.asarray(sb)[fin])


def test_winner_row_emission_matches_gather():
    """The kernels' emitted winner rows (params, ptype, palette entry)
    must equal the per-sid gather they replace — the contract behind
    the flat wavefront's gather-free shading (PROFILE_r05.md)."""
    scene = _mixed_scene()
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=8)
    cs = prep.cluster
    assert cs.pal_idx is not None and len(cs.pal_rep) >= 1
    C = cs.blocks.shape[0]
    n = 192
    o, d = _rays(n, 11)
    c1 = (jnp.arange(n, dtype=jnp.int32) * 13) % C
    c2 = (c1 * 7 + 3) % C
    with pltpu.force_tpu_interpret_mode():
        table = pp.pack_table(cs)
        pr1, pr2 = pp.probe_pair_raw(cs, table, o, d, c1, c2)
    params = np.asarray(scene.params)[:, :9]
    ptype = np.asarray(scene.ptype)
    pal = np.asarray(cs.pal_idx)
    for row in (np.asarray(pr1), np.asarray(pr2)):
        fin = np.isfinite(row[:, 0])
        sid = row[fin, 1].astype(np.int32)
        np.testing.assert_array_equal(row[fin, 2:11], params[sid])
        np.testing.assert_array_equal(row[fin, 11].astype(np.int32),
                                      ptype[sid])
        np.testing.assert_array_equal(row[fin, 12].astype(np.int32),
                                      pal[sid])
    # dense winner row from the fused select+scan kernel
    skip_e = jnp.full((n,), -np.inf, jnp.float32)
    skip_c = jnp.full((n,), -1, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        aabbs = pp.pack_aabbs(cs)
        fams, tabs = pp.pack_dense_tables(prep, scene, cs.pal_idx)
        *_cand, t_d, sid_d, row_d = pp.select_scan(
            cs, aabbs, fams, tabs, o, d, skip_e, skip_c, C)
    row_d = np.asarray(row_d)
    fin = np.isfinite(np.asarray(t_d))
    sid = np.asarray(sid_d)[fin]
    np.testing.assert_array_equal(row_d[fin, 2:11], params[sid])
    np.testing.assert_array_equal(row_d[fin, 11].astype(np.int32),
                                  ptype[sid])
    np.testing.assert_array_equal(row_d[fin, 12].astype(np.int32),
                                  pal[sid])


def test_probe_min_want_row_matches_pair_row():
    """probe_blocks_min(want_row=True) returns the same winner row as
    probe_pair_raw's per-round rows (both VMEM and streamed bodies)."""
    scene = _mixed_scene()
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=8)
    cs = prep.cluster
    C = cs.blocks.shape[0]
    n = 96
    o, d = _rays(n, 17)
    c1 = (jnp.arange(n, dtype=jnp.int32) * 5) % C
    with pltpu.force_tpu_interpret_mode():
        table = pp.pack_table(cs)
        pr1, _ = pp.probe_pair_raw(cs, table, o, d, c1, c1)
        row_v = pp.probe_blocks_min(cs, table, o, d, c1, stream=False,
                                    want_row=True)
        row_s = pp.probe_blocks_min(cs, table, o, d, c1, stream=True,
                                    want_row=True)
    np.testing.assert_array_equal(np.asarray(pr1), np.asarray(row_v))
    np.testing.assert_array_equal(np.asarray(row_v), np.asarray(row_s))


def test_flat_wavefront_streamed_rows_end_to_end():
    """The gather-free STREAMED regime (3-kernel form with
    probe_blocks_min(want_row) + XLA dense where-chain) must match the
    XLA-path flat wavefront exactly in counts and tightly in radiance."""
    import dataclasses
    scene = _mixed_scene(n_tri=150, n_sphere=0, n_torus=0, n_aarect=0,
                         n_square=0)
    prep = bvh.attach_clusters(trace.prepare(scene), scene,
                               group=128, min_count=32)
    settings = RenderSettings(render_type=RenderType.NORMAL_NEE,
                              max_bounces=2)
    camera = Camera.create((0.0, 0.5, -2.0), 0.15, 0.0)
    W = H = 8
    pix = jnp.arange(W * H, dtype=jnp.int32)
    a0, c0, _ = wavefront.render_queue_flat(
        prep, scene, settings, camera, pix, W, H, jnp.uint32(4), 64)
    prep_f = dataclasses.replace(prep, use_fused=True)
    old_sel, old_pair = wavefront.FUSED_SELECT, wavefront.FUSED_PAIR
    wavefront.FUSED_SELECT = wavefront.FUSED_PAIR = False
    try:
        with pltpu.force_tpu_interpret_mode():
            a1, c1, _ = wavefront.render_queue_flat(
                prep_f, scene, settings, camera, pix, W, H,
                jnp.uint32(4), 64)
    finally:
        wavefront.FUSED_SELECT, wavefront.FUSED_PAIR = old_sel, old_pair
    assert (np.asarray(c0) == np.asarray(c1)).all()
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=1e-4, atol=1e-4)
