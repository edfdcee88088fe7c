"""Pallas TPU kernel for the cluster probe: per-lane block gather + test.

The probe step of the cluster traversal (``ops.cluster.trace_clusters``
and ``ops.wavefront.render_queue_flat``) is, per round: every lane
gathers *its own* cluster's (G, 9) parameter block and tests all G
primitives.  Under XLA this is a ``jnp.take`` that materializes a
(B, G, 9) gather result to HBM and reads it back — measured 3.5 ms per
round at B=32k on a v5e (~43 GB/s effective, ~10x off HBM speed),
which made the gather the dominant cost of mesh-scale rendering.

The TPU-native fix exploits that a whole cluster table is small: at
G=128 and 100k primitives it is ~790 clusters x 16 rows x 128 lanes x
4 B = 6.5 MB — it FITS IN VMEM (~16 MB/core).  So the kernel keeps the
entire table VMEM-resident (fetched from HBM once per dispatch), and
each grid step serves a group of lanes: their cluster indices arrive
in SMEM, each index dynamically slices a (16, 128) tile out of the
table (a VMEM-local move, no HBM traffic at all), the tiles are
re-stacked into (LANE_GROUP, 128) parameter rows, and the masked
type-switched intersection test runs at full VPU occupancy.

LANE_GROUP is 64, not the sublane-count 8: grid-step count is the
dominant cost of this kernel, not the slices or the restack.  Measured
on a v5e at B=32k, C=550 (one probe round per iteration inside a
device-side loop): 1.15 ms/round at LANE_GROUP=8 vs 0.47 at 32 and
0.37 at 64 (128 plateaus at 0.36); a variant with all slices removed
or the restack removed times the same at LG=8, so the per-step fixed
overhead — not data movement — set the old cost.

The kernel also REDUCES in-kernel: instead of returning the (B, G)
candidate matrix to HBM (16 MB/round at 32k lanes, plus an XLA argmin
+ a (B,) shape-id gather measured at 0.33 ms/round), it returns one
(t, shape_id) pair per lane.  Shape ids ride the table itself (row 10,
exact in f32 below 2^24), so the argmin, the slot->sid lookup, and
the first-slot tie-break all happen on the (LG, G) tile in VMEM.

Table layout (``pack_table``): row-major (C, 16, G) f32 —
rows 0-8 the primitive parameter rows transposed (params on sublanes,
slots on lanes), row 9 the PrimType code as f32 (-1 padding), row 10
the slot's global shape id as f32 (-1 padding), rows 11-15 zero
padding to the 16-sublane f32 tile so every cluster's tile is
tile-aligned for the dynamic slice.

The test formulas transcribe ``ops.cluster._block_test``'s per-family
kernels verbatim (which in turn cite the reference per primitive), so
the Pallas and XLA probe paths agree to FMA rounding.  Only the
families present in the structure are compiled in.

Not differentiable (Pallas); like the fused megakernel this is gated
on ``ScenePrep.use_fused`` — forward rendering only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wasm_pathtracer_tpu.models.scene import PrimType

LANE_GROUP = 256        # lanes served per probe grid step (see module doc)
TABLE_ROWS = 16         # 9 params + type code + sid, padded to 2 f32 tiles
VMEM_TABLE_BYTES = 8 * 2 ** 20   # table budget; beyond it, XLA fallback

_EPS_SLACK = 0.1 * 2e-4          # triangle.rs:44
_TORUS_STEPS = 24
_TORUS_NEWTON = 4
_TORUS_OMEGA = 1.6
_TORUS_TOL = 1e-4


def fits_vmem(cs) -> bool:
    """Whether the cluster table fits the kernel's VMEM budget (the
    fast path: the whole table rides VMEM, slices are register moves)."""
    C, G = cs.blocks.shape[0], cs.blocks.shape[1]
    return G == 128 and C * TABLE_ROWS * G * 4 <= VMEM_TABLE_BYTES


def kernel_ok(cs) -> bool:
    """Whether the Pallas probe path applies at all.  Beyond the VMEM
    budget (~131k primitives at G=128) the table stays in HBM and each
    grid step DMAs its lanes' (16, 128) tiles into a VMEM scratch —
    slower than VMEM-resident, far faster than the XLA ``jnp.take``
    fallback that materializes a (B, G, 9) gather through HBM."""
    return cs.blocks.shape[1] == 128


def pack_table(cs):
    """(C, G, 9) blocks + (C, G) btype + slot sids -> (C, 16, G) table.

    Row 11 is the slot's material-palette entry (``cs.pal_idx``, -1 on
    padding slots or when the ClusterSet carries no palette) — the
    winner-row emission (:func:`probe_pair_raw`) returns it so the flat
    wavefront can shade without any per-sid gather.

    Runs inside jit; build it OUTSIDE any traversal loop (it is
    loop-invariant) and pass it to :func:`probe_blocks` /
    :func:`probe_blocks_min`.
    """
    C, G, _ = cs.blocks.shape
    params = jnp.transpose(cs.blocks, (0, 2, 1))          # (C, 9, G)
    btype = cs.btype.astype(jnp.float32)[:, None, :]      # (C, 1, G)
    sid = cs.slot_to_sid.reshape(C, 1, G).astype(jnp.float32)
    if cs.pal_idx is not None:
        pal = cs.pal_idx[jnp.maximum(cs.slot_to_sid, 0)]
        pal = jnp.where(cs.slot_to_sid >= 0, pal, -1)
        pal = pal.reshape(C, 1, G).astype(jnp.float32)
    else:
        pal = jnp.full((C, 1, G), -1.0, jnp.float32)
    pad = jnp.zeros((C, TABLE_ROWS - 12, G), jnp.float32)
    return jnp.concatenate([params, btype, sid, pal, pad], axis=1)


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _nz(x, eps=1e-30):
    return jnp.where(jnp.abs(x) < eps, eps, x)


def _tri_test(A, o, d):
    """Transcription of ``cluster._tri_block_test`` on (8, G) rows."""
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = A[:9]
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    nx, ny, nzz = _cross(e1x, e1y, e1z, e2x, e2y, e2z)
    ndd = _nz(_dot(nx, ny, nzz, dx, dy, dz))
    t = (_dot(nx, ny, nzz, v0x, v0y, v0z)
         - _dot(nx, ny, nzz, ox, oy, oz)) / ndd
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nzz * nzz,
                                        1e-30))
    px = ox + dx * t
    py = oy + dy * t
    pz = oz + dz * t

    def left_of(ax, ay, az, bx, by, bz):
        cx, cy, cz = _cross(bx - ax, by - ay, bz - az,
                            px - ax, py - ay, pz - az)
        s = _dot(cx, cy, cz, nx, ny, nzz)
        return s * inv_len + _EPS_SLACK >= 0.0

    inside = left_of(v0x, v0y, v0z, v1x, v1y, v1z)
    inside &= left_of(v1x, v1y, v1z, v2x, v2y, v2z)
    inside &= left_of(v2x, v2y, v2z, v0x, v0y, v0z)
    return jnp.where(inside & (t > 0.0), t, jnp.inf)


def _sphere_test(A, o, d):
    """``cluster._sphere_block_test``."""
    ox, oy, oz = o
    dx, dy, dz = d
    cx, cy, cz, rad = A[0], A[1], A[2], A[3]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    b = 2.0 * _dot(ocx, ocy, ocz, dx, dy, dz)
    c = _dot(ocx, ocy, ocz, ocx, ocy, ocz) - rad * rad
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    sq = jnp.where(disc > 0.0, sq, 0.0)
    t0 = (-b + sq) * 0.5
    t1 = (-b - sq) * 0.5
    tn, tf = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
    t = jnp.where(tn > 0.0, tn, tf)
    ok = (disc >= 0.0) & (t > 0.0) & (rad > 0.0)
    return jnp.where(ok, t, jnp.inf)


def _aarect_test(A, o, d):
    """``cluster._aarect_block_test``."""
    ox, oy, oz = o
    dx, dy, dz = d
    ix, iy, iz = 1.0 / _nz(dx), 1.0 / _nz(dy), 1.0 / _nz(dz)
    ax1 = (A[0] - ox) * ix
    ay1 = (A[1] - oy) * iy
    az1 = (A[2] - oz) * iz
    ax2 = (A[3] - ox) * ix
    ay2 = (A[4] - oy) * iy
    az2 = (A[5] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(ax1, ax2),
                                   jnp.minimum(ay1, ay2)),
                       jnp.minimum(az1, az2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(ax1, ax2),
                                   jnp.maximum(ay1, ay2)),
                       jnp.maximum(az1, az2))
    t = jnp.where(tmin > 0.0, tmin, tmax)
    return jnp.where((tmin < tmax) & (t > 0.0), t, jnp.inf)


def _square_test(A, o, d):
    """``cluster._square_block_test``."""
    ox, oy, oz = o
    dx, dy, dz = d
    ndd = _nz(dy)
    t = (A[1] - oy) / ndd
    px = ox + dx * t
    pz = oz + dz * t
    inside = (2.0 * jnp.abs(px - A[0]) < A[3]) \
        & (2.0 * jnp.abs(pz - A[2]) < A[3])
    return jnp.where(inside & (t > 0.0) & (dy != 0.0), t, jnp.inf)


def _torus_test(A, o, d):
    """``cluster._torus_block_test`` == ``intersect.tori_march`` on
    component rows (over-relaxed sphere march + Newton polish)."""
    ox, oy, oz = o
    dx, dy, dz = d
    lox, loy, loz = ox - A[0], oy - A[1], oz - A[2]
    bigr, smr = A[3], A[4]
    extx = bigr + smr
    ix, iy, iz = 1.0 / _nz(dx), 1.0 / _nz(dy), 1.0 / _nz(dz)
    ax1 = (-extx - lox) * ix
    ax2 = (extx - lox) * ix
    ay1 = (-smr - loy) * iy
    ay2 = (smr - loy) * iy
    az1 = (-extx - loz) * iz
    az2 = (extx - loz) * iz
    t_in = jnp.maximum(jnp.maximum(jnp.minimum(ax1, ax2),
                                   jnp.minimum(ay1, ay2)),
                       jnp.minimum(az1, az2))
    t_out = jnp.minimum(jnp.minimum(jnp.maximum(ax1, ax2),
                                    jnp.maximum(ay1, ay2)),
                        jnp.maximum(az1, az2))
    hit_box = (t_in < t_out) & (t_out > 0.0)

    def sdf(t):
        pxl = lox + dx * t
        pyl = loy + dy * t
        pzl = loz + dz * t
        qx = jnp.sqrt(jnp.maximum(pxl * pxl + pzl * pzl, 1e-24)) - bigr
        return jnp.sqrt(jnp.maximum(qx * qx + pyl * pyl, 1e-24)) - smr

    def dsdf(t):
        pxl = lox + dx * t
        pyl = loy + dy * t
        pzl = loz + dz * t
        rho = jnp.sqrt(jnp.maximum(pxl * pxl + pzl * pzl, 1e-24))
        qx = rho - bigr
        ql = jnp.sqrt(jnp.maximum(qx * qx + pyl * pyl, 1e-24))
        drho = (pxl * dx + pzl * dz) / rho
        return (qx * drho + pyl * dy) / ql

    t = jnp.maximum(t_in, 1e-4)
    sign0 = jnp.sign(sdf(t))
    sign0 = jnp.where(sign0 == 0.0, 1.0, sign0)

    # f32 relaxation flag: Mosaic cannot carry vector bools in scf.for
    def march(_, st):
        t, dist, relaxed = st
        step = dist * (1.0 + (_TORUS_OMEGA - 1.0) * relaxed)
        t2_ = t + jnp.where((dist > _TORUS_TOL) & (t < t_out), step, 0.0)
        d2 = sign0 * sdf(t2_)
        accept = (step <= _TORUS_TOL) | (d2 + dist >= step)
        return (jnp.where(accept, t2_, t), jnp.where(accept, d2, dist),
                accept.astype(jnp.float32))

    t, _, _ = jax.lax.fori_loop(
        0, _TORUS_STEPS, march,
        (t, sign0 * sdf(t), jnp.ones(t.shape, jnp.float32)))

    def newton(_, t):
        f = sign0 * sdf(t)
        fp = sign0 * dsdf(t)
        fp = jnp.where(jnp.abs(fp) < 1e-6,
                       jnp.where(fp < 0, -1e-6, 1e-6), fp)
        tn = jnp.clip(t - f / fp, jnp.maximum(t_in, 1e-4), t_out)
        return jnp.where(jnp.abs(f) > 1e-6, tn, t)

    t = jax.lax.fori_loop(0, _TORUS_NEWTON, newton, t)
    ok = hit_box & (jnp.abs(sdf(t)) <= 10.0 * _TORUS_TOL) & (t > 0.0) \
        & (t <= t_out + _TORUS_TOL)
    return jnp.where(ok, t, jnp.inf)


_TESTS = {
    int(PrimType.TRIANGLE): _tri_test,
    int(PrimType.SPHERE): _sphere_test,
    int(PrimType.TORUS): _torus_test,
    int(PrimType.AARECT): _aarect_test,
    int(PrimType.SQUARE): _square_test,
}


_BIGF = 1e30


def pack_aabbs(cs):
    """(C, 3) lo + (C, 3) hi -> (8, Cpad) row table for the select
    kernel: rows 0-2 lo.xyz, rows 3-5 hi.xyz, rows 6-7 zero.  Padding
    clusters (id >= C) are masked OUT inside the kernel by the static
    cluster count — an "empty box" sentinel does not work, because a
    slab test against inverted bounds yields a (-inf, +inf) interval
    per axis, i.e. a hit at entry 0.
    """
    C = cs.lo.shape[0]
    Cpad = -(-C // 128) * 128
    lo = jnp.pad(cs.lo, ((0, Cpad - C), (0, 0)))
    hi = jnp.pad(cs.hi, ((0, Cpad - C), (0, 0)))
    return jnp.concatenate([lo.T, hi.T, jnp.zeros((2, Cpad), jnp.float32)],
                           axis=0)


# lanes per select-kernel grid step: larger than the probe's 8 because
# the select does (LG, Cpad) work per step with no per-lane dynamic
# loads — fewer grid steps amortize the per-step DMA/loop overhead
SELECT_GROUP = 256


def _make_select_kernel(C: int):
    def kernel(rays_ref, aabb_ref, out_ref):
        """Per-lane TWO lex-min unvisited clusters.

        rays_ref: (1, LG, 16) — cols 0-5 ray o/d, 6 skip_e, 7 skip_c
        (f32), rest padding.  aabb_ref: (8, Cpad) packed boxes.
        out_ref: (LG, 8) — cols 0 e_cur, 1 c_cur, 2 e_b, 3 c_b (f32),
        4 e_after: the first and second unvisited candidates in
        ascending (entry, id) order plus the entry of the candidate
        after both.  One slab pass serves TWO probe rounds per
        iteration — most traces need <= 2 probes (measured mesh70k:
        ~1.5 probe rounds per trace), so the (B, C) slab recompute
        runs ~once per trace instead of once per probe.

        The entry-distance formula matches ``cluster._rays_vs_boxes``;
        the cursor filter matches the flat wavefront's XLA fallback.
        """
        rays = rays_ref[0]                                # (LG, 16)
        ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        skip_e, skip_c = rays[:, 6:7], rays[:, 7:8]

        ix, iy, iz = 1.0 / _nz(dx), 1.0 / _nz(dy), 1.0 / _nz(dz)
        x1 = (aabb_ref[0:1, :] - ox) * ix                 # (8, Cpad)
        y1 = (aabb_ref[1:2, :] - oy) * iy
        z1 = (aabb_ref[2:3, :] - oz) * iz
        x2 = (aabb_ref[3:4, :] - ox) * ix
        y2 = (aabb_ref[4:5, :] - oy) * iy
        z2 = (aabb_ref[5:6, :] - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(x1, x2),
                                       jnp.minimum(y1, y2)),
                           jnp.minimum(z1, z2))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(x1, x2),
                                       jnp.maximum(y1, y2)),
                           jnp.maximum(z1, z2))
        # int32 iota then convert: Mosaic's tpu.iota is integer-only
        cid = jax.lax.broadcasted_iota(jnp.int32, tmin.shape, 1) \
            .astype(jnp.float32)
        hit = (tmax >= tmin) & (tmax > 0.0) & (cid < float(C))
        ent = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)

        unvis = (ent > skip_e) | ((ent == skip_e) & (cid > skip_c))
        ent = jnp.where(unvis, ent, jnp.inf)
        e_cur = jnp.min(ent, axis=1, keepdims=True)       # (LG, 1)
        c_cur = jnp.min(jnp.where(ent == e_cur, cid, _BIGF), axis=1,
                        keepdims=True)
        after1 = (ent > e_cur) | ((ent == e_cur) & (cid > c_cur))
        ent1 = jnp.where(after1, ent, jnp.inf)
        e_b = jnp.min(ent1, axis=1, keepdims=True)
        c_b = jnp.min(jnp.where(ent1 == e_b, cid, _BIGF), axis=1,
                      keepdims=True)
        after2 = (ent1 > e_b) | ((ent1 == e_b) & (cid > c_b))
        e_after = jnp.min(jnp.where(after2, ent1, jnp.inf), axis=1,
                          keepdims=True)
        out = jnp.concatenate(
            [e_cur, c_cur, e_b, c_b, e_after,
             jnp.zeros((SELECT_GROUP, 3), jnp.float32)], axis=1)
        out_ref[...] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("C",))
def _select_call(aabbs, rays, C):
    NG = rays.shape[0]
    Cpad = aabbs.shape[1]
    return pl.pallas_call(
        _make_select_kernel(C),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, SELECT_GROUP, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SELECT_GROUP, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG * SELECT_GROUP, 8),
                                       jnp.float32),
    )(rays, aabbs)


def select_blocks(cs, aabbs, o, d, skip_e, skip_c, C: int):
    """The first TWO lex-min unvisited clusters per lane: the Pallas
    twin of the flat wavefront's slab + cursor-filter + reductions.

    Returns (e_cur, c_cur, e_b, c_b, e_after): the next two candidates
    in ascending (entry, id) order after the cursor and the entry of
    the candidate after both (for the completion test when both get
    probed).  Cluster ids are int32 clamped to [0, C).
    """
    B = o.shape[0]
    pad = (-B) % SELECT_GROUP
    rays = jnp.concatenate(
        [o, d, skip_e[:, None], skip_c.astype(jnp.float32)[:, None],
         jnp.zeros((B, 8), jnp.float32)], axis=1)
    rays = jnp.pad(rays, ((0, pad), (0, 0))).reshape(-1, SELECT_GROUP, 16)
    out = _select_call(aabbs, rays, C)[:B]
    e_cur = out[:, 0]
    c_cur = jnp.minimum(out[:, 1], C - 1).astype(jnp.int32)
    e_b = out[:, 2]
    c_b = jnp.minimum(out[:, 3], C - 1).astype(jnp.int32)
    return e_cur, c_cur, e_b, c_b, out[:, 4]


_BIGI = 2 ** 30


def pack_dense_tables(prep, scene, pal_idx=None):
    """Per-family (P8, 16) tables for the dense (non-clustered)
    remainder: cols 0-8 the parameter row, col 9 the global shape id
    as f32 (-1 on padding rows), col 10 the material-palette entry
    (-1 without a palette; see ``cluster.ClusterSet.pal_idx``).
    Consumed by the fused :func:`select_scan` kernel, which folds the
    reference's dense prefix (``scene.rs:162-184``) into the slab
    pass — measured r05: a standalone scan over a 1-primitive
    remainder costs ~0.3 ms/iter at 16k lanes in either kernel regime,
    pure per-dispatch overhead.

    Returns (fams, tables): ``fams`` a static tuple of (ptype, n).
    """
    fams = []
    tables = []
    for name in ("plane", "sphere", "triangle", "torus", "aarect",
                 "square"):
        idx = getattr(prep, f"idx_{name}")
        n = idx.shape[0]
        if not n:
            continue
        fam = int(getattr(PrimType, name.upper()))
        rows = scene.params[idx][:, :9]
        sid = idx.astype(jnp.float32)[:, None]
        if pal_idx is not None:
            pal = pal_idx[idx].astype(jnp.float32)[:, None]
        else:
            pal = jnp.full((n, 1), -1.0, jnp.float32)
        tab = jnp.concatenate(
            [rows, sid, pal, jnp.zeros((n, 5), jnp.float32)], axis=1)
        pad = (-n) % 8
        tab = jnp.pad(tab, ((0, pad), (0, 0)),
                      constant_values=0.0)
        if pad:
            tab = tab.at[n:, 9].set(-1.0)
            tab = tab.at[n:, 10].set(-1.0)
        fams.append((fam, n))
        tables.append(tab)
    return tuple(fams), tables


def dense_scan_ok(prep, max_dense: int = 64) -> bool:
    """Whether the dense remainder is small enough to fold into the
    select kernel (beyond it, keep the standalone megakernel scan)."""
    n = sum(getattr(prep, f"idx_{k}").shape[0] for k in
            ("plane", "sphere", "triangle", "torus", "aarect", "square"))
    return 0 < n <= max_dense


def _make_select_scan_kernel(C: int, fams):
    from wasm_pathtracer_tpu.ops import scene_pallas as sp

    t_fns = {
        int(PrimType.PLANE): sp._t_planes,
        int(PrimType.SPHERE): sp._t_spheres,
        int(PrimType.TRIANGLE): sp._t_tris,
        int(PrimType.TORUS): sp._t_tori,
        int(PrimType.AARECT): sp._t_aarects,
        int(PrimType.SQUARE): sp._t_squares,
    }

    def kernel(rays_ref, aabb_ref, *refs):
        *dense_refs, out_ref, dense_out_ref = refs
        rays = rays_ref[0]                                # (LG, 16)
        ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        skip_e, skip_c = rays[:, 6:7], rays[:, 7:8]

        # ---- slab + two-candidate lex-min (see _make_select_kernel) --
        ix, iy, iz = 1.0 / _nz(dx), 1.0 / _nz(dy), 1.0 / _nz(dz)
        x1 = (aabb_ref[0:1, :] - ox) * ix                 # (LG, Cpad)
        y1 = (aabb_ref[1:2, :] - oy) * iy
        z1 = (aabb_ref[2:3, :] - oz) * iz
        x2 = (aabb_ref[3:4, :] - ox) * ix
        y2 = (aabb_ref[4:5, :] - oy) * iy
        z2 = (aabb_ref[5:6, :] - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(x1, x2),
                                       jnp.minimum(y1, y2)),
                           jnp.minimum(z1, z2))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(x1, x2),
                                       jnp.maximum(y1, y2)),
                           jnp.maximum(z1, z2))
        cid = jax.lax.broadcasted_iota(jnp.int32, tmin.shape, 1) \
            .astype(jnp.float32)
        hit = (tmax >= tmin) & (tmax > 0.0) & (cid < float(C))
        ent = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)

        unvis = (ent > skip_e) | ((ent == skip_e) & (cid > skip_c))
        ent = jnp.where(unvis, ent, jnp.inf)
        e_cur = jnp.min(ent, axis=1, keepdims=True)       # (LG, 1)
        c_cur = jnp.min(jnp.where(ent == e_cur, cid, _BIGF), axis=1,
                        keepdims=True)
        after1 = (ent > e_cur) | ((ent == e_cur) & (cid > c_cur))
        ent1 = jnp.where(after1, ent, jnp.inf)
        e_b = jnp.min(ent1, axis=1, keepdims=True)
        c_b = jnp.min(jnp.where(ent1 == e_b, cid, _BIGF), axis=1,
                      keepdims=True)
        after2 = (ent1 > e_b) | ((ent1 == e_b) & (cid > c_b))
        e_after = jnp.min(jnp.where(after2, ent1, jnp.inf), axis=1,
                          keepdims=True)

        # ---- dense remainder scan, megakernel orientation (prims on
        # sublanes, the LG lanes on the lane axis) ---------------------
        o3 = (rays[:, 0], rays[:, 1], rays[:, 2])         # (LG,) each
        d3 = (rays[:, 3], rays[:, 4], rays[:, 5])
        lg = o3[0].shape[0]
        best_t = jnp.full((1, lg), jnp.inf, jnp.float32)
        best_sid = jnp.full((1, lg), -1.0, jnp.float32)
        # dense WINNER ROW: params 0-8, ptype, pal — emitted so the
        # flat wavefront shades without a per-sid gather (see
        # _reduce_min_row's docstring for the measured why)
        best_row = [jnp.zeros((1, lg), jnp.float32) for _ in range(11)]
        for (fam, n), ref in zip(fams, dense_refs):
            t = t_fns[fam](ref, o3, d3)                   # (P8, LG)
            tmin_f = jnp.min(t, axis=0, keepdims=True)
            io = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
            j = jnp.min(jnp.where(t <= tmin_f, io, _BIGI), axis=0,
                        keepdims=True)
            win = io == j
            sidv = jnp.sum(jnp.where(win, ref[:, 9][:, None], 0.0),
                           axis=0, keepdims=True)
            better = tmin_f < best_t
            best_t = jnp.where(better, tmin_f, best_t)
            best_sid = jnp.where(better, sidv, best_sid)
            for k in range(9):
                v = jnp.sum(jnp.where(win, ref[:, k][:, None], 0.0),
                            axis=0, keepdims=True)
                best_row[k] = jnp.where(better, v, best_row[k])
            best_row[9] = jnp.where(better, jnp.float32(fam),
                                    best_row[9])
            palv = jnp.sum(jnp.where(win, ref[:, 10][:, None], 0.0),
                           axis=0, keepdims=True)
            best_row[10] = jnp.where(better, palv, best_row[10])

        out = jnp.concatenate(
            [e_cur, c_cur, e_b, c_b, e_after,
             jnp.zeros((SELECT_GROUP, 3), jnp.float32)], axis=1)
        out_ref[...] = out
        # dense results stay LANE-oriented (Mosaic cannot shape-cast a
        # lane vector into sublane tiles): their own (16, LG) output
        # block — rows 0/1 = t/sid, rows 2-12 the winner row (params
        # 0-8, ptype, pal); the wrapper slices them back per lane.
        dense_out_ref[...] = jnp.broadcast_to(
            jnp.concatenate([best_t, best_sid] + best_row
                            + [jnp.zeros((3, lg), jnp.float32)], axis=0),
            dense_out_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("C", "fams"))
def _select_scan_call(aabbs, rays, dense_tabs, C, fams):
    NG = rays.shape[0]
    Cpad = aabbs.shape[1]
    return pl.pallas_call(
        _make_select_scan_kernel(C, fams),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, SELECT_GROUP, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(tab.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for tab in dense_tabs],
        ],
        out_specs=[
            pl.BlockSpec((SELECT_GROUP, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, SELECT_GROUP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NG * SELECT_GROUP, 8), jnp.float32),
            jax.ShapeDtypeStruct((NG * 16, SELECT_GROUP), jnp.float32),
        ],
    )(rays, aabbs, *dense_tabs)


def select_scan(cs, aabbs, dense_fams, dense_tabs, o, d, skip_e, skip_c,
                C: int):
    """Fused select + dense-remainder scan: one kernel emits the two
    lex-min unvisited clusters AND the nearest dense-family hit.

    Returns (e_cur, c_cur, e_b, c_b, e_after, t_dense, sid_dense,
    row_dense) — the first five exactly as :func:`select_blocks`;
    ``t_dense`` is +inf on miss and ``sid_dense`` the winning global
    shape id (-1 on miss), matching ``trace.trace_scene``'s contract
    on the dense remainder; ``row_dense`` is the (B, 16) dense winner
    row in :func:`_reduce_min_row` layout ([t, sid, p0..p8, ptype,
    pal, pads]) for gather-free shading.
    """
    B = o.shape[0]
    pad = (-B) % SELECT_GROUP
    rays = jnp.concatenate(
        [o, d, skip_e[:, None], skip_c.astype(jnp.float32)[:, None],
         jnp.zeros((B, 8), jnp.float32)], axis=1)
    rays = jnp.pad(rays, ((0, pad), (0, 0))).reshape(-1, SELECT_GROUP, 16)
    out, dense = _select_scan_call(aabbs, rays, tuple(dense_tabs), C,
                                   dense_fams)
    out = out[:B]
    NG = rays.shape[0]
    dense = dense.reshape(NG, 16, SELECT_GROUP)
    t_d = dense[:, 0, :].reshape(-1)[:B]
    sid_f = dense[:, 1, :].reshape(-1)[:B]
    row_d = dense.transpose(0, 2, 1).reshape(-1, 16)[:B]
    e_cur = out[:, 0]
    c_cur = jnp.minimum(out[:, 1], C - 1).astype(jnp.int32)
    e_b = out[:, 2]
    c_b = jnp.minimum(out[:, 3], C - 1).astype(jnp.int32)
    sid_d = jnp.where(jnp.isfinite(t_d), sid_f, -1.0).astype(jnp.int32)
    return e_cur, c_cur, e_b, c_b, out[:, 4], t_d, sid_d, row_d


def _test_tiles(families, G, rays, tiles):
    """Restack per-lane tiles into (LG, G) parameter rows and run the
    masked type-switched test.

    Returns (t (LG, G) candidate distances, A: the 12 restacked
    (LG, G) table rows — params 0-8, btype 9, sid 10, pal 11).
    """
    # re-stack: parameter row k for the LG lanes -> (LG, G)
    A = [jnp.concatenate([tl[k:k + 1, :] for tl in tiles], axis=0)
         for k in range(12)]
    o = (rays[:, 0:1], rays[:, 1:2], rays[:, 2:3])        # (LG, 1) each
    d = (rays[:, 3:4], rays[:, 4:5], rays[:, 5:6])
    btype = A[9]
    t = jnp.full((LANE_GROUP, G), jnp.inf, jnp.float32)
    for fam in families:
        tf = _TESTS[fam](A, o, d)
        t = jnp.where(btype == jnp.float32(fam), tf, t)
    return t, A


def _probe_body(families, G, cidx_ref, rays_ref, tab_ref):
    """VMEM-resident probe body: per-lane tile slices are VMEM-local
    register moves (no HBM traffic)."""
    tiles = []
    for j in range(LANE_GROUP):
        c = cidx_ref[0, 0, j]
        tiles.append(tab_ref[pl.ds(c, 1), :, :][0])
    return _test_tiles(families, G, rays_ref[0], tiles)


def _probe_body_stream(families, G, cidx_ref, rays_ref, tab_ref,
                       scratch_ref, sem_ref):
    """HBM-streamed probe body: the table stays in ANY/HBM memory and
    each lane's (16, G) tile is DMA'd into the VMEM scratch.  All
    LANE_GROUP copies are started before any is awaited, so the DMA
    engine pipelines them."""
    copies = []
    for j in range(LANE_GROUP):
        c = cidx_ref[0, 0, j]
        cp = pltpu.make_async_copy(tab_ref.at[pl.ds(c, 1)],
                                   scratch_ref.at[pl.ds(j, 1)],
                                   sem_ref.at[j])
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()
    tiles = [scratch_ref[j] for j in range(LANE_GROUP)]
    return _test_tiles(families, G, rays_ref[0], tiles)


def _reduce_min_row(t, A, G):
    """(LG, G) candidates -> the per-lane WINNER ROW: (LG, 16) block
    ``[t_min, sid, p0..p8, btype, pal, 0, 0, 0]``.

    The winner is the FIRST minimum slot — the same tie-break as
    ``jnp.argmin`` in the XLA fallback.  Emitting the winner's table
    row here (12 masked reductions on data already in registers) is
    what lets the flat wavefront shade WITHOUT a per-sid row gather:
    that gather inside the kernel-bearing while body is a measured
    ~+1.5 ms/iter scheduling cliff (PROFILE_r05.md).  On a miss
    (t_min = +inf) the row is the first slot's — garbage but
    deterministic; shade masks on ``isfinite``.
    """
    tloc = jnp.min(t, axis=1, keepdims=True)              # (LG, 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) \
        .astype(jnp.float32)
    jloc = jnp.min(jnp.where(t == tloc, slot, float(G)), axis=1,
                   keepdims=True)
    win = (slot == jloc)
    cols = [jnp.sum(jnp.where(win, A[k], 0.0), axis=1, keepdims=True)
            for k in (10, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11)]
    return jnp.concatenate(
        [tloc] + cols + [jnp.zeros((t.shape[0], 3), jnp.float32)],
        axis=1)


def _make_kernel(families, G):
    def kernel(cidx_ref, rays_ref, tab_ref, t_ref):
        # cidx_ref: (1, 1, LG) SMEM int32; rays_ref: (1, LG, 8) VMEM
        # (ox oy oz dx dy dz _ _); tab_ref: (C, 16, G) VMEM (whole
        # table); t_ref: (LG, G) out.
        t, _ = _probe_body(families, G, cidx_ref, rays_ref, tab_ref)
        t_ref[...] = t

    return kernel


def _make_min_kernel(families, G, stream):
    def kernel(cidx_ref, rays_ref, tab_ref, out_ref, *scr):
        # out_ref: (LG, 16) winner row — see _reduce_min_row.
        if stream:
            t, A = _probe_body_stream(families, G, cidx_ref,
                                      rays_ref, tab_ref, *scr)
        else:
            t, A = _probe_body(families, G, cidx_ref, rays_ref,
                               tab_ref)
        out_ref[...] = _reduce_min_row(t, A, G)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("families", "want_min", "stream"))
def _probe_call(table, rays, cidx, families, want_min=False,
                stream=False):
    C, ROWS, G = table.shape
    NG = cidx.shape[0]                                    # B / LG groups
    if want_min:
        kernel = _make_min_kernel(families, G, stream)
        out_shape = jax.ShapeDtypeStruct((NG * LANE_GROUP, 16),
                                         jnp.float32)
        out_block = (LANE_GROUP, 16)
    else:
        assert not stream, "streaming implemented for the min kernel"
        kernel = _make_kernel(families, G)
        out_shape = jax.ShapeDtypeStruct((NG * LANE_GROUP, G),
                                         jnp.float32)
        out_block = (LANE_GROUP, G)
    table_space = pltpu.ANY if stream else pltpu.VMEM
    scratch_shapes = ([pltpu.VMEM((LANE_GROUP, ROWS, G), jnp.float32),
                       pltpu.SemaphoreType.DMA((LANE_GROUP,))]
                      if stream else [])
    return pl.pallas_call(
        kernel,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, 1, LANE_GROUP), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LANE_GROUP, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=table_space)
            if stream else
            pl.BlockSpec((C, ROWS, G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_block, lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
    )(cidx, rays, table)


def _pad_args(cs, o, d, cidx):
    B = o.shape[0]
    C = cs.blocks.shape[0]
    pad = (-B) % LANE_GROUP
    rays = jnp.concatenate([o, d, jnp.zeros((B, 2), jnp.float32)], axis=1)
    rays = jnp.pad(rays, ((0, pad), (0, 0))).reshape(-1, LANE_GROUP, 8)
    cidx = jnp.clip(cidx, 0, C - 1)
    cidx = jnp.pad(cidx, (0, pad)).reshape(-1, 1, LANE_GROUP)
    return rays, cidx


def probe_blocks(cs, table, o, d, cidx):
    """Per-lane cluster block test: the Pallas twin of
    ``jnp.take(blocks) + cluster._block_test``.

    Args:
      cs: the ClusterSet (for static family/shape info).
      table: :func:`pack_table` output — build once per dispatch,
        outside the traversal loop.
      o, d: (B, 3) rays.
      cidx: (B,) int32 cluster index per lane (clamped to [0, C)).

    Returns (B, G) candidate distances, +inf on miss/padding.
    """
    B = o.shape[0]
    rays, cidx = _pad_args(cs, o, d, cidx)
    t = _probe_call(table, rays, cidx, cs.families)
    return t[:B]


def _make_pair_kernel(families, G):
    def kernel(cidx_ref, rays_ref, tab_ref, out_ref):
        """Both probe rounds of one flat-loop iteration in ONE kernel.

        cidx_ref: (1, 2, LG) SMEM int32 — rows = candidates c1, c2.
        Outputs the RAW per-round reductions [t1, sid1, t2, sid2]; all
        masking/bound logic stays in XLA exactly as in the two-call
        form.  STATELESS by design: an earlier variant took
        (t_best, sid_best, probing) as VMEM inputs and did the
        between-round bound logic in-kernel — measured +1 ms/iter per
        FEEDBACK input (a kernel output routed through the loop carry
        back into the same kernel's VMEM input forces a per-iteration
        staging/relayout; inputs with no feedback, e_b/cap, were
        free).  Raw outputs keep the feedback path in fused XLA ops
        where it costs nothing.
        """
        rays = rays_ref[0]

        def probe(row):
            tiles = [tab_ref[pl.ds(cidx_ref[0, row, j], 1), :, :][0]
                     for j in range(LANE_GROUP)]
            t, A = _test_tiles(families, G, rays, tiles)
            return _reduce_min_row(t, A, G)

        out_ref[...] = jnp.concatenate([probe(0), probe(1)], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("families",))
def _pair_call(table, rays, cidx, families):
    C, ROWS, G = table.shape
    NG = cidx.shape[0]
    return pl.pallas_call(
        _make_pair_kernel(families, G),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, 2, LANE_GROUP), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LANE_GROUP, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ROWS, G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANE_GROUP, 32), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG * LANE_GROUP, 32),
                                       jnp.float32),
    )(cidx, rays, table)


def probe_pair_raw(cs, table, o, d, c1, c2):
    """Both flat-loop probe rounds in one kernel (VMEM table only).

    Each round is exactly :func:`probe_blocks_min` on its candidate;
    one launch shares the ray staging.  Returns (row1, row2): each
    round's (B, 16) winner row ``[t, sid, p0..p8, btype, pal, pads]``
    (first-minimum tie-break; garbage-but-deterministic on miss) — the
    caller applies the ``better``/bound masking in XLA (the kernel is
    deliberately STATELESS; feedback VMEM inputs cost ~1 ms/iter each,
    see the module doc).
    """
    B = o.shape[0]
    C = cs.blocks.shape[0]
    pad = (-B) % LANE_GROUP
    rays = jnp.concatenate([o, d, jnp.zeros((B, 2), jnp.float32)], axis=1)
    rays = jnp.pad(rays, ((0, pad), (0, 0))).reshape(-1, LANE_GROUP, 8)
    cidx = jnp.stack([jnp.clip(c1, 0, C - 1),
                      jnp.clip(c2, 0, C - 1)], axis=0)    # (2, B)
    cidx = jnp.pad(cidx, ((0, 0), (0, pad))) \
        .reshape(2, -1, LANE_GROUP).transpose(1, 0, 2)
    out = _pair_call(table, rays, cidx, cs.families)[:B]
    return out[:, 0:16], out[:, 16:32]


def probe_blocks_min(cs, table, o, d, cidx, stream=None,
                     want_row=False):
    """Probe + in-kernel reduction: the Pallas twin of
    ``jnp.take + _block_test + argmin + sid_grid gather`` in one pass.

    ``stream`` selects the HBM-streamed body; default = auto by the
    table's VMEM budget, so scenes beyond ~131k primitives transparently
    take the DMA path instead of falling back to XLA.

    Returns (t_min (B,) f32, sid (B,) int32) — sid is the shape id at
    the first minimum slot (== the XLA fallback's ``argmin`` pick);
    garbage-but-deterministic (-1 or 0) when t_min is +inf.  With
    ``want_row`` the full (B, 16) winner row is returned instead
    (cols 0/1 are t/sid; see :func:`_reduce_min_row`).
    """
    if stream is None:
        stream = not fits_vmem(cs)
    B = o.shape[0]
    rays, cidx = _pad_args(cs, o, d, cidx)
    out = _probe_call(table, rays, cidx, cs.families, want_min=True,
                      stream=stream)[:B]
    if want_row:
        return out
    return out[:, 0], out[:, 1].astype(jnp.int32)
