"""Pallas TPU kernel: streaming dense ray-triangle nearest hit.

Design note (what happened to the Pallas BVH kernel): a per-ray
divergent BVH walk needs per-lane gathers from the node table, and
Mosaic rejects vector int indexing into VMEM refs ("Cannot do int
indexing on TPU") — the VPU has no per-lane gather.  Divergent traversal
on TPU therefore goes through XLA's gather lowering (``ops.traverse``),
which is exactly the kind of op the compiler owns.  What Pallas *can*
own is the dense regime: rays x triangle-chunks with zero gathers,
everything streaming HBM -> VMEM on a 2-D grid.  That is this kernel:

- grid (ray blocks, triangle chunks); grid dim 1 is the minor (fastest)
  axis, so each ray block's output stays resident while the triangle
  table streams past it — Pallas generates the double-buffered pipeline
  from the BlockSpecs;
- each step intersects (RB, TC) pairs fully vectorized (the
  rays-x-primitives semantics of ``ops.intersect.rays_vs_triangles``,
  reference ``triangle.rs:159-191``) and folds a running (t, slot) min
  into the output block;
- all vector math is written component-wise on (RB, TC) planes — no
  ``jnp.cross``/``stack`` on a trailing size-3 axis, which Mosaic lays
  out as padded (1, TC) tiles and then fails to re-concatenate
  ("result/input offset mismatch on non-concat dimension").

Inputs are SoA planes (9, T) so a component slice ``tri_ref[k, :]`` is
one contiguous VMEM row.

Used by ``trace_scene`` when ``ScenePrep.use_pallas`` is set; the
portable XLA paths remain the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 256
TRI_CHUNK = 512
_EPS_SLACK = 0.1 * 2e-4   # triangle.rs:44


def _kernel(tri_ref, o_ref, d_ref, t_ref, slot_ref):
    """One (RAY_BLOCK, TRI_CHUNK) tile of the rays x triangles sweep.

    tri_ref: (9, TC) — rows are v0x v0y v0z v1x v1y v1z v2x v2y v2z.
    o_ref, d_ref: (3, RB) ray origin/direction components.
    t_ref, slot_ref: (RB,) running nearest hit.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[0] = jnp.full(t_ref.shape[1:], jnp.inf, jnp.float32)
        slot_ref[0] = jnp.full(slot_ref.shape[1:], -1, jnp.int32)

    # triangle component rows, broadcast later against rays
    v0x, v0y, v0z = tri_ref[0, :], tri_ref[1, :], tri_ref[2, :]
    v1x, v1y, v1z = tri_ref[3, :], tri_ref[4, :], tri_ref[5, :]
    v2x, v2y, v2z = tri_ref[6, :], tri_ref[7, :], tri_ref[8, :]

    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    # unnormalized plane normal n = e1 x e2
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    orig = nx * v0x + ny * v0y + nz * v0z                # (TC,)

    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]   # (RB,)
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]

    # (RB, TC) planes
    ndd = (dx[:, None] * nx[None, :] + dy[:, None] * ny[None, :]
           + dz[:, None] * nz[None, :])
    ndd = jnp.where(jnp.abs(ndd) < 1e-30, 1e-30, ndd)
    ndo = (ox[:, None] * nx[None, :] + oy[:, None] * ny[None, :]
           + oz[:, None] * nz[None, :])
    t = (orig[None, :] - ndo) / ndd

    px = ox[:, None] + dx[:, None] * t
    py = oy[:, None] + dy[:, None] * t
    pz = oz[:, None] + dz[:, None] * t

    def left_of(ax, ay, az, ex, ey, ez):
        """n . ((b - a) x (p - a)) with e = b - a, componentwise."""
        wx, wy, wz = px - ax[None, :], py - ay[None, :], pz - az[None, :]
        cx = ey[None, :] * wz - ez[None, :] * wy
        cy = ez[None, :] * wx - ex[None, :] * wz
        cz = ex[None, :] * wy - ey[None, :] * wx
        s = (cx * nx[None, :] + cy * ny[None, :] + cz * nz[None, :])
        return s * inv_len[None, :] + _EPS_SLACK >= 0.0

    inside = left_of(v0x, v0y, v0z, e1x, e1y, e1z)
    inside &= left_of(v1x, v1y, v1z, v2x - v1x, v2y - v1y, v2z - v1z)
    inside &= left_of(v2x, v2y, v2z, v0x - v2x, v0y - v2y, v0z - v2z)

    t = jnp.where(inside & (t > 0.0), t, jnp.inf)

    # running min across triangle chunks
    jloc = jnp.argmin(t, axis=1).astype(jnp.int32)       # (RB,)
    tloc = jnp.min(t, axis=1)
    slot = j * TRI_CHUNK + jloc

    # outputs are (1, 8, RB/8) tiles (Mosaic needs the last two block
    # dims (8,128)-aligned or full); reshape the lane vectors to match
    tloc2 = tloc.reshape(t_ref.shape[1:])
    slot2 = slot.reshape(slot_ref.shape[1:])
    better = tloc2 < t_ref[0]
    t_ref[0] = jnp.where(better, tloc2, t_ref[0])
    slot_ref[0] = jnp.where(better, slot2, slot_ref[0])


@jax.jit
def dense_tri_nearest(tri_planes, o_planes, d_planes):
    """Nearest-hit sweep of a ray batch against all triangles.

    Args:
      tri_planes: (9, T) f32, T a TRI_CHUNK multiple (pad rows must be
        degenerate / all-zero).
      o_planes, d_planes: (3, R) rays, R a RAY_BLOCK multiple.

    Returns (t (R,), slot (R,)) with slot == -1 on miss.
    """
    R = o_planes.shape[1]
    T = tri_planes.shape[1]
    grid = (R // RAY_BLOCK, T // TRI_CHUNK)

    t, slot = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, TRI_CHUNK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # (1, 8, RB/8) blocks: Mosaic requires the last two block
            # dims be (8,128)-divisible or equal to the full array dims
            pl.BlockSpec((1, 8, RAY_BLOCK // 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, RAY_BLOCK // 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R // RAY_BLOCK, 8, RAY_BLOCK // 8),
                                 jnp.float32),
            jax.ShapeDtypeStruct((R // RAY_BLOCK, 8, RAY_BLOCK // 8),
                                 jnp.int32),
        ],
    )(tri_planes, o_planes, d_planes)
    return t.reshape(R), slot.reshape(R)


def pad_tris(tri_rows):
    """(T, 9) row table -> padded (9, T') SoA planes for the kernel."""
    T = tri_rows.shape[0]
    pad = (-T) % TRI_CHUNK
    rows = jnp.pad(tri_rows, ((0, pad), (0, 0)))
    return rows.T


def pad_rays(o, d):
    """(R, 3) rays -> padded (3, R') planes.  Returns (o, d, R_pad)."""
    R = o.shape[0]
    pad = (-R) % RAY_BLOCK
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    return o_p.T, d_p.T
