"""Cluster-dense triangle traversal — the TPU-native acceleration
structure for large meshes.

Why not a classic BVH walk on TPU: the per-ray divergent loop is one
scalar gather per node visit, and measured on a v5e the vmapped
``while_loop`` traversal runs ~0.04 Mrays/s — two orders below the
dense kernels, because the VPU has no per-lane gather and every node
fetch serializes.  The reference's recursion (``scene.rs:218-342``)
simply has no efficient analog at lane granularity.

The TPU answer exploits what the hardware *is* good at: wide dense
compute and block-granular memory moves.  Triangles are grouped into
fixed-size **clusters** (contiguous runs of the BVH leaf order, so each
cluster is spatially coherent — the BVH build quality still matters,
it just moves into the data layout):

1. rays x clusters slab test — one dense (R, C) VPU pass (the
   descendant of ``AABBx4::hit``, scaled from 4 boxes to all of them);
2. iterative nearest-cluster probing: each round, every active ray
   picks its nearest untested cluster, gathers that cluster's whole
   (G, 9) triangle block (one contiguous ~4.5 KB slice per ray — a
   coarse, HBM-friendly gather), tests all G triangles densely, and
   retires the cluster;
3. a ray stops when its nearest remaining cluster entry distance
   exceeds its best hit — the same ``max_dis`` pruning as the
   reference's ordered descent.

The loop is a ``lax.while_loop`` in lockstep over the batch; rounds
cost O(R*G) dense work + one structured gather, and typical rays
finish in a handful of rounds.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

CLUSTER_SIZE = 128   # triangles per cluster (G)


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterSet:
    """Device-side cluster tables."""

    lo: jax.Array          # (C, 3) cluster AABB min
    hi: jax.Array          # (C, 3) cluster AABB max
    blocks: jax.Array      # (C, G, 9) triangle vertices (padded degenerate)
    slot_to_sid: jax.Array  # (C*G,) leaf-slot -> global shape id (-1 pad)
    max_rounds: int = _field(metadata=dict(static=True), default=64)


def build_clusters(tri_rows: np.ndarray, prim_index: np.ndarray,
                   group: int = CLUSTER_SIZE) -> ClusterSet:
    """Partition leaf-ordered triangles into fixed clusters.

    ``tri_rows``: (T, 9) leaf-ordered vertices (from the BVH build —
    the leaf order is what makes contiguous runs spatially tight).
    ``prim_index``: (T,) leaf slot -> shape id.
    """
    tri_rows = np.asarray(tri_rows, np.float32)
    prim_index = np.asarray(prim_index, np.int32)
    T = tri_rows.shape[0]
    pad = (-T) % group
    rows = np.pad(tri_rows, ((0, pad), (0, 0)))
    sids = np.pad(prim_index, (0, pad), constant_values=-1)
    C = rows.shape[0] // group
    blocks = rows.reshape(C, group, 9)

    v = blocks.reshape(C, group, 3, 3)
    pd = np.float32(0.1 * 2e-4)
    # padded rows are all-zero: exclude them from bounds via the sid mask
    valid = (sids.reshape(C, group) >= 0)[..., None, None]
    big = np.float32(1e30)
    lo = np.where(valid, v, big).min(axis=(1, 2)) - pd
    hi = np.where(valid, v, -big).max(axis=(1, 2)) + pd

    return ClusterSet(
        lo=jnp.asarray(lo),
        hi=jnp.asarray(hi),
        blocks=jnp.asarray(blocks),
        slot_to_sid=jnp.asarray(sids),
        max_rounds=int(C),
    )


def _rays_vs_boxes(o, d, lo, hi):
    """(R,3) x (C,3) -> (R,C) entry distance (0 if inside), inf miss."""
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    t1 = (lo[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t2 = (hi[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0.0)
    return jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)


def _tri_block_test(o, d, block):
    """(R,3) rays vs per-ray (R,G,9) triangle blocks -> (R,G) distances."""
    v0, v1, v2 = block[..., 0:3], block[..., 3:6], block[..., 6:9]
    n = jnp.cross(v1 - v0, v2 - v0)                      # (R,G,3)
    ndd = jnp.sum(n * d[:, None, :], -1)
    ndd = jnp.where(jnp.abs(ndd) < 1e-30, 1e-30, ndd)
    t = (jnp.sum(n * v0, -1) - jnp.sum(n * o[:, None, :], -1)) / ndd
    nn = n * jax.lax.rsqrt(jnp.maximum(jnp.sum(n * n, -1), 1e-30))[..., None]
    p = o[:, None, :] + d[:, None, :] * t[..., None]

    inside = jnp.ones(t.shape, bool)
    for a, b in ((v0, v1), (v1, v2), (v2, v0)):
        c = jnp.cross(b - a, p - a)
        inside &= jnp.sum(c * nn, -1) + 0.1 * 2e-4 >= 0.0
    return jnp.where(inside & (t > 0.0), t, jnp.inf)


def trace_clusters(cs: ClusterSet, o, d, t_init):
    """Nearest hit through the cluster structure.

    Returns (t, leaf_slot, rounds) — map slots through
    ``cs.slot_to_sid`` for shape ids; rounds is the per-ray probe count
    (the cost counter analog of BVH node visits).
    """
    R = o.shape[0]
    G = cs.blocks.shape[1]
    ent = _rays_vs_boxes(o, d, cs.lo, cs.hi)            # (R, C)

    def cond(state):
        ent, t_best, _, _ = state
        return jnp.any(jnp.min(ent, axis=1) < t_best)

    def body(state):
        ent, t_best, slot_best, rounds = state
        e = jnp.min(ent, axis=1)
        c = jnp.argmin(ent, axis=1).astype(jnp.int32)   # (R,)
        active = e < t_best
        rounds = rounds + jnp.where(active, 1, 0)

        block = jnp.take(cs.blocks, c, axis=0)          # (R, G, 9)
        t = _tri_block_test(o, d, block)                # (R, G)
        t = jnp.where(active[:, None], t, jnp.inf)
        jloc = jnp.argmin(t, axis=1).astype(jnp.int32)
        tloc = jnp.min(t, axis=1)
        better = tloc < t_best
        t_best = jnp.where(better, tloc, t_best)
        slot_best = jnp.where(better, c * G + jloc, slot_best)

        # retire the probed cluster
        cols = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 1)
        ent = jnp.where(cols == c[:, None], jnp.inf, ent)
        return ent, t_best, slot_best, rounds

    state = (ent, t_init, jnp.full((R,), -1, jnp.int32),
             jnp.zeros((R,), jnp.int32))
    _, t_best, slot_best, rounds = jax.lax.while_loop(cond, body, state)
    return t_best, slot_best, rounds
