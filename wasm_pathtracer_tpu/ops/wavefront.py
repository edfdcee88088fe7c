"""Flattened persistent wavefront: traversal fused into the path loop.

The mesh-scale problem with :func:`ops.integrator.render_queue` is that
every bounce calls ``trace_scene``, whose cluster traversal
(``ops.cluster.trace_clusters``) is itself a *nested* lockstep
``while_loop``: all lanes wait for the slowest ray's probe sequence at
every bounce, then wait again for the slowest NEE shadow ray.  On a
100k-triangle cloud the tail rays need tens of probe rounds, so typical
lane utilization inside the nested loop collapses.

Here the traversal micro-steps become part of the *outer* persistent
loop — the same flattening that path regeneration applies to bounces,
applied one level deeper (the reference's analog is the per-ray early
``return`` inside the recursive descent, ``scene.rs:218-288``).  Each
lane carries a tiny state machine:

  SCAN   rebuild the lane's nearest-cluster shortlist: one dense trace
         over the non-clustered families (``trace_scene`` with the
         cluster detached — the fused Pallas megakernel when enabled)
         plus a rays x cluster-AABB slab pass folded into a top-K
         nearest shortlist (``lax.top_k``);
  PROBE  walk the shortlist cursor one cluster per iteration: gather
         that cluster's (G, 9) block, masked type-switched dense test
         (``ops.cluster._block_test``), fold into the running nearest;
         stop when the next entry distance exceeds the running best —
         the reference's ``max_dis`` pruning (``scene.rs:262-288``);
  SHADE  the estimator step (:func:`ops.integrator._shade_core` — the
         exact code the lockstep drivers run), which may emit a
         deferred NEE shadow query: the lane then traces the shadow
         ray through the same SCAN/PROBE machinery and resolves the
         occlusion on completion;
  REGEN  finished paths splat into the frame accumulator and pull the
         next sample off the pixel queue, exactly as ``render_queue``.

Every outer iteration advances *every* live lane one micro-step, so no
lane ever waits for another's traversal: the probe work per iteration
is one dense (lanes x G) block test at full occupancy.

Exactness: the shortlist walk visits clusters in ascending
``(entry_distance, cluster_id)`` order — identical to the retire-loop's
``argmin`` order (ties break to the lowest id in both) — and when a
lane exhausts its K entries with the last one still closer than its
best hit, it RESCANS with a lexicographic ``(entry, id)`` skip filter,
so the probe sequence is exactly the nearest-first sequence regardless
of K.  Per-path radiance is bit-identical to ``render_queue`` (same
RNG slots, same estimator code, same nearest-hit tie-breaking); only
the per-pixel float accumulation order differs.

Shadow rays resolve nearest-hit semantics identical to
``trace.shadow_ray`` (the sampled light shape does not occlude), with
one extra *pruning* bound: clusters entirely beyond the light distance
cannot change the verdict and are skipped, so the probe count (the
cost metric) can undercount the lockstep path's — never the verdict.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from wasm_pathtracer_tpu.config import RenderSettings
from wasm_pathtracer_tpu.models.camera import Camera, primary_rays
from wasm_pathtracer_tpu.ops import cluster as cl
from wasm_pathtracer_tpu.ops import trace as tr
from wasm_pathtracer_tpu.ops import integrator as itg
from wasm_pathtracer_tpu.utils import rng as rnglib
from wasm_pathtracer_tpu.utils import vecmath as vm

# shortlist length: candidate clusters per scan.  Deep enough that
# rescans are rare on the 100k-cloud workload; exactness never depends
# on it (see module docstring).
SHORTLIST_K = 12

_NEG_INF = jnp.float32(-jnp.inf)


def _scan_shortlist(cs: cl.ClusterSet, o, d, bound, skip_e, skip_c, k: int):
    """Nearest-K cluster shortlist for each ray.

    ``bound``: entries >= bound can never contribute (the running best
    hit / shadow distance) and are dropped.  ``(skip_e, skip_c)``: the
    lexicographic (entry, id) position already consumed — a rescan
    continues strictly after it; fresh scans pass (-inf, -1).

    Returns (sl_ent (R, k) ascending, sl_ids (R, k)); missing
    candidates are +inf.
    """
    ent = cl._rays_vs_boxes(o, d, cs.lo, cs.hi)            # (R, C)
    cid = jax.lax.broadcasted_iota(jnp.int32, ent.shape, 1)
    keep = (ent > skip_e[:, None]) | ((ent == skip_e[:, None])
                                      & (cid > skip_c[:, None]))
    keep &= ent < bound[:, None]
    ent = jnp.where(keep, ent, jnp.inf)
    # top_k of the negated entries = smallest-k; ties resolve to the
    # lowest index (lax.top_k is stable), giving (entry, id) lex order
    neg, ids = jax.lax.top_k(-ent, k)
    return -neg, ids


def render_queue_flat(prep: tr.ScenePrep, scene, settings: RenderSettings,
                      camera: Camera, pix_queue, width: int, height: int,
                      seed, n_lanes: int, photon_grid=None, rid_base=0,
                      shortlist_k: int = SHORTLIST_K):
    """Persistent wavefront with flattened cluster traversal.

    Same contract as :func:`ops.integrator.render_queue` (same queue
    semantics, same RNG keying, same return triple) — requires
    ``prep.cluster``; the driver picks this form for cluster scenes.

    Returns (color_sum (H*W, 3), n_samples (H*W,) int32, lane_cost
    (n_lanes,) int32).
    """
    assert prep.cluster is not None, "render_queue_flat needs clusters"
    cs = prep.cluster
    S = pix_queue.shape[0]
    B = n_lanes
    G = cs.blocks.shape[1]
    C = cs.blocks.shape[0]
    K = min(shortlist_k, C)   # a shortlist can't exceed the cluster count
    HW = width * height
    if S == 0:
        return (jnp.zeros((HW, 3), jnp.float32), jnp.zeros((HW,), jnp.int32),
                jnp.zeros((B,), jnp.int32))
    if settings.max_bounces == 0:
        counts = jnp.zeros((HW,), jnp.int32).at[pix_queue].add(1)
        return (jnp.zeros((HW, 3), jnp.float32), counts,
                jnp.zeros((B,), jnp.int32))

    light_tab = itg._light_table(scene)
    prep_nc = dataclasses.replace(prep, cluster=None)
    sid_grid = cs.slot_to_sid.reshape(C, G)
    eps = settings.epsilon
    max_b = jnp.uint32(settings.max_bounces)

    def gen(sidx):
        """Primary ray for queue slot ``sidx`` (clamped; masked later)."""
        pid = pix_queue[jnp.clip(sidx, 0, S - 1)]
        rid = jnp.uint32(rid_base) + sidx.astype(jnp.uint32)
        px = pid % width
        py = pid // width
        jx, jy, _ = rnglib.uniform3(seed, rid, itg.SLOT_JITTER)
        o, d = primary_rays(camera, px, py, jx, jy, width, height,
                            settings.screen_z)
        return pid, rid, o, d

    sidx0 = jnp.arange(B, dtype=jnp.int32)
    pid0, rid0, o0, d0 = gen(sidx0)
    f3 = lambda: jnp.zeros((B, 3), jnp.float32)
    state = dict(
        issued=jnp.int32(min(B, S)),
        # --- path registers -------------------------------------------
        o=o0, d=d0,                      # next-bounce ray (set at shade)
        tp=jnp.ones((B, 3), jnp.float32),
        col=f3(),
        hdb=jnp.zeros((B,), bool),
        absorb=f3(),
        bounce=jnp.zeros((B,), jnp.uint32),
        pid=pid0, rid=rid0,
        live=sidx0 < S,
        # --- trace registers ------------------------------------------
        tr_o=o0, tr_d=d0,                # the ray being traced
        shadow=jnp.zeros((B,), bool),    # tracing a shadow query?
        t_best=jnp.full((B,), jnp.inf, jnp.float32),
        sid_best=jnp.full((B,), -1, jnp.int32),
        sl_ent=jnp.full((B, K), jnp.inf, jnp.float32),
        sl_ids=jnp.zeros((B, K), jnp.int32),
        cur=jnp.full((B,), K, jnp.int32),
        skip_e=jnp.full((B,), -jnp.inf, jnp.float32),
        skip_c=jnp.full((B,), -1, jnp.int32),
        need_scan=sidx0 < S,
        fresh=sidx0 < S,
        # --- pending NEE query (set at shade, used at resolve) --------
        pend_contrib=f3(),
        pend_dist=jnp.zeros((B,), jnp.float32),
        pend_lsid=jnp.zeros((B,), jnp.int32),
        pend_cont=jnp.zeros((B,), bool),  # path survives past this bounce
        # --- frame ----------------------------------------------------
        accum=jnp.zeros((HW, 3), jnp.float32),
        counts=jnp.zeros((HW,), jnp.int32),
        cost=jnp.zeros((B,), jnp.int32),
    )

    def cond(st):
        return jnp.any(st["live"])

    def body(st):
        live = st["live"]
        tr_o, tr_d = st["tr_o"], st["tr_d"]
        shadow = st["shadow"]

        # ---- SCAN: dense trace + shortlist rebuild --------------------
        scan = live & st["need_scan"]
        fresh = scan & st["fresh"]
        t_d, sid_d, hit_d, c_d = tr.trace_scene(prep_nc, scene, tr_o, tr_d)
        t_best = jnp.where(fresh, t_d, st["t_best"])
        sid_best = jnp.where(fresh, sid_d, st["sid_best"])
        cost = st["cost"] + jnp.where(fresh, c_d, 0)

        bound = jnp.where(shadow, jnp.minimum(t_best, st["pend_dist"]),
                          t_best)
        sl_ent_n, sl_ids_n = _scan_shortlist(
            cs, tr_o, tr_d, bound, st["skip_e"], st["skip_c"], K)
        sl_ent = jnp.where(scan[:, None], sl_ent_n, st["sl_ent"])
        sl_ids = jnp.where(scan[:, None], sl_ids_n, st["sl_ids"])
        cur = jnp.where(scan, 0, st["cur"])

        # ---- PROBE: one cluster per lane ------------------------------
        cur_c = jnp.clip(cur, 0, K - 1)
        e_cur = jnp.take_along_axis(sl_ent, cur_c[:, None], 1)[:, 0]
        c_cur = jnp.take_along_axis(sl_ids, cur_c[:, None], 1)[:, 0]
        probing = live & (cur < K) & (e_cur < bound)

        block = jnp.take(cs.blocks, c_cur, axis=0)          # (B, G, 9)
        btype = jnp.take(cs.btype, c_cur, axis=0)           # (B, G)
        t_blk = cl._block_test(tr_o, tr_d, block, btype, cs.families)
        t_blk = jnp.where(probing[:, None], t_blk, jnp.inf)
        jloc = jnp.argmin(t_blk, axis=1).astype(jnp.int32)
        tloc = jnp.min(t_blk, axis=1)
        sid_loc = jnp.take(sid_grid, c_cur, axis=0)[
            jnp.arange(B), jloc]                            # (B,)
        better = tloc < t_best
        t_best = jnp.where(better, tloc, t_best)
        sid_best = jnp.where(better, sid_loc, sid_best)
        cur = cur + probing.astype(jnp.int32)
        cost = cost + jnp.where(probing, G, 0)

        # ---- completion / rescan decision -----------------------------
        bound = jnp.where(shadow, jnp.minimum(t_best, st["pend_dist"]),
                          t_best)
        last_e = sl_ent[:, K - 1]
        rescan = live & (cur >= K) & jnp.isfinite(last_e) & (last_e < bound)
        skip_e = jnp.where(rescan, last_e, st["skip_e"])
        skip_c = jnp.where(rescan, sl_ids[:, K - 1], st["skip_c"])
        cur_cc = jnp.clip(cur, 0, K - 1)
        e_next = jnp.where(cur < K,
                           jnp.take_along_axis(sl_ent, cur_cc[:, None],
                                               1)[:, 0],
                           jnp.inf)
        done = live & ~rescan & (e_next >= bound)

        # ---- RESOLVE: finished shadow queries --------------------------
        resolve = done & shadow
        occluded = jnp.isfinite(t_best) & (t_best < st["pend_dist"]) \
            & (sid_best != st["pend_lsid"])
        col = st["col"] + jnp.where((resolve & ~occluded)[:, None],
                                    st["pend_contrib"], 0.0)

        # ---- SHADE: finished primary traces ----------------------------
        shade = done & ~shadow
        slot0 = st["bounce"] * itg._SLOTS_PER_BOUNCE
        (o_n, d_n, tp_n, col_n, alive_n, hdb_n, absorb_n), req = \
            itg._shade_core(prep, scene, settings, light_tab, photon_grid,
                            tr_o, tr_d, st["tp"], col, shade, st["hdb"],
                            st["absorb"], slot0, st["rid"], seed,
                            t_best, sid_best, jnp.isfinite(t_best))
        # adopt estimator updates ONLY on shade lanes: _shade_core's
        # carry passes (tr_o, tr_d) — the ray currently being traced —
        # through unchanged on non-scatter lanes, so adopting o_n/d_n
        # unmasked would overwrite a lane's stored next-bounce BSDF ray
        # with its in-flight shadow ray (and its Beer-Lambert throughput
        # multiply is unmasked, so tp_n is also only valid on shade)
        sh3 = shade[:, None]
        o = jnp.where(sh3, o_n, st["o"])
        d = jnp.where(sh3, d_n, st["d"])
        tp = jnp.where(sh3, tp_n, st["tp"])
        absorb = jnp.where(sh3, absorb_n, st["absorb"])
        hdb = jnp.where(shade, hdb_n, st["hdb"])
        # col_n's adds are all gated on alive(=shade) so it is exact for
        # every lane, including this iteration's resolve adds
        col = col_n
        bounce = jnp.where(shade, st["bounce"] + jnp.uint32(1), st["bounce"])
        cont_shade = alive_n & (bounce < max_b)

        if req is not None:
            pend = shade & req["need"]
            to_l = req["p_to"] - req["p_from"]
            dir_len = vm.length(to_l)
            d_sh = to_l / jnp.maximum(dir_len, 1e-30)[..., None]
            o_sh = req["p_from"] + d_sh * eps
            pend_contrib = jnp.where(pend[:, None], req["contrib"],
                                     st["pend_contrib"])
            pend_dist = jnp.where(pend, dir_len, st["pend_dist"])
            pend_lsid = jnp.where(pend, req["light_sid"], st["pend_lsid"])
        else:
            pend = jnp.zeros((B,), bool)
            o_sh = tr_o
            d_sh = tr_d
            pend_contrib = st["pend_contrib"]
            pend_dist = st["pend_dist"]
            pend_lsid = st["pend_lsid"]
        pend_cont = jnp.where(shade, cont_shade, st["pend_cont"])

        # ---- FINALIZE: bounce complete (shadow resolved or not needed) -
        fin = resolve | (shade & ~pend)
        cont = fin & jnp.where(shadow, st["pend_cont"], cont_shade)
        end = fin & ~cont

        # splat finished paths; regen from the queue (lane-order ranks,
        # deterministic; mode="drop" discards the sharding pad sentinel)
        accum = st["accum"].at[st["pid"]].add(
            jnp.where(end[:, None], col, 0.0), mode="drop")
        counts = st["counts"].at[st["pid"]].add(end.astype(jnp.int32),
                                                mode="drop")
        ranks = jnp.cumsum(end.astype(jnp.int32)) - 1
        new_sidx = st["issued"] + ranks
        can = end & (new_sidx < S)
        issued = jnp.minimum(st["issued"] + jnp.sum(end.astype(jnp.int32)),
                             S)
        pid_n, rid_n, o_p, d_p = gen(new_sidx)
        canc = can[:, None]

        # next traced ray: shadow query > regenerated primary > next bounce
        tr_o2 = jnp.where(pend[:, None], o_sh,
                          jnp.where(canc, o_p,
                                    jnp.where(cont[:, None], o, tr_o)))
        tr_d2 = jnp.where(pend[:, None], d_sh,
                          jnp.where(canc, d_p,
                                    jnp.where(cont[:, None], d, tr_d)))
        start = pend | can | cont

        return dict(
            issued=issued,
            o=jnp.where(canc, o_p, o),
            d=jnp.where(canc, d_p, d),
            tp=jnp.where(canc, 1.0, tp),
            col=jnp.where(canc, 0.0, col),
            hdb=jnp.where(can, False, hdb),
            absorb=jnp.where(canc, 0.0, absorb),
            bounce=jnp.where(can, jnp.uint32(0), bounce),
            pid=jnp.where(can, pid_n, st["pid"]),
            rid=jnp.where(can, rid_n, st["rid"]),
            live=(live & ~end) | can,
            tr_o=tr_o2, tr_d=tr_d2,
            shadow=jnp.where(start, pend, shadow),
            t_best=t_best, sid_best=sid_best,
            sl_ent=sl_ent, sl_ids=sl_ids, cur=cur,
            skip_e=jnp.where(start, _NEG_INF, skip_e),
            skip_c=jnp.where(start, -1, skip_c),
            need_scan=jnp.where(start, True,
                                jnp.where(scan, rescan, st["need_scan"]
                                          | rescan)),
            fresh=jnp.where(start, True, jnp.where(scan, False,
                                                   st["fresh"])),
            pend_contrib=pend_contrib,
            pend_dist=pend_dist,
            pend_lsid=pend_lsid,
            pend_cont=pend_cont,
            accum=accum, counts=counts, cost=cost,
        )

    st = jax.lax.while_loop(cond, body, state)
    return st["accum"], st["counts"], st["cost"]
