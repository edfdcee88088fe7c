"""IN-LOOP component attribution for the two production renderers.

Methodology note (r05): PROFILE_r04 attributed per-iteration cost by
timing each component STANDALONE and treating the remainder of the
measured iteration as "bookkeeping".  This round's A/B experiments
showed that method materially overcounts: removing a standalone-0.3ms
component from the real loop often changes the iteration time by ~0
(XLA fuses, overlaps input staging, and hides latencies inside the
while body), and the true loop skeleton (ring records + regeneration +
state merges) costs ~0.09 ms/iter at B=16k — not the 0.4-1.1 ms the
residual method reported.  The honest instrument is the one here:
run the REAL loop body for a FIXED iteration count with individual
components replaced by constants (each variant compiled whole, so
fusion/overlap effects are preserved), and attribute by DELTAS between
variants.  Numbers are marginal in-loop costs, not standalone costs —
deltas need not sum exactly to the full time (shared work re-fuses),
and that is the point.

Usage: python examples/profile_inloop.py [--which museum|flat|both]
Prints one JSON line per loop; paste into PROFILE_r05.md.

NOTE (r05b): the production flat loop now shades GATHER-FREE from
kernel-emitted winner rows (wavefront.ROW_FUSED; PROFILE_r05.md r05b).
The flat_strip below keeps the r04-form body (per-sid gather shade) so
its strip variants stay comparable with the r04/r05 numbers on record;
for end-to-end timings of the production regime use
ops.wavefront.render_queue_flat directly (bench.py mesh70k stage).
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(f, reps=3):
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f() for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


# ---------------------------------------------------------------------------
# museum queue loop (integrator.render_queue body shape)
# ---------------------------------------------------------------------------

def museum_strip(B=16_384, NIT=128, S=2_621_440):
    from wasm_pathtracer_tpu.config import RenderSettings, RenderType
    from wasm_pathtracer_tpu.models import scenes
    from wasm_pathtracer_tpu.models.camera import initial_camera, primary_rays
    from wasm_pathtracer_tpu.ops import integrator as itg
    from wasm_pathtracer_tpu.ops import trace as tr
    from wasm_pathtracer_tpu.utils import rng as rnglib
    import wasm_pathtracer_tpu.utils.vecmath as vm

    settings = RenderSettings(render_type=RenderType.NORMAL_NEE,
                              max_bounces=8)
    scene = scenes.museum()
    prep = tr.prepare(scene, use_fused=jax.default_backend() != "cpu")
    cam = initial_camera(0)
    W = H = 512
    HW = W * H
    seed = jnp.uint32(5)
    pix_queue = jax.random.randint(jax.random.key(1), (S,), 0, HW)
    light_tab = itg._light_table(scene)
    packed_rows = tr.pack_hit_rows(scene)
    K = -(-S // B)
    K += max(2, K // 2)

    def make(trace_on, shadow_on, shade_on):
        def gen(sidx):
            pid = pix_queue[jnp.clip(sidx, 0, S - 1)]
            rid = sidx.astype(jnp.uint32)
            jx, jy, _ = rnglib.uniform3(seed, rid, itg.SLOT_JITTER)
            o, d = primary_rays(cam, pid % W, pid // W, jx, jy, W, H,
                                settings.screen_z)
            return pid, rid, o, d

        sidx0 = jnp.arange(B, dtype=jnp.int32)
        pid0, rid0, o0, d0 = gen(sidx0)
        state = dict(
            issued=jnp.int32(min(B, S)), o=o0, d=d0,
            tp=jnp.ones((B, 3), jnp.float32),
            col=jnp.zeros((B, 3), jnp.float32),
            alive=sidx0 < S, hdb=jnp.zeros((B,), bool),
            absorb=jnp.zeros((B, 3), jnp.float32),
            bounce=jnp.zeros((B,), jnp.uint32), pid=pid0, rid=rid0,
            ring_col=jnp.zeros((K, B, 3), jnp.float32),
            ring_pid=jnp.full((K, B), HW, jnp.int32),
            k_lane=jnp.zeros((B,), jnp.int32),
            cost=jnp.zeros((B,), jnp.int32), it=jnp.int32(0),
        )

        def body(st):
            was = st["alive"]
            o, d = st["o"], st["d"]
            slot0 = st["bounce"] * itg._SLOTS_PER_BOUNCE
            if trace_on:
                t, sid, hit, c = tr.trace_scene(prep, scene, o, d)
            else:
                t = jnp.full((B,), 4.0, jnp.float32)
                sid = jnp.zeros((B,), jnp.int32)
                hit = jnp.ones((B,), bool)
                c = jnp.int32(1)
            step_cost = jnp.where(was, c, 0)
            if shade_on:
                carry, req = itg._shade_core(
                    prep, scene, settings, light_tab, None,
                    o, d, st["tp"], st["col"], was, st["hdb"],
                    st["absorb"], slot0, st["rid"], seed, t, sid, hit,
                    packed_rows=packed_rows)
            else:
                # fake shade MUST consume the trace outputs (t, sid,
                # hit) or XLA dead-codes the trace kernel entirely —
                # its cost counter alone is shape-static
                u = rnglib.uniform3(seed, st["rid"], slot0)[0]
                alive2 = was & (u > 0.4) & hit
                tconsume = 1e-9 * (jnp.where(hit, t, 0.0)
                                   + sid.astype(jnp.float32))
                carry = (o, d, st["tp"],
                         st["col"] + 0.01 + tconsume[:, None],
                         alive2, st["hdb"], st["absorb"])
                req = dict(need=was, p_from=o,
                           p_to=o + d * jnp.where(hit, t,
                                                  1.0)[:, None] + 1.0,
                           light_sid=sid,
                           contrib=jnp.ones((B, 3), jnp.float32))
            o, d, tp, col, alive, hdb, absorb = carry
            if req is not None and shadow_on:
                occluded, sc2 = tr.shadow_ray(
                    prep, scene, req["p_from"], req["p_to"],
                    req["light_sid"], settings.epsilon)
                step_cost = step_cost + jnp.where(req["need"], sc2, 0)
                col = col + jnp.where((req["need"] & ~occluded)[:, None],
                                      req["contrib"], 0.0)
            cost = st["cost"] + step_cost
            bounce = st["bounce"] + jnp.uint32(1)
            done = was & (~alive |
                          (bounce >= jnp.uint32(settings.max_bounces)))
            alive = alive & ~done
            sel = (jax.lax.broadcasted_iota(jnp.int32, (K, B), 0)
                   == st["k_lane"][None, :]) & done[None, :]
            ring_col = jnp.where(sel[..., None], col[None],
                                 st["ring_col"])
            ring_pid = jnp.where(sel, st["pid"][None], st["ring_pid"])
            k_lane = st["k_lane"] + done.astype(jnp.int32)
            claimable = done & (k_lane < K)
            ranks = jnp.cumsum(claimable.astype(jnp.int32)) - 1
            new_sidx = st["issued"] + ranks
            can = claimable & (new_sidx < S)
            issued = jnp.minimum(
                st["issued"] + jnp.sum(claimable.astype(jnp.int32)), S)
            pid_n, rid_n, o_n, d_n = gen(new_sidx)
            canc = can[:, None]
            return dict(
                issued=issued,
                o=jnp.where(canc, o_n, o), d=jnp.where(canc, d_n, d),
                tp=jnp.where(canc, 1.0, tp),
                col=jnp.where(canc, 0.0, col),
                alive=alive | can, hdb=jnp.where(can, False, hdb),
                absorb=jnp.where(canc, 0.0, absorb),
                bounce=jnp.where(can, jnp.uint32(0), bounce),
                pid=jnp.where(can, pid_n, st["pid"]),
                rid=jnp.where(can, rid_n, st["rid"]),
                ring_col=ring_col, ring_pid=ring_pid, k_lane=k_lane,
                cost=cost, it=st["it"] + 1,
            )

        @jax.jit
        def run():
            st = jax.lax.while_loop(lambda st: st["it"] < NIT, body,
                                    state)
            return st["col"].sum() + st["cost"].sum() \
                + st["ring_col"].sum() + st["k_lane"].sum()
        return run

    out = {}
    for name, flags in [("full", (1, 1, 1)), ("no_shadow", (1, 0, 1)),
                        ("no_trace", (0, 1, 1)), ("no_shade", (1, 1, 0)),
                        ("skeleton", (0, 0, 0))]:
        out[name] = round(timed(make(*flags)) / NIT * 1e3, 4)
        print(f"museum {name:10s}: {out[name]:.3f} ms/iter",
              file=sys.stderr, flush=True)
    return out


# ---------------------------------------------------------------------------
# flat wavefront loop — see /tmp prototyping in r05; the same strip on
# the wavefront body shape
# ---------------------------------------------------------------------------

def flat_strip(B=16_384, NIT=128, S=524_288):
    from wasm_pathtracer_tpu.config import RenderSettings, RenderType
    from wasm_pathtracer_tpu.models import scenes
    from wasm_pathtracer_tpu.models.camera import Camera, primary_rays
    from wasm_pathtracer_tpu.ops import bvh, probe_pallas as pp
    from wasm_pathtracer_tpu.ops import trace as tr, integrator as itg
    from wasm_pathtracer_tpu.utils import rng as rnglib
    import wasm_pathtracer_tpu.utils.vecmath as vm

    settings = RenderSettings(render_type=RenderType.NORMAL_NEE,
                              max_bounces=8)
    scene = scenes.mesh_scene(scenes.surface_mesh(188))
    prep = bvh.attach_clusters(
        tr.prepare(scene, use_fused=jax.default_backend() != "cpu"),
        scene)
    cs = prep.cluster
    C, G = cs.blocks.shape[0], cs.blocks.shape[1]
    cam = Camera.create((0.0, 1.0, -6.0), 0.1, 0.0)
    W = H = 512
    HW = W * H
    table = pp.pack_table(cs)
    aabbs = pp.pack_aabbs(cs)
    dense_fams, dense_tabs = pp.pack_dense_tables(prep, scene)
    light_tab = itg._light_table(scene)
    packed_rows = tr.pack_hit_rows(scene)
    eps = settings.epsilon
    max_b = jnp.uint32(settings.max_bounces)
    seed = jnp.uint32(5)
    pix_queue = jax.random.randint(jax.random.key(1), (S,), 0, HW)
    K = -(-S // B)
    K += max(2, K // 2)

    def make(select_on, probe_on, shade_on):
        def gen(sidx):
            pid = pix_queue[jnp.clip(sidx, 0, S - 1)]
            rid = sidx.astype(jnp.uint32)
            jx, jy, _ = rnglib.uniform3(seed, rid, itg.SLOT_JITTER)
            o, d = primary_rays(cam, pid % W, pid // W, jx, jy, W, H,
                                settings.screen_z)
            return pid, rid, o, d

        sidx0 = jnp.arange(B, dtype=jnp.int32)
        pid0, rid0, o0, d0 = gen(sidx0)
        f3 = lambda: jnp.zeros((B, 3), jnp.float32)  # noqa: E731
        state = dict(
            issued=jnp.int32(min(B, S)), o=o0, d=d0,
            tp=jnp.ones((B, 3), jnp.float32), col=f3(),
            hdb=jnp.zeros((B,), bool), absorb=f3(),
            bounce=jnp.zeros((B,), jnp.uint32), pid=pid0, rid=rid0,
            live=sidx0 < S, tr_o=o0, tr_d=d0,
            shadow=jnp.zeros((B,), bool),
            t_best=jnp.full((B,), jnp.inf, jnp.float32),
            sid_best=jnp.full((B,), -1, jnp.int32),
            skip_e=jnp.full((B,), -jnp.inf, jnp.float32),
            skip_c=jnp.full((B,), -1, jnp.int32),
            need_scan=sidx0 < S, pend_contrib=f3(),
            pend_dist=jnp.zeros((B,), jnp.float32),
            pend_lsid=jnp.zeros((B,), jnp.int32),
            pend_cont=jnp.zeros((B,), bool),
            ring_col=jnp.zeros((K, B, 3), jnp.float32),
            ring_pid=jnp.full((K, B), HW, jnp.int32),
            k_lane=jnp.zeros((B,), jnp.int32),
            cost=jnp.zeros((B,), jnp.int32), iters=jnp.int32(0),
        )

        def body(st):
            live = st["live"]
            tr_o, tr_d = st["tr_o"], st["tr_d"]
            shadow = st["shadow"]
            scan = live & st["need_scan"]
            skip_e = jnp.where(scan, -jnp.inf, st["skip_e"])
            skip_c = jnp.where(scan, -1, st["skip_c"])
            if select_on:
                e_cur, c_cur, e_b, c_b, e_aft, t_d, sid_d, _rd = \
                    pp.select_scan(cs, aabbs, dense_fams, dense_tabs,
                                   tr_o, tr_d, skip_e, skip_c, C)
            else:
                e_cur = jnp.full((B,), jnp.inf, jnp.float32)
                c_cur = jnp.zeros((B,), jnp.int32)
                e_b, c_b, e_aft = e_cur, c_cur, e_cur
                t_d = jnp.full((B,), 7.0, jnp.float32)
                sid_d = jnp.zeros((B,), jnp.int32)
            t_best = jnp.where(scan, t_d, st["t_best"])
            sid_best = jnp.where(scan, sid_d, st["sid_best"])
            cost = st["cost"] + jnp.where(scan, 1, 0)
            bound = jnp.where(shadow,
                              jnp.minimum(t_best, st["pend_dist"]),
                              t_best)
            probing = live & (e_cur < bound)
            skip_e = jnp.where(probing, e_cur, skip_e)
            skip_c = jnp.where(probing, c_cur, skip_c)
            if probe_on:
                _r1, _r2 = pp.probe_pair_raw(
                    cs, table, tr_o, tr_d, c_cur, c_b)
                tl1, sv1 = _r1[:, 0], _r1[:, 1].astype(jnp.int32)
                tl2, sv2 = _r2[:, 0], _r2[:, 1].astype(jnp.int32)
                better = probing & (tl1 < t_best)
                t_best = jnp.where(better, tl1, t_best)
                sid_best = jnp.where(better, sv1, sid_best)
                bound = jnp.where(shadow,
                                  jnp.minimum(t_best, st["pend_dist"]),
                                  t_best)
                probing2 = probing & (e_b < bound)
                better2 = probing2 & (tl2 < t_best)
                t_best = jnp.where(better2, tl2, t_best)
                sid_best = jnp.where(better2, sv2, sid_best)
            else:
                probing2 = probing & (e_b < bound)
            skip_e = jnp.where(probing2, e_b, skip_e)
            skip_c = jnp.where(probing2, c_b, skip_c)
            cost = cost + jnp.where(probing, G, 0) \
                + jnp.where(probing2, G, 0)
            e_next = jnp.where(probing2, e_aft,
                               jnp.where(probing, e_b, e_cur))
            bound = jnp.where(shadow,
                              jnp.minimum(t_best, st["pend_dist"]),
                              t_best)
            early_occ = shadow & jnp.isfinite(t_best) & \
                (t_best < st["pend_dist"]) & \
                (sid_best != st["pend_lsid"])
            done = live & ((e_next >= bound) | early_occ)
            resolve = done & shadow
            occluded = jnp.isfinite(t_best) & \
                (t_best < st["pend_dist"]) & \
                (sid_best != st["pend_lsid"])
            col = st["col"] + jnp.where((resolve & ~occluded)[:, None],
                                        st["pend_contrib"], 0.0)
            shade = done & ~shadow
            slot0 = st["bounce"] * itg._SLOTS_PER_BOUNCE
            if shade_on:
                (o_n, d_n, tp_n, col_n, alive_n, hdb_n, absorb_n), req = \
                    itg._shade_core(prep, scene, settings, light_tab,
                                    None, tr_o, tr_d, st["tp"], col,
                                    shade, st["hdb"], st["absorb"],
                                    slot0, st["rid"], seed, t_best,
                                    sid_best, jnp.isfinite(t_best),
                                    packed_rows=packed_rows)
            else:
                o_n, d_n, tp_n, col_n = st["o"], st["d"], st["tp"], col
                alive_n = shade & (st["bounce"] < 3)
                hdb_n, absorb_n = st["hdb"], st["absorb"]
                req = dict(need=shade, p_from=tr_o, p_to=tr_o + 1.0,
                           light_sid=jnp.zeros((B,), jnp.int32),
                           contrib=jnp.ones((B, 3), jnp.float32))
            sh3 = shade[:, None]
            o = jnp.where(sh3, o_n, st["o"])
            d = jnp.where(sh3, d_n, st["d"])
            tp = jnp.where(sh3, tp_n, st["tp"])
            absorb = jnp.where(sh3, absorb_n, st["absorb"])
            hdb = jnp.where(shade, hdb_n, st["hdb"])
            col = col_n
            bounce = jnp.where(shade, st["bounce"] + jnp.uint32(1),
                               st["bounce"])
            cont_shade = alive_n & (bounce < max_b)
            pend = shade & req["need"]
            to_l = req["p_to"] - req["p_from"]
            dir_len = vm.length(to_l)
            d_sh = to_l / jnp.maximum(dir_len, 1e-30)[..., None]
            o_sh = req["p_from"] + d_sh * eps
            pend_contrib = jnp.where(pend[:, None], req["contrib"],
                                     st["pend_contrib"])
            pend_dist = jnp.where(pend, dir_len, st["pend_dist"])
            pend_lsid = jnp.where(pend, req["light_sid"],
                                  st["pend_lsid"])
            pend_cont = jnp.where(shade, cont_shade, st["pend_cont"])
            fin = resolve | (shade & ~pend)
            cont = fin & jnp.where(shadow, st["pend_cont"], cont_shade)
            end = fin & ~cont
            sel = (jax.lax.broadcasted_iota(jnp.int32, (K, B), 0)
                   == st["k_lane"][None, :]) & end[None, :]
            ring_col = jnp.where(sel[..., None], col[None],
                                 st["ring_col"])
            ring_pid = jnp.where(sel, st["pid"][None], st["ring_pid"])
            k_lane = st["k_lane"] + end.astype(jnp.int32)
            claimable = end & (k_lane < K)
            ranks = jnp.cumsum(claimable.astype(jnp.int32)) - 1
            new_sidx = st["issued"] + ranks
            can = claimable & (new_sidx < S)
            issued = jnp.minimum(
                st["issued"] + jnp.sum(claimable.astype(jnp.int32)), S)
            pid_n, rid_n, o_p, d_p = gen(new_sidx)
            canc = can[:, None]
            tr_o2 = jnp.where(pend[:, None], o_sh,
                              jnp.where(canc, o_p,
                                        jnp.where(cont[:, None], o,
                                                  tr_o)))
            tr_d2 = jnp.where(pend[:, None], d_sh,
                              jnp.where(canc, d_p,
                                        jnp.where(cont[:, None], d,
                                                  tr_d)))
            start = pend | can | cont
            return dict(
                issued=issued,
                o=jnp.where(canc, o_p, o), d=jnp.where(canc, d_p, d),
                tp=jnp.where(canc, 1.0, tp),
                col=jnp.where(canc, 0.0, col),
                hdb=jnp.where(can, False, hdb),
                absorb=jnp.where(canc, 0.0, absorb),
                bounce=jnp.where(can, jnp.uint32(0), bounce),
                pid=jnp.where(can, pid_n, st["pid"]),
                rid=jnp.where(can, rid_n, st["rid"]),
                live=(live & ~end) | can, tr_o=tr_o2, tr_d=tr_d2,
                shadow=jnp.where(start, pend, shadow),
                t_best=t_best, sid_best=sid_best,
                skip_e=skip_e, skip_c=skip_c,
                need_scan=jnp.where(start, True,
                                    jnp.zeros((B,), bool)),
                pend_contrib=pend_contrib, pend_dist=pend_dist,
                pend_lsid=pend_lsid, pend_cont=pend_cont,
                ring_col=ring_col, ring_pid=ring_pid, k_lane=k_lane,
                cost=cost, iters=st["iters"] + 1,
            )

        @jax.jit
        def run():
            st = jax.lax.while_loop(lambda st: st["iters"] < NIT, body,
                                    state)
            return st["col"].sum() + st["cost"].sum() \
                + st["t_best"].sum() + st["ring_col"].sum() \
                + st["k_lane"].sum()
        return run

    # shade sub-strip: the two per-iteration row gathers alone (the
    # packed hit row + the light row), consumed, on top of the
    # skeleton — isolates the gather share of _shade_core's in-loop
    # cost
    def make_gathers():
        lpack, _ = light_tab

        def body(st):
            sid = jnp.clip(st["sid_best"], 0,
                           packed_rows.shape[0] - 1)
            prow = packed_rows[sid]
            lid = (st["pid"] + st["iters"]) % lpack.shape[0]
            lrow = lpack[lid]
            col = st["col"] + 1e-9 * (prow[:, :3] + lrow[:, :3])
            return dict(st, col=col,
                        sid_best=(st["sid_best"] + 1)
                        % packed_rows.shape[0],
                        iters=st["iters"] + 1)

        sidx0 = jnp.arange(B, dtype=jnp.int32)
        state = dict(col=jnp.zeros((B, 3), jnp.float32),
                     sid_best=sidx0 % packed_rows.shape[0],
                     pid=sidx0, iters=jnp.int32(0))

        @jax.jit
        def run():
            st = jax.lax.while_loop(lambda st: st["iters"] < NIT, body,
                                    state)
            return st["col"].sum()
        return run

    out = {}
    for name, flags in [("full", (1, 1, 1)), ("no_select", (0, 1, 1)),
                        ("no_probe", (1, 0, 1)), ("no_shade", (1, 1, 0)),
                        ("skeleton", (0, 0, 0))]:
        out[name] = round(timed(make(*flags)) / NIT * 1e3, 4)
        print(f"flat {name:10s}: {out[name]:.3f} ms/iter",
              file=sys.stderr, flush=True)
    out["gathers_x2"] = round(timed(make_gathers()) / NIT * 1e3, 4)
    print(f"flat gathers_x2: {out['gathers_x2']:.3f} ms/iter",
          file=sys.stderr, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="both",
                    choices=("museum", "flat", "both"))
    args = ap.parse_args()
    rec = {"backend": jax.default_backend(), "lanes": 16_384,
           "method": "in-loop strip-down (fixed-iteration real loop "
                     "body, components replaced by constants)"}
    if args.which in ("museum", "both"):
        rec["museum_ms_per_iter"] = museum_strip()
    if args.which in ("flat", "both"):
        rec["flat_ms_per_iter"] = flat_strip()
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
