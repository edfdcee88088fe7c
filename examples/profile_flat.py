"""Ablate one flat-wavefront iteration on the mesh70k workload.

Companion to examples/profile_museum.py for the FLAT (cluster) path:
times the select kernel (B x C slab + two-candidate lex-min), one probe
round (B x G block test), the dense non-cluster scan, and _shade_core,
each as K chained applications inside one jit (dispatch amortized, DCE
prevented by consuming every iteration's outputs), against the full
loop's per-iteration time from return_iters.
"""
import time, sys, json, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np
from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.ops import bvh, cluster as cl, probe_pallas as pp
from wasm_pathtracer_tpu.ops import trace as tr, wavefront, integrator as itg
from wasm_pathtracer_tpu.utils import rng as rnglib
import dataclasses

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
K = 8
scene = scenes.mesh_scene(scenes.surface_mesh(188))
prep = bvh.attach_clusters(tr.prepare(scene, use_fused=True), scene)
cs = prep.cluster
C, G = cs.blocks.shape[0], cs.blocks.shape[1]
print(f"C={C} G={G}", file=sys.stderr)
settings = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=8)
cam = Camera.create((0.0, 1.0, -6.0), 0.1, 0.0)
prep_nc = dataclasses.replace(prep, cluster=None)
table = pp.pack_table(cs)
aabbs = pp.pack_aabbs(cs)

rid = jnp.arange(B, dtype=jnp.uint32)
pix = jax.random.randint(jax.random.key(0), (B,), 0, 512*512)
jx, jy, _ = rnglib.uniform3(jnp.uint32(1), rid, itg.SLOT_JITTER)
from wasm_pathtracer_tpu.models.camera import primary_rays
o, d = primary_rays(cam, pix % 512, pix // 512, jx, jy, 512, 512, settings.screen_z)
skip_e0 = jnp.full((B,), -jnp.inf, jnp.float32)
skip_c0 = jnp.full((B,), -1, jnp.int32)

def timeit(fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3 / K

@jax.jit
def f_select(o, d):
    def body(i, carry):
        se, sc, acc = carry
        e_cur, c_cur, e_b, c_b, e_aft = pp.select_blocks(cs, aabbs, o, d, se, sc, C)
        return (jnp.where(e_cur < jnp.inf, e_cur, se),
                jnp.where(e_cur < jnp.inf, c_cur, sc),
                acc + e_aft.sum() + c_b.sum().astype(jnp.float32))
    _, _, acc = jax.lax.fori_loop(0, K, body, (skip_e0, skip_c0, jnp.float32(0)))
    return acc

@jax.jit
def f_probe(o, d):
    c0 = jnp.zeros((B,), jnp.int32)
    def body(i, carry):
        c_sel, acc = carry
        tloc, sid_loc = pp.probe_blocks_min(cs, table, o, d, c_sel)
        c2 = (c_sel + 1 + (sid_loc.astype(jnp.int32) & 0)) % C
        return c2, acc + jnp.where(jnp.isfinite(tloc), tloc, 0.0).sum()
    _, acc = jax.lax.fori_loop(0, K, body, (c0, jnp.float32(0)))
    return acc

@jax.jit
def f_scan(o, d):
    def body(i, carry):
        o_, acc = carry
        t, sid, hit, c = tr.trace_scene(prep_nc, scene, o_, d)
        return o + 1e-7*jnp.where(hit, t, 1.0)[:, None], acc + jnp.where(hit, t, 0.).sum() + sid.sum()
    _, acc = jax.lax.fori_loop(0, K, body, (o, jnp.float32(0)))
    return acc

light_tab = itg._light_table(scene)
packed_rows = tr.pack_hit_rows(scene)
t_, sid_, hit_, _ = tr.trace_scene(prep_nc, scene, o, d)
tp0 = jnp.ones((B,3), jnp.float32); col0 = jnp.zeros((B,3), jnp.float32)
alive0 = jnp.ones((B,), bool); hdb0 = jnp.zeros((B,), bool)
abs0 = jnp.zeros((B,3), jnp.float32); slot0 = jnp.zeros((B,), jnp.uint32)

@jax.jit
def f_shade(o, d, t, sid, hit):
    def body(i, carry):
        tp_, acc = carry
        (o2, d2, tp2, col2, *_), req = itg._shade_core(
            prep, scene, settings, light_tab, None, o, d, tp_, col0,
            alive0, hdb0, abs0, slot0, rid, jnp.uint32(1)+i.astype(jnp.uint32),
            t, sid, hit, packed_rows=packed_rows)
        extra = req["contrib"].sum() if req is not None else 0.0
        return tp2, acc + col2.sum() + extra
    _, acc = jax.lax.fori_loop(0, K, body, (tp0, jnp.float32(0)))
    return acc

ms = {}
ms["select"] = timeit(f_select, o, d)
ms["probe_x1"] = timeit(f_probe, o, d)
ms["scan_dense"] = timeit(f_scan, o, d)
ms["shade"] = timeit(f_shade, o, d, t_, sid_, hit_)

S = 524_288
pixq = jax.random.randint(jax.random.key(1), (S,), 0, 512*512)
@jax.jit
def f_full(seed):
    acc, cnt, cost, its = wavefront.render_queue_flat(
        prep, scene, settings, cam, pixq, 512, 512, seed, B, return_iters=True)
    return acc.sum(), cnt.sum(), cost.astype(jnp.float32).sum(), its
out = f_full(jnp.uint32(0)); jax.block_until_ready(out)
t0 = time.perf_counter()
outs = [f_full(jnp.uint32(i)) for i in range(1,3)]
jax.block_until_ready(outs)
dt = (time.perf_counter()-t0)/2
its = int(outs[0][3]); paths = int(outs[0][1])
ms["full_iter"] = dt*1e3/its
rec = {k: round(v,4) for k,v in ms.items()}
rec["iters"] = its; rec["paths_per_sec"] = round(paths/dt,1)
rec["modeled"] = round(ms["select"]+2*ms["probe_x1"]+ms["shade"],4)
print(json.dumps(rec))
