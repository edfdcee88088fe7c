"""Timing lab for probe_blocks_min variants (chip-only, not a test)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.ops import bvh, trace, probe_pallas as pp

B = 16384
K = 8
mesh = scenes.mesh_scene(scenes.surface_mesh(188))
prep = bvh.attach_clusters(trace.prepare(mesh, use_fused=True), mesh)
cs = prep.cluster
table = pp.pack_table(cs)
C = cs.blocks.shape[0]
key = jax.random.key(0)
o = jax.random.uniform(key, (B, 3), minval=-3, maxval=3)
d = jax.random.normal(jax.random.key(1), (B, 3))
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
c0 = jax.random.randint(jax.random.key(2), (B,), 0, C)

@jax.jit
def f(o, d, c0):
    def body(i, carry):
        c_sel, acc = carry
        tloc, sid = pp.probe_blocks_min(cs, table, o, d, c_sel)
        c2 = (c_sel + 1) % C
        return c2, acc + jnp.where(jnp.isfinite(tloc), tloc, 0.0).sum() + sid.sum()
    _, acc = jax.lax.fori_loop(0, K, body, (c0, jnp.float32(0)))
    return acc

out = f(o, d, c0); jax.block_until_ready(out)
t0 = time.perf_counter()
outs = [f(o, d, c0) for _ in range(20)]
jax.block_until_ready(outs)
ms = (time.perf_counter() - t0) / 20 / K * 1e3
print(f"probe_blocks_min B={B} LG={pp.LANE_GROUP}: {ms:.4f} ms/round  checksum={float(out):.3f}")
