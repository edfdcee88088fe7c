"""Benchmark: path-traced rays (paths) per second on one chip.

Workload: the museum scene (``SURVEY.md`` flagship: 146 shapes, 108 area
lights) at 512x512 with NEE path tracing, 8-bounce wavefront loop —
the same estimator the reference runs per tick.  A "ray" here is one
full path tick (the reference's unit of work: 1 tick ~ 1 primary path,
``src/tracer.rs:99-123``), including all bounce and shadow rays.

Execution model: the persistent wavefront with path regeneration
(``ops.integrator.render_queue``) over the fused whole-scene Pallas
megakernel (``ops.scene_pallas``) — every lane stays occupied until the
sample queue drains, so no scene trace is wasted on RR-dead paths
(~2.8x the lockstep batch loop on this workload).

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
only throughput machinery it documents is the worker auto-tuner's
initial rate of 500 rays / 50 ms = 10,000 rays/sec in-browser
(``src_ts/worker/worker.ts:22,71-81``).  We report against that 1e4
rays/sec anchor.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from wasm_pathtracer_tpu.config import RenderSettings, RenderType
    from wasm_pathtracer_tpu.models import scenes
    from wasm_pathtracer_tpu.models.camera import initial_camera
    from wasm_pathtracer_tpu.ops import integrator, trace

    scene = scenes.museum()
    # fused whole-scene Pallas megakernel (ops/scene_pallas.py): the
    # forward-only fast path; falls back to XLA dense off-TPU
    prep = trace.prepare(scene, use_fused=jax.default_backend() != "cpu")
    settings = RenderSettings(render_type=RenderType.NORMAL_NEE,
                              max_bounces=8)
    camera = initial_camera(0)
    W = H = 512
    # queue/lane sweep on the v5e-class chip: (2.6M, 64k) ~ 3.5M paths/s,
    # (5.2M, 64k) ~ 3.7M; larger queues amortize the drain tail
    S = 2_621_440   # paths per dispatch (80 spp over 512x512)
    B = 65_536      # wavefront lanes

    @jax.jit
    def step(seed):
        pix = jax.random.randint(jax.random.key(seed), (S,), 0, W * H)
        acc, cnt, cost = integrator.render_queue(
            prep, scene, settings, camera, pix, W, H, seed, B)
        return acc.sum(), cnt.sum()

    # warm up / compile
    jax.block_until_ready(step(jnp.uint32(0)))

    n_iters = 4
    t0 = time.perf_counter()
    # dispatch all steps asynchronously, sync once
    outs = [step(jnp.uint32(i)) for i in range(1, n_iters + 1)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    acc = sum(float(x) for x, _ in outs)
    done = sum(int(c) for _, c in outs)
    assert np.isfinite(acc)
    assert done == n_iters * S, f"queue not drained: {done} != {n_iters * S}"

    rays_per_sec = n_iters * S / dt
    baseline = 1.0e4  # reference worker initial auto-tune rate (see above)
    print(json.dumps({
        "metric": "rays_per_sec_1chip",
        "value": round(rays_per_sec, 1),
        "unit": "paths/s",
        "vs_baseline": round(rays_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
