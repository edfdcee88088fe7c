"""Benchmark: path-traced rays (paths) per second on one chip.

Workload: the museum scene (``SURVEY.md`` flagship: 146 shapes, 108 area
lights) at 512x512 with NEE path tracing, 8-bounce wavefront loop —
the same estimator the reference runs per tick.  A "ray" here is one
full path tick (the reference's unit of work: 1 tick ~ 1 primary path,
``src/tracer.rs:99-123``), including all bounce and shadow rays.

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
    B = 32768   # batch sweep on v5e: 32k ~ 527k paths/s, 65k ~ 521k, 262k ~ 323k

    @jax.jit
    def step(seed):
        pix = jax.random.randint(jax.random.key(seed), (B,), 0, W * H)
        px = pix % W
        py = pix // W
        col, _ = integrator.render_pixels(prep, scene, settings, camera,
                                          px, py, W, H, seed)
        return col.sum()

    # warm up / compile
    step(jnp.uint32(0)).block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    # dispatch all steps asynchronously, sync once: a per-iteration
    # float() readback serializes host<->device and costs ~2x throughput
    outs = [step(jnp.uint32(i)) for i in range(1, n_iters + 1)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    acc = sum(float(x) for x in outs)
    assert np.isfinite(acc)

    rays_per_sec = n_iters * B / dt
    baseline = 1.0e4  # reference worker initial auto-tune rate (see above)
    print(json.dumps({
        "metric": "rays_per_sec_1chip",
        "value": round(rays_per_sec, 1),
        "unit": "paths/s",
        "vs_baseline": round(rays_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
