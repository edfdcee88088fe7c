"""Multi-host setup and scaling-efficiency measurement.

The reference has no multi-machine story (SURVEY §5: browser
postMessage + SharedArrayBuffer on one page).  Here multi-host is the
standard JAX single-controller recipe: every host runs the same
program, ``jax.distributed.initialize`` wires the DCN, and the
``rays`` mesh spans all chips — the render/train code in
``parallel.shard`` is unchanged.

``measure_scaling`` is the harness for BASELINE.md's >85% scaling
efficiency target: throughput per chip at 1 device vs N devices on the
same workload.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX if requested via args or env.

    No-op for single-process runs.  Returns the global device count.
    """
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def measure_scaling(render_fn, device_counts, seed=0, iters: int = 5):
    """Throughput scaling over subsets of the available devices.

    ``render_fn(mesh, seed) -> jax.Array`` renders one frame/batch over
    the given mesh.  Returns a list of dicts with per-chip throughput
    and efficiency relative to 1 device.
    """
    from wasm_pathtracer_tpu.parallel.shard import make_ray_mesh

    results = []
    base_per_chip = None
    base_dt = None
    for n in device_counts:
        devices = jax.devices()[:n]
        if len(devices) < n:
            break
        mesh = make_ray_mesh(devices)
        out = render_fn(mesh, jnp.uint32(seed))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = render_fn(mesh, jnp.uint32(seed + 1 + i))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        per_chip = 1.0 / (dt * n)
        if base_per_chip is None:
            base_per_chip = per_chip
            base_dt = dt
        results.append(dict(
            devices=n,
            seconds_per_frame=dt,
            # strong-scaling efficiency: per-chip throughput at n devices
            # vs 1 device — the BASELINE >85% definition; meaningful on
            # REAL chips (n devices = n x the hardware)
            efficiency=per_chip / base_per_chip,
            # sharding-overhead factor: t(1)/t(n) at FIXED total work.
            # On a virtual CPU mesh all "devices" share the same host
            # cores, so the ideal is 1.0 (constant wall time) and any
            # deficit is pure partition/collective overhead — the only
            # signal a virtual topology can give
            aggregate_efficiency=base_dt / dt,
        ))
    return results
