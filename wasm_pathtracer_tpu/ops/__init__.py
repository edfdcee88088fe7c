from wasm_pathtracer_tpu.ops import (  # noqa: F401
    intersect,
    trace,
    integrator,
    accum,
    filters,
)
