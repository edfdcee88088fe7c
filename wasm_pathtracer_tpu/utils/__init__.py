from wasm_pathtracer_tpu.utils import vecmath, rng, obj, png  # noqa: F401
