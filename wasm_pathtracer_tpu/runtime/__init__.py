from wasm_pathtracer_tpu.runtime.session import Session, RenderInstance  # noqa: F401
