from wasm_pathtracer_tpu.parallel.shard import (  # noqa: F401
    make_ray_mesh,
    render_image_sharded,
    render_queue_sharded,
    render_queue_flat_sharded,
    make_train_step,
)
