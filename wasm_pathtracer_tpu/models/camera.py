"""Camera model and primary-ray generation.

Reproduces the reference camera exactly (``src/tracer.rs:16-26`` and the
ray construction in ``compute_rays``, ``src/tracer.rs:156-193``): the
camera first rotates around x, then around y, then translates; the
virtual screen sits at z = +0.8 with x scaled by the aspect ratio and y
flipped (pixel (0,0) is top-left).  Z points into the screen
(``src/wasm_interface.rs:33``).

The camera is a pytree — ``location``, ``rot_x``, ``rot_y`` are
differentiable, so pixel gradients can flow to camera pose.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from wasm_pathtracer_tpu.utils import vecmath as vm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    location: jax.Array  # (3,) f32
    rot_x: jax.Array     # () f32
    rot_y: jax.Array     # () f32

    @staticmethod
    def create(location, rot_x=0.0, rot_y=0.0) -> "Camera":
        return Camera(
            location=jnp.asarray(location, jnp.float32),
            rot_x=jnp.asarray(rot_x, jnp.float32),
            rot_y=jnp.asarray(rot_y, jnp.float32),
        )


def primary_rays(camera: Camera, px, py, jx, jy, width: int, height: int,
                 screen_z: float = 0.8):
    """Build primary rays for pixel indices ``(px, py)`` with in-pixel
    jitter ``(jx, jy)`` in [0,1).

    Matches ``src/tracer.rs:178-193``:
      fx = ((x + jx) / w - 0.5) * aspect
      fy = 0.5 - (y + jy) / h
      dir = normalize((fx, fy, 0.8)).rot_x(cam.rot_x).rot_y(cam.rot_y)

    Returns (origins (..., 3), directions (..., 3)).
    """
    fw = jnp.float32(width)
    fh = jnp.float32(height)
    ar = fw / fh
    fx = ((px.astype(jnp.float32) + jx) / fw - 0.5) * ar
    fy = 0.5 - (py.astype(jnp.float32) + jy) / fh
    pixel = jnp.stack([fx, fy, jnp.full_like(fx, screen_z)], axis=-1)
    d = vm.normalize(pixel)
    d = vm.rot_x(d, camera.rot_x)
    d = vm.rot_y(d, camera.rot_y)
    o = jnp.broadcast_to(camera.location, d.shape)
    return o, d


# Per-scene initial cameras (``src_ts/client/index.ts:152-162``).
INITIAL_CAMERAS = {
    0: dict(location=(0.0, 16.34, -23.76), rot_x=0.54, rot_y=0.0),   # museum
    1: dict(location=(-0.9, 5.4, 0.4), rot_x=0.58, rot_y=0.0),       # bunny (low)
    2: dict(location=(-0.9, 5.4, 0.4), rot_x=0.58, rot_y=0.0),       # bunny (high)
    # cloud workload scenes (ids 3/4/5): look at the [-1.25,1.5]^2 x
    # [5,7.75] box (the generated cloud after the x0.5 +5z upload
    # transform, models/scenes.py::cloud) from the front
    3: dict(location=(0.0, 0.5, -2.0), rot_x=0.05, rot_y=0.0),
    4: dict(location=(0.0, 0.5, -2.0), rot_x=0.05, rot_y=0.0),
    5: dict(location=(0.0, 0.5, -2.0), rot_x=0.05, rot_y=0.0),
}


def initial_camera(scene_id: int) -> Camera:
    cfg = INITIAL_CAMERAS.get(scene_id, dict(location=(0.0, 0.0, 0.0),
                                             rot_x=0.0, rot_y=0.0))
    return Camera.create(**cfg)
