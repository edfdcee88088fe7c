"""Camera controller: the key-driven navigation of the reference client.

Re-implements ``src_ts/client/input/camera_controller.ts``: WASD
translates across the plane, PageUp/PageDown moves vertically, arrow
keys rotate; translations are rotated into the camera frame
(``translation.rotX(rotX).rotY(rotY)``, controller:84) before being
applied, so "forward" follows the view direction.  Step sizes match the
reference: 0.03 units per key tick, 0.001*pi radians per rotate tick
(the ticker fires every 10 ms with missed-tick compensation,
``input_key.ts:28-66`` — callers pass ``count`` for that).

Key names replace browser key codes; any front-end (curses, a notebook
widget, a request handler) can drive it.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.utils import vecmath as vm

import jax.numpy as jnp

_MOVE = 0.03
_ROT = 0.001 * np.pi

# key -> (translation vector | None, d_rot_x, d_rot_y)
_BINDINGS = {
    "w": ((0.0, 0.0, _MOVE), 0.0, 0.0),        # forward
    "s": ((0.0, 0.0, -_MOVE), 0.0, 0.0),       # backward
    "d": ((_MOVE, 0.0, 0.0), 0.0, 0.0),        # right
    "a": ((-_MOVE, 0.0, 0.0), 0.0, 0.0),       # left
    "pageup": ((0.0, _MOVE, 0.0), 0.0, 0.0),   # up
    "pagedown": ((0.0, -_MOVE, 0.0), 0.0, 0.0),
    "left": (None, 0.0, -_ROT),
    "right": (None, 0.0, _ROT),
    "up": (None, -_ROT, 0.0),
    "down": (None, _ROT, 0.0),
}


class CameraController:
    def __init__(self, camera: Camera,
                 on_update: Optional[Callable[[Camera], None]] = None):
        self._camera = camera
        self._on_update = on_update

    @property
    def camera(self) -> Camera:
        return self._camera

    def set(self, camera: Camera):
        self._camera = camera
        self._notify()

    def set_silent(self, camera: Camera):
        """Replace the camera WITHOUT firing ``on_update`` — for scene
        switches, where the session resets its own camera and a deferred
        camera-update callback would clobber the fresh accumulator."""
        self._camera = camera

    def key(self, name: str, count: int = 1):
        """Apply ``count`` ticks of the named key (see _BINDINGS)."""
        b = _BINDINGS.get(name.lower())
        if b is None:
            return
        trans, drx, dry = b
        c = self._camera
        rx = float(c.rot_x) + drx * count
        ry = float(c.rot_y) + dry * count
        loc = np.asarray(c.location, np.float32)
        if trans is not None:
            t = jnp.asarray(trans, jnp.float32) * count
            # rotate the step into the camera frame (controller.ts:84)
            t = vm.rot_y(vm.rot_x(t, jnp.float32(rx)), jnp.float32(ry))
            loc = loc + np.asarray(t)
        self._camera = Camera.create(loc, rx, ry)
        self._notify()

    def _notify(self):
        if self._on_update is not None:
            self._on_update(self._camera)
