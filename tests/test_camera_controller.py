"""Camera controller semantics (``camera_controller.ts``)."""

import numpy as np

from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.runtime.camera_controller import CameraController


def test_forward_moves_along_view_direction():
    c = CameraController(Camera.create((0, 0, 0), 0.0, 0.0))
    c.key("w", count=10)
    loc = np.asarray(c.camera.location)
    assert np.allclose(loc, [0, 0, 0.3], atol=1e-6)


def test_forward_respects_rotation():
    # rotY = pi/2: forward (+z in camera frame) becomes +x in world
    c = CameraController(Camera.create((0, 0, 0), 0.0, np.pi / 2))
    c.key("w", count=10)
    loc = np.asarray(c.camera.location)
    assert np.allclose(loc, [0.3, 0, 0], atol=1e-6)


def test_rotation_keys():
    c = CameraController(Camera.create((0, 0, 0), 0.0, 0.0))
    c.key("left", count=100)
    assert np.isclose(float(c.camera.rot_y), -0.1 * np.pi, atol=1e-6)
    c.key("down", count=50)
    assert np.isclose(float(c.camera.rot_x), 0.05 * np.pi, atol=1e-6)


def test_vertical_movement_in_camera_frame():
    # the reference rotates ALL translations into the camera frame,
    # including PageUp/Down (controller.ts:84)
    c = CameraController(Camera.create((0, 0, 0), np.pi / 2, 0.0))
    c.key("pageup", count=10)
    loc = np.asarray(c.camera.location)
    # rot_x(pi/2) maps +y to +z
    assert np.allclose(loc, [0, 0, 0.3], atol=1e-6)


def test_on_update_callback_and_unknown_key():
    seen = []
    c = CameraController(Camera.create((0, 0, 0), 0.0, 0.0),
                         on_update=seen.append)
    c.key("w")
    c.key("nosuchkey")
    assert len(seen) == 1
