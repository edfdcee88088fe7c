"""Live interactive session + HTTP viewer (``runtime/live.py``).

The reference's interactive surface is the worker run-loop with
deferred control updates (``src_ts/worker/worker.ts:154-209``) and the
key-driven camera (``src_ts/client/input/camera_controller.ts``).
These tests drive :class:`LiveSession.tick` synchronously — no render
thread — so every deferred control is observable one tick later, and
exercise :class:`LiveServer`'s endpoints over real HTTP.
"""

import json
import urllib.request

import numpy as np
import pytest

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.runtime.live import LiveSession, LiveServer
from wasm_pathtracer_tpu.runtime.session import Session

W = H = 32


@pytest.fixture(scope="module")
def live():
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=3)
    sess = Session(W, H, 100, left=st, right=st)
    return LiveSession(sess, target_tick=0.01)


def test_tick_renders_and_caches_frames(live):
    fid0 = live.status()["frame_id"]
    live.tick()
    assert live.status()["frame_id"] > fid0
    png = live.frame_png()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert live.status()["total_ticks"] > 0


def test_key_moves_camera_next_tick(live):
    """/key is deferred to the render thread: the controller state and
    the session camera both change only at the next tick."""
    loc0 = np.asarray(live.session.camera.location)
    live.key("w", count=10)
    # not applied yet (deferred)
    assert np.allclose(np.asarray(live.session.camera.location), loc0)
    live.tick()   # applies controller.key -> defers session.update_camera
    live.tick()   # applies session.update_camera
    loc1 = np.asarray(live.session.camera.location)
    assert not np.allclose(loc1, loc0)
    # forward key at rot_x=0.25,rot_y=0 moves mostly along +z
    assert loc1[2] > loc0[2]


def test_pause_preserves_accumulation_and_resume_continues(live):
    live.tick()
    live.pause()
    live.tick()   # applies the pause
    ticks0 = live.status()["total_ticks"]
    img0 = live.session.image().copy()
    assert live.tick() == 0.0  # paused beat renders nothing
    assert live.status()["total_ticks"] == ticks0
    assert np.array_equal(live.session.image(), img0)  # worker.ts:191-209
    live.resume()
    live.tick()   # applies the resume (pending runs even while paused)
    live.tick()
    assert live.status()["total_ticks"] > ticks0


def test_set_settings_mid_run_restarts_accumulation(live):
    live.resume()
    live.tick()
    live.tick()
    assert live.status()["total_ticks"] > 0
    st = RenderSettings(render_type=RenderType.NO_NEE, max_bounces=3)
    live.set_settings(st, st)
    live.tick()
    # restart-from-scratch semantics (wasm_interface.rs:173-204):
    # both instances rebuilt with the new estimator, accumulation reset
    assert live.session.left.settings.render_type == RenderType.NO_NEE
    assert live.session.right.settings.render_type == RenderType.NO_NEE


def test_set_scene_resets_camera(live):
    from wasm_pathtracer_tpu.models.camera import initial_camera
    live.key("w", count=50)
    live.tick()
    live.tick()
    live.set_scene(101)
    live.tick()
    cam0 = initial_camera(101)
    assert live.session.scene_id == 101
    assert np.allclose(np.asarray(live.session.camera.location),
                       np.asarray(cam0.location))
    # the controller was silently synced: the next key step starts from
    # the scene's initial camera, not the pre-switch one
    assert np.allclose(np.asarray(live.controller.camera.location),
                       np.asarray(cam0.location))
    live.set_scene(100)
    live.tick()


def test_set_viewport_resizes(live):
    live.set_viewport(16, 16)
    live.tick()
    assert live.session.width == 16 and live.session.height == 16
    assert live.session.results().shape == (16, 16, 3)
    live.set_viewport(W, H)
    live.tick()


def test_show_sampling_toggle(live):
    live.set_show_sampling(True)
    live.tick()
    assert live.show_sampling is True
    live.set_show_sampling(False)
    live.tick()
    assert live.show_sampling is False


def test_http_endpoints():
    """LiveServer over real HTTP: page, frame.png, status JSON, and a
    control round-trip — the Elm-panel replacement surface."""
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=2)
    sess = Session(16, 16, 100, left=st, right=st)
    live = LiveSession(sess, target_tick=0.01)
    server = LiveServer(live, port=0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    import urllib.error
    try:
        def get(path):
            with urllib.request.urlopen(base + path, timeout=10) as r:
                return r.read(), r.headers.get("Content-Type")

        body, ctype = get("/")
        assert b"wasm_pathtracer_tpu" in body and "text/html" in ctype

        live.tick()
        body, ctype = get("/frame.png")
        assert body[:8] == b"\x89PNG\r\n\x1a\n" and ctype == "image/png"

        body, ctype = get("/status")
        status = json.loads(body)
        assert status["width"] == 16 and status["scene"] == 100

        body, _ = get("/key?k=w&n=5")
        assert body == b"ok"
        loc0 = np.asarray(sess.camera.location)
        live.tick()
        live.tick()
        assert not np.allclose(np.asarray(sess.camera.location), loc0)

        get("/pause")
        live.tick()
        assert live.paused
        get("/resume")
        live.tick()
        assert not live.paused

        get("/settings?left=0&right=2&right_adaptive=1")
        live.tick()
        assert sess.left.settings.render_type == RenderType.NO_NEE
        assert sess.right.settings.render_type == RenderType.PNEE
        assert sess.right.settings.adaptive is True

        try:
            get("/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.stop()


def test_drag_to_pan_reference_clamp(live):
    """Drag-to-pan with the reference's exact reclamp semantics
    (``render_target.ts:128-143``): a target smaller than the window is
    bounded WITHIN the window; a larger target must fully occupy it."""
    # small target (32x32) in the default 512x512 window
    assert live.recenter() == (240, 240)
    assert live.pan(-10_000, -10_000) == (0, 0)
    assert live.pan(10_000, 10_000) == (512 - W, 512 - H)
    # accumulation: small drags add up before clamping bites
    live.recenter()
    assert live.pan(-3, 7) == (237, 247)
    assert live.pan(-3, 7) == (234, 254)
    # large target: shrink the window below the target size
    live.window_w = live.window_h = 16
    try:
        assert live.pan(10_000, 10_000) == (0, 0)
        assert live.pan(-10_000, -10_000) == (16 - W, 16 - H)
        assert live.recenter() == (round((16 - W) / 2), round((16 - H) / 2))
    finally:
        live.window_w = live.window_h = 512
        live.recenter()


def test_pan_http_endpoints(live):
    """The /pan and /recenter endpoints round-trip the clamped offsets,
    and /status reports them (the page's drag handler syncs from the
    returned JSON)."""
    server = LiveServer(live, port=0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        def get(path):
            with urllib.request.urlopen(base + path, timeout=10) as r:
                return r.read()

        live.recenter()
        r = json.loads(get("/pan?dx=-10000&dy=5"))
        assert r == {"x": 0, "y": 245}
        r = json.loads(get("/recenter"))
        assert r == {"x": 240, "y": 240}
        status = json.loads(get("/status"))
        assert status["pan_x"] == 240 and status["pan_y"] == 240
        assert b"mousedown" in get("/")       # the page wires the drag
    finally:
        server.stop()
