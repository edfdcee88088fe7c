"""Driver run-loop and CLI shell tests.

The reference's worker run-loop auto-tunes its tick size to ~50 ms of
wall time and defers camera/viewport updates to the top of the next
tick (``src_ts/worker/worker.ts:55-95,133-144``); pause preserves
accumulation (``worker.ts:191-209``).  The CLI replaces the Elm/TS
shell (L3-L5).
"""

import os

import numpy as np

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.runtime.driver import Driver
from wasm_pathtracer_tpu.runtime.session import Session
from wasm_pathtracer_tpu.runtime import cli

_FAST = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=3,
                       ray_batch_size=1024, regen_lanes=256)


def _session(w=32, h=32):
    return Session(w, h, scene_id=100, left=_FAST, right=_FAST)


def test_driver_auto_tune_rescales_ticks():
    sess = _session()
    drv = Driver(sess, target_tick=0.01)
    assert drv.ticks_per_step == 500          # worker.ts:22 initial value
    for _ in range(3):
        drv.step()
    # a CPU step is far slower than 10 ms: the tuner must have cut the
    # batch toward the wall-clock target (worker.ts:75-81)
    assert drv.ticks_per_step != 500
    assert drv.total_ticks > 0


def test_driver_deferred_camera_applied_next_step():
    sess = _session()
    drv = Driver(sess, target_tick=10.0)
    drv.request_camera((1.0, 2.0, -3.0), 0.1, 0.2)
    # not applied until the next tick (worker.ts:61-69)
    assert float(sess.camera.location[0]) != 1.0
    drv.step()
    assert float(sess.camera.location[0]) == 1.0
    assert float(sess.camera.rot_x) == np.float32(0.1)


def test_driver_pause_via_on_frame():
    sess = _session()
    frames = []

    def on_frame(s):
        frames.append(s.results().copy())
        drv.pause()

    drv = Driver(sess, on_frame=on_frame, target_tick=10.0)
    drv.run(seconds=60.0)   # would run a minute if pause failed
    assert len(frames) == 1
    # pause preserved accumulation
    assert float(np.asarray(sess.buffer.count).sum()) > 0


def test_cli_renders_png(tmp_path):
    out = tmp_path / "frame.png"
    cli.main(["--scene", "100", "--width", "128", "--height", "128",
              "--ticks", "512", "--batch", "512", "--lanes", "256",
              "--max-bounces", "3", "--out", str(out)])
    assert out.exists() and os.path.getsize(out) > 100


def test_cli_checkpoint_roundtrip(tmp_path):
    ck = tmp_path / "c.npz"
    out1 = tmp_path / "a.png"
    out2 = tmp_path / "b.png"
    base = ["--scene", "100", "--width", "128", "--height", "128",
            "--batch", "512", "--lanes", "256", "--max-bounces", "3"]
    cli.main(base + ["--ticks", "512", "--checkpoint", str(ck),
                     "--out", str(out1)])
    cli.main(base + ["--ticks", "512", "--resume", str(ck),
                     "--out", str(out2)])
    assert ck.exists() and out2.exists()


def test_checkpoint_preserves_adaptive_ledger(tmp_path):
    """A resumed adaptive render must NOT re-enter bootstrap: the
    rays-traced ledger and floor-sweep position round-trip."""
    from wasm_pathtracer_tpu.runtime import checkpoint
    st = _FAST.replace(adaptive=True)
    sess = Session(32, 32, scene_id=100, left=st, right=st)
    sess.compute(4096)      # enough to clear 4-spp bootstrap per half
    assert sess.left._rays_traced > 0
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, sess)

    sess2 = Session(32, 32, scene_id=100, left=st, right=st)
    checkpoint.load(path, sess2)
    assert sess2.left._rays_traced == sess.left._rays_traced
    assert int(sess2.left._sweep) == int(sess.left._sweep)
    assert sess2.num_bvh_hits == sess.num_bvh_hits
