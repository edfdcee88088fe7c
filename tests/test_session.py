"""Session API tests — the reference's WASM interface semantics
(``src/wasm_interface.rs``) exercised through the Python mirror."""

import numpy as np
import pytest

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.runtime.session import Session
from wasm_pathtracer_tpu.runtime import checkpoint


def _small_session(**kw):
    fast = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=4,
                          ray_batch_size=2048)
    kw.setdefault("left", fast)
    kw.setdefault("right", fast)
    return Session(64, 64, scene_id=100, **kw)


def test_compute_accumulates_samples():
    s = _small_session()
    s.compute(4096)
    counts = np.asarray(s.buffer.count)
    assert counts.sum() >= 4096
    img = s.results()
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img.max() > 0


def test_left_right_halves_receive_samples():
    s = _small_session()
    s.compute(8192)
    counts = np.asarray(s.buffer.count)
    assert counts[:, :32].sum() > 0, "left half unsampled"
    assert counts[:, 32:].sum() > 0, "right half unsampled"


def test_update_camera_resets_accumulation():
    s = _small_session()
    s.compute(2048)
    assert np.asarray(s.buffer.count).sum() > 0
    s.update_camera((0.0, 2.0, -3.0), 0.3, 0.0)
    assert np.asarray(s.buffer.count).sum() == 0


def test_update_scene_switches_and_resets():
    s = _small_session()
    s.compute(2048)
    s.update_scene(0)
    assert s.scene.num_shapes == 146
    assert np.asarray(s.buffer.count).sum() == 0


def test_update_viewport_resizes():
    s = _small_session()
    s.update_viewport(96, 80)
    s.compute(2048)
    assert s.results().shape == (80, 96, 3)


def test_store_mesh_triggers_rebuild_for_active_scene():
    s = _small_session()
    s.update_scene(2)          # bunny scene uses mesh 1
    base_shapes = s.scene.num_shapes
    tris = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    rebuilt = s.store_mesh(1, tris)
    assert rebuilt
    assert s.scene.num_shapes == base_shapes + 1


def test_store_mesh_inactive_scene_no_rebuild():
    s = _small_session()       # scene 100
    tris = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    assert not s.store_mesh(1, tris)


def test_invalid_scene_raises():
    s = _small_session()
    with pytest.raises(ValueError):
        s.update_scene(42)


def test_checkpoint_roundtrip(tmp_path):
    s = _small_session()
    s.compute(2048)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, s)

    s2 = _small_session()
    checkpoint.load(path, s2)
    assert np.array_equal(np.asarray(s2.buffer.acc), np.asarray(s.buffer.acc))
    assert np.array_equal(np.asarray(s2.buffer.count),
                          np.asarray(s.buffer.count))
    # resumed session continues accumulating
    s2.compute(2048)
    assert np.asarray(s2.buffer.count).sum() > np.asarray(s.buffer.count).sum()


def test_sampling_density_view():
    ad = RenderSettings(render_type=RenderType.NORMAL_NEE, adaptive=True,
                        max_bounces=4, ray_batch_size=2048,
                        adaptive_bootstrap_spp=1)
    s = Session(64, 64, scene_id=100, left=ad, right=ad)
    s.compute(2048 * 10)
    img = s.results(show_sampling=True)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0


def test_checkpoint_preserves_photon_state(tmp_path):
    pnee = RenderSettings(render_type=RenderType.PNEE, max_bounces=4,
                          ray_batch_size=2048, total_photons=4000,
                          photon_grid_res=8)
    s = Session(48, 48, scene_id=100, left=pnee, right=pnee)
    s.compute(4096)
    assert s.left.photon_grid is not None
    n_before = int(s.left.photon_grid.num_photons)
    assert n_before > 0

    path = str(tmp_path / "pnee.npz")
    checkpoint.save(path, s)
    s2 = Session(48, 48, scene_id=100, left=pnee, right=pnee)
    checkpoint.load(path, s2)
    assert int(s2.left.photon_grid.num_photons) == n_before
    assert np.array_equal(np.asarray(s2.left.photon_grid.bins),
                          np.asarray(s.left.photon_grid.bins))
    s2.compute(2048)  # resumes without rebuilding from scratch


def test_cloud_scene_end_to_end_uses_flat_wavefront():
    """The procedural cloud workloads (scene ids 3/4/5 — the reference
    client's standing meshes, ``src_ts/client/index.ts:224-226``) render
    end-to-end through the session, with clusters attached and the
    flattened wavefront selected automatically."""
    fast = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=3,
                          ray_batch_size=1024, regen_lanes=256)
    s = Session(32, 32, scene_id=4, left=fast, right=fast)
    n_tri = int(np.asarray(s.scene.ptype == 2).sum())
    assert n_tri == 10_002   # 10k cloud + 2 light triangles
    assert s.prep.cluster is not None
    s.compute(2048)
    counts = np.asarray(s.buffer.count)
    assert counts.sum() >= 2048
    assert s.results().max() > 0
    # cost counter is sub-linear: far fewer prim tests than brute force
    per_ray = s.num_bvh_hits / max(counts.sum(), 1)
    assert 0 < per_ray < n_tri


def test_cloud_scene_100k_traces():
    """100k-triangle cloud (scene 5): primary rays trace through the
    cluster structure with sub-linear per-ray cost."""
    import jax.numpy as jnp
    from wasm_pathtracer_tpu.models import scenes as reg
    from wasm_pathtracer_tpu.models.camera import initial_camera, primary_rays
    from wasm_pathtracer_tpu.ops import bvh as bvhlib
    from wasm_pathtracer_tpu.ops import trace as tr

    scene = reg.select_scene(5)
    assert int(np.asarray(scene.ptype == 2).sum()) == 100_002
    prep = bvhlib.attach_clusters(tr.prepare(scene), scene)
    cam = initial_camera(5)
    n = 512
    pix = jnp.arange(n, dtype=jnp.int32) * 8   # every 8th pixel of 64x64
    px = pix % 64
    py = pix // 64
    o, d = primary_rays(cam, px, py, jnp.zeros(n) + 0.5, jnp.zeros(n) + 0.5,
                        64, 64, 0.8)
    t, sid, hit, cost = tr.trace_scene(prep, scene, o, d)
    assert bool(hit.any())
    assert float(np.asarray(cost).mean()) < 100_002 / 4
