"""Scene construction parity checks (counts from ``src/scenes.rs``)."""

import numpy as np

from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.scene import MatKind, PrimType


def test_museum_counts():
    s = scenes.museum()
    # 1 plane + 27 tori + 108 light triangles + 10 walls = 146 shapes
    assert s.num_shapes == 146
    assert s.num_inf == 1
    assert s.num_lights == 108
    ptype = np.asarray(s.ptype)
    assert (ptype == PrimType.TORUS).sum() == 27
    assert (ptype == PrimType.TRIANGLE).sum() == 108
    assert (ptype == PrimType.AARECT).sum() == 10
    # all lights are emissive triangles with intensity 2.5 * color <= 2.5
    em = np.asarray(s.emission)[np.asarray(s.light_shape)]
    assert (em.max(axis=-1) <= 2.5 + 1e-6).all()
    assert (em.max(axis=-1) > 0).all()


def test_museum_color_shuffle_deterministic():
    a = scenes.museum()
    b = scenes.museum()
    assert np.array_equal(np.asarray(a.emission), np.asarray(b.emission))


def test_bunny_scene_without_mesh():
    s = scenes.bunny_high()
    # 2 planes + 2 light triangles
    assert s.num_shapes == 4
    assert s.num_inf == 2
    assert s.num_lights == 2
    em = np.asarray(s.emission)[np.asarray(s.light_shape)]
    assert np.allclose(em, 16.0)


def test_bunny_scene_with_mesh_applies_upload_transform():
    tris = np.array([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], np.float32)
    s = scenes.bunny_high({scenes.MESH_BUNNY_HIGH: tris})
    assert s.num_shapes == 5
    params = np.asarray(s.params)
    ptype = np.asarray(s.ptype)
    tri_rows = params[ptype == PrimType.TRIANGLE]
    # first triangle row is the mesh tri: x0.5 scale, +5z translate
    # (``wasm_interface.rs:300-313``)
    mesh_row = tri_rows[0]
    assert np.allclose(mesh_row[:3], [0, 0, 5])
    assert np.allclose(mesh_row[3:6], [1, 0, 5])


def test_sphere_plane_scene():
    s = scenes.sphere_plane()
    assert s.num_lights == 2
    assert s.num_inf == 1


def test_whitted_scene_materials():
    s = scenes.whitted()
    kinds = set(np.asarray(s.mat_kind).tolist())
    assert int(MatKind.REFRACT) in kinds
    assert int(MatKind.REFLECT) in kinds
    assert s.textures.shape[0] == 1          # checker atlas
    assert int(np.asarray(s.tex_id).max()) == 0


def test_scene_registry():
    import pytest
    with pytest.raises(ValueError):
        scenes.select_scene(1)   # reference panics on unknown ids too
    assert scenes.select_scene(0).num_shapes == 146


def test_triangle_cloud_shape():
    """Generator distribution matches ``src_ts/client/index.ts:164-184``:
    centers in [-2.5, 2.5]^2 x [0, 5], positive [0, 0.5] vertex offsets."""
    t = scenes.triangle_cloud(4096)
    assert t.shape == (4096, 3, 3)
    assert (t[..., 0] >= -2.5).all() and (t[..., 0] <= 3.0).all()
    assert (t[..., 1] >= -2.5).all() and (t[..., 1] <= 3.0).all()
    assert (t[..., 2] >= 0.0).all() and (t[..., 2] <= 5.5).all()
    # offsets are strictly positive: every vertex >= its triangle's center
    centers = t.min(axis=1)
    assert (t - centers[:, None, :] >= 0.0).all()
    assert (t - centers[:, None, :] <= 0.5).all()
