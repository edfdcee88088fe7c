"""Scaling harness smoke tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import pytest

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.models import scenes
from wasm_pathtracer_tpu.models.camera import Camera
from wasm_pathtracer_tpu.ops import trace
from wasm_pathtracer_tpu.parallel import render_image_sharded
from wasm_pathtracer_tpu.parallel.distributed import initialize, measure_scaling

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_initialize_single_process_noop():
    assert initialize() == len(jax.devices())


@pytest.mark.slow
def test_measure_scaling_runs():
    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=3)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)

    def render(mesh, seed):
        return render_image_sharded(mesh, prep, scene, st, cam, 32, 32, seed)

    res = measure_scaling(render, [1, 2, 8], iters=2)
    assert [r["devices"] for r in res] == [1, 2, 8]
    assert res[0]["efficiency"] == 1.0
    for r in res:
        assert r["seconds_per_frame"] > 0
        assert r["efficiency"] > 0
