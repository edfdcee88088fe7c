"""Photon-grid PNEE tests.

Recreates the reference's manual harness ``test_photon_tree``
(``src/main.rs:22-52``): photons from left-region lights must bias
sampling toward those lights at left-region query points, and the
returned pdf must be a valid probability that matches empirical
sampling frequencies (the ``test_empirical_pdf`` idea, ``main.rs:54-81``).
"""

import numpy as np
import jax.numpy as jnp

from wasm_pathtracer_tpu.config import RenderSettings, RenderType
from wasm_pathtracer_tpu.models.scene import SceneBuilder, Material
from wasm_pathtracer_tpu.ops import photon, trace
from wasm_pathtracer_tpu.utils import rng as rnglib


def _two_light_scene():
    """Ground plane lit by a left light (strong) and right light (weak)."""
    b = SceneBuilder()
    b.add_plane((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), Material.diffuse(0.8, 0.8, 0.8))
    left = Material.emissive(20.0, 20.0, 20.0)
    right = Material.emissive(1.0, 1.0, 1.0)
    b.add_triangle((-5.0, 3.0, 1.0), (-4.0, 3.0, 1.0), (-5.0, 3.0, -1.0), left)
    b.add_triangle((5.0, 3.0, 1.0), (4.0, 3.0, 1.0), (5.0, 3.0, -1.0), right)
    return b.build()


def _built_grid(scene, n_batches=8, batch=4096):
    settings = RenderSettings(render_type=RenderType.PNEE, photon_grid_res=8)
    prep = trace.prepare(scene)
    lo, hi = photon.grid_bounds_for_scene(scene, settings)
    grid = photon.PhotonGrid.create(scene.num_lights, lo, hi,
                                    settings.photon_grid_res)
    for i in range(n_batches):
        grid = photon.emit_photons(grid, prep, scene, settings,
                                   jnp.uint32(1000 + i), batch)
    return grid, settings


def test_photons_deposit_and_count():
    scene = _two_light_scene()
    grid, _ = _built_grid(scene)
    n = int(grid.num_photons)
    assert n > 1000, f"only {n} photons landed"
    # histogram grew beyond the 1.0 init
    assert float(jnp.sum(grid.bins)) > grid.bins.shape[0] * grid.bins.shape[1]


def test_sampling_biases_toward_near_strong_light():
    scene = _two_light_scene()
    grid, _ = _built_grid(scene)
    R = 4096
    rid = jnp.arange(R, dtype=jnp.uint32)
    # query points on the floor under the LEFT (strong) light
    p = jnp.tile(jnp.asarray([[-4.5, 0.0, 0.0]], jnp.float32), (R, 1))
    lid, pdf = photon.sample(grid, p, jnp.uint32(77), rid, 0)
    lid = np.asarray(lid)
    frac_left = (lid == 0).mean()
    assert frac_left > 0.7, f"left light picked only {frac_left:.2f}"
    # pdf must be a valid probability and consistent with frequencies
    pdf = np.asarray(pdf)
    assert (pdf > 0).all() and (pdf <= 1.0 + 1e-5).all()
    assert abs(pdf[lid == 0].mean() - frac_left) < 0.1


def test_pdf_matches_empirical_frequency():
    """The returned pdf is the true per-sample probability: over many
    draws at the same point, freq(light) ~= pdf(light)."""
    scene = _two_light_scene()
    grid, _ = _built_grid(scene)
    R = 8192
    rid = jnp.arange(R, dtype=jnp.uint32)
    p = jnp.tile(jnp.asarray([[2.0, 0.0, 0.5]], jnp.float32), (R, 1))
    lid, pdf = photon.sample(grid, p, jnp.uint32(5), rid, 0)
    lid, pdf = np.asarray(lid), np.asarray(pdf)
    for light in (0, 1):
        sel = lid == light
        if sel.sum() > 100:
            freq = sel.mean()
            assert abs(pdf[sel].mean() - freq) < 0.05, \
                f"light {light}: pdf {pdf[sel].mean():.3f} vs freq {freq:.3f}"


def test_outside_grid_falls_back_to_uniform():
    scene = _two_light_scene()
    grid, _ = _built_grid(scene)
    R = 1024
    rid = jnp.arange(R, dtype=jnp.uint32)
    p = jnp.tile(jnp.asarray([[9999.0, 9999.0, 9999.0]], jnp.float32), (R, 1))
    lid, pdf = photon.sample(grid, p, jnp.uint32(3), rid, 0)
    assert np.allclose(np.asarray(pdf), 0.5)
    frac = (np.asarray(lid) == 0).mean()
    assert 0.4 < frac < 0.6


def test_bins_start_at_one_no_zero_probability():
    """``EmpiricalPDF`` bins init to 1.0 so no light has probability 0
    (``empirical_pdf.rs:4-28``)."""
    grid = photon.PhotonGrid.create(4, (-1, -1, -1), (1, 1, 1), res=4)
    assert float(grid.bins.min()) == 1.0
    R = 512
    rid = jnp.arange(R, dtype=jnp.uint32)
    p = jnp.zeros((R, 3), jnp.float32)
    lid, pdf = photon.sample(grid, p, jnp.uint32(1), rid, 0)
    assert (np.asarray(pdf) > 0).all()
    # empty grid: all four lights equally likely
    counts = np.bincount(np.asarray(lid), minlength=4)
    assert (counts > R / 8).all()
