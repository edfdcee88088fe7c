"""Checkpoint / resume for progressive renders.

The reference has no persistence (SURVEY §5): its in-memory analog is
the progressive accumulator (``src/render_target.rs:5-65``) plus the
photon tree, both rebuilt from scratch on any restart.  Here the full
render state — accumulator, sample counts, photon histograms, round
counters, camera — serializes to one ``.npz``, so a long render can
resume after preemption and a deterministic replay reproduces any tile
(the fault-tolerance story the reference lacks).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from wasm_pathtracer_tpu.ops import accum, photon


def save(path: str, session) -> None:
    data = dict(
        width=session.width,
        height=session.height,
        scene_id=session.scene_id,
        seed=session.seed,
        acc=np.asarray(session.buffer.acc),
        count=np.asarray(session.buffer.count),
        density=session.density,
        cam_location=np.asarray(session.camera.location),
        cam_rot_x=np.asarray(session.camera.rot_x),
        cam_rot_y=np.asarray(session.camera.rot_y),
        left_round=session.left.round,
        right_round=session.right.round,
        # adaptive-sampler ledgers: without these a resumed adaptive
        # render would re-enter bootstrap and lose its sweep position
        left_rays_traced=session.left._rays_traced,
        right_rays_traced=session.right._rays_traced,
        left_sweep=np.asarray(session.left._sweep),
        right_sweep=np.asarray(session.right._sweep),
        left_bvh_hits=session.left.num_bvh_hits,
        right_bvh_hits=session.right.num_bvh_hits,
    )
    for name, inst in (("left", session.left), ("right", session.right)):
        if inst.photon_grid is not None:
            g = inst.photon_grid
            data[f"{name}_photon_bins"] = np.asarray(g.bins)
            data[f"{name}_photon_lo"] = np.asarray(g.lo)
            data[f"{name}_photon_hi"] = np.asarray(g.hi)
            data[f"{name}_photon_n"] = np.asarray(g.num_photons)
            data[f"{name}_photon_res"] = g.res
    np.savez_compressed(path, **data)


def load(path: str, session) -> None:
    """Restore state into an existing session (same viewport/scene)."""
    z = np.load(path)
    assert int(z["width"]) == session.width and \
        int(z["height"]) == session.height, "viewport mismatch"
    if int(z["scene_id"]) != session.scene_id:
        session.update_scene(int(z["scene_id"]))
    session.buffer = accum.AccumBuffer(acc=jnp.asarray(z["acc"]),
                                       count=jnp.asarray(z["count"]))
    session.density = z["density"]
    from wasm_pathtracer_tpu.models.camera import Camera
    session.camera = Camera.create(z["cam_location"],
                                   float(z["cam_rot_x"]),
                                   float(z["cam_rot_y"]))
    session.left.round = int(z["left_round"])
    session.right.round = int(z["right_round"])
    for name, inst in (("left", session.left), ("right", session.right)):
        # older checkpoints predate the adaptive ledger fields
        if f"{name}_rays_traced" in z:
            inst._rays_traced = int(z[f"{name}_rays_traced"])
            inst._sweep = jnp.asarray(z[f"{name}_sweep"], jnp.int32)
            inst.num_bvh_hits = int(z[f"{name}_bvh_hits"])
    for name, inst in (("left", session.left), ("right", session.right)):
        key = f"{name}_photon_bins"
        if key in z:
            inst.photon_grid = photon.PhotonGrid(
                bins=jnp.asarray(z[key]),
                lo=jnp.asarray(z[f"{name}_photon_lo"]),
                hi=jnp.asarray(z[f"{name}_photon_hi"]),
                num_photons=jnp.asarray(z[f"{name}_photon_n"]),
                res=int(z[f"{name}_photon_res"]),
            )
