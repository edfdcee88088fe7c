"""Inverse rendering demo: recover scene materials from a target image.

The flagship differentiable workload (BASELINE.json north star: "pixel
gradients flow to material/light/camera parameters").  Renders a target
with the true materials, perturbs the albedos, then descends back using
the sharded train step (gradients psum-ed over the ray mesh).

Run:  python examples/inverse_render.py [--steps 40] [--size 48]
"""

import argparse
import os
import sys

import numpy as np

# runnable from anywhere: the package lives next to examples/
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--lr", type=float, default=0.8)
    p.add_argument("--out", type=str, default=None,
                   help="write before/after/target PNG strip")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from wasm_pathtracer_tpu.config import RenderSettings, RenderType
    from wasm_pathtracer_tpu.models import scenes
    from wasm_pathtracer_tpu.models.camera import Camera
    from wasm_pathtracer_tpu.ops import trace
    from wasm_pathtracer_tpu.parallel import (
        make_ray_mesh, make_train_step, render_image_sharded)

    scene = scenes.sphere_plane()
    prep = trace.prepare(scene)
    st = RenderSettings(render_type=RenderType.NORMAL_NEE, max_bounces=5,
                        early_exit=False)
    cam = Camera.create((0.0, 1.5, -2.0), 0.25, 0.0)
    W = H = args.size
    mesh = make_ray_mesh()

    print(f"devices: {len(jax.devices())}; target render...")
    target = render_image_sharded(mesh, prep, scene, st, cam, W, H,
                                  jnp.uint32(1000), spp=8)

    # perturb the DIFFUSE albedos (emissive shapes never read their
    # albedo row, so it receives no gradient and stays wherever we
    # leave it — keep it fixed and measure only rows that matter)
    from wasm_pathtracer_tpu.models.scene import MatKind
    diffuse_rows = (scene.mat_kind == int(MatKind.DIFFUSE))[:, None]
    wrong_albedo = jnp.clip(scene.albedo + jnp.where(
        diffuse_rows, jnp.asarray([[0.15, -0.3, 0.25]], jnp.float32), 0.0),
        0, 1)
    cur = scene.with_materials(albedo=wrong_albedo)
    init_err = float(jnp.abs(jnp.where(diffuse_rows,
                                       cur.albedo - scene.albedo,
                                       0.0)).max())
    before = render_image_sharded(mesh, prep, cur, st, cam, W, H,
                                  jnp.uint32(2000), spp=4)

    step = make_train_step(mesh, prep, st, W, H, lr=args.lr, spp=4)
    cc = cam
    for i in range(args.steps):
        loss, cur, cc = step(cur, cc, target, jnp.uint32(3000 + i))
        if i % 5 == 0 or i == args.steps - 1:
            err = float(jnp.abs(jnp.where(diffuse_rows,
                                          cur.albedo - scene.albedo,
                                          0.0)).max())
            print(f"step {i:3d}  loss {float(loss):.5f}  "
                  f"max albedo err {err:.3f}")

    after = render_image_sharded(mesh, prep, cur, st, cam, W, H,
                                 jnp.uint32(4000), spp=4)
    final_err = float(jnp.abs(jnp.where(diffuse_rows,
                                        cur.albedo - scene.albedo,
                                        0.0)).max())
    print(f"max albedo error: {init_err:.3f} -> {final_err:.3f}")

    if args.out:
        from wasm_pathtracer_tpu.utils.png import write_png, tonemap_u8
        strip = np.concatenate([np.asarray(before), np.asarray(after),
                                np.asarray(target)], axis=1)
        write_png(args.out, tonemap_u8(strip))
        print(f"wrote {args.out} (before | after | target)")

    # success: materially recovered toward the truth (full recovery
    # needs more steps than a demo budget; convergence rate ~0.002/step
    # at this resolution)
    return 0 if final_err < 0.8 * init_err else 1


if __name__ == "__main__":
    sys.exit(main())
