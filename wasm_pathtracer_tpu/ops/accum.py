"""Progressive accumulation buffers.

Functional equivalent of ``RenderTarget`` (``src/render_target.rs:5-77``):
a per-pixel radiance sum + sample count whose mean is the displayed
image.  The reference mutates per pixel on every sample; here whole
sample batches scatter-add in one op, and the pytree is the renderer's
checkpointable state (SURVEY §5: accumulator + counts + RNG counter are
the checkpoint).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AccumBuffer:
    acc: jax.Array     # (H, W, 3) f32 radiance sum
    count: jax.Array   # (H, W) f32 samples per pixel

    @staticmethod
    def create(width: int, height: int) -> "AccumBuffer":
        return AccumBuffer(
            acc=jnp.zeros((height, width, 3), jnp.float32),
            count=jnp.zeros((height, width), jnp.float32),
        )

    def clear(self) -> "AccumBuffer":
        # ``RenderTarget::clear`` (``render_target.rs:44-52``)
        return AccumBuffer.create(self.acc.shape[1], self.acc.shape[0])


def write_samples(buf: AccumBuffer, px, py, color) -> AccumBuffer:
    """Scatter-add a batch of samples (``RenderTarget::write``,
    ``render_target.rs:55-65``)."""
    acc = buf.acc.at[py, px].add(color)
    count = buf.count.at[py, px].add(1.0)
    return AccumBuffer(acc=acc, count=count)


def write_sums(buf: AccumBuffer, color_sum, counts) -> AccumBuffer:
    """Add pre-accumulated full-frame sums (from
    ``integrator.render_queue``): ``color_sum`` (H*W, 3) radiance totals
    and ``counts`` (H*W,) samples per pixel."""
    H, W, _ = buf.acc.shape
    return AccumBuffer(
        acc=buf.acc + color_sum.reshape(H, W, 3),
        count=buf.count + counts.reshape(H, W).astype(jnp.float32),
    )


def mean_image(buf: AccumBuffer) -> jax.Array:
    """Average radiance; pixels with zero samples read 0."""
    c = jnp.maximum(buf.count, 1.0)[..., None]
    return buf.acc / c


def clamped_image(buf: AccumBuffer) -> jax.Array:
    """``read_clamped`` (``render_target.rs:74-77``)."""
    return jnp.clip(mean_image(buf), 0.0, 1.0)


def mix_color(v):
    """Sampling-density false color (``sampling_strategy.rs:224-230``):
    green below average, blue at average (0.5), red above."""
    v = jnp.clip(v, 0.0, 1.0)[..., None]
    green = jnp.array([0.0, 1.0, 0.0])
    blue = jnp.array([0.0, 0.0, 1.0])
    red = jnp.array([1.0, 0.0, 0.0])
    lo = green * (1.0 - 2.0 * v) + blue * (2.0 * v)
    hi = blue * (1.0 - 2.0 * (v - 0.5)) + red * (2.0 * (v - 0.5))
    return jnp.where(v < 0.5, lo, hi)


def depth_image(t, max_t=None):
    """White-near / black-far tone mapping for the depth debug view
    (``tracer.rs:203-213``)."""
    finite = jnp.isfinite(t)
    if max_t is None:
        max_t = jnp.max(jnp.where(finite, t, 0.0)) + 1e-6
    g = jnp.clip(1.0 - t / max_t, 0.0, 1.0)
    g = jnp.where(finite, g, 0.0)
    return jnp.stack([g, g, g], axis=-1)
