"""Sequential jnp oracle renderer — the parity reference for the kernels.

Blends all depth-sorted gaussians into every pixel with a `lax.scan`
(one step per gaussian, whole-image state), using direct sequential
transmittance products — numerically independent from the kernels'
log-space/matmul formulation, but semantically identical to the CUDA
rasterizer (gsplat `rasterize_to_pixels`): alpha floor 1/255, clamp
0.999, sigma>=0 test, early termination excluding the terminator, and
the same *tile-granular* coverage cut (a pixel sees a gaussian iff the
gaussian's 3-sigma box touches the pixel's tile). Fully differentiable
via jax autodiff — the gradient oracle for the custom-VJP path.

O(N * H * W): use for small scenes/tests only.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mtgs_tpu.raster.chunk_math import ALPHA_MAX, ALPHA_MIN
from mtgs_tpu.raster.projection import ProjectedGaussians


def blend_reference(
    proj: ProjectedGaussians,
    opacities: jax.Array,   # [N] (compensation already applied)
    colors: jax.Array,      # [N, C] (depth channel already appended if any)
    perm: jax.Array,        # [N] depth order
    *,
    width: int,
    height: int,
    tile_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (accum_color [H, W, C], t_final [H, W])."""
    C = colors.shape[-1]
    HW = height * width

    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :].repeat(height, 0).reshape(-1)
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None].repeat(width, 1).reshape(-1)
    tile_x = (jnp.arange(width, dtype=jnp.int32) // tile_size)[None, :].repeat(height, 0).reshape(-1)
    tile_y = (jnp.arange(height, dtype=jnp.int32) // tile_size)[:, None].repeat(width, 1).reshape(-1)

    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)

    m = proj.means2d[perm]
    conic = proj.conics[perm]
    r = proj.radii[perm].astype(jnp.float32)
    op = opacities[perm]
    col = colors[perm]
    ok = (proj.valid[perm] & (proj.radii[perm] > 0)).astype(jnp.float32)

    # Same tile-span formula as binning.py.
    tmin_x = jnp.clip(jnp.floor((m[:, 0] - r) / tile_size), 0, tiles_x).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.ceil((m[:, 0] + r) / tile_size), 0, tiles_x).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((m[:, 1] - r) / tile_size), 0, tiles_y).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.ceil((m[:, 1] + r) / tile_size), 0, tiles_y).astype(jnp.int32)

    def step(carry, inp):
        t_full, t_out, rgb = carry
        mean, con, o, c, okf, txl, txh, tyl, tyh = inp
        dx = px - mean[0]
        dy = py - mean[1]
        sigma = 0.5 * (con[0] * dx * dx + con[2] * dy * dy) + con[1] * dx * dy
        covered = (
            (tile_x >= txl) & (tile_x < txh) & (tile_y >= tyl) & (tile_y < tyh)
        ).astype(jnp.float32) * okf
        raw = o * jnp.exp(-sigma)
        contrib = (sigma >= 0) & (raw >= ALPHA_MIN)
        alpha = jnp.minimum(raw, ALPHA_MAX) * contrib.astype(jnp.float32) * covered
        next_full = t_full * (1.0 - alpha)
        composite = ((next_full > 1e-4) & (alpha > 0)).astype(jnp.float32)
        w = t_out * alpha * composite
        rgb = rgb + w[:, None] * c[None, :]
        t_out = t_out * jnp.where(composite > 0, 1.0 - alpha, 1.0)
        return (next_full, t_out, rgb), None

    init = (
        jnp.ones((HW,), jnp.float32),
        jnp.ones((HW,), jnp.float32),
        jnp.zeros((HW, C), jnp.float32),
    )
    (t_full, t_out, rgb), _ = jax.lax.scan(
        step, init, (m, conic, op, col, ok, tmin_x, tmax_x, tmin_y, tmax_y)
    )
    return rgb.reshape(height, width, C), t_out.reshape(height, width)
