"""Tile-sharded rendering: one image's tiles split across chips.

The splatting analog of sequence parallelism (SURVEY.md §2.4/§5):
projection, binning, and the intersection gather are cheap relative to
the per-tile blend and stay replicated; the blend — the hot loop in both
directions — is `shard_map`'d over the tile axis, so each chip blends a
contiguous block of GLOBAL tiles against the replicated intersection
slab. Because intersection slots are ordered by (tile, depth), the tile
sharding partitions slots contiguously: each shard's backward writes
gradients only into its own slot range, and the shard_map transpose
`psum`s the per-gaussian slab cotangents over ICI — full training
gradients through sharded tiles, not just forward rendering.

Implemented inside `mtgs_tpu.raster.rasterize(mesh=...)`; this module
keeps the original entry point as a thin alias.
"""

from __future__ import annotations

from jax.sharding import Mesh

from mtgs_tpu.raster.rasterize import RasterizeConfig, rasterize


def rasterize_tile_sharded(
    means, quats, scales, opacities, colors, viewmat, K,
    config: RasterizeConfig, mesh: Mesh, axis: str = "data",
    **kwargs,
):
    """Tile-sharded render; same outputs as `rasterize` (render, alpha,
    info) and fully differentiable (parameter grads + tap2d/absgrad)."""
    return rasterize(
        means, quats, scales, opacities, colors, viewmat, K, config,
        mesh=mesh, shard_axis=axis, **kwargs,
    )
