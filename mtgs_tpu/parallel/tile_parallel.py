"""Tile-sharded rendering: one image's tiles split across chips.

The splatting analog of sequence parallelism (SURVEY.md §5): projection
and binning are cheap and replicated; the per-tile blend — the hot loop —
is `shard_map`'d over the tile axis, so each chip blends a contiguous
slab of tiles against the (replicated) intersection buffers. Outputs
concatenate along the tile axis with no cross-chip traffic at all in the
forward (tiles are independent); only the final image gather crosses ICI.

Used for fast eval/viewer rendering of large frames; the training path
currently shards over cameras instead (data_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mtgs_tpu.raster import binning
from mtgs_tpu.raster.blend_pallas import blend_forward_pallas
from mtgs_tpu.raster.blend_xla import blend_forward_xla
from mtgs_tpu.raster.chunk_math import NUM_GEOM
from mtgs_tpu.raster.projection import project_gaussians
from mtgs_tpu.raster.rasterize import RasterizeConfig, _finalize


def rasterize_tile_sharded(
    means, quats, scales, opacities, colors, viewmat, K,
    config: RasterizeConfig, mesh: Mesh, axis: str = "data",
):
    """Forward-only tile-sharded render. Same outputs as `rasterize`
    (render, alpha, info) without gradient support."""
    n_dev = mesh.shape[axis]
    proj = project_gaussians(
        means, quats, scales, viewmat, K, config.width, config.height,
        near_plane=config.near_plane, far_plane=config.far_plane,
        antialiased=(config.rasterize_mode == "antialiased"),
    )
    op_eff = opacities * proj.compensations
    cols = colors
    if config.with_depth:
        cols = jnp.concatenate([cols, proj.depths[:, None]], axis=-1)
    c_total = cols.shape[-1]

    binned = binning.bin_gaussians(
        proj.means2d, proj.radii, proj.depths, proj.valid,
        width=config.width, height=config.height,
        tile_size=config.tile_size, max_intersections=config.max_intersections,
    )
    table = jnp.concatenate(
        [proj.means2d, proj.conics, op_eff[:, None], cols], axis=-1
    )  # [N, 6 + c_total]
    w = NUM_GEOM + c_total
    w_pad = ((w + 7) // 8) * 8  # DMA sublane tiling
    rows = jnp.concatenate(
        [table[binned.perm], jnp.zeros((1, w), means.dtype)]
    )[binned.gidx]
    slab_t = jnp.pad(rows, ((0, 0), (0, w_pad - w))).T

    T = binned.tile_offsets.shape[0]
    T_pad = ((T + n_dev - 1) // n_dev) * n_dev
    offs = jnp.pad(binned.tile_offsets, (0, T_pad - T))
    hds = jnp.pad(binned.tile_heads, (0, T_pad - T))
    cnts = jnp.pad(binned.tile_counts, (0, T_pad - T))
    nchk = jnp.pad(binned.tile_nchunks, (0, T_pad - T))

    backend = config.resolve_backend()
    blend = blend_forward_pallas if backend == "pallas" else blend_forward_xla

    def shard_fn(offs_l, hds_l, cnts_l, nchk_l, slab_l):
        # each shard blends a contiguous block of GLOBAL tiles — pixel
        # origins must come from the global tile index, not the local row
        base = jax.lax.axis_index(axis) * offs_l.shape[0]
        return blend(
            slab_l, offs_l, hds_l, cnts_l, nchk_l,
            tile_size=config.tile_size, tiles_x=config.tiles_x,
            c_total=c_total, tile_base=base,
            **({"interpret": config.interpret} if backend == "pallas" else {}),
        )

    rgb_tiles, t_final = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(offs, hds, cnts, nchk, slab_t)

    ts = config.tile_size
    img = rgb_tiles[:T].reshape(config.tiles_y, config.tiles_x, c_total, ts, ts)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        config.tiles_y * ts, config.tiles_x * ts, c_total
    )[: config.height, : config.width, :c_total]
    t_img = t_final[:T].reshape(config.tiles_y, config.tiles_x, ts, ts)
    t_img = t_img.transpose(0, 2, 1, 3).reshape(
        config.tiles_y * ts, config.tiles_x * ts
    )[: config.height, : config.width]
    alpha = (1.0 - t_img)[..., None]
    render = _finalize(img, alpha, config, c_total)
    info = dict(
        means2d=proj.means2d, radii=proj.radii, depths=proj.depths,
        n_intersections=binned.n_intersections,
    )
    return render, alpha, info
