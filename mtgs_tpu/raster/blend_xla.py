"""Pure-XLA tile blend driver (CPU tests, interpret-free parity, fallback).

Runs the exact same per-chunk math as the Pallas kernels
(`chunk_math.forward_chunk` / `backward_chunk`) but drives it with
`lax.scan` over chunk position, vmapped over tiles. Correct everywhere
JAX runs; the Pallas path is the performance path on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from mtgs_tpu.raster import chunk_math as cm
from mtgs_tpu.raster.chunk_math import CHUNK, NUM_CH, NUM_GEOM


def _tile_origins(num_tiles: int, tiles_x: int, tile_size: int):
    t = jnp.arange(num_tiles, dtype=jnp.int32)
    ox = ((t % tiles_x) * tile_size).astype(jnp.float32)
    oy = ((t // tiles_x) * tile_size).astype(jnp.float32)
    return ox, oy


def blend_forward_xla(
    geom_t: jax.Array,       # [8, cap]
    col_t: jax.Array,        # [8, cap]
    tile_offsets: jax.Array,  # [num_tiles] aligned window starts
    tile_heads: jax.Array,    # [num_tiles]
    tile_counts: jax.Array,   # [num_tiles]
    tile_nchunks: jax.Array,  # [num_tiles]
    *,
    tile_size: int,
    tiles_x: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (rgb_tiles [T, 8, PIX], t_final [T, PIX])."""
    num_tiles = tile_offsets.shape[0]
    cap = geom_t.shape[1]
    max_chunks = cap // CHUNK
    F = cm.pixel_features(tile_size)
    LT = cm.tri_inclusive(CHUNK)
    ox, oy = _tile_origins(num_tiles, tiles_x, tile_size)

    def per_tile(offset, head, count, nchunks, origin_x, origin_y):
        def step(carry, k):
            idx = jnp.minimum(offset + k * CHUNK, cap - CHUNK)
            geom = jax.lax.dynamic_slice(geom_t, (0, idx), (NUM_GEOM, CHUNK))
            col = jax.lax.dynamic_slice(col_t, (0, idx), (NUM_CH, CHUNK))
            new = cm.forward_chunk(
                carry, geom, col, origin_x, origin_y, F, LT,
                bounds=(head - k * CHUNK, head + count - k * CHUNK),
            )
            live = k < nchunks
            carry = jax.tree.map(lambda a, b: jnp.where(live, b, a), carry, new)
            return carry, None

        init = cm.init_carry(tile_size)
        out, _ = jax.lax.scan(step, init, jnp.arange(max_chunks, dtype=jnp.int32))
        return out.rgb, jnp.exp(out.log_t_out)[:, 0]

    rgb, t_final = jax.vmap(per_tile)(
        tile_offsets, tile_heads, tile_counts, tile_nchunks, ox, oy
    )
    return rgb, t_final


def blend_backward_xla(
    geom_t: jax.Array,
    col_t: jax.Array,
    tile_offsets: jax.Array,
    tile_heads: jax.Array,
    tile_counts: jax.Array,
    tile_nchunks: jax.Array,
    rgb_tiles: jax.Array,    # [T, 8, PIX] forward output
    t_final: jax.Array,      # [T, PIX]
    g_rgb: jax.Array,        # [T, 8, PIX]
    g_t: jax.Array,          # [T, PIX]
    *,
    tile_size: int,
    tiles_x: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns per-intersection (g_geom_t [8, cap], g_col_t [8, cap])."""
    num_tiles = tile_offsets.shape[0]
    cap = geom_t.shape[1]
    max_chunks = cap // CHUNK
    F = cm.pixel_features(tile_size)
    LT = cm.tri_inclusive(CHUNK)
    ox, oy = _tile_origins(num_tiles, tiles_x, tile_size)

    def per_tile(offset, head, count, nchunks, origin_x, origin_y, rgb_fwd, tf, grgb, gt):
        tf = tf[:, None]
        gt = gt[:, None]
        total_dot = jnp.sum(grgb * rgb_fwd, axis=0)[:, None]  # [PIX, 1]

        def step(carry, k):
            idx = jnp.minimum(offset + k * CHUNK, cap - CHUNK)
            geom = jax.lax.dynamic_slice(geom_t, (0, idx), (NUM_GEOM, CHUNK))
            col = jax.lax.dynamic_slice(col_t, (0, idx), (NUM_CH, CHUNK))
            g_geom, g_col, new = cm.backward_chunk(
                carry, geom, col, origin_x, origin_y, grgb, gt, tf, total_dot, F, LT,
                bounds=(head - k * CHUNK, head + count - k * CHUNK),
            )
            live = k < nchunks
            carry = jax.tree.map(lambda a, b: jnp.where(live, b, a), carry, new)
            livef = live.astype(g_geom.dtype)
            return carry, (g_geom * livef, g_col * livef, idx)

        init = cm.BwdCarry(
            log_t_all=jnp.zeros((tile_size * tile_size, 1), jnp.float32),
            wg_cum=jnp.zeros((tile_size * tile_size, 1), jnp.float32),
        )
        _, (gg, gc, idxs) = jax.lax.scan(
            step, init, jnp.arange(max_chunks, dtype=jnp.int32)
        )
        return gg, gc, idxs  # [max_chunks, 8, CHUNK] x2, [max_chunks]

    gg, gc, idxs = jax.vmap(per_tile)(
        tile_offsets, tile_heads, tile_counts, tile_nchunks,
        ox, oy, rgb_tiles, t_final, g_rgb, g_t
    )
    # Scatter per-(tile, chunk) gradient slabs back to the flat buffers.
    # Chunk ranges of live chunks are disjoint across tiles; dead chunks
    # scatter zeros (possibly onto live slots of other tiles) — harmless
    # with scatter-ADD only if they land on zeros... they may not, so mask
    # dead chunks to a dump slot instead.
    live = (
        jnp.arange(gg.shape[1], dtype=jnp.int32)[None, :]
        < tile_nchunks[:, None]
    )  # [T, max_chunks]
    flat_gg = gg.reshape(-1, NUM_GEOM, CHUNK)
    flat_gc = gc.reshape(-1, NUM_CH, CHUNK)
    flat_idx = jnp.where(live.reshape(-1), idxs.reshape(-1), cap)  # cap => dropped

    g_geom_t = jnp.zeros_like(geom_t)
    g_col_t = jnp.zeros_like(col_t)
    col_pos = flat_idx[:, None] + jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    row_geom = jnp.broadcast_to(
        jnp.arange(NUM_GEOM, dtype=jnp.int32)[None, :, None], flat_gg.shape
    )
    pos_geom = jnp.broadcast_to(col_pos[:, None, :], flat_gg.shape)
    g_geom_t = g_geom_t.at[row_geom, pos_geom].add(flat_gg, mode="drop")
    row_col = jnp.broadcast_to(
        jnp.arange(NUM_CH, dtype=jnp.int32)[None, :, None], flat_gc.shape
    )
    pos_col = jnp.broadcast_to(col_pos[:, None, :], flat_gc.shape)
    g_col_t = g_col_t.at[row_col, pos_col].add(flat_gc, mode="drop")
    return g_geom_t, g_col_t
