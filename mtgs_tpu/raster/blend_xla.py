"""Pure-XLA tile blend driver (CPU tests, interpret-free parity, fallback).

Runs the exact same per-chunk math as the Pallas kernels
(`chunk_math.forward_chunk` / `backward_chunk`) but drives it with
`lax.scan` over chunk position, vmapped over tiles. Correct everywhere
JAX runs; the Pallas path is the performance path on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mtgs_tpu.raster import chunk_math as cm
from mtgs_tpu.raster.chunk_math import CHUNK


def _tile_origins(num_tiles: int, tiles_x: int, tile_size: int, base=0):
    t = base + jnp.arange(num_tiles, dtype=jnp.int32)
    ox = ((t % tiles_x) * tile_size).astype(jnp.float32)
    oy = ((t // tiles_x) * tile_size).astype(jnp.float32)
    return ox, oy


def blend_forward_xla(
    slab_t: jax.Array,        # [8-aligned W >= 6 + c_total, cap]
    tile_offsets: jax.Array,  # [num_tiles] aligned window starts
    tile_heads: jax.Array,    # [num_tiles]
    tile_counts: jax.Array,   # [num_tiles]
    tile_nchunks: jax.Array,  # [num_tiles]
    *,
    tile_size: int,
    tiles_x: int,
    c_total: int,
    tile_base=0,   # global index of tile row 0 (tile-sharded rendering)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (rgb_tiles [T, c_total, PIX], t_final [T, PIX])."""
    num_tiles = tile_offsets.shape[0]
    W, cap = slab_t.shape
    ct = c_total
    live_w = cm.NUM_GEOM + ct
    max_chunks = cap // CHUNK
    F = cm.pixel_features(tile_size)
    LT = cm.tri_inclusive(CHUNK)
    ox, oy = _tile_origins(num_tiles, tiles_x, tile_size, tile_base)

    def per_tile(offset, head, count, nchunks, origin_x, origin_y):
        def step(carry, k):
            idx = jnp.minimum(offset + k * CHUNK, cap - CHUNK)
            slab = jax.lax.dynamic_slice(slab_t, (0, idx), (live_w, CHUNK))
            new = cm.forward_chunk(
                carry, slab, origin_x, origin_y, F, LT,
                bounds=(head - k * CHUNK, head + count - k * CHUNK),
            )
            live = k < nchunks
            carry = jax.tree.map(lambda a, b: jnp.where(live, b, a), carry, new)
            return carry, None

        init = cm.init_carry(tile_size, ct)
        out, _ = jax.lax.scan(step, init, jnp.arange(max_chunks, dtype=jnp.int32))
        return out.rgb, jnp.exp(out.log_t_out)[:, 0]

    rgb, t_final = jax.vmap(per_tile)(
        tile_offsets, tile_heads, tile_counts, tile_nchunks, ox, oy
    )
    return rgb, t_final


def blend_backward_xla(
    slab_t: jax.Array,
    tile_offsets: jax.Array,
    tile_heads: jax.Array,
    tile_counts: jax.Array,
    tile_nchunks: jax.Array,
    rgb_tiles: jax.Array,    # [T, c_total, PIX] forward output
    t_final: jax.Array,      # [T, PIX]
    g_rgb: jax.Array,        # [T, c_total, PIX]
    g_t: jax.Array,          # [T, PIX]
    *,
    tile_size: int,
    tiles_x: int,
    c_total: int,
    tile_base=0,   # global index of tile row 0 (tile-sharded rendering)
) -> jax.Array:
    """Returns per-intersection g_slab_t [W, cap] (pad rows zero)."""
    num_tiles = tile_offsets.shape[0]
    W, cap = slab_t.shape
    live_w = cm.NUM_GEOM + c_total
    max_chunks = cap // CHUNK
    F = cm.pixel_features(tile_size)
    LT = cm.tri_inclusive(CHUNK)
    ox, oy = _tile_origins(num_tiles, tiles_x, tile_size, tile_base)

    def per_tile(offset, head, count, nchunks, origin_x, origin_y, rgb_fwd, tf, grgb, gt):
        tf = tf[:, None]
        gt = gt[:, None]
        total_dot = jnp.sum(grgb * rgb_fwd, axis=0)[:, None]  # [PIX, 1]

        def step(carry, k):
            idx = jnp.minimum(offset + k * CHUNK, cap - CHUNK)
            slab = jax.lax.dynamic_slice(slab_t, (0, idx), (live_w, CHUNK))
            g_slab, new = cm.backward_chunk(
                carry, slab, origin_x, origin_y, grgb, gt, tf, total_dot, F, LT,
                bounds=(head - k * CHUNK, head + count - k * CHUNK),
            )
            live = k < nchunks
            carry = jax.tree.map(lambda a, b: jnp.where(live, b, a), carry, new)
            return carry, (g_slab * live.astype(g_slab.dtype), idx)

        init = cm.BwdCarry(
            log_t_all=jnp.zeros((tile_size * tile_size, 1), jnp.float32),
            wg_cum=jnp.zeros((tile_size * tile_size, 1), jnp.float32),
        )
        _, (gg, idxs) = jax.lax.scan(
            step, init, jnp.arange(max_chunks, dtype=jnp.int32)
        )
        return gg, idxs  # [max_chunks, live_w, CHUNK], [max_chunks]

    gg, idxs = jax.vmap(per_tile)(
        tile_offsets, tile_heads, tile_counts, tile_nchunks,
        ox, oy, rgb_tiles, t_final, g_rgb, g_t
    )
    # Scatter-ADD per-(tile, chunk) gradient slabs back to the flat
    # buffer: shared boundary windows between adjacent tiles carry
    # complementary-masked (zero elsewhere) values, so adds compose;
    # dead chunks are masked to a dump slot.
    live = (
        jnp.arange(gg.shape[1], dtype=jnp.int32)[None, :]
        < tile_nchunks[:, None]
    )  # [T, max_chunks]
    flat_gg = gg.reshape(-1, live_w, CHUNK)
    flat_idx = jnp.where(live.reshape(-1), idxs.reshape(-1), cap)  # cap => dropped

    g_slab = jnp.zeros_like(slab_t)
    col_pos = flat_idx[:, None] + jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    rows = jnp.broadcast_to(
        jnp.arange(live_w, dtype=jnp.int32)[None, :, None], flat_gg.shape
    )
    pos = jnp.broadcast_to(col_pos[:, None, :], flat_gg.shape)
    return g_slab.at[rows, pos].add(flat_gg, mode="drop")
