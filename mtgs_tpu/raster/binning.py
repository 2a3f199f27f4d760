"""Tile binning: gaussian -> (tile, depth)-ordered intersection lists.

TPU-native replacement for gsplat's `isect_tiles` / `isect_offset_encode`
CUDA kernels (the tile-sort stage of the rasterization called at
`mtgs/scene_model/mtgs_scene_graph.py:640-662` in OpenDriveLab/MTGS).

Design (static shapes, no atomics, all XLA):
 1. Sort the N gaussians once, globally, by camera depth (`lax.sort`).
 2. Expand each gaussian to its covered tiles with `jnp.repeat(...,
    total_repeat_length=max_intersections)` — fixed capacity; overflow is
    truncated and reported so the caller can grow the capacity and re-jit.
 3. STABLE-sort the (tile, gaussian) pairs by tile id only. Because the
    input enumeration order is the global depth order, stability gives
    depth order within every tile — exactly the (tile<<32)|depth radix
    sort of the CUDA path, with a single int32 key.
 4. Re-lay out each tile's run to a CHUNK(=128)-aligned offset with one
    scatter, padding with a sentinel id. Every per-tile range then starts
    at a 128-aligned slot and spans whole chunks: the Pallas blend kernel
    DMAs perfectly aligned (8, 128) blocks, and the per-chunk math treats
    sentinel entries as opacity-0 no-ops.

Everything here is index math under stop_gradient; gradients flow through
the later *gather* of per-gaussian attributes into intersection order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mtgs_tpu.raster.chunk_math import CHUNK


class BinnedIntersections(NamedTuple):
    """Static-capacity tile-intersection structure.

    Attributes:
        perm: [N] depth-order permutation of the input gaussians.
        inv_perm: [N] inverse of perm (sorted index of each input gaussian).
        gidx: [capacity] int32 — for every padded intersection slot, the
            index into the *depth-sorted* gaussian arrays; == N (sentinel)
            for padding slots.
        tile_offsets: [num_tiles] int32 chunk-aligned start of each tile's
            run in `gidx`.
        tile_nchunks: [num_tiles] int32 number of CHUNK-sized chunks.
        pair_pos: [max_intersections] int32 — padded slot of each pair in
            ENUMERATION order (grouped by depth-sorted gaussian);
            == capacity for invalid pairs. Enables scatter-free gradient
            segment-reduction (cumsum over pair order).
        pair_offsets: [N] int32 exclusive pair-count prefix (sorted order).
        pair_counts: [N] int32 pairs per gaussian (sorted order).
        n_intersections: [] int32 true (unpadded, untruncated) pair count —
            if > max_intersections the caller must grow capacity.
    """

    perm: jax.Array
    inv_perm: jax.Array
    gidx: jax.Array
    tile_offsets: jax.Array
    tile_nchunks: jax.Array
    pair_pos: jax.Array
    pair_offsets: jax.Array
    pair_counts: jax.Array
    n_intersections: jax.Array


def padded_capacity(max_intersections: int, num_tiles: int) -> int:
    """Static capacity of the chunk-aligned intersection buffer
    (rounded to 512 so the blocked Pallas transposes stay aligned)."""
    cap = max_intersections + num_tiles * (CHUNK - 1)
    return ((cap + 511) // 512) * 512


def bin_gaussians(
    means2d: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    *,
    width: int,
    height: int,
    tile_size: int,
    max_intersections: int,
) -> BinnedIntersections:
    """Build the chunk-aligned per-tile intersection lists.

    Args:
        means2d: [N, 2] pixel-space centers.
        radii: [N] int32 screen radii (0 = culled).
        depths: [N] camera depths (sort key).
        valid: [N] bool.
        width, height, tile_size, max_intersections: static ints.
    """
    means2d = jax.lax.stop_gradient(means2d)
    depths = jax.lax.stop_gradient(depths)

    N = means2d.shape[0]
    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    num_tiles = tiles_x * tiles_y
    I = max_intersections
    cap = padded_capacity(I, num_tiles)

    # ---- 1. global depth sort ----------------------------------------
    depth_key = jnp.where(valid, depths, jnp.inf)
    _, perm = jax.lax.sort(
        (depth_key, jnp.arange(N, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    m = means2d[perm]
    r = radii[perm].astype(jnp.float32)
    valid_s = valid[perm] & (radii[perm] > 0)

    # ---- 2. tile spans + expansion -----------------------------------
    tmin_x = jnp.clip(jnp.floor((m[:, 0] - r) / tile_size), 0, tiles_x).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.ceil((m[:, 0] + r) / tile_size), 0, tiles_x).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((m[:, 1] - r) / tile_size), 0, tiles_y).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.ceil((m[:, 1] + r) / tile_size), 0, tiles_y).astype(jnp.int32)
    # span_x capped at 255 so it bit-packs below (a gaussian spanning
    # >255 tile columns would cover a >8000px-wide footprint)
    span_x = jnp.clip(tmax_x - tmin_x, 0, 255)
    span_y = jnp.maximum(tmax_y - tmin_y, 0)
    counts = jnp.where(valid_s, span_x * span_y, 0).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if N > 0 else jnp.zeros((), jnp.int32)

    slot = jnp.arange(I, dtype=jnp.int32)
    # Per-pair segment id/offset via scatter+cumsum/cummax instead of
    # jnp.repeat (which lowers to an I-from-N random gather — the
    # dominant cost class on TPU). `offsets` is non-decreasing, so a
    # scatter-max at each segment start followed by a running max
    # reconstructs the step function; the +1-indicator cumsum gives the
    # segment index, skipping empty gaussians via duplicate increments.
    zeros_i = jnp.zeros((I,), jnp.int32)
    safe_off = jnp.minimum(offsets, I)  # == I drops (truncated tail)
    ind = zeros_i.at[safe_off].add(1, mode="drop")
    src = jnp.cumsum(ind) - 1
    off_s = jax.lax.cummax(zeros_i.at[safe_off].max(offsets, mode="drop"))
    # One bit-packed (tmin_x | tmin_y | span_x) word per gaussian;
    # construction guarantees local in [0, counts) for every slot < total.
    packed = tmin_x | (tmin_y << 11) | (span_x << 22)
    pk = packed[jnp.clip(src, 0, N - 1)]
    local = slot - off_s
    sx = jnp.maximum(pk >> 22, 1)
    lx = local % sx
    ly = local // sx
    tile = (((pk >> 11) & 0x7FF) + ly) * tiles_x + ((pk & 0x7FF) + lx)
    pair_ok = slot < total
    tile = jnp.where(pair_ok, tile, num_tiles)  # sentinel tile sorts last

    # ---- 3. stable sort by tile id (preserves depth order in-tile) ---
    pair_ids = jnp.arange(I, dtype=jnp.int32)
    tile_sorted, src_sorted, pair_id_sorted = jax.lax.sort(
        (tile, src, pair_ids), num_keys=1, is_stable=True
    )

    # ---- 4. chunk-aligned re-layout (gather-only — no 4M scatter) ----
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)
    tcounts = ends - starts
    padded = ((tcounts + CHUNK - 1) // CHUNK) * CHUNK
    tile_offsets = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    tile_nchunks = (padded // CHUNK).astype(jnp.int32)

    # Each padded slot j pulls its source: its chunk's tile t (small
    # chunk->tile table via searchsorted), within-tile rank r, sorted-pair
    # index starts[t] + r. TPU scatters serialize; gathers with monotone
    # per-tile indices stream — this formulation is scatter-free.
    n_chunks_cap = cap // CHUNK
    chunk_tile = (
        jnp.searchsorted(
            tile_offsets, jnp.arange(n_chunks_cap, dtype=jnp.int32) * CHUNK,
            side="right",
        ).astype(jnp.int32)
        - 1
    )
    # chunk-level lookups (tiny gathers) broadcast to slots — avoids three
    # per-slot gathers
    off_c = tile_offsets[chunk_tile]      # [n_chunks]
    cnt_c = tcounts[chunk_tile]
    start_c = starts[chunk_tile]
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    base = jnp.arange(n_chunks_cap, dtype=jnp.int32) * CHUNK
    r2 = base[:, None] + lane[None, :] - off_c[:, None]       # [n_chunks, CHUNK]
    live2 = r2 < cnt_c[:, None]
    src_idx = jnp.minimum((start_c[:, None] + r2).reshape(cap), I - 1)
    gidx = jnp.where(live2.reshape(cap), src_sorted[src_idx], N)  # sentinel = N

    # ---- 5. pair -> padded-slot map (for scatter-free gradient reduce) --
    # padded slot of SORTED pair s, then invert the tile sort with a second
    # sort keyed on pair id (sorts are ~10x cheaper than TPU scatters).
    sorted_idx = jnp.arange(I, dtype=jnp.int32)
    # tile_offsets/starts per sorted pair via scatter+cummax over tile
    # starts (both sequences are non-decreasing; `starts` are the exact
    # segment boundaries in sorted-pair space)
    zi = jnp.zeros((I,), jnp.int32)
    safe_starts = jnp.minimum(starts, I)
    off_rep = jax.lax.cummax(zi.at[safe_starts].max(tile_offsets, mode="drop"))
    start_rep = jax.lax.cummax(zi.at[safe_starts].max(starts, mode="drop"))
    pos_sorted = jnp.where(
        tile_sorted < num_tiles,
        off_rep + (sorted_idx - start_rep),
        cap,
    )
    _, pair_pos = jax.lax.sort((pair_id_sorted, pos_sorted), num_keys=1, is_stable=True)

    # inverse gaussian permutation (input index -> sorted index)
    _, inv_perm = jax.lax.sort((perm, jnp.arange(N, dtype=jnp.int32)), num_keys=1)

    return BinnedIntersections(
        perm=perm,
        inv_perm=inv_perm,
        gidx=gidx,
        tile_offsets=tile_offsets,
        tile_nchunks=tile_nchunks,
        pair_pos=pair_pos,
        pair_offsets=offsets.astype(jnp.int32),
        pair_counts=counts.astype(jnp.int32),
        n_intersections=total,
    )
