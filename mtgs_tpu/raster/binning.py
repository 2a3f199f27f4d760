"""Tile binning: gaussian -> (tile, depth)-ordered intersection lists.

TPU-native replacement for gsplat's `isect_tiles` / `isect_offset_encode`
CUDA kernels (the tile-sort stage of the rasterization called at
`mtgs/scene_model/mtgs_scene_graph.py:640-662` in OpenDriveLab/MTGS).

Design (static shapes, no atomics, all XLA):
 1. Per-gaussian tile spans in input order (order-independent), bit-packed
    into one word per gaussian.
 2. Sort the N gaussians once, globally, by camera depth (`lax.sort`),
    then expand each gaussian to its covered tiles via an
    indicator-scatter + cumsum (fixed `max_intersections` capacity;
    overflow is truncated and reported so the caller can grow + re-jit).
 3. STABLE-sort the (tile, gaussian) pairs by tile id only. Because the
    input enumeration order is the global depth order, stability gives
    depth order within every tile — exactly the (tile<<32)|depth radix
    sort of the CUDA path, with a single int32 key.
 4. Per-tile ranges stay UNALIGNED in sorted-pair order (no re-layout
    pass): the blend kernels cover each run with 128-aligned DMA windows
    and mask lanes outside [head, head + count).

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
        gidx: [capacity] int32 — for every intersection slot (tile-sorted
            pair order), the index into the *depth-sorted* gaussian
            arrays; == N (sentinel) only in the capacity pad region.
        tile_offsets: [num_tiles] int32 128-aligned DMA window start of
            each tile's run (floor(start / CHUNK) * CHUNK).
        tile_heads: [num_tiles] int32 offset of the first live pair
            within the first window (start - tile_offsets).
        tile_counts: [num_tiles] int32 live pairs per tile; the kernels
            mask window lanes outside [head, head + count).
        tile_nchunks: [num_tiles] int32 aligned windows per tile
            (= ceil((head + count) / CHUNK), 0 for empty tiles).
        pair_offsets: [N] int32 exclusive pair-count prefix (sorted order).
        pair_counts: [N] int32 pairs per gaussian (sorted order).
        n_intersections: [] int32 true (unpadded, untruncated) pair count —
            if > max_intersections the caller must grow capacity.
    """

    perm: jax.Array
    inv_perm: jax.Array
    gidx: jax.Array
    tile_offsets: jax.Array
    tile_heads: jax.Array
    tile_counts: jax.Array
    tile_nchunks: jax.Array
    pair_offsets: jax.Array
    pair_counts: jax.Array
    n_intersections: jax.Array


def tile_spans(
    means2d: jax.Array,
    radii: jax.Array,
    valid: jax.Array,
    *,
    width: int,
    height: int,
    tile_size: int,
    conics: jax.Array = None,
    op_eff: jax.Array = None,
    row_range=None,
):
    """Per-gaussian tile-span words in input order (order-independent
    math shared by both binning paths): returns (packed, counts) where
    packed = tmin_x | tmin_y << 11 | span_x << 22.

    `row_range=(r0, r1)` (traced int32 scalars) clips spans to tile rows
    [r0, r1) and packs tmin_y SHARD-LOCAL (tmin_y - r0): the per-shard
    span computation of the tile-sharded pipeline (SURVEY §2.4 — each
    chip expands/sorts/blends only the pairs landing in its own tile-row
    band; the reference analog is the tile-partitioned CUDA pipeline,
    `mtgs/scene_model/mtgs_scene_graph.py:640-662`).

    When `conics` ([N, 3] cxx, cxy, cyy of the blurred covariance) and
    `op_eff` ([N] post-compensation opacities) are given, the gsplat
    circle AABB is intersected with the per-axis AABB of the EXACT alpha
    support {S <= ln(255 * op_eff)} — the blend kernel's contrib test is
    `op_eff * exp(-S) >= 1/255`, so a tile fully outside that level set
    contributes exactly zero forward value AND zero gradient for every
    pixel. Dropping those pairs is bit-exact (golden tests cover it) and
    cuts intersections hardest for anisotropic / low-opacity gaussians,
    where the isotropic 3-sigma_max circle overcovers. The level set's
    half-extent along x is sqrt(2 * S_cut * v00b) with v00b = cyy /
    det(conic) (and symmetrically for y); a 0.5 px + 1% S margin absorbs
    f32 rounding between this bound and the kernel's per-pixel S.
    """
    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    rf = radii.astype(jnp.float32)
    rx = ry = rf
    if conics is not None and op_eff is not None:
        conics = jax.lax.stop_gradient(conics)
        a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
        det = jnp.maximum(a * c - b * b, 1e-24)
        s_cut = jnp.log(jnp.maximum(op_eff, 1e-12) * 255.0) * 1.01
        pos = s_cut > 0.0
        ext = lambda diag: jnp.where(
            pos, jnp.sqrt(jnp.maximum(2.0 * s_cut * diag / det, 0.0)) + 0.5, 0.0
        )
        rx = jnp.minimum(rf, ext(c))   # v00b = cyy / det(conic)
        ry = jnp.minimum(rf, ext(a))
    tmin_x = jnp.clip(jnp.floor((means2d[:, 0] - rx) / tile_size), 0, tiles_x).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.ceil((means2d[:, 0] + rx) / tile_size), 0, tiles_x).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((means2d[:, 1] - ry) / tile_size), 0, tiles_y).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.ceil((means2d[:, 1] + ry) / tile_size), 0, tiles_y).astype(jnp.int32)
    y_base = 0
    if row_range is not None:
        r0, r1 = row_range
        r1 = jnp.maximum(r0, r1)  # shards fully past tiles_y clip empty
        tmin_y = jnp.clip(tmin_y, r0, r1)
        tmax_y = jnp.clip(tmax_y, r0, r1)
        y_base = r0
    # span_x capped at 255 so it bit-packs (a gaussian spanning >255 tile
    # columns would cover a >8000px-wide footprint)
    span_x = jnp.clip(tmax_x - tmin_x, 0, 255)
    span_y = jnp.maximum(tmax_y - tmin_y, 0)
    live = valid & (radii > 0)
    if op_eff is not None:
        # contrib needs raw = op_eff * exp(-S) >= 1/255 with S >= 0, so
        # op_eff < 1/255 can never contribute anywhere — exact drop
        live = live & (op_eff >= 1.0 / 255.0)
    counts = jnp.where(live, span_x * span_y, 0).astype(jnp.int32)
    packed = tmin_x | ((tmin_y - y_base) << 11) | (span_x << 22)
    return packed, counts


def window_anchors(offsets: jax.Array, max_intersections: int) -> jax.Array:
    """128-aligned table-window anchor per 512-pair block for
    `expand_fused`: block k's owners lie in [gal[k], gal[k] + 768)."""
    from mtgs_tpu.raster.expand_fused import ALIGN, B, WINA

    N = offsets.shape[0]
    bounds = jnp.arange(max_intersections // B, dtype=jnp.int32) * B
    gstart = jnp.searchsorted(offsets, bounds, side="right").astype(jnp.int32) - 1
    n_pad = ((N + ALIGN - 1) // ALIGN) * ALIGN + WINA
    return jnp.clip((jnp.clip(gstart, 0, N - 1) // ALIGN) * ALIGN,
                    0, n_pad - WINA)


def searchsorted_expand(
    offsets: jax.Array,   # [N] int32 exclusive pair-count prefix (sorted order)
    packed: jax.Array,    # [N] int32 span words (sorted order)
    total: jax.Array,     # [] int32 true pair count
    max_intersections: int,
    *,
    tiles_x: int,
    num_tiles: int,
):
    """(tile, src) per depth-order pair slot — scatter-free, kernel-free.

    The owner of slot s is the last gaussian whose offset is <= s: ONE
    `searchsorted` over the offset prefix, then two row gathers for the
    owner's offset and span word. All int32: exact, no f32 telescoping.

    This is the PORTABLE fallback (CPU tests, any backend) and an
    env-gated experiment (MTGS_EXPAND=searchsorted). On-chip it measured
    SLOWER than the windowed Pallas expand at 2M slots (random row
    gathers price per row and searchsorted lowers poorly); the r1
    microbench that suggested otherwise timed identical queued
    executions, which the device tunnel apparently de-duplicates —
    chained-step timing (profile_raster) is the reliable methodology.

    Dead slots (>= total) return tile == num_tiles (sorts last) and a
    clamped src whose gradient rows are exactly zero downstream.
    """
    N = offsets.shape[0]
    slot = jnp.arange(max_intersections, dtype=jnp.int32)
    src = jnp.searchsorted(
        offsets, slot, side="right", method="sort"
    ).astype(jnp.int32) - 1
    src = jnp.clip(src, 0, N - 1)
    off_s = offsets[src]
    pk = packed[src]
    local = slot - off_s
    sx = jnp.maximum(pk >> 22, 1)
    ly = local // sx
    lx = local - ly * sx
    tile = (((pk >> 11) & 0x7FF) + ly) * tiles_x + ((pk & 0x7FF) + lx)
    tile = jnp.where(slot < total, tile, num_tiles)
    return tile, src


def padded_capacity(max_intersections: int, num_tiles: int = 0) -> int:
    """Static capacity of the intersection buffer: max_intersections plus
    one CHUNK of spill slack (a tile's final partial chunk may read/write
    past `total`), rounded to 512 so the blocked Pallas transposes stay
    aligned. `num_tiles` is unused (kept for API stability)."""
    return ((max_intersections + CHUNK + 511) // 512) * 512


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
    conics: jax.Array = None,
    op_eff: jax.Array = None,
) -> BinnedIntersections:
    """Build the tile-sorted per-tile intersection lists.

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

    # ---- 1. tile spans in INPUT order (order-independent per-gaussian
    # math — computing them before the depth sort means the sort feeds
    # ONE packed [N, 2] gather instead of separate means2d/radii/valid
    # permutation gathers, the former top cost of this stage) ----------
    packed_in, counts_in = tile_spans(
        means2d, radii, valid, width=width, height=height,
        tile_size=tile_size, conics=conics, op_eff=op_eff,
    )

    # ---- 2. global depth sort (span words ride as sort payload — a
    # payload operand is far cheaper than a separate [N] permutation
    # gather afterwards). Zero-pair gaussians (culled, off-screen, or
    # zero-span) sort to the TAIL: every sorted index < n_live then owns
    # >= 1 pair, so sorted gaussian ids are PAIR-DENSE — any K
    # consecutive tile-sorted-then-gidx-sorted rows span < K distinct
    # consecutive ids, which the windowed segment-sum kernel
    # (segment_sum.py) relies on. -------------------------------------
    depth_key = jnp.where(counts_in > 0, depths, jnp.inf)
    # (depth, iota) as an explicit 2-key pair = stable semantics without
    # XLA's hidden stability-tiebreaker operand.
    _, perm, packed, counts = jax.lax.sort(
        (depth_key, jnp.arange(N, dtype=jnp.int32), packed_in, counts_in),
        num_keys=2, is_stable=False,
    )
    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if N > 0 else jnp.zeros((), jnp.int32)

    offsets = offsets.astype(jnp.int32)
    import os

    if (os.environ.get("MTGS_EXPAND") != "searchsorted"
            and jax.default_backend() == "tpu" and I % 512 == 0
            and I < (1 << 24) and N < (1 << 24)):
        # Pallas windowed expand: zero scatters, zero global scans (see
        # expand_pallas.py). The searchsorted formulation below is the
        # portable fallback (and an env-gated on-chip experiment that
        # measured SLOWER at 2M slots: searchsorted + the per-slot value
        # gathers price per row).
        from mtgs_tpu.raster.expand_pallas import expand_pairs

        tile, src = expand_pairs(
            offsets, packed, total, I, tiles_x=tiles_x, num_tiles=num_tiles
        )
    else:
        tile, src = searchsorted_expand(
            offsets, packed, total, I, tiles_x=tiles_x, num_tiles=num_tiles
        )

    # ---- 3. sort by tile id, depth order in-tile ---------------------
    # Within a tile src strictly increases in expansion (depth) order, so
    # (tile, src) as a 2-key non-stable sort reproduces the stable
    # by-tile sort exactly, minus the hidden tiebreaker operand; ties on
    # both keys exist only among dead sentinel slots (order irrelevant).
    tile_sorted, src_sorted = jax.lax.sort(
        (tile, src), num_keys=2, is_stable=False
    )

    # ---- 4. per-tile ranges (UNALIGNED — no re-layout) ----------------
    # Each tile's run [start, start+count) stays where the pair sort put
    # it. The blend kernels cover it with 128-ALIGNED DMA windows
    # starting at floor(start/128)*128 (Mosaic requires lane-dim
    # alignment) and mask lanes outside [head, head+count); gradient
    # windows shared between adjacent tiles accumulate via sequential
    # read-modify-write.
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)
    tcounts = (ends - starts).astype(jnp.int32)
    tile_base = (starts // CHUNK) * CHUNK
    tile_heads = starts - tile_base
    tile_nchunks = jnp.where(
        tcounts > 0, (tile_heads + tcounts + CHUNK - 1) // CHUNK, 0
    ).astype(jnp.int32)

    # Invariant actually relied on downstream: slots >= total carry SOME
    # depth-sorted gaussian id (a zero-pair/culled one when any exist; on
    # the Pallas expand path possibly several different window-truncated
    # ids clamped to N-1) whose gradient rows are EXACTLY ZERO
    # (zero-filled blend outputs), so segment sums are unaffected. Do NOT
    # assume dead slots repeat "the last live id" or that sorted gidx is
    # gap-free; only the zero-gradient property is guaranteed. The
    # capacity pad region gets the N sentinel.
    gidx = jnp.concatenate(
        [src_sorted, jnp.full((cap - I,), N, jnp.int32)]
    )

    # inverse gaussian permutation (input index -> sorted index)
    # perm is a permutation (unique keys): stability is meaningless
    _, inv_perm = jax.lax.sort(
        (perm, jnp.arange(N, dtype=jnp.int32)), num_keys=1, is_stable=False
    )

    return BinnedIntersections(
        perm=perm,
        inv_perm=inv_perm,
        gidx=gidx,
        tile_offsets=tile_base,
        tile_heads=tile_heads,
        tile_counts=tcounts,
        tile_nchunks=tile_nchunks,
        pair_offsets=offsets.astype(jnp.int32),
        pair_counts=counts.astype(jnp.int32),
        n_intersections=total,
    )
