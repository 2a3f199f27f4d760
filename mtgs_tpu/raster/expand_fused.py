"""Fused pair expansion: depth-sorted table -> per-slot (sort key, owner,
attribute columns), ready for an attribute-payload tile sort.

Motivation (the fused fast path of `rasterize.py`): the classic path
materializes intersections with TWO full-capacity random row gathers
(`table[perm]` at N rows, `table_pad[gidx]` at capacity rows) — random
gathers are the slowest data-movement primitive on TPU (they price per
row; see `segment_sum.py`). This kernel instead produces, per pair slot
in DEPTH order:

  * `key  = tile << SB | slot` — an int32 that a single-operand
    NON-stable `lax.sort` orders exactly like the reference's stable
    (tile, depth) radix sort (slot index encodes depth order),
  * `src` — the owning gaussian's index into the depth-sorted arrays
    (the segment key for the backward's per-gaussian reduction),
  * the owner's full attribute row (means2d/conic/opacity/colors),
    EXACTLY copied via a one-hot MXU matmul.

so the pair sort can carry the attributes as payload operands and the
random gathers disappear (gsplat's `isect_tiles` + the implicit
attribute gather of `rasterize_to_pixels`,
`mtgs/scene_model/mtgs_scene_graph.py:640-662`, in one pass).

Same structural facts as `expand_pallas.py`: `offsets` is
non-decreasing and every live gaussian owns >= 1 pair, so the owners of
a 512-slot block are consecutive gaussians inside a 768-wide window at
the 128-aligned anchor below the block's first owner. Per block the
kernel DMAs ONE attribute-major table window [W_tab, 768] from HBM
(rows = attributes plus f32 index rows; see `table_index_rows`) and
computes:

  I1[s, j]  = (off[j] <= s)                        # [B, WINA]
  onehot    = I1 - I1_next   (off_next row)        # owner selector
  attrs     = A @ onehot^T                         # exact f32 copy
  (d_off, d_lo, d_hi, cnt) = delta-rows @ I1^T     # exact ints < 2^24
  off_s/lo_s/hi_s = base[k] + d_*                  # telescoped sums

The delta rows (exclusive first differences of off/lo/hi) and the
shifted `off_next` row are precomputed in XLA when the table is built:
Mosaic cannot concatenate slices that live at different sublane
offsets inside the VMEM window, so every shift/difference the kernel
would need is hoisted into table rows, and the per-block base values
`row[anchor-1]` ride in as scalar-prefetch operands. The one-hot
matmul is EXACT in f32 (each output column is one input times 1.0 plus
zeros; bf16x3 recombination is lossless for both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_pallas import _db_dma

B = 512        # pair slots per grid step
WINA = 768     # table-window width: 128-aligned anchor + <=127 head
               # skew + <=513 owners  ->  640, padded to a 128 multiple
ALIGN = 128


def _kernel(gal_ref, tot_ref, base_ref, tab_hbm, key_ref, src_ref,
            attr_ref, tab_s, sem, *, nw, tiles_x, num_tiles, n_gauss, sb):
    k = pl.program_id(0)
    g0 = pl.multiple_of(gal_ref[k], ALIGN)
    cp = pltpu.make_async_copy(
        tab_hbm.at[:, pl.ds(g0, WINA)], tab_s, sem.at[0]
    )
    cp.start()
    cp.wait()
    _compute(tab_s[:], g0, k, tot_ref, base_ref, key_ref, src_ref,
             attr_ref, nw=nw, tiles_x=tiles_x, num_tiles=num_tiles,
             n_gauss=n_gauss, sb=sb)


def _kernel_db(gal_ref, tot_ref, base_ref, tab_hbm, key_ref, src_ref,
               attr_ref, tab_s, sem, *, nblocks, nw, tiles_x, num_tiles,
               n_gauss, sb):
    """Double-buffered variant (opt-in via MTGS_DB_DMA=1): block k+1's
    window copy is issued before block k's math. The grid dimension is
    sequential ("arbitrary") and scratch persists across steps, so the
    prefetch issued at step k is ready by step k+1."""
    k = pl.program_id(0)

    def copy(j, buf):
        g = pl.multiple_of(gal_ref[j], ALIGN)
        return pltpu.make_async_copy(
            tab_hbm.at[:, pl.ds(g, WINA)], tab_s.at[buf], sem.at[buf]
        )

    @pl.when(k == 0)
    def _():
        copy(0, 0).start()

    @pl.when(k + 1 < nblocks)
    def _():
        copy(k + 1, (k + 1) % 2).start()

    copy(k, k % 2).wait()
    g0 = pl.multiple_of(gal_ref[k], ALIGN)
    _compute(tab_s[k % 2], g0, k, tot_ref, base_ref, key_ref, src_ref,
             attr_ref, nw=nw, tiles_x=tiles_x, num_tiles=num_tiles,
             n_gauss=n_gauss, sb=sb)


def _compute(win, g0, k, tot_ref, base_ref, key_ref, src_ref, attr_ref,
             *, nw, tiles_x, num_tiles, n_gauss, sb):
    base = (k * B).astype(jnp.float32)
    s_col = base + jax.lax.broadcasted_iota(      # [B, 1] (int iota:
        jnp.int32, (B, 1), 0).astype(jnp.float32)  # Mosaic has no f32 iota)

    off_row = win[nw: nw + 1]                                    # [1, WINA]
    off_next = win[nw + 1: nw + 2]                # off shifted left by one
    i1t = (off_row <= s_col).astype(jnp.float32)                 # [B, WINA]
    # owner selector: 1 iff off[j] <= s < off[j+1]
    oht = i1t - (off_next <= s_col).astype(jnp.float32)

    # exact one-hot copy of the owner's attribute rows: [nw, B]
    attrs = jax.lax.dot_general(
        win[0:nw], oht, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    attr_ref[0:nw] = attrs
    if attr_ref.shape[0] > nw:
        attr_ref[nw:] = jnp.zeros_like(attr_ref[nw:])

    # telescoped integer fields via the precomputed global delta rows
    # (exclusive first differences): sum_{j indicated} D_row[j] =
    # row[owner] - row[anchor-1], and the scalar-prefetched base_ref[k] =
    # row[anchor-1] adds the rest.
    #
    # Exactness assumption (advisor r1): the TELESCOPED result and the
    # row values are < 2^24, but individual D rows are signed and an
    # arbitrary-order partial subset sum of D_hi could transiently exceed
    # 2^24 for very wide spans. Precision.HIGHEST makes the MXU
    # accumulate this contraction in f32 adds whose partials are bounded
    # by max_j |prefix up to j| only under left-to-right order; on TPU the
    # systolic accumulation IS sequential over K, so partials telescope
    # and stay < 2^24. `validate_fused` runs fused-vs-classic forward and
    # gradient parity ON CHIP at bench scale (results/onchip/*/
    # validate_fused.log) — corrupted off_s/lo_s/hi_s from a reordered
    # contraction would show up there as render/grad mismatches.
    vals = win[nw + 2: nw + 6]                                   # [4, WINA]
    g = jax.lax.dot_general(
        vals, i1t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                            # [4, B]
    off_s = base_ref[0, k].astype(jnp.float32) + g[0:1]
    lo_s = base_ref[1, k].astype(jnp.float32) + g[1:2]
    hi_s = base_ref[2, k].astype(jnp.float32) + g[2:3]
    # ones-row count: src = g0 + (#indicated live rows) - 1 = owner index
    rank = g[3:4] - 1.0

    # packed fields: lo = tmin_x (11 bits); hi = tmin_y | span_x << 11
    span_x = jnp.maximum(jnp.floor((hi_s + 0.5) / 2048.0), 1.0)
    tmin_y = hi_s - jnp.floor((hi_s + 0.5) / 2048.0) * 2048.0
    s_row = base + jax.lax.broadcasted_iota(
        jnp.int32, (1, B), 1).astype(jnp.float32)
    local = s_row - off_s
    ly = jnp.floor((local + 0.5) / span_x)
    lx = local - ly * span_x
    tile = (tmin_y + ly) * tiles_x + (lo_s + lx)

    total = tot_ref[0]
    live = s_row < total.astype(jnp.float32)
    tile_i = jnp.where(live, tile, jnp.float32(num_tiles)).astype(jnp.int32)
    slot_i = s_row.astype(jnp.int32)
    key_ref[0] = (tile_i << sb) | slot_i

    src = jnp.maximum(g0.astype(jnp.float32) + rank, 0.0)
    src_ref[0] = jnp.minimum(src, jnp.float32(n_gauss - 1)).astype(jnp.int32)


def fused_fits(max_intersections: int, num_tiles: int, n_gauss: int) -> bool:
    """Static gate: packed (tile << SB | slot) must fit in a positive
    int32, and the integer telescoping needs values < 2^24."""
    sb = slot_bits(max_intersections)
    return (
        max_intersections % B == 0
        and max_intersections < (1 << 24)
        and n_gauss < (1 << 24)
        and ((num_tiles + 1) << sb) + max_intersections < (1 << 31)
    )


def slot_bits(max_intersections: int) -> int:
    return max(1, (max_intersections - 1).bit_length())


def table_index_rows(offsets, packed, n, n_pad, max_intersections, gal):
    """Builds the six index rows appended to the fused table plus the
    per-block scalar base values, all in XLA (Mosaic cannot shift /
    difference rows in-kernel across sublane offsets). Rows, in order:
    off (pad = I), off_next (off shifted left; pad = I), D_off / D_lo /
    D_hi (exclusive first differences), ones (live-row count).
    Returns (rows list of [n_pad] f32, base [3, nblocks] int32)."""
    I = max_intersections
    pad0 = n_pad - n
    off = jnp.pad(offsets.astype(jnp.float32), (0, pad0),
                  constant_values=float(I))
    lo = jnp.pad((packed & 0x7FF).astype(jnp.float32), (0, pad0))
    hi = jnp.pad((packed >> 11).astype(jnp.float32), (0, pad0))
    off_next = jnp.concatenate(
        [off[1:], jnp.full((1,), float(I), jnp.float32)])

    def excl_diff(row):
        return row - jnp.concatenate([jnp.zeros((1,), row.dtype), row[:-1]])

    ones = jnp.pad(jnp.ones((n,), jnp.float32), (0, pad0))
    rows = [off, off_next, excl_diff(off), excl_diff(lo), excl_diff(hi),
            ones]
    prev = jnp.maximum(gal - 1, 0)
    base = jnp.where(
        gal[None, :] > 0,
        jnp.stack([off[prev], lo[prev], hi[prev]]).astype(jnp.int32),
        0,
    )
    return rows, base


def expand_fused(
    tab_am: jax.Array,    # [W_tab, n_pad] attr-major depth-sorted table;
                          # rows [0, nw) = attributes, rows [nw, nw+6) =
                          # the index rows from `table_index_rows`
    gal: jax.Array,       # [nblocks] int32 128-aligned window anchors
    base: jax.Array,      # [3, nblocks] int32 per-block off/lo/hi bases
    total: jax.Array,     # [] int32 true pair count
    max_intersections: int,
    *,
    nw: int,
    tiles_x: int,
    num_tiles: int,
    n_gauss: int,
    interpret: bool = False,
):
    """Returns (key [I] i32, src [I] i32, attrs [round_up(nw, 8), I] f32)."""
    I = max_intersections
    sb = slot_bits(I)
    assert fused_fits(I, num_tiles, n_gauss), (I, num_tiles, n_gauss)
    w_tab = tab_am.shape[0]
    assert w_tab >= nw + 6 and w_tab % 8 == 0, (w_tab, nw)
    assert tab_am.shape[1] % ALIGN == 0
    nblocks = I // B
    w_out = ((nw + 7) // 8) * 8
    double_buffer = _db_dma()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,                # gal, total, base
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            # key/src as [nblocks, 1, B]: a (1, B) block of a 2-D
            # (nblocks, B) array violates Mosaic's (8k, 128k)-or-full
            # trailing-dims rule; the 3-D layout's (1, B) trailing dims
            # match the block exactly.
            pl.BlockSpec((1, 1, B), lambda i, gs, tt, bs: (i, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda i, gs, tt, bs: (i, 0, 0)),
            pl.BlockSpec((w_out, B), lambda i, gs, tt, bs: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                ((2, w_tab, WINA) if double_buffer else (w_tab, WINA)),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((2,) if double_buffer else (1,)),
        ],
    )
    kernel = functools.partial(
        _kernel_db, nblocks=nblocks,
    ) if double_buffer else _kernel
    key, src, attrs = pl.pallas_call(
        functools.partial(
            kernel, nw=nw, tiles_x=tiles_x, num_tiles=num_tiles,
            n_gauss=n_gauss, sb=sb,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((nblocks, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((w_out, I), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(gal, total.reshape(1), base, tab_am)
    return key.reshape(I), src.reshape(I), attrs
