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
a B-slot block are consecutive gaussians inside a WINA-wide window at
the 128-aligned anchor below the block's first owner. Per block the
kernel DMAs ONE attribute-major table window [W_tab, WINA] from HBM
(rows = attributes plus f32 index rows; see `table_index_rows`) and
computes:

  onehot[s, j] = (off[j] <= s) - (off[j+1] <= s)   # owner selector
  [attrs; off_s; lo_s; hi_s; idx_s] = rows[0:nw+4] @ onehot^T

ONE one-hot contraction fetches the attribute columns AND the owner's
integer fields (pair offset, packed span fields, global depth-sorted
index) — each output column is exactly one input column times 1.0, so
the copy is exact in f32 with no accumulation-order assumptions (the
earlier delta-telescoping formulation needed the MXU to accumulate
K sequentially; this one does not). The shifted `off_next` row is
precomputed in XLA when the table is built (Mosaic cannot shift slices
across sublane offsets inside the VMEM window).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_pallas import _db_dma

# B=256 halves the indicator/matmul area per slot vs the original 512:
# per block the one-hot contraction touches WINA*B cells, and WINA =
# skew + B + 1 shrinks with B, so total work across I/B blocks scales
# ~(B + 256) — 512 -> 256 cut the kernel's MXU area by ~1.9x (measured
# on-chip in profile_fused's expand stage).
B = 256        # pair slots per grid step
WINA = 384     # table-window width: 128-aligned anchor + <=127 head
               # skew + <=257 owners  ->  384 (a 128 multiple)
ALIGN = 128


def _kernel(gal_ref, tot_ref, tab_hbm, key_ref, src_ref,
            attr_ref, tab_s, sem, *, nw, tiles_x, num_tiles, n_gauss, sb):
    k = pl.program_id(0)
    g0 = pl.multiple_of(gal_ref[k], ALIGN)
    cp = pltpu.make_async_copy(
        tab_hbm.at[:, pl.ds(g0, WINA)], tab_s, sem.at[0]
    )
    cp.start()
    cp.wait()
    _compute(tab_s[:], g0, k, tot_ref, key_ref, src_ref,
             attr_ref, nw=nw, tiles_x=tiles_x, num_tiles=num_tiles,
             n_gauss=n_gauss, sb=sb)


def _kernel_db(gal_ref, tot_ref, tab_hbm, key_ref, src_ref,
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
    _compute(tab_s[k % 2], g0, k, tot_ref, key_ref, src_ref,
             attr_ref, nw=nw, tiles_x=tiles_x, num_tiles=num_tiles,
             n_gauss=n_gauss, sb=sb)


def _compute(win, g0, k, tot_ref, key_ref, src_ref, attr_ref,
             *, nw, tiles_x, num_tiles, n_gauss, sb):
    base = (k * B).astype(jnp.float32)
    s_col = base + jax.lax.broadcasted_iota(      # [B, 1] (int iota:
        jnp.int32, (B, 1), 0).astype(jnp.float32)  # Mosaic has no f32 iota)

    off_row = win[nw: nw + 1]                                    # [1, WINA]
    off_next = win[nw + 4: nw + 5]                # off shifted left by one
    # owner selector: 1 iff off[j] <= s < off[j+1]
    oht = (off_row <= s_col).astype(jnp.float32) - (
        off_next <= s_col).astype(jnp.float32)                   # [B, WINA]

    # ONE exact one-hot copy: attributes AND the owner's integer fields
    # (off / lo / hi / global index) are table rows [0, nw+4), so a
    # single [nw+4, WINA] x [WINA, B] contraction fetches everything.
    # Each output column is exactly one input column times 1.0 — exact
    # under HIGHEST (6 bf16 MXU passes) and EQUALLY exact under the
    # 3-pass value-side bf16 split (`dot_exact_rhs`: hi+mid+lo
    # reconstructs any f32 bit-for-bit and the one-hot side is 0/1),
    # which halves this kernel's MXU area (SORT_WALL §5's recovery
    # lever). Unlike the previous delta-telescoping formulation, no
    # accumulation-order assumption is needed (advisor r1 note): there
    # are no partial subset sums, only a one-hot selection.
    from mtgs_tpu.raster.chunk_math import dot_exact_rhs

    out = dot_exact_rhs(
        win[0: nw + 4], oht, (((1,), (1,)), ((), ()))
    )                                                            # [nw+4, B]
    attr_ref[0:nw] = out[0:nw]
    if attr_ref.shape[0] > nw:
        attr_ref[nw:] = jnp.zeros_like(attr_ref[nw:])
    off_s = out[nw: nw + 1]
    lo_s = out[nw + 1: nw + 2]
    hi_s = out[nw + 2: nw + 3]
    idx_s = out[nw + 3: nw + 4]   # owner's global depth-sorted index

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

    src = jnp.maximum(idx_s, 0.0)
    src_ref[0] = jnp.minimum(src, jnp.float32(n_gauss - 1)).astype(jnp.int32)


def fused_fits(max_intersections: int, num_tiles: int, n_gauss: int) -> bool:
    """Static gate: packed (tile << SB | slot) must fit in a positive
    int32, and the f32 one-hot value copies need values < 2^24."""
    sb = slot_bits(max_intersections)
    return (
        max_intersections % B == 0
        and max_intersections < (1 << 24)
        and n_gauss < (1 << 24)
        and ((num_tiles + 1) << sb) + max_intersections < (1 << 31)
    )


def slot_bits(max_intersections: int) -> int:
    return max(1, (max_intersections - 1).bit_length())


def table_index_rows(offsets, packed, n, n_pad, max_intersections, gal=None):
    """Builds the five index rows appended to the fused table, all in
    XLA (Mosaic cannot shift rows in-kernel across sublane offsets).
    Rows, in order (positions nw..nw+4 of the table):
    off (pad = I), lo = tmin_x, hi = tmin_y|span_x<<11, idx (global
    depth-sorted gaussian index), off_next (off shifted left; pad = I).
    Rows nw..nw+3 sit contiguously after the attributes so the kernel's
    single one-hot contraction covers [0, nw+4)."""
    I = max_intersections
    pad0 = n_pad - n
    off = jnp.pad(offsets.astype(jnp.float32), (0, pad0),
                  constant_values=float(I))
    lo = jnp.pad((packed & 0x7FF).astype(jnp.float32), (0, pad0))
    hi = jnp.pad((packed >> 11).astype(jnp.float32), (0, pad0))
    idx = jnp.pad(
        jnp.arange(n, dtype=jnp.float32), (0, pad0),
        constant_values=float(n - 1))
    off_next = jnp.concatenate(
        [off[1:], jnp.full((1,), float(I), jnp.float32)])
    return [off, lo, hi, idx, off_next]


def expand_fused(
    tab_am: jax.Array,    # [W_tab, n_pad] attr-major depth-sorted table;
                          # rows [0, nw) = attributes, rows [nw, nw+5) =
                          # the index rows from `table_index_rows`
    gal: jax.Array,       # [nblocks] int32 128-aligned window anchors
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
    assert w_tab >= nw + 5 and w_tab % 8 == 0, (w_tab, nw)
    assert tab_am.shape[1] % ALIGN == 0
    nblocks = I // B
    w_out = ((nw + 7) // 8) * 8
    double_buffer = _db_dma()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                # gal, total
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            # key/src as [nblocks, 1, B]: a (1, B) block of a 2-D
            # (nblocks, B) array violates Mosaic's (8k, 128k)-or-full
            # trailing-dims rule; the 3-D layout's (1, B) trailing dims
            # match the block exactly.
            pl.BlockSpec((1, 1, B), lambda i, gs, tt: (i, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda i, gs, tt: (i, 0, 0)),
            pl.BlockSpec((w_out, B), lambda i, gs, tt: (0, i)),
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
    )(gal, total.reshape(1), tab_am)
    return key.reshape(I), src.reshape(I), attrs
