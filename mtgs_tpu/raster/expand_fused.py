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
(rows = attributes plus f32 index rows off/lo/hi) and computes:

  I1[s, j]  = (off[j] <= s)                        # [B, WINA]
  onehot    = I1 - shift_left(I1)                  # owner selector
  attrs     = A @ onehot^T                         # exact f32 copy
  (rank, off_s, lo_s, hi_s) = delta-rows @ I1^T    # exact ints < 2^24

The one-hot matmul is EXACT in f32 (each output column is one input
times 1.0 plus zeros; bf16x3 recombination is lossless for both).
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


def _kernel(gal_ref, tot_ref, tab_hbm, key_ref, src_ref, attr_ref,
            tab_s, sem, *, nw, tiles_x, num_tiles, n_gauss, sb):
    k = pl.program_id(0)
    g0 = pl.multiple_of(gal_ref[k], ALIGN)
    cp = pltpu.make_async_copy(
        tab_hbm.at[:, pl.ds(g0, WINA)], tab_s, sem.at[0]
    )
    cp.start()
    cp.wait()
    _compute(tab_s[:], g0, k, tot_ref, key_ref, src_ref, attr_ref,
             nw=nw, tiles_x=tiles_x, num_tiles=num_tiles,
             n_gauss=n_gauss, sb=sb)


def _kernel_db(gal_ref, tot_ref, tab_hbm, key_ref, src_ref, attr_ref,
               tab_s, sem, *, nblocks, nw, tiles_x, num_tiles,
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
    _compute(tab_s[k % 2], g0, k, tot_ref, key_ref, src_ref, attr_ref,
             nw=nw, tiles_x=tiles_x, num_tiles=num_tiles,
             n_gauss=n_gauss, sb=sb)


def _compute(win, g0, k, tot_ref, key_ref, src_ref, attr_ref,
             *, nw, tiles_x, num_tiles, n_gauss, sb):
    base = (k * B).astype(jnp.float32)
    s_col = base + jax.lax.broadcasted_iota(jnp.float32, (B, 1), 0)  # [B,1]

    off_row = win[nw: nw + 1]                                    # [1, WINA]
    i1t = (off_row <= s_col).astype(jnp.float32)                 # [B, WINA]
    oht = i1t - jnp.concatenate(
        [i1t[:, 1:], jnp.zeros((B, 1), jnp.float32)], axis=1
    )

    # exact one-hot copy of the owner's attribute rows: [nw, B]
    attrs = jax.lax.dot_general(
        win[0:nw], oht, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    attr_ref[0:nw] = attrs
    if attr_ref.shape[0] > nw:
        attr_ref[nw:] = jnp.zeros_like(attr_ref[nw:])

    # owner rank + telescoped integer fields (all values < 2^24: exact)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINA), 1)
    cnt = (lane >= 1).astype(jnp.float32)

    def delta(row):
        prev = jnp.concatenate(
            [jnp.zeros((1, 1), jnp.float32), row[:, :-1]], axis=1
        )
        return row - prev

    vals = jnp.concatenate(
        [cnt, delta(win[nw: nw + 1]), delta(win[nw + 1: nw + 2]),
         delta(win[nw + 2: nw + 3]),
         jnp.zeros((4, WINA), jnp.float32)],
        axis=0,
    )                                                            # [8, WINA]
    g = jax.lax.dot_general(
        vals, i1t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                            # [8, B]
    rank, off_s, lo_s, hi_s = g[0:1], g[1:2], g[2:3], g[3:4]

    # packed fields: lo = tmin_x (11 bits); hi = tmin_y | span_x << 11
    span_x = jnp.maximum(jnp.floor((hi_s + 0.5) / 2048.0), 1.0)
    tmin_y = hi_s - jnp.floor((hi_s + 0.5) / 2048.0) * 2048.0
    s_row = base + jax.lax.broadcasted_iota(jnp.float32, (1, B), 1)
    local = s_row - off_s
    ly = jnp.floor((local + 0.5) / span_x)
    lx = local - ly * span_x
    tile = (tmin_y + ly) * tiles_x + (lo_s + lx)

    total = tot_ref[0]
    live = s_row < total.astype(jnp.float32)
    tile_i = jnp.where(live, tile, jnp.float32(num_tiles)).astype(jnp.int32)
    slot_i = s_row.astype(jnp.int32)
    key_ref[...] = (tile_i << sb) | slot_i

    src = g0.astype(jnp.float32) + rank
    src_ref[...] = jnp.minimum(src, jnp.float32(n_gauss - 1)).astype(jnp.int32)


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


def expand_fused(
    tab_am: jax.Array,    # [W_tab, n_pad] attr-major depth-sorted table;
                          # rows [0, nw) = attributes, nw = offsets (f32,
                          # pad rows = I), nw+1 = lo, nw+2 = hi
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
    assert w_tab >= nw + 3 and w_tab % 8 == 0, (w_tab, nw)
    assert tab_am.shape[1] % ALIGN == 0
    nblocks = I // B
    w_out = ((nw + 7) // 8) * 8
    double_buffer = _db_dma()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                # gal, total
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, B), lambda i, gs, tt: (i, 0)),
            pl.BlockSpec((1, B), lambda i, gs, tt: (i, 0)),
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
            jax.ShapeDtypeStruct((nblocks, B), jnp.int32),
            jax.ShapeDtypeStruct((nblocks, B), jnp.int32),
            jax.ShapeDtypeStruct((w_out, I), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(gal, total.reshape(1), tab_am)
    return key.reshape(I), src.reshape(I), attrs
