"""Pair expansion: (sorted gaussians, pair offsets) -> per-slot (tile, src).

TPU-native replacement for the scatter + prefix-scan expansion in
`binning.bin_gaussians` (itself the static-shape equivalent of gsplat's
`isect_tiles` CUDA kernel, `mtgs/scene_model/mtgs_scene_graph.py:640-662`).
The XLA formulations need either 1M-row random scatters or full-capacity
random gathers — both price per row on TPU (the searchsorted variant in
`binning.py` measured 181 ms end-to-end vs 68 ms for this kernel at 1M
gaussians). This kernel produces the same (tile, src) arrays with zero
scatters, zero gathers and zero global scans.

Structure it exploits: `offsets` (exclusive prefix of per-gaussian pair
counts, depth-sorted order) is NON-DECREASING, and every live gaussian
owns >= 1 pair (zero-pair gaussians depth-sort to the tail), so the
owners of any B consecutive pair slots are at most B+1 CONSECUTIVE
gaussians starting at the owner of the block's first slot (gstart,
computed with one searchsorted over block boundaries). Per B-slot block
the kernel:

  1. builds the owner selector
     onehot[j, s] = (off[j] <= s) - (off[j+1] <= s)      # [WIN, B]
  2. ONE [8, WIN] x [WIN, B] MXU contraction of the VALUE rows
     (pair offset, packed-span lo/hi fields, global gaussian index)
     against the selector — each output column is exactly one input
     column times 1.0, so the copy is exact in f32 with no
     accumulation-order assumptions;
  3. decodes local pair rank -> (tile row, tile col) with the exact
     float floor-division trick (margins >= 0.5/255 >> f32 ulp).

Slots >= total get the sentinel tile (they sort to the tail of the tile
sort and are excluded from every tile's range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# B=512 (measured): this kernel's per-block cost is dominated by the
# fixed overhead of its six BlockSpec window transfers, NOT MXU area —
# B=256 doubled the block count and regressed the classic binning stage
# 28 -> 57 ms on-chip (results/onchip/20260821_012844/profile_classic).
# (expand_fused.py is the opposite: one manual wide DMA per block, MXU
# area dominates, and B=256 helps there.)
B = 512          # pair slots per grid step
WIN = B + 128    # offset-window entries per block (owners <= B+1, padded)


def _kernel(gstart_ref, tot_ref, off_col_ref, offn_col_ref, off_row_ref,
            lo_row_ref, hi_row_ref, idx_row_ref, tile_ref, src_ref,
            *, tiles_x, num_tiles, n_gauss):
    k = pl.program_id(0)
    base = (k * B).astype(jnp.float32)
    s = base + jax.lax.broadcasted_iota(      # [1, B] (int iota: Mosaic
        jnp.int32, (1, B), 1).astype(jnp.float32)  # has no f32 iota)

    off_col = off_col_ref[0]                                      # [WIN, 1]
    offn_col = offn_col_ref[0]
    # owner selector: 1 iff off[j] <= s < off[j+1]
    oht = (off_col <= s).astype(jnp.float32) - (
        offn_col <= s).astype(jnp.float32)                        # [WIN, B]

    vals = jnp.concatenate(
        [off_row_ref[0], lo_row_ref[0], hi_row_ref[0], idx_row_ref[0],
         jnp.zeros((4, WIN), jnp.float32)],
        axis=0,
    )                                                             # [8, WIN]
    # HIGHEST: native f32 MXU passes — a default-precision dot may lower
    # to single-pass bf16 and round the < 2^24 integer values. One-hot
    # selection: each output column is one input column times 1.0.
    g = jax.lax.dot_general(
        vals, oht, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                             # [8, B]

    off_s, lo_s, hi_s, idx_s = g[0:1], g[1:2], g[2:3], g[3:4]
    # packed fields: lo = tmin_x (11 bits); hi = tmin_y | span_x << 11
    span_x = jnp.maximum(jnp.floor((hi_s + 0.5) / 2048.0), 1.0)
    tmin_y = hi_s - jnp.floor((hi_s + 0.5) / 2048.0) * 2048.0
    local = s - off_s
    ly = jnp.floor((local + 0.5) / span_x)
    lx = local - ly * span_x
    tile = (tmin_y + ly) * tiles_x + (lo_s + lx)

    total = tot_ref[0]
    live = s < total.astype(jnp.float32)
    tile_ref[0] = jnp.where(
        live, tile, jnp.float32(num_tiles)).astype(jnp.int32)
    src = jnp.maximum(idx_s, 0.0)
    src_ref[0] = jnp.minimum(src, jnp.float32(n_gauss - 1)).astype(jnp.int32)


def expand_pairs(
    offsets: jax.Array,   # [N] int32 exclusive pair-count prefix, sorted order
    packed: jax.Array,    # [N] int32 tmin_x | tmin_y << 11 | span_x << 22
    total: jax.Array,     # [] int32 true pair count
    max_intersections: int,
    *,
    tiles_x: int,
    num_tiles: int,
    interpret: bool = False,
):
    """Returns (tile [I] int32 w/ sentinel num_tiles on dead slots,
    src [I] int32 owner index into the depth-sorted gaussian arrays)."""
    N = offsets.shape[0]
    I = max_intersections
    assert I % B == 0 and I < (1 << 24) and N < (1 << 24), (I, N)
    nblocks = I // B

    bounds = jnp.arange(nblocks, dtype=jnp.int32) * B
    gstart = (
        jnp.searchsorted(offsets, bounds, side="right").astype(jnp.int32) - 1
    )
    gstart = jnp.clip(gstart, 0, N - 1)

    # f32 window source rows (pad offset I: > any slot, never indicated)
    off_pad = jnp.concatenate(
        [offsets, jnp.full((WIN + 1,), I, jnp.int32)]).astype(jnp.float32)
    lo_pad = jnp.concatenate(
        [packed & 0x7FF, jnp.zeros((WIN,), jnp.int32)]).astype(jnp.float32)
    hi_pad = jnp.concatenate(
        [packed >> 11, jnp.zeros((WIN,), jnp.int32)]).astype(jnp.float32)
    idx_pad = jnp.concatenate(
        [jnp.arange(N, dtype=jnp.float32),
         jnp.full((WIN,), float(N - 1), jnp.float32)])
    offn_pad = off_pad[1:]

    def win(arr):
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(arr, (st,), (WIN,))
        )(gstart)

    # Row windows as [nblocks, 1, WIN] (and the column-vector windows as
    # [nblocks, WIN, 1]): Mosaic requires the last two block dims to be
    # (8k, 128k) or equal to the array dims — (1, WIN) / (WIN, 1) blocks
    # of 2-D matrices violate that, but with these 3-D layouts each
    # block is exactly the array's own trailing dims.
    off_row = win(off_pad)[:, None, :]        # [nblocks, 1, WIN]
    lo_row = win(lo_pad)[:, None, :]
    hi_row = win(hi_pad)[:, None, :]
    idx_row = win(idx_pad)[:, None, :]
    off_col = win(off_pad)[:, :, None]        # [nblocks, WIN, 1]
    offn_col = win(offn_pad)[:, :, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                # gstart, total
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, WIN, 1), lambda i, gs, tt: (i, 0, 0)),
            pl.BlockSpec((1, WIN, 1), lambda i, gs, tt: (i, 0, 0)),
            pl.BlockSpec((1, 1, WIN), lambda i, gs, tt: (i, 0, 0)),
            pl.BlockSpec((1, 1, WIN), lambda i, gs, tt: (i, 0, 0)),
            pl.BlockSpec((1, 1, WIN), lambda i, gs, tt: (i, 0, 0)),
            pl.BlockSpec((1, 1, WIN), lambda i, gs, tt: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, B), lambda i, gs, tt: (i, 0, 0)),
            pl.BlockSpec((1, 1, B), lambda i, gs, tt: (i, 0, 0)),
        ],
    )
    tile, src = pl.pallas_call(
        functools.partial(
            _kernel, tiles_x=tiles_x, num_tiles=num_tiles, n_gauss=N
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((nblocks, 1, B), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(gstart, total.reshape(1), off_col, offn_col, off_row, lo_row,
      hi_row, idx_row)
    return tile.reshape(I), src.reshape(I)
