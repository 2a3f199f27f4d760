"""Pair expansion: (sorted gaussians, pair offsets) -> per-slot (tile, src).

TPU-native replacement for the scatter + prefix-scan expansion in
`binning.bin_gaussians` (itself the static-shape equivalent of gsplat's
`isect_tiles` CUDA kernel, `mtgs/scene_model/mtgs_scene_graph.py:640-662`).
The XLA formulation needs two 1M-row random scatters plus three
full-capacity prefix passes (~21 ms at 1M gaussians / 2M pairs — random
scatters price per row on TPU). This kernel produces the same (tile, src)
arrays with zero scatters and zero global scans.

Structure it exploits: `offsets` (exclusive prefix of per-gaussian pair
counts, depth-sorted order) is NON-DECREASING, and every live gaussian
owns >= 1 pair (zero-pair gaussians depth-sort to the tail), so the
owners of any B consecutive pair slots are at most B+1 CONSECUTIVE
gaussians starting at the owner of the block's first slot (gstart,
computed with one searchsorted over block boundaries). Per 512-slot
block the kernel:

  1. builds the indicator I1[j, s] = (off_win[j] <= s)  -- [WIN, B];
  2. one [8, WIN] x [WIN, B] MXU matmul of delta-encoded value rows
     against I1 telescopes out, per slot: the owner rank (count row),
     the owner's pair offset, and the owner's packed tile-span fields
     (values are < 2^24 so f32 accumulation is exact);
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

# r1 delta-telescoping kernel RESTORED after two measured regressions of
# a one-hot value-contraction rewrite (results/onchip/20260821_012844 and
# _041449 profile_classic: 28 -> 57 ms at B=256, -> 101 ms with the
# six-window variant at B=512 — the extra (WIN, 1)-layout column window
# and row streams dominate). The fused kernel (expand_fused.py) keeps
# the one-hot value design, which measured FASTER there (manual wide
# DMA amortizes the window differently).
B = 512          # pair slots per grid step
WIN = B + 128    # offset-window entries per block (owners <= B+1, padded)


def _kernel(gstart_ref, tot_ref, off_col_ref, off_row_ref, lo_row_ref,
            hi_row_ref, tile_ref, src_ref, *, tiles_x, num_tiles, n_gauss):
    k = pl.program_id(0)
    base = (k * B).astype(jnp.float32)
    s = base + jax.lax.broadcasted_iota(      # [1, B] (int iota: Mosaic
        jnp.int32, (1, B), 1).astype(jnp.float32)  # has no f32 iota)

    off_col = off_col_ref[0]                                      # [WIN, 1]
    i1 = (off_col <= s).astype(jnp.float32)                       # [WIN, B]

    def delta(row_ref):
        row = row_ref[0]                                          # [1, WIN]
        prev = jnp.concatenate(
            [jnp.zeros((1, 1), jnp.float32), row[:, :-1]], axis=1
        )
        return row - prev          # j=0 carries the full value (I1[0]=1)

    cnt = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.float32), jnp.ones((1, WIN - 1), jnp.float32)],
        axis=1,
    )
    vals = jnp.concatenate(
        [cnt, delta(off_row_ref), delta(lo_row_ref), delta(hi_row_ref),
         jnp.zeros((4, WIN), jnp.float32)],
        axis=0,
    )                                                             # [8, WIN]
    # HIGHEST: the value rows are integers up to 2^24 — a default-precision
    # f32 dot may lower to single-pass bf16 on the MXU and round them.
    g = jax.lax.dot_general(
        vals, i1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                             # [8, B]

    src_local, off_s, lo_s, hi_s = g[0:1], g[1:2], g[2:3], g[3:4]
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
    src = gstart_ref[k].astype(jnp.float32) + src_local
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
        [offsets, jnp.full((WIN,), I, jnp.int32)]).astype(jnp.float32)
    lo_pad = jnp.concatenate(
        [packed & 0x7FF, jnp.zeros((WIN,), jnp.int32)]).astype(jnp.float32)
    hi_pad = jnp.concatenate(
        [packed >> 11, jnp.zeros((WIN,), jnp.int32)]).astype(jnp.float32)

    def win(arr):
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(arr, (st,), (WIN,))
        )(gstart)

    # Row windows as [nblocks, 1, WIN] (and the column-vector window as
    # [nblocks, WIN, 1]): Mosaic requires the last two block dims to be
    # (8k, 128k) or equal to the array dims — (1, WIN) / (WIN, 1) blocks
    # of 2-D matrices violate that, but with these 3-D layouts each
    # block is exactly the array's own trailing dims.
    off_row = win(off_pad)[:, None, :]        # [nblocks, 1, WIN]
    lo_row = win(lo_pad)[:, None, :]
    hi_row = win(hi_pad)[:, None, :]
    off_col = win(off_pad)[:, :, None]        # [nblocks, WIN, 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                # gstart, total
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, WIN, 1), lambda i, gs, tt: (i, 0, 0)),
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
    )(gstart, total.reshape(1), off_col, off_row, lo_row, hi_row)
    return tile.reshape(I), src.reshape(I)
