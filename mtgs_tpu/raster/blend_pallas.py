"""Pallas TPU kernels for the per-tile alpha blend (forward + backward).

The performance path of the rasterizer (XLA-driver twin:
`blend_xla.py`; shared math: `chunk_math.py`). One `pallas_call` walks
all tiles (TPU grid = sequential + pipelined on the TensorCore); each
tile program:

  * reads its intersection range (aligned window start, head, count,
    nchunks) from scalar-prefetched SMEM (`PrefetchScalarGridSpec`),
  * DMAs (8, CHUNK) geometry/color slabs HBM->VMEM from 128-ALIGNED
    windows covering the tile's unaligned run [start, start+count) in
    sorted-pair order; lanes outside [head, head+count) belong to
    adjacent tiles and are masked to no-ops,
  * runs the chunk math (MXU matmuls for sigma/cumsum/accumulation),
  * early-exits the chunk loop once every pixel's transmittance is
    saturated (the TPU analog of the CUDA warp `done` break),
  * writes its (8, PIX) color block + (PIX,) final transmittance.

The backward kernel replays chunks front-to-back (no stored
per-intersection state; suffix terms recovered from the forward outputs)
and accumulates per-intersection gradients into HBM via
read-modify-write (boundary windows are shared between adjacent tiles
with complementary masks; the sequential ascending grid makes the
read-add-write race-free — no atomics). Early-exited and slack ranges
keep their zero-init (aliased zero inputs). The final per-gaussian
reduction is a sort+segment-sum outside the kernel.

Multi-chip: shard tiles across devices at the JAX level (shard_map over
the tile axis); each device runs this kernel on its tile subset.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtgs_tpu.raster import chunk_math as cm
from mtgs_tpu.raster.chunk_math import CHUNK, LOG_T_EPS, NUM_CH, NUM_GEOM


def _origin(tile_id, tiles_x: int, tile_size: int):
    ox = ((tile_id % tiles_x) * tile_size).astype(jnp.float32)
    oy = ((tile_id // tiles_x) * tile_size).astype(jnp.float32)
    return ox, oy


def _fwd_kernel(
    # scalar prefetch
    off_ref,    # 128-aligned window starts
    head_ref,   # first live lane within the first window
    cnt_ref,    # live pairs per tile
    nch_ref,    # aligned windows per tile
    # inputs (HBM)
    geom_hbm,
    col_hbm,
    # constants (VMEM)
    f_ref,
    lt_ref,
    # outputs (VMEM blocks)
    rgb_ref,
    tfin_ref,
    # scratch
    geom_s,
    col_s,
    sems,
    *,
    tile_size: int,
    tiles_x: int,
):
    t = pl.program_id(0)
    offset = off_ref[t]
    head = head_ref[t]
    count = cnt_ref[t]
    nch = nch_ref[t]
    ox, oy = _origin(t, tiles_x, tile_size)
    F = f_ref[:]
    LT = lt_ref[:]
    P = tile_size * tile_size

    def cond(state):
        k, carry = state
        return jnp.logical_and(k < nch, jnp.max(carry.log_t_all) > LOG_T_EPS)

    def body(state):
        k, carry = state
        idx = pl.multiple_of(offset + k * CHUNK, CHUNK)
        cp_g = pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(idx, CHUNK)], geom_s, sems.at[0]
        )
        cp_c = pltpu.make_async_copy(
            col_hbm.at[:, pl.ds(idx, CHUNK)], col_s, sems.at[1]
        )
        cp_g.start()
        cp_c.start()
        cp_g.wait()
        cp_c.wait()
        carry = cm.forward_chunk(
            carry, geom_s[:], col_s[:], ox, oy, F, LT,
            bounds=(head - k * CHUNK, head + count - k * CHUNK),
        )
        return k + 1, carry

    init = (jnp.zeros((), jnp.int32), cm.init_carry(tile_size))
    _, carry = jax.lax.while_loop(cond, body, init)
    rgb_ref[0] = carry.rgb
    tfin_ref[0] = jnp.exp(carry.log_t_out).reshape(1, P)


def blend_forward_pallas(
    geom_t: jax.Array,
    col_t: jax.Array,
    tile_offsets: jax.Array,
    tile_heads: jax.Array,
    tile_counts: jax.Array,
    tile_nchunks: jax.Array,
    *,
    tile_size: int,
    tiles_x: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (rgb_tiles [T, 8, PIX], t_final [T, PIX])."""
    T = tile_offsets.shape[0]
    P = tile_size * tile_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((P, NUM_GEOM), lambda t, *_: (0, 0)),
            pl.BlockSpec((CHUNK, CHUNK), lambda t, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, NUM_CH, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((NUM_GEOM, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_CH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, tile_size=tile_size, tiles_x=tiles_x)
    rgb, tfin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, NUM_CH, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_offsets, tile_heads, tile_counts, tile_nchunks, geom_t, col_t,
      cm.pixel_features(tile_size), cm.tri_inclusive(CHUNK))
    return rgb, tfin[:, 0, :]



def _bwd_kernel(
    off_ref,    # 128-aligned window starts
    head_ref,   # first live lane within the first window
    cnt_ref,    # live pairs per tile
    nch_ref,    # aligned windows per tile
    # inputs
    geom_hbm,
    col_hbm,
    f_ref,
    lt_ref,
    rgb_ref,     # [1, 8, P] forward accumulated color
    tfin_ref,    # [1, P]
    grgb_ref,    # [1, 8, P]
    gt_ref,      # [1, P]
    zg_geom_hbm,  # zero-filled [8, cap], aliased to g_geom_hbm
    zg_col_hbm,   # zero-filled [8, cap], aliased to g_col_hbm
    # outputs (HBM)
    g_geom_hbm,
    g_col_hbm,
    # scratch
    geom_s,
    col_s,
    gg_s,
    gc_s,
    ggp_s,
    gcp_s,
    sems,
    wsems,
    *,
    tile_size: int,
    tiles_x: int,
):
    t = pl.program_id(0)
    offset = off_ref[t]
    head = head_ref[t]
    count = cnt_ref[t]
    nch = nch_ref[t]
    ox, oy = _origin(t, tiles_x, tile_size)
    F = f_ref[:]
    LT = lt_ref[:]
    P = tile_size * tile_size

    grgb = grgb_ref[0]                       # [8, P]
    gt = gt_ref[0].reshape(P, 1)  # block (1,1,P) -> row -> column
    tf = tfin_ref[0].reshape(P, 1)
    total_dot = jnp.sum(grgb * rgb_ref[0], axis=0).reshape(P, 1)

    def cond(state):
        # Early exit mirroring the forward: once every pixel's
        # transmittance saturates, all later gaussians have w=0 and
        # mask=0, hence exactly-zero gradients — which the zero-filled
        # (aliased) output buffers already hold.
        k, carry = state
        return jnp.logical_and(k < nch, jnp.max(carry.log_t_all) > LOG_T_EPS)

    def body(state):
        k, carry = state
        idx = pl.multiple_of(offset + k * CHUNK, CHUNK)
        cp_g = pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(idx, CHUNK)], geom_s, sems.at[0]
        )
        cp_c = pltpu.make_async_copy(
            col_hbm.at[:, pl.ds(idx, CHUNK)], col_s, sems.at[1]
        )
        cp_g.start()
        cp_c.start()
        # Only a tile's FIRST window can be shared with earlier tiles
        # (window k>=1 starts at base + k*128 > previous tile's end), so
        # only k == 0 needs read-modify-write accumulation; interior
        # windows are untouched zeros and take a plain overwrite. The
        # sequential ascending grid makes the read-add-write race-free.
        first = k == 0

        @pl.when(first)
        def _():
            rd_g = pltpu.make_async_copy(
                g_geom_hbm.at[:, pl.ds(idx, CHUNK)], ggp_s, sems.at[2]
            )
            rd_c = pltpu.make_async_copy(
                g_col_hbm.at[:, pl.ds(idx, CHUNK)], gcp_s, sems.at[3]
            )
            rd_g.start()
            rd_c.start()
            rd_g.wait()
            rd_c.wait()

        cp_g.wait()
        cp_c.wait()
        g_geom, g_col, carry = cm.backward_chunk(
            carry, geom_s[:], col_s[:], ox, oy, grgb, gt, tf, total_dot, F, LT,
            bounds=(head - k * CHUNK, head + count - k * CHUNK),
        )
        firstf = first.astype(g_geom.dtype)
        gg_s[:] = g_geom + firstf * ggp_s[:]
        gc_s[:] = g_col + firstf * gcp_s[:]
        wr_g = pltpu.make_async_copy(
            gg_s, g_geom_hbm.at[:, pl.ds(idx, CHUNK)], wsems.at[0]
        )
        wr_c = pltpu.make_async_copy(
            gc_s, g_col_hbm.at[:, pl.ds(idx, CHUNK)], wsems.at[1]
        )
        wr_g.start()
        wr_c.start()
        wr_g.wait()
        wr_c.wait()
        return k + 1, carry

    init = (
        jnp.zeros((), jnp.int32),
        cm.BwdCarry(
            log_t_all=jnp.zeros((P, 1), jnp.float32),
            wg_cum=jnp.zeros((P, 1), jnp.float32),
        ),
    )
    jax.lax.while_loop(cond, body, init)


def blend_backward_pallas(
    geom_t: jax.Array,
    col_t: jax.Array,
    tile_offsets: jax.Array,
    tile_heads: jax.Array,
    tile_counts: jax.Array,
    tile_nchunks: jax.Array,
    rgb_tiles: jax.Array,
    t_final: jax.Array,
    g_rgb: jax.Array,
    g_t: jax.Array,
    *,
    tile_size: int,
    tiles_x: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns per-intersection (g_geom_t [8, cap], g_col_t [8, cap]).

    Output buffers are zero-initialized (aliased zero inputs), so slack
    capacity and early-exited chunk ranges hold exact zeros.
    """
    T = tile_offsets.shape[0]
    P = tile_size * tile_size
    cap = geom_t.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((P, NUM_GEOM), lambda t, *_: (0, 0)),
            pl.BlockSpec((CHUNK, CHUNK), lambda t, *_: (0, 0)),
            pl.BlockSpec((1, NUM_CH, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, NUM_CH, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((NUM_GEOM, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_CH, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_GEOM, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_CH, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_GEOM, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_CH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tile_size=tile_size, tiles_x=tiles_x)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NUM_GEOM, cap), jnp.float32),
            jax.ShapeDtypeStruct((NUM_CH, cap), jnp.float32),
        ],
        # zero-filled inputs donate their buffers to outputs 0/1
        # (indices count ALL operands, including the 4 scalar-prefetch args)
        input_output_aliases={12: 0, 13: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # sequential ascending grid: the spill-lane overwrite
            # protocol at unaligned tile boundaries depends on it
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        tile_offsets,
        tile_heads,
        tile_counts,
        tile_nchunks,
        geom_t,
        col_t,
        cm.pixel_features(tile_size),
        cm.tri_inclusive(CHUNK),
        rgb_tiles,
        t_final[:, None, :],
        g_rgb,
        g_t[:, None, :],
        jnp.zeros((NUM_GEOM, cap), jnp.float32),
        jnp.zeros((NUM_CH, cap), jnp.float32),
    )


def _transpose_kernel(in_ref, out_ref):
    out_ref[:] = in_ref[:].T


def rows_to_attr_major(rows: jax.Array, blk: int = 512) -> jax.Array:
    """[cap, W] -> [W, cap] transpose as a tiled Pallas kernel.

    XLA's transpose of a big gather output runs ~100x off memory
    bandwidth on TPU; a blocked VMEM transpose is ~free.
    """
    cap, w = rows.shape
    assert cap % blk == 0, (cap, blk)
    return pl.pallas_call(
        _transpose_kernel,
        grid=(cap // blk,),
        in_specs=[pl.BlockSpec((blk, w), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((w, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((w, cap), rows.dtype),
    )(rows)


def attr_major_to_rows(attrs: jax.Array, blk: int = 512) -> jax.Array:
    """[W, cap] -> [cap, W] blocked Pallas transpose (see rows_to_attr_major)."""
    w, cap = attrs.shape
    assert cap % blk == 0, (cap, blk)
    return pl.pallas_call(
        _transpose_kernel,
        grid=(cap // blk,),
        in_specs=[pl.BlockSpec((w, blk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((blk, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((cap, w), attrs.dtype),
    )(attrs)
