"""Pallas TPU kernels for the per-tile alpha blend (forward + backward).

The performance path of the rasterizer (XLA-driver twin:
`blend_xla.py`; shared math: `chunk_math.py`). One `pallas_call` walks
all tiles (TPU grid = sequential + pipelined on the TensorCore); each
tile program:

  * reads its intersection range (aligned window start, head, count,
    nchunks) from scalar-prefetched SMEM (`PrefetchScalarGridSpec`),
  * DMAs ONE (6 + c_total, CHUNK) geometry+color slab HBM->VMEM from
    128-ALIGNED windows covering the tile's unaligned run
    [start, start+count) in sorted-pair order; lanes outside
    [head, head+count) belong to adjacent tiles and are masked to
    no-ops,
  * runs the chunk math (MXU matmuls for sigma/cumsum/accumulation),
  * early-exits the chunk loop once every pixel's transmittance is
    saturated (the TPU analog of the CUDA warp `done` break),
  * writes its (c_total, PIX) color block + (PIX,) final transmittance.

The backward kernel replays chunks front-to-back (no stored
per-intersection state; suffix terms recovered from the forward outputs)
and accumulates per-intersection gradients into HBM. Boundary windows
shared between adjacent tiles (complementary masks) read-modify-write on
each tile's FIRST window only — interior windows are untouched zeros —
and the sequential ascending grid makes that race-free (no atomics).
Early-exited and slack ranges keep their zero-init (aliased zero
inputs). The final per-gaussian reduction is a sort+segment-sum outside
the kernel.

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
from mtgs_tpu.raster.chunk_math import CHUNK, LOG_T_EPS


def _db_dma() -> bool:
    """Double-buffered chunk DMA — DEFAULT ON. On-chip (results/onchip,
    1M gaussians, 960x540 fwd+bwd): classic 95.5 -> 68.5 ms, fused
    70.8 -> 68.6 ms. Set MTGS_DB_DMA=0 to fall back to single-buffer."""
    import os

    return os.environ.get("MTGS_DB_DMA", "1") != "0"


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
    base_ref,   # [1] global index of tile row 0 (tile-sharded render)
    # inputs (HBM)
    slab_hbm,   # [6 + c_total, cap]
    # constants (VMEM)
    f_ref,
    lt_ref,
    # outputs (VMEM blocks)
    rgb_ref,
    tfin_ref,
    # scratch
    slab_s,
    sems,
    *,
    tile_size: int,
    tiles_x: int,
    c_total: int,
):
    t = pl.program_id(0)
    offset = off_ref[t]
    head = head_ref[t]
    count = cnt_ref[t]
    nch = nch_ref[t]
    ox, oy = _origin(base_ref[0] + t, tiles_x, tile_size)
    F = f_ref[:]
    LT = lt_ref[:]
    P = tile_size * tile_size

    def cond(state):
        k, carry = state
        return jnp.logical_and(k < nch, jnp.max(carry.log_t_all) > LOG_T_EPS)

    def body(state):
        k, carry = state
        idx = pl.multiple_of(offset + k * CHUNK, CHUNK)
        cp = pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(idx, CHUNK)], slab_s, sems.at[0]
        )
        cp.start()
        cp.wait()
        carry = cm.forward_chunk(
            carry, slab_s[0: cm.NUM_GEOM + c_total], ox, oy, F, LT,
            bounds=(head - k * CHUNK, head + count - k * CHUNK),
        )
        return k + 1, carry

    init = (jnp.zeros((), jnp.int32), cm.init_carry(tile_size, c_total))
    _, carry = jax.lax.while_loop(cond, body, init)
    rgb_ref[0] = carry.rgb
    tfin_ref[0] = jnp.exp(carry.log_t_out).reshape(1, P)


def _fwd_kernel_db(
    off_ref, head_ref, cnt_ref, nch_ref, base_ref,
    slab_hbm, f_ref, lt_ref,
    rgb_ref, tfin_ref,
    slab_s,     # [2, W, CHUNK] double buffer
    sems,       # DMA sems [2]
    *,
    tile_size: int,
    tiles_x: int,
    c_total: int,
):
    """Double-buffered variant of `_fwd_kernel`: chunk k+1's HBM->VMEM
    copy is issued before chunk k's math, hiding the per-chunk DMA
    latency behind the VPU/MXU work (opt-in via MTGS_DB_DMA=1)."""
    t = pl.program_id(0)
    offset = off_ref[t]
    head = head_ref[t]
    count = cnt_ref[t]
    nch = nch_ref[t]
    ox, oy = _origin(base_ref[0] + t, tiles_x, tile_size)
    F = f_ref[:]
    LT = lt_ref[:]
    P = tile_size * tile_size

    def copy(k, buf):
        idx = pl.multiple_of(offset + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(idx, CHUNK)], slab_s.at[buf], sems.at[buf]
        )

    @pl.when(nch > 0)
    def _():
        copy(0, 0).start()

    def cond(state):
        k, carry = state
        return jnp.logical_and(k < nch, jnp.max(carry.log_t_all) > LOG_T_EPS)

    def body(state):
        k, carry = state

        @pl.when(k + 1 < nch)
        def _():
            copy(k + 1, (k + 1) % 2).start()

        copy(k, k % 2).wait()
        carry = cm.forward_chunk(
            carry, slab_s[k % 2, 0: cm.NUM_GEOM + c_total], ox, oy, F, LT,
            bounds=(head - k * CHUNK, head + count - k * CHUNK),
        )
        return k + 1, carry

    init = (jnp.zeros((), jnp.int32), cm.init_carry(tile_size, c_total))
    ke, carry = jax.lax.while_loop(cond, body, init)

    # early exit leaves chunk ke's prefetch (issued by iteration ke-1)
    # in flight — drain it so the kernel ends with quiet semaphores
    @pl.when(jnp.logical_and(ke > 0, ke < nch))
    def _():
        copy(ke, ke % 2).wait()

    rgb_ref[0] = carry.rgb
    tfin_ref[0] = jnp.exp(carry.log_t_out).reshape(1, P)


def blend_forward_pallas(
    slab_t: jax.Array,        # [8-aligned W >= 6 + c_total, cap]
    tile_offsets: jax.Array,
    tile_heads: jax.Array,
    tile_counts: jax.Array,
    tile_nchunks: jax.Array,
    *,
    tile_size: int,
    tiles_x: int,
    c_total: int,
    interpret: bool = False,
    tile_base=None,   # [] or [1] global index of tile row 0
) -> Tuple[jax.Array, jax.Array]:
    """Returns (rgb_tiles [T, c_total, PIX], t_final [T, PIX])."""
    T = tile_offsets.shape[0]
    P = tile_size * tile_size
    W = slab_t.shape[0]
    ct = c_total
    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    tile_base = jnp.asarray(tile_base, jnp.int32).reshape(1)
    double_buffer = _db_dma()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((P, cm.NUM_GEOM), lambda t, *_: (0, 0)),
            pl.BlockSpec((CHUNK, CHUNK), lambda t, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ct, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                ((2, W, CHUNK) if double_buffer else (W, CHUNK)), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((2,) if double_buffer else (1,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel_db if double_buffer else _fwd_kernel,
        tile_size=tile_size, tiles_x=tiles_x, c_total=ct,
    )
    rgb, tfin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, ct, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_offsets, tile_heads, tile_counts, tile_nchunks, tile_base,
      slab_t, cm.pixel_features(tile_size), cm.tri_inclusive(CHUNK))
    return rgb, tfin[:, 0, :]


def _bwd_kernel(
    off_ref,    # 128-aligned window starts
    head_ref,   # first live lane within the first window
    cnt_ref,    # live pairs per tile
    nch_ref,    # aligned windows per tile
    base_ref,   # [1] global index of tile row 0 (tile-sharded training)
    # inputs
    slab_hbm,
    f_ref,
    lt_ref,
    rgb_ref,     # [1, c_total, P] forward accumulated color
    tfin_ref,    # [1, 1, P]
    grgb_ref,    # [1, c_total, P]
    gt_ref,      # [1, 1, P]
    zg_hbm,      # zero-filled [W, cap], aliased to g_hbm
    # outputs (HBM)
    g_hbm,
    # scratch
    slab_s,
    gg_s,
    ggp_s,
    sems,
    wsems,
    *,
    tile_size: int,
    tiles_x: int,
    c_total: int,
):
    t = pl.program_id(0)
    offset = off_ref[t]
    head = head_ref[t]
    count = cnt_ref[t]
    nch = nch_ref[t]
    ox, oy = _origin(base_ref[0] + t, tiles_x, tile_size)
    F = f_ref[:]
    LT = lt_ref[:]
    P = tile_size * tile_size

    grgb = grgb_ref[0]                       # [c_total, P]
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
        cp = pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(idx, CHUNK)], slab_s, sems.at[0]
        )
        cp.start()
        # Only a tile's FIRST window can be shared with earlier tiles
        # (window k>=1 starts at base + k*128 > previous tile's end), so
        # only k == 0 needs read-modify-write accumulation; interior
        # windows are untouched zeros and take a plain overwrite. The
        # sequential ascending grid makes the read-add-write race-free.
        first = k == 0

        @pl.when(first)
        def _():
            rd = pltpu.make_async_copy(
                g_hbm.at[:, pl.ds(idx, CHUNK)], ggp_s, sems.at[1]
            )
            rd.start()
            rd.wait()

        cp.wait()
        g_slab, carry = cm.backward_chunk(
            carry, slab_s[0: cm.NUM_GEOM + c_total], ox, oy, grgb, gt, tf,
            total_dot, F, LT,
            bounds=(head - k * CHUNK, head + count - k * CHUNK),
        )
        live_w = cm.NUM_GEOM + c_total
        firstf = first.astype(g_slab.dtype)
        gg_s[0:live_w] = g_slab + firstf * ggp_s[0:live_w]
        if gg_s.shape[0] > live_w:
            gg_s[live_w:] = jnp.zeros_like(gg_s[live_w:])
        wr = pltpu.make_async_copy(
            gg_s, g_hbm.at[:, pl.ds(idx, CHUNK)], wsems.at[0]
        )
        wr.start()
        wr.wait()
        return k + 1, carry

    init = (
        jnp.zeros((), jnp.int32),
        cm.BwdCarry(
            log_t_all=jnp.zeros((P, 1), jnp.float32),
            wg_cum=jnp.zeros((P, 1), jnp.float32),
        ),
    )
    jax.lax.while_loop(cond, body, init)


def _bwd_kernel_db(
    off_ref, head_ref, cnt_ref, nch_ref, base_ref,
    slab_hbm, f_ref, lt_ref,
    rgb_ref, tfin_ref, grgb_ref, gt_ref, zg_hbm,
    g_hbm,
    slab_s,     # [2, W, CHUNK]
    gg_s,       # [2, W, CHUNK]
    ggp_s,      # [W, CHUNK] RMW partial of the shared first window
    sems,       # DMA sems [3]: read buf 0/1 + RMW read
    wsems,      # DMA sems [2]: write buf 0/1
    *,
    tile_size: int,
    tiles_x: int,
    c_total: int,
):
    """Double-buffered backward (opt-in via MTGS_DB_DMA=1): chunk k+1's
    slab read prefetches before chunk k's math, and chunk k's gradient
    write-back stays in flight through iteration k+1 (windows within a
    tile are disjoint; all writes drain before the program ends, so the
    cross-tile shared-first-window RMW stays race-free)."""
    t = pl.program_id(0)
    offset = off_ref[t]
    head = head_ref[t]
    count = cnt_ref[t]
    nch = nch_ref[t]
    ox, oy = _origin(base_ref[0] + t, tiles_x, tile_size)
    F = f_ref[:]
    LT = lt_ref[:]
    P = tile_size * tile_size
    live_w = cm.NUM_GEOM + c_total

    grgb = grgb_ref[0]
    gt = gt_ref[0].reshape(P, 1)
    tf = tfin_ref[0].reshape(P, 1)
    total_dot = jnp.sum(grgb * rgb_ref[0], axis=0).reshape(P, 1)

    def rcopy(k, buf):
        idx = pl.multiple_of(offset + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(idx, CHUNK)], slab_s.at[buf], sems.at[buf]
        )

    def wcopy(k, buf):
        idx = pl.multiple_of(offset + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            gg_s.at[buf], g_hbm.at[:, pl.ds(idx, CHUNK)], wsems.at[buf]
        )

    @pl.when(nch > 0)
    def _():
        rcopy(0, 0).start()

    def cond(state):
        k, carry = state
        return jnp.logical_and(k < nch, jnp.max(carry.log_t_all) > LOG_T_EPS)

    def body(state):
        k, carry = state

        @pl.when(k + 1 < nch)
        def _():
            rcopy(k + 1, (k + 1) % 2).start()

        first = k == 0

        @pl.when(first)
        def _():
            idx0 = pl.multiple_of(offset, CHUNK)
            rd = pltpu.make_async_copy(
                g_hbm.at[:, pl.ds(idx0, CHUNK)], ggp_s, sems.at[2]
            )
            rd.start()
            rd.wait()

        rcopy(k, k % 2).wait()
        g_slab, carry = cm.backward_chunk(
            carry, slab_s[k % 2, 0:live_w], ox, oy, grgb, gt, tf,
            total_dot, F, LT,
            bounds=(head - k * CHUNK, head + count - k * CHUNK),
        )
        # reclaim this write buffer from the write issued 2 chunks ago
        @pl.when(k >= 2)
        def _():
            wcopy(k - 2, k % 2).wait()

        firstf = first.astype(g_slab.dtype)
        gg_s[k % 2, 0:live_w] = g_slab + firstf * ggp_s[0:live_w]
        if gg_s.shape[1] > live_w:
            gg_s[k % 2, live_w:] = jnp.zeros_like(gg_s[k % 2, live_w:])
        wcopy(k, k % 2).start()
        return k + 1, carry

    init = (
        jnp.zeros((), jnp.int32),
        cm.BwdCarry(
            log_t_all=jnp.zeros((P, 1), jnp.float32),
            wg_cum=jnp.zeros((P, 1), jnp.float32),
        ),
    )
    ke, _ = jax.lax.while_loop(cond, body, init)

    # drain: writes ke-2 / ke-1 and (on early exit) the ke read prefetch
    @pl.when(ke >= 2)
    def _():
        wcopy(ke - 2, ke % 2).wait()

    @pl.when(ke >= 1)
    def _():
        wcopy(ke - 1, (ke - 1) % 2).wait()

    @pl.when(jnp.logical_and(ke > 0, ke < nch))
    def _():
        rcopy(ke, ke % 2).wait()


def blend_backward_pallas(
    slab_t: jax.Array,
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
    c_total: int,
    interpret: bool = False,
    tile_base=None,   # [] or [1] global index of tile row 0
) -> jax.Array:
    """Returns per-intersection g_slab_t [W, cap] (pad rows zero).

    Output buffer is zero-initialized (aliased zero input), so slack
    capacity and early-exited chunk ranges hold exact zeros.
    """
    T = tile_offsets.shape[0]
    P = tile_size * tile_size
    W, cap = slab_t.shape
    ct = c_total
    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    tile_base = jnp.asarray(tile_base, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((P, cm.NUM_GEOM), lambda t, *_: (0, 0)),
            pl.BlockSpec((CHUNK, CHUNK), lambda t, *_: (0, 0)),
            pl.BlockSpec((1, ct, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, ct, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((2, W, CHUNK), jnp.float32),
                pltpu.VMEM((2, W, CHUNK), jnp.float32),
                pltpu.VMEM((W, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if _db_dma()
            else [
                pltpu.VMEM((W, CHUNK), jnp.float32),
                pltpu.VMEM((W, CHUNK), jnp.float32),
                pltpu.VMEM((W, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((1,)),
            ]
        ),
    )
    kernel = functools.partial(
        _bwd_kernel_db if _db_dma() else _bwd_kernel,
        tile_size=tile_size, tiles_x=tiles_x, c_total=ct,
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((W, cap), jnp.float32)],
        # zero-filled input donates its buffer to output 0
        # (indices count ALL operands, including the 5 scalar-prefetch args)
        input_output_aliases={12: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # sequential ascending grid: the boundary-window RMW protocol
            # depends on it
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        tile_offsets,
        tile_heads,
        tile_counts,
        tile_nchunks,
        tile_base,
        slab_t,
        cm.pixel_features(tile_size),
        cm.tri_inclusive(CHUNK),
        rgb_tiles,
        t_final[:, None, :],
        g_rgb,
        g_t[:, None, :],
        jnp.zeros((W, cap), jnp.float32),
    )
    return out


def _transpose_kernel(in_ref, out_ref):
    w = in_ref.shape[1]
    out_ref[0:w] = in_ref[:].T
    if out_ref.shape[0] > w:
        out_ref[w:] = jnp.zeros_like(out_ref[w:])


def rows_to_attr_major(rows: jax.Array, blk: int = 512, *, interpret: bool = False) -> jax.Array:
    """[cap, W] -> [round_up(W, 8), cap] transpose as a tiled Pallas kernel
    (pad rows are zeros — Mosaic DMA slices need 8-aligned sublane dims).

    XLA's transpose of a big gather output runs ~100x off memory
    bandwidth on TPU; a blocked VMEM transpose is ~free.
    """
    cap, w = rows.shape
    w_pad = ((w + 7) // 8) * 8
    assert cap % blk == 0, (cap, blk)
    return pl.pallas_call(
        _transpose_kernel,
        grid=(cap // blk,),
        in_specs=[pl.BlockSpec((blk, w), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((w_pad, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((w_pad, cap), rows.dtype),
        interpret=interpret,
    )(rows)


def attr_major_to_rows(attrs: jax.Array, blk: int = 512, *, interpret: bool = False) -> jax.Array:
    """[W, cap] -> [cap, W] blocked Pallas transpose (see rows_to_attr_major)."""
    w, cap = attrs.shape
    assert cap % blk == 0, (cap, blk)
    return pl.pallas_call(
        _transpose_kernel,
        grid=(cap // blk,),
        in_specs=[pl.BlockSpec((w, blk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((blk, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((cap, w), attrs.dtype),
        interpret=interpret,
    )(attrs)
