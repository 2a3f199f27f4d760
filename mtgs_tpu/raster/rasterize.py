"""Public differentiable rasterization API.

TPU-native equivalent of `gsplat.rendering.rasterization` as consumed by
the reference at `mtgs/scene_model/mtgs_scene_graph.py:640-662`
(OpenDriveLab/MTGS): projection -> binning -> per-tile blend, fully under
`jax.grad` via a custom VJP around the Pallas blend kernels.

Extras beyond the gsplat signature, reflecting JAX's functional autodiff:

* `tap2d`: a zeros-[N,2] array added to the projected 2D means. Its
  gradient equals the screen-space means2d gradient — the functional
  replacement for the reference's `info["means2d"].retain_grad()`
  (`mtgs_scene_graph.py:666-668`).
* `absgrad_sink`: a zeros-[N,2] array ignored by the forward; its
  "gradient" is the absolute-value screen-gradient accumulation
  (sum over tiles of |per-tile means2d gradient|) — gsplat's `absgrad`
  densification signal (`mtgs_scene_graph.py:657,1171-1177`).

Both are ordinary inputs: `jax.grad` w.r.t. them yields the densify
statistics in the same backward pass as the parameter gradients.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtgs_tpu.raster import binning
from mtgs_tpu.raster.blend_pallas import blend_backward_pallas, blend_forward_pallas
from mtgs_tpu.raster.blend_reference import blend_reference
from mtgs_tpu.raster.blend_xla import blend_backward_xla, blend_forward_xla
from mtgs_tpu.raster.chunk_math import CHUNK, MAX_CH, NUM_GEOM
from mtgs_tpu.raster.projection import project_gaussians

_LOG = logging.getLogger(__name__)
_UNSHARDED_WARNED: set = set()


class RasterizeConfig(NamedTuple):
    """Static rasterization settings (hashable; part of the jit cache key)."""

    width: int
    height: int
    tile_size: int = 32
    near_plane: float = 0.01
    far_plane: float = 1e10
    rasterize_mode: str = "classic"      # "classic" | "antialiased"
    render_mode: str = "RGB"             # "RGB" | "RGB+D" | "RGB+ED" | "D" | "ED"
    max_intersections: int = 1 << 20
    backend: str = "auto"                # "auto" | "pallas" | "xla" | "reference"
    interpret: bool = False              # run Pallas in interpreter mode
    fused: bool = True                   # attr-payload sort path (pallas only;
    # the faster configuration on-chip — results/onchip/*/profile_*.log:
    # 72 ms vs 97 ms fwd+bwd at 1M gaussians; falls back to the classic
    # gather path when fused_fits() fails or the backend is not pallas)

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_size)

    @property
    def with_depth(self) -> bool:
        return "D" in self.render_mode

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return "pallas" if jax.default_backend() == "tpu" else "xla"


class _BlendStatics(NamedTuple):
    tile_size: int
    tiles_x: int
    backend: str
    interpret: bool
    c_total: int


def _f0(a):
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend(statics, slab_t, tile_offsets, tile_heads, tile_counts, tile_nchunks,
           tile_base):
    out, _ = _blend_fwd(
        statics, slab_t, tile_offsets, tile_heads, tile_counts, tile_nchunks,
        tile_base,
    )
    return out


def _blend_fwd(statics, slab_t, tile_offsets, tile_heads, tile_counts,
               tile_nchunks, tile_base):
    if statics.backend == "pallas":
        rgb, tfin = blend_forward_pallas(
            slab_t, tile_offsets, tile_heads, tile_counts, tile_nchunks,
            tile_size=statics.tile_size, tiles_x=statics.tiles_x,
            c_total=statics.c_total, interpret=statics.interpret,
            tile_base=tile_base,
        )
    else:
        rgb, tfin = blend_forward_xla(
            slab_t, tile_offsets, tile_heads, tile_counts, tile_nchunks,
            tile_size=statics.tile_size, tiles_x=statics.tiles_x,
            c_total=statics.c_total, tile_base=tile_base,
        )
    res = (slab_t, tile_offsets, tile_heads, tile_counts, tile_nchunks,
           tile_base, rgb, tfin)
    return (rgb, tfin), res


def _blend_bwd(statics, res, cot):
    (slab_t, tile_offsets, tile_heads, tile_counts, tile_nchunks, tile_base,
     rgb, tfin) = res
    g_rgb, g_t = cot
    if statics.backend == "pallas":
        g_slab_t = blend_backward_pallas(
            slab_t, tile_offsets, tile_heads, tile_counts, tile_nchunks,
            rgb, tfin, g_rgb, g_t,
            tile_size=statics.tile_size, tiles_x=statics.tiles_x,
            c_total=statics.c_total, interpret=statics.interpret,
            tile_base=tile_base,
        )
    else:
        g_slab_t = blend_backward_xla(
            slab_t, tile_offsets, tile_heads, tile_counts, tile_nchunks,
            rgb, tfin, g_rgb, g_t,
            tile_size=statics.tile_size, tiles_x=statics.tiles_x,
            c_total=statics.c_total, tile_base=tile_base,
        )
    # Slack capacity regions of both backends' outputs are exact zeros
    # (aliased zero-init in Pallas, zeros+scatter in XLA), so the
    # downstream sort-based reduction needs no masking.
    return (
        g_slab_t,
        _f0(tile_offsets), _f0(tile_heads), _f0(tile_counts), _f0(tile_nchunks),
        _f0(tile_base),
    )


_blend.defvjp(_blend_fwd, _blend_bwd)


# ------------------------------------------------------------------------
# Intersection gather with scatter-free backward.
#
# The forward is a plain gather (sorted-pad-gather-transpose). Its
# natural VJP is a 4M-row scatter-add — which SERIALIZES on TPU (~400 ms
# at 1M gaussians). Instead: co-sort the per-slot gradient rows by
# gaussian id (gidx) — a multi-operand `lax.sort` is ~5x cheaper on TPU
# than the equivalent full-capacity random gather — which makes each
# gaussian's contributions CONTIGUOUS, then segment-reduce with one
# cumsum + a boundary gather at the pair-offset prefix. The absgrad
# densify signal rides the same machinery on |d means2d| columns.
# ------------------------------------------------------------------------

class _GatherStatics(NamedTuple):
    c_total: int          # live color channels (incl. depth if present)
    max_intersections: int


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_intersections(statics, table, binned, sink):
    out, _ = _gather_fwd(statics, table, binned, sink)
    return out


def _gather_fwd(statics, table, binned, sink):
    n = table.shape[0]
    # ONE (6 + c_total)-wide gather table (geom|col) — random-index
    # gathers are the TPU bottleneck; one pass over the indices, no
    # structurally-zero columns.
    table_pad = jnp.concatenate(
        [table[binned.perm], jnp.zeros((1, table.shape[1]), table.dtype)]
    )
    rows = table_pad[binned.gidx]
    if jax.default_backend() == "tpu":
        from mtgs_tpu.raster.blend_pallas import rows_to_attr_major

        slab_t = rows_to_attr_major(rows)  # [W8, cap] via Pallas (XLA's own
        # transpose of gather outputs costs ~40ms at this size); rows are
        # zero-padded to a multiple of 8 for DMA tiling.
    else:
        w = rows.shape[1]
        w_pad = ((w + 7) // 8) * 8
        slab_t = jnp.pad(rows, ((0, 0), (0, w_pad - w))).T
    return slab_t, (binned, n)


def _gather_bwd(statics, res, cot):
    binned, n = res
    g_slab_t = cot  # [W, cap] attr-major, zero on dead slots
    ct = statics.c_total
    nw = NUM_GEOM + ct
    # gradient rows ride the by-gaussian sort as payload operands —
    # the cheapest way to move column data through a permutation on TPU
    # (random gathers price per row; see _gather_fused_fwd's note)
    rows = [g_slab_t[i] for i in range(nw)]
    (gidx_s,), s = payload_sort((binned.gidx,), rows)
    srt = (gidx_s, *s)

    if jax.default_backend() == "tpu" and not os.environ.get("MTGS_NO_SEGSUM"):
        # MXU windowed segment sum over the sorted rows (the last two
        # rows carry absgrad = sum of |per-tile d means2d|, gsplat's
        # densify signal) — see segment_sum.py for why this beats the
        # cumsum + boundary-gather fallback below.
        from mtgs_tpu.raster.blend_pallas import attr_major_to_rows
        from mtgs_tpu.raster.segment_sum import dense_segment_sum

        w_pad = ((nw + 2 + 7) // 8) * 8
        rows16 = jnp.concatenate(
            [
                jnp.stack([*s, jnp.abs(s[0]), jnp.abs(s[1])], axis=0),
                jnp.zeros((w_pad - nw - 2, s[0].shape[0]), s[0].dtype),
            ]
        )
        sums_t = dense_segment_sum(rows16, srt[0], n)   # [w_pad, n_out]
        seg = attr_major_to_rows(sums_t)[binned.inv_perm]
    else:
        # [cap, 6+ct+2] sorted rows + absgrad columns
        cols = jnp.stack([*s, jnp.abs(s[0]), jnp.abs(s[1])], axis=-1)
        # Segment reduce: after the sort, sorted-gaussian g's
        # contributions occupy [min(pair_offsets[g], L),
        # min(pair_offsets[g+1], L)) where L = min(total,
        # max_intersections) is the live-slot count; dead slots
        # (gidx == N) sort last and hold zeros.
        cs = jnp.cumsum(cols, axis=0)
        cs0 = jnp.concatenate([jnp.zeros((1, cols.shape[1]), cols.dtype), cs])
        last = binned.pair_offsets[-1:] + binned.pair_counts[-1:]
        bounds = jnp.minimum(
            jnp.concatenate([binned.pair_offsets, last]),
            statics.max_intersections,
        )
        G = cs0[bounds]
        seg = (G[1:] - G[:-1])[binned.inv_perm]  # [N, 6+ct+2] input order

    g_table = seg[:, :nw]
    absgrad = seg[:, nw: nw + 2]
    return (g_table, jax.tree.map(_f0, binned), absgrad)


_gather_intersections.defvjp(_gather_fwd, _gather_bwd)


# ------------------------------------------------------------------------
# Fused path: attributes ride the sorts as payload operands.
#
# The classic path's top data-movement costs are two full-capacity random
# row gathers (`table[perm]`, `table_pad[gidx]`) plus an inv_perm gather
# in the backward. Here every permutation is a multi-operand `lax.sort`
# (sequential-access merge passes) and the depth-order expansion is a
# Pallas windowed one-hot kernel (expand_fused.py):
#   fwd: ONE sort((depth, iota), spans + table cols)  -> depth-sorted
#        table + permutation (iota doubles as the stability tiebreaker
#        AND the perm payload)
#        expand_fused                     -> per-slot key/src/attr columns
#        sort(key, attr cols)             -> tile-sorted slab (+ ranges)
#   bwd: sort(slot, grad cols)            -> depth-slot-ordered grads
#        dense_segment_sum keyed by src   -> per-sorted-gaussian sums
#        sort(perm, sum cols)             -> input-order gradients
# ------------------------------------------------------------------------

class _FusedStatics(NamedTuple):
    c_total: int
    max_intersections: int
    num_tiles: int
    tiles_x: int
    interpret: bool


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _sort_avoiding_cliff(operands, num_keys: int):
    """`lax.sort`, padding the operand count off the 11-operand cliff.

    The on-chip microbench (results/onchip/*/microbench.log) shows an
    ~5x latency cliff at EXACTLY 11 operands (0.61 ms vs 0.08 @ 5 and
    0.11 @ 13 for n=1M) — XLA's sort tiling degenerates there. RGB
    rendering (c_total=4, nw=10) hits 11 operands on every fused sort;
    one zero dummy operand sidesteps it.
    """
    ops = list(operands)
    if len(ops) == 11:
        ops.append(jnp.zeros_like(ops[-1]))
        out = jax.lax.sort(tuple(ops), num_keys=num_keys, is_stable=False)
        return out[:-1]
    return jax.lax.sort(tuple(ops), num_keys=num_keys, is_stable=False)


def payload_sort(key_ops, payload_ops, *, num_keys=None):
    """Multi-operand `lax.sort` with f32 payload compression.

    MTGS_SORT_PACK=1 packs pairs of f32 payload operands into ONE
    complex64 operand (re/im — both arrays transported bit-for-bit, so
    the pack is EXACT; only genuine-f32 columns are packed, never
    bitcast ints, whose NaN patterns XLA may not preserve).

    MEASURED NEUTRAL on-chip, so OFF by default: with packing enabled
    the four fused-path sorts time identically (11.75/9.92/5.72/4.61 ms,
    trace 2026-08-21 vs results/onchip/20260821_060110/profile_fused) —
    XLA sort cost scales with payload BYTES, not operand count (or XLA
    decomposes c64 into re/im pairs before sorting). Kept as the
    measurement harness for that fact and in case a future XLA changes
    the trade-off.

    Returns (sorted_keys_tuple, sorted_payloads_list) in input order.
    """
    num_keys = num_keys or len(key_ops)
    if os.environ.get("MTGS_SORT_PACK", "0") == "0":
        srt = _sort_avoiding_cliff(
            (*key_ops, *payload_ops), num_keys=num_keys)
        return srt[:num_keys], list(srt[num_keys:])
    f32_idx = [i for i, p in enumerate(payload_ops)
               if p.dtype == jnp.float32]
    other_idx = [i for i, p in enumerate(payload_ops)
                 if p.dtype != jnp.float32]
    packed = [
        jax.lax.complex(payload_ops[f32_idx[2 * j]],
                        payload_ops[f32_idx[2 * j + 1]])
        for j in range(len(f32_idx) // 2)
    ]
    tail = [payload_ops[f32_idx[-1]]] if len(f32_idx) % 2 else []
    srt = _sort_avoiding_cliff(
        (*key_ops, *packed, *tail, *(payload_ops[i] for i in other_idx)),
        num_keys=num_keys,
    )
    res = [None] * len(payload_ops)
    pos = num_keys
    for j in range(len(packed)):
        res[f32_idx[2 * j]] = jnp.real(srt[pos])
        res[f32_idx[2 * j + 1]] = jnp.imag(srt[pos])
        pos += 1
    if tail:
        res[f32_idx[-1]] = srt[pos]
        pos += 1
    for i in other_idx:
        res[i] = srt[pos]
        pos += 1
    return srt[:num_keys], res


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_fused(statics, table, packed_in, counts_in, depths, sink):
    out, _ = _gather_fused_fwd(statics, table, packed_in, counts_in, depths, sink)
    return out


def _gather_fused_fwd(statics, table, packed_in, counts_in, depths, sink):
    import os

    n, nw = table.shape
    I = statics.max_intersections
    cap = binning.padded_capacity(I)

    if os.environ.get("MTGS_EXPAND") != "searchsorted":
        return _gather_fused_fwd_pallas_expand(
            statics, table, packed_in, counts_in, depths)

    # ---- MTGS_EXPAND=searchsorted experiment (NOT the default) ----
    # Replaces the windowed expand + payload sorts with searchsorted +
    # full-capacity random row gathers. MEASURED 3x SLOWER on-chip
    # (results/onchip: 210.8 ms vs 68.5 at 1M gaussians): random gathers
    # price per ROW (~tens of ns each over 2M rows) and searchsorted
    # lowers poorly, while multi-operand sorts move the same data at
    # ~1 ms/operand. Kept as a measured negative result.
    # 1. depth sort of the per-gaussian span words ONLY (4 operands).
    depth_key = jnp.where(
        counts_in > 0, jax.lax.stop_gradient(depths), jnp.inf
    )
    _, perm, packed, counts = jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32), packed_in, counts_in),
        num_keys=2, is_stable=False,
    )
    offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    total = offsets[-1] + counts[-1]

    # 2. scatter-free kernel-free expansion: owner + tile per depth slot
    sb = slot_bits_of(I)
    tile, src = binning.searchsorted_expand(
        offsets, packed, total, I,
        tiles_x=statics.tiles_x, num_tiles=statics.num_tiles,
    )
    key = (tile << sb) | jnp.arange(I, dtype=jnp.int32)

    # 3. pair sort of (key, src) only, then ONE composed gather of the
    # owner's attribute row in input order: idx = perm[src_sorted]
    key_s, src_sorted = jax.lax.sort((key, src), num_keys=1, is_stable=False)
    idx = perm[src_sorted]
    rows = table[idx]  # [I, nw]
    if jax.default_backend() == "tpu" and not statics.interpret:
        from mtgs_tpu.raster.blend_pallas import rows_to_attr_major

        rows = jnp.concatenate(
            [rows, jnp.zeros((cap - I, nw), rows.dtype)])
        slab_t = rows_to_attr_major(rows)
    else:
        w_pad = _round8(nw)
        slab_t = jnp.pad(rows, ((0, cap - I), (0, w_pad - nw))).T
    return (slab_t, key_s, total), (key_s, src, perm, n)


def slot_bits_of(max_intersections: int) -> int:
    from mtgs_tpu.raster.expand_fused import slot_bits

    return slot_bits(max_intersections)


def _gather_fused_fwd_pallas_expand(statics, table, packed_in, counts_in, depths):
    """Default fused forward: attributes ride the sorts as payload
    operands and the windowed Pallas kernel expands pairs. At 2M slots a
    multi-operand sort moves attribute columns ~10x cheaper than random
    row gathers (which price per row), so payload sorts beat the
    searchsorted+gather formulation above (measured on-chip)."""
    from mtgs_tpu.raster.expand_fused import (
        ALIGN, WINA, expand_fused, table_index_rows,
    )

    n, nw = table.shape
    I = statics.max_intersections
    cap = binning.padded_capacity(I)
    n_pad = ((n + ALIGN - 1) // ALIGN) * ALIGN + WINA

    depth_key = jnp.where(
        counts_in > 0, jax.lax.stop_gradient(depths), jnp.inf
    )
    (_, perm), pls = payload_sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32)),
        [packed_in, counts_in, *(table[:, j] for j in range(nw))],
        num_keys=2,
    )
    packed, counts = pls[0], pls[1]
    offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    total = offsets[-1] + counts[-1]
    gal = binning.window_anchors(offsets, I)

    pad0 = n_pad - n
    rows = [jnp.pad(r, (0, pad0)) for r in pls[2:]]
    rows += table_index_rows(offsets, packed, n, n_pad, I)
    w_tab = _round8(nw + 5)
    rows += [jnp.zeros((n_pad,), jnp.float32)] * (w_tab - nw - 5)
    tab_am = jnp.stack(rows)

    key, src, attrs = expand_fused(
        tab_am, gal, total, I,
        nw=nw, tiles_x=statics.tiles_x, num_tiles=statics.num_tiles,
        n_gauss=n, interpret=statics.interpret,
    )

    (key_s,), attr_s = payload_sort(
        (key,), [attrs[j] for j in range(nw)]
    )
    w_pad = _round8(nw)
    slab_t = jnp.pad(
        jnp.stack(attr_s + [jnp.zeros((I,), jnp.float32)] * (w_pad - nw)),
        ((0, 0), (0, cap - I)),
    )
    return (slab_t, key_s, total), (key_s, src, perm, n)


def _gather_fused_bwd(statics, res, cot):
    from mtgs_tpu.raster.expand_fused import slot_bits
    from mtgs_tpu.raster.segment_sum import dense_segment_sum

    key_s, src, perm, n = res
    g_slab_t, _, _ = cot
    nw = NUM_GEOM + statics.c_total
    I = statics.max_intersections

    # back to depth-slot order (slot is a permutation: non-stable is
    # exact). Gradient rows ride as SORT PAYLOADS — at 2M elements a
    # payload operand costs ~1 ms while a random gather of the same data
    # prices per row (~10x more); see the searchsorted experiment note
    # in _gather_fused_fwd.
    slot = key_s & ((1 << slot_bits(I)) - 1)
    _, s = payload_sort(
        (slot,), [g_slab_t[j, :I] for j in range(nw)]
    )

    # MXU windowed segment sum keyed by the slot-order owner ids (the
    # fused gate guarantees I % 512 == 0; interpret covers CPU tests)
    w_pad = _round8(nw + 2)
    rows = jnp.concatenate(
        [
            jnp.stack([*s, jnp.abs(s[0]), jnp.abs(s[1])], axis=0),
            jnp.zeros((w_pad - nw - 2, I), s[0].dtype),
        ]
    )
    sums_t = dense_segment_sum(rows, src, n, interpret=statics.interpret)
    sum_rows = [sums_t[j, :n] for j in range(nw + 2)]

    # sorted-gaussian order -> input order (payload sort, not a gather)
    _, outs = payload_sort((perm,), sum_rows)
    g_table = jnp.stack(outs[:nw], axis=-1)
    absgrad = jnp.stack(outs[nw: nw + 2], axis=-1)
    return (
        g_table, _f0(perm), _f0(perm),
        jnp.zeros((n,), jnp.float32), absgrad,
    )


_gather_fused.defvjp(_gather_fused_fwd, _gather_fused_bwd)


def _fused_pipeline(fstat, bstat, table, packed_in, counts_in, depths, sink,
                    tile_base):
    """expand -> attr-payload pair sort -> per-tile ranges -> blend for
    ONE tile range (the full image, or one shard's tile-row band)."""
    from mtgs_tpu.raster.expand_fused import slot_bits

    I = fstat.max_intersections
    slab_t, key_s, n_isect = _gather_fused(
        fstat, table, packed_in, counts_in, depths, sink
    )
    q = jnp.arange(fstat.num_tiles + 1, dtype=jnp.int32) << slot_bits(I)
    bounds = jnp.searchsorted(key_s, q, side="left").astype(jnp.int32)
    starts, tcounts = bounds[:-1], bounds[1:] - bounds[:-1]
    tile_offsets = (starts // CHUNK) * CHUNK
    tile_heads = starts - tile_offsets
    tile_nchunks = jnp.where(
        tcounts > 0, (tile_heads + tcounts + CHUNK - 1) // CHUNK, 0
    ).astype(jnp.int32)
    rgb_tiles, t_final = _blend(
        bstat, slab_t, tile_offsets, tile_heads, tcounts, tile_nchunks,
        tile_base,
    )
    return rgb_tiles, t_final, n_isect


def _fused_shard_plan(config: RasterizeConfig, n_dev: int, n_gauss: int):
    """Static plan for the fully-sharded fused pipeline, or None if the
    capacity doesn't divide cleanly. Returns (rows_per_shard,
    num_tiles_local, I_shard)."""
    from mtgs_tpu.raster.expand_fused import fused_fits

    I = config.max_intersections
    if n_dev <= 1 or I % n_dev:
        return None
    I_s = I // n_dev
    rows_per = -(-config.tiles_y // n_dev)
    ntl = rows_per * config.tiles_x
    if I_s % 512 or not fused_fits(I_s, ntl, n_gauss):
        return None
    return rows_per, ntl, I_s


def _rasterize_fused_sharded(
    config, mesh, shard_axis, plan, c_total,
    means2d_sg, radii, conics, op_eff_sg, live, table, depths, sink,
):
    """SURVEY §2.4's tile-space sharding, whole-pipeline edition: each
    chip computes spans for ALL gaussians clipped to its own tile-row
    band (cheap O(N)), then depth-sorts, expands, pair-sorts, and blends
    ONLY the pairs landing in its band — the global capacity-sized sorts
    become per-shard I/n_dev-slot sorts and no intersection slab is ever
    replicated (VERDICT r2 item 1; the reference analog is gsplat's
    tile-partitioned pipeline, `mtgs_scene_graph.py:640-662`).

    Differentiable end to end: the custom-VJP gather/blend run inside
    `shard_map`, each shard's backward reduces its own slots to
    per-gaussian partials, and the replicated-input transpose psums
    table/sink cotangents over ICI — the gradient all-reduce.
    """
    from jax.sharding import PartitionSpec as _P

    rows_per, ntl, I_s = plan
    tiles_y = config.tiles_y
    fstat = _FusedStatics(
        c_total=c_total, max_intersections=I_s, num_tiles=ntl,
        tiles_x=config.tiles_x, interpret=config.interpret,
    )
    bstat = _BlendStatics(
        tile_size=config.tile_size, tiles_x=config.tiles_x,
        backend="pallas", interpret=config.interpret, c_total=c_total,
    )

    def shard_fn(m2d, rad, con, op, lv, tab, dep, snk):
        s = jax.lax.axis_index(shard_axis)
        r0 = (s * rows_per).astype(jnp.int32)
        packed, counts = binning.tile_spans(
            m2d, rad, lv,
            width=config.width, height=config.height,
            tile_size=config.tile_size, conics=con, op_eff=op,
            row_range=(r0, jnp.minimum(r0 + rows_per, tiles_y)),
        )
        base = (s * ntl).astype(jnp.int32).reshape(1)
        rgb, tfin, n_is = _fused_pipeline(
            fstat, bstat, tab, packed, counts, dep, snk, base
        )
        return rgb, tfin, n_is.reshape(1)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(_P(),) * 8,
        out_specs=(_P(shard_axis), _P(shard_axis), _P(shard_axis)),
        check_vma=False,
    )(means2d_sg, radii, conics, op_eff_sg, live, table, depths, sink)


def rasterize(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    viewmat: jax.Array,
    K: jax.Array,
    config: RasterizeConfig,
    *,
    tap2d: Optional[jax.Array] = None,
    absgrad_sink: Optional[jax.Array] = None,
    mesh=None,
    shard_axis: str = "data",
    inside_shard_map: bool = False,
) -> Tuple[jax.Array, jax.Array, dict]:
    """Render one camera view of a set of 3D Gaussians.

    Args:
        means: [N, 3] world centers.
        quats: [N, 4] wxyz rotations (normalized internally).
        scales: [N, 3] linear scales.
        opacities: [N] in [0, 1] (already sigmoided).
        colors: [N, C] per-gaussian colors, C <= 7 (SH already evaluated).
        viewmat: [4, 4] world-to-camera (cv convention).
        K: [3, 3] intrinsics.
        config: static RasterizeConfig.
        tap2d / absgrad_sink: optional zeros-[N, 2] gradient taps (see
            module docstring).
        mesh / shard_axis: when a `jax.sharding.Mesh` is given, the
            WHOLE intersection pipeline runs `shard_map`'d over
            `shard_axis` (SURVEY §2.4's tile-space sharding): each chip
            computes spans clipped to its own tile-row band, then
            depth-sorts, expands, pair-sorts and blends only that band's
            pairs at I/n_dev capacity — no replicated slab, and the
            capacity-sized sorts (59% of the single-chip step) scale
            with devices. Fully differentiable: per-shard backwards
            reduce their own slots to per-gaussian partials and the
            shard_map transpose psums table/sink cotangents over ICI.
            Requires the fused pallas path and max_intersections
            divisible by n_dev*512 (else: classic path falls back to
            blend-only sharding with a replicated slab; a fused config
            failing the split renders unsharded).

    Returns:
        render: [H, W, C(+1 if depth mode)] — raw channels; ED mode's last
            channel is alpha-normalized expected depth.
        alpha: [H, W, 1] accumulated opacity.
        info: dict with means2d [N,2] (tapped), radii [N], depths [N],
            n_intersections (traced scalar; if it exceeds
            config.max_intersections the render silently truncated the
            furthest intersections — grow the config and re-jit).
    """
    N = means.shape[0]
    C = colors.shape[-1]
    if config.with_depth:
        if C + 1 > MAX_CH:
            raise ValueError(f"too many channels: {C}+depth > {MAX_CH}")
    elif C > MAX_CH:
        raise ValueError(f"too many channels: {C} > {MAX_CH}")

    proj = project_gaussians(
        means, quats, scales, viewmat, K,
        config.width, config.height,
        near_plane=config.near_plane, far_plane=config.far_plane,
        antialiased=(config.rasterize_mode == "antialiased"),
    )
    means2d = proj.means2d
    if tap2d is not None:
        means2d = means2d + tap2d
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((N, 2), means.dtype)

    op_eff = opacities * proj.compensations

    cols = colors
    if config.with_depth:
        cols = jnp.concatenate([cols, proj.depths[:, None]], axis=-1)
    c_total = cols.shape[-1]

    backend = config.resolve_backend()

    if mesh is not None and config.fused and backend == "pallas":
        # gaussian-ownership distributed pipeline (dist_fused.py): every
        # stage — projection, spans, depth sort, expand, pair exchange,
        # merge, blend — is per-shard sized; pairs ride ICI via
        # all_to_all instead of replicating the gaussian table. Falls
        # through to the band-replicated plan below when shapes don't
        # divide (N % n_dev, I % (n_dev * 512)).
        from mtgs_tpu.raster.dist_fused import (
            dist_shard_plan, rasterize_fused_dist, rasterize_fused_dist_inside,
        )

        dplan = dist_shard_plan(config, int(mesh.shape[shard_axis]), N)
        if dplan is not None:
            c_total = C + (1 if config.with_depth else 0)
            tap = (tap2d if tap2d is not None
                   else jnp.zeros((N, 2), means.dtype))
            sink = (absgrad_sink if absgrad_sink is not None
                    else jnp.zeros((N, 2), means.dtype))
            if inside_shard_map:
                # caller is already under a shard_map binding shard_axis
                # (2D cameras x tiles mesh — nesting shard_maps is not
                # supported, so the body runs inline with collectives)
                img_f, t_f, n_isect, m2d, radii, depths = (
                    rasterize_fused_dist_inside(
                        config, shard_axis, dplan, c_total,
                        means, quats, scales, opacities, colors,
                        viewmat, K, tap, sink,
                    ))
            else:
                img_f, t_f, n_isect, m2d, radii, depths = (
                    rasterize_fused_dist(
                        config, mesh, shard_axis, dplan, c_total,
                        means, quats, scales, opacities, colors,
                        viewmat, K, tap, sink,
                    ))
            # bands assembled their image rows in-shard; just crop
            img = img_f[: config.height, : config.width]
            t_img = t_f[: config.height, : config.width]
            alpha = (1.0 - t_img)[..., None]
            render = _finalize(img, alpha, config, c_total)
            info = dict(means2d=m2d, radii=radii, depths=depths,
                        n_intersections=n_isect)
            return render, alpha, info

    if inside_shard_map:
        # no dist plan under an enclosing shard_map: render unsharded
        # (row-redundant but correct); the band-replicated path below
        # would nest shard_maps, which this jax build cannot do.
        mesh = None

    if backend == "reference":
        accum, t_out = blend_reference(
            proj.replace(means2d=means2d), op_eff, cols, _depth_perm(proj),
            width=config.width, height=config.height, tile_size=config.tile_size,
        )
        alpha = (1.0 - t_out)[..., None]
        render = _finalize(accum, alpha, config, c_total)
        info = dict(
            means2d=means2d, radii=proj.radii, depths=proj.depths,
            n_intersections=jnp.zeros((), jnp.int32),
        )
        return render, alpha, info

    # zero-opacity gaussians (gated-out scene-graph nodes, dead padded
    # rows) can never contribute — drop them before binning so padded
    # capacities don't cost intersections.
    live = proj.valid & (jax.lax.stop_gradient(op_eff) > 0)

    # Pack per-gaussian rows; the gather to intersection order has a
    # custom scatter-free VJP that also yields the absgrad densify signal
    # (as the cotangent of `absgrad_sink`).
    table = jnp.concatenate(
        [means2d, proj.conics, op_eff[:, None], cols], axis=-1
    )  # [N, 6 + c_total]

    from mtgs_tpu.raster.expand_fused import fused_fits

    num_tiles = config.tiles_x * config.tiles_y
    use_fused = (
        config.fused and backend == "pallas"
        and fused_fits(config.max_intersections, num_tiles, N)
    )
    shard_plan = None
    if mesh is not None:
        if use_fused:
            shard_plan = _fused_shard_plan(config, mesh.shape[shard_axis], N)
        if shard_plan is None:
            # a mesh was requested but the fully-sharded plan is not
            # viable (capacity not divisible by n_dev*512, fused gate
            # failed, ...) — warn once per (config shape) so scaling
            # runs can't silently measure the single-device path
            # (ADVICE r3).
            key = (config.max_intersections, config.width, config.height,
                   int(mesh.shape[shard_axis]), N)
            if key not in _UNSHARDED_WARNED:
                _UNSHARDED_WARNED.add(key)
                _LOG.warning(
                    "rasterize: mesh(%s=%d) given but fused shard plan "
                    "inactive (max_intersections=%d, fused=%s) — "
                    "rendering without whole-pipeline tile sharding",
                    shard_axis, mesh.shape[shard_axis],
                    config.max_intersections, use_fused,
                )

    if shard_plan is not None:
        # WHOLE-pipeline tile sharding: per-shard spans/expand/sort/blend
        # (see _rasterize_fused_sharded). Falls through to the shared
        # image assembly below.
        rgb_flat, t_flat, n_parts = _rasterize_fused_sharded(
            config, mesh, shard_axis, shard_plan, c_total,
            jax.lax.stop_gradient(means2d), proj.radii, proj.conics,
            jax.lax.stop_gradient(op_eff), live, table, proj.depths,
            absgrad_sink,
        )
        rgb_tiles, t_final = rgb_flat[:num_tiles], t_flat[:num_tiles]
        # truncation signal: each shard truncates independently at
        # I/n_dev, so the binding load is the fullest shard scaled back
        # to the global capacity (the true untruncated total is
        # sum(n_parts); growth logic must react to the max).
        n_isect = jnp.max(n_parts) * mesh.shape[shard_axis]
    elif use_fused:
        packed_in, counts_in = binning.tile_spans(
            jax.lax.stop_gradient(means2d), proj.radii, live,
            width=config.width, height=config.height,
            tile_size=config.tile_size,
            conics=proj.conics, op_eff=jax.lax.stop_gradient(op_eff),
        )
        fstat = _FusedStatics(
            c_total=c_total, max_intersections=config.max_intersections,
            num_tiles=num_tiles, tiles_x=config.tiles_x,
            interpret=config.interpret,
        )
        bstat = _BlendStatics(
            tile_size=config.tile_size, tiles_x=config.tiles_x,
            backend=backend, interpret=config.interpret, c_total=c_total,
        )
        # (a mesh whose capacity split fails _fused_shard_plan renders
        # unsharded — correct, just not distributed)
        rgb_tiles, t_final, n_isect = _fused_pipeline(
            fstat, bstat, table, packed_in, counts_in, proj.depths,
            absgrad_sink, jnp.zeros((1,), jnp.int32),
        )
    else:
        binned = binning.bin_gaussians(
            means2d, proj.radii, proj.depths, live,
            width=config.width, height=config.height,
            tile_size=config.tile_size,
            max_intersections=config.max_intersections,
            conics=proj.conics, op_eff=jax.lax.stop_gradient(op_eff),
        )
        gather_statics = _GatherStatics(
            c_total=c_total, max_intersections=config.max_intersections
        )
        slab_t = _gather_intersections(
            gather_statics, table, binned, absgrad_sink
        )
        tile_offsets, tile_heads = binned.tile_offsets, binned.tile_heads
        tcounts, tile_nchunks = binned.tile_counts, binned.tile_nchunks
        n_isect = binned.n_intersections

        statics = _BlendStatics(
            tile_size=config.tile_size, tiles_x=config.tiles_x,
            backend=backend, interpret=config.interpret, c_total=c_total,
        )
        if mesh is None:
            rgb_tiles, t_final = _blend(
                statics, slab_t, tile_offsets, tile_heads, tcounts,
                tile_nchunks, jnp.zeros((1,), jnp.int32),
            )
        else:
            # classic path: blend-only tile sharding (the slab stays
            # replicated; kept as the non-fused fallback — the fused
            # path above shards the whole pipeline instead)
            from jax.sharding import PartitionSpec as _P

            n_dev = mesh.shape[shard_axis]
            T = tile_offsets.shape[0]
            T_pad = -(-T // n_dev) * n_dev
            padT = lambda a: jnp.pad(a, (0, T_pad - T))

            def shard_fn(offs_l, hds_l, cnts_l, nchk_l, slab_l):
                base = (jax.lax.axis_index(shard_axis)
                        * offs_l.shape[0]).astype(jnp.int32).reshape(1)
                return _blend(statics, slab_l, offs_l, hds_l, cnts_l,
                              nchk_l, base)

            rgb_tiles, t_final = jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(_P(shard_axis), _P(shard_axis), _P(shard_axis),
                          _P(shard_axis), _P()),
                out_specs=(_P(shard_axis), _P(shard_axis)),
                check_vma=False,
            )(padT(tile_offsets), padT(tile_heads), padT(tcounts),
              padT(tile_nchunks), slab_t)
            rgb_tiles, t_final = rgb_tiles[:T], t_final[:T]

    render, alpha = _assemble_image(rgb_tiles, t_final, config, c_total)
    info = dict(
        means2d=means2d, radii=proj.radii, depths=proj.depths,
        n_intersections=n_isect,
    )
    return render, alpha, info


def _assemble_image(rgb_tiles, t_final, config: RasterizeConfig, c_total: int):
    """Tile-major blend outputs -> (render [H, W, c], alpha [H, W, 1])."""
    ts = config.tile_size
    img = rgb_tiles.reshape(config.tiles_y, config.tiles_x, c_total, ts, ts)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        config.tiles_y * ts, config.tiles_x * ts, c_total
    )[: config.height, : config.width, :c_total]
    t_img = t_final.reshape(config.tiles_y, config.tiles_x, ts, ts)
    t_img = t_img.transpose(0, 2, 1, 3).reshape(
        config.tiles_y * ts, config.tiles_x * ts
    )[: config.height, : config.width]
    alpha = (1.0 - t_img)[..., None]
    return _finalize(img, alpha, config, c_total), alpha


def _depth_perm(proj):
    depth_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    _, perm = jax.lax.sort(
        (depth_key, jnp.arange(depth_key.shape[0], dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
    return perm


def _finalize(accum: jax.Array, alpha: jax.Array, config: RasterizeConfig, c_total: int):
    """Apply ED normalization (gsplat: last channel / clamp(alpha))."""
    if config.render_mode.endswith("ED"):
        depth = accum[..., -1:] / jnp.maximum(alpha, 1e-10)
        return jnp.concatenate([accum[..., : c_total - 1], depth], axis=-1)
    return accum[..., :c_total]
