"""Gaussian-ownership distributed rasterization: the scaling path.

SURVEY §2.4's north star — "shard pixels/tiles across chips,
gather/replicate the Gaussians each tile batch needs" — implemented the
TPU way. The round-3 band-sharded pipeline (`rasterize.py::
_rasterize_fused_sharded`) scaled every capacity-sized sort but left two
Amdahl terms: an N-sized depth sort + unperm sort replicated on every
shard, and every shard holding ALL gaussian attribute columns (VERDICT
r3 missing #3; measured 34% efficiency at 8 virtual devices). This
module removes both:

  * each shard OWNS a contiguous N/n block of gaussians: projection,
    span computation, depth sort (N/n-sized, attributes as sort
    payloads) and pair expansion run on the owner over the FULL image;
  * expanded pairs are grouped by destination tile-row band (one sort at
    the per-shard pair capacity) and exchanged with ONE
    `lax.all_to_all` — per-pair attribute rows ride ICI, never the full
    gaussian table (the "Gaussians gathered over ICI" of SURVEY §2.4;
    total bytes moved = pairs x row width, independent of device count);
  * each destination band merge-sorts its received pairs by
    (tile, depth, global id) — reproducing the single-device
    (tile, depth-order) sort EXACTLY, tie-broken like the reference's
    stable radix sort (gsplat `isect_tiles`, consumed at
    `mtgs/scene_model/mtgs_scene_graph.py:640-662`) — and blends its
    own tile rows.

Backward retraces the route with no N-sized step: blend grads unsort to
arrival order (I_recv sort), reverse all_to_all, re-assemble into band
order (transpose of the block slicing), unsort to expansion order
(I/n sort), MXU segment-sum per owner, local unperm (N/n sort). Table
cotangents never leave their owner shard — the gradient "all-reduce" of
the replicated design becomes a no-op.

Every sort is N/n- or O(I/n)-sized; the only replicated work is scalar
plumbing. Capacities:

    I_s   = max_intersections / n   per-owner expansion capacity
    I_blk = roundup(I_s * slack / n, 128)   per (src, dst) exchange block
    I_recv = n * I_blk ~= slack * I/n       per-band merge capacity

`slack` (MTGS_BLK_SLACK, default 2) absorbs src->band load imbalance;
overflow on any leg is reported through the rasterizer's
`n_intersections` signal (scaled to the global capacity) so the
trainer's growth loop reacts exactly as on one chip.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mtgs_tpu.raster import binning
from mtgs_tpu.raster.chunk_math import CHUNK, NUM_GEOM


def _f0(a):
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


# ------------------------------------------------------------------------
# Differentiable permutation-by-sort: forward sorts stop-gradient keys
# with the column block as payload operands; backward applies the inverse
# permutation with ONE payload sort (the cheapest way to move column data
# through a permutation on TPU — see rasterize.py's measured notes).
# ------------------------------------------------------------------------


def sort_cols_by(keys, cols):
    """Sort `cols` ([w, L] f32) by `keys` (tuple of [L] arrays).

    Returns (sorted_keys_tuple, perm, sorted_cols); `perm[i]` is the
    input position of sorted slot i. Differentiable in `cols` only
    (keys are treated as stop-gradient index data)."""
    return _sort_cols_by(tuple(np.dtype(k.dtype).str for k in keys),
                         keys, cols)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sort_cols_by(key_dtypes, keys, cols):
    out, _ = _scb_fwd(key_dtypes, keys, cols)
    return out


def _scb_fwd(key_dtypes, keys, cols):
    from mtgs_tpu.raster.rasterize import _sort_avoiding_cliff

    w, L = cols.shape
    nk = len(keys)
    srt = _sort_avoiding_cliff(
        (*keys, jnp.arange(L, dtype=jnp.int32), *(cols[j] for j in range(w))),
        num_keys=nk,
    )
    perm = srt[nk]
    out = (tuple(srt[:nk]), perm, jnp.stack(srt[nk + 1:]))
    return out, perm


def _scb_bwd(key_dtypes, perm, cot):
    from mtgs_tpu.raster.rasterize import _sort_avoiding_cliff

    _, _, g_cols = cot
    w = g_cols.shape[0]
    srt = _sort_avoiding_cliff(
        (perm, *(g_cols[j] for j in range(w))), num_keys=1
    )
    g_keys = tuple(
        jnp.zeros(perm.shape, dt) if jnp.issubdtype(np.dtype(dt), np.floating)
        else np.zeros(perm.shape, dtype=jax.dtypes.float0)
        for dt in key_dtypes
    )
    return (g_keys, jnp.stack(srt[1:]))


_sort_cols_by.defvjp(_scb_fwd, _scb_bwd)


# ------------------------------------------------------------------------
# Owner-side expansion: local depth sort -> windowed Pallas expand,
# emitting per-pair attribute rows PLUS two metadata rows (camera depth,
# global input index) that the destination band's merge sort keys on.
# ------------------------------------------------------------------------


class _DistStatics(NamedTuple):
    nw: int            # live table width (6 + c_total)
    I_s: int           # per-owner expansion capacity
    ntp: int           # padded global tile count (n_dev * ntl)
    tiles_x: int
    n_local: int       # gaussians owned per shard
    interpret: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dist_expand(statics, table, packed, counts, depths, sink, gidx0):
    out, _ = _dist_expand_fwd(statics, table, packed, counts, depths, sink,
                              gidx0)
    return out


def _dist_expand_fwd(statics, table, packed, counts, depths, sink, gidx0):
    from mtgs_tpu.raster.expand_fused import (
        ALIGN, WINA, expand_fused, table_index_rows,
    )
    from mtgs_tpu.raster.rasterize import payload_sort

    n, nw = table.shape
    nw_ext = nw + 2
    I = statics.I_s
    n_pad = ((n + ALIGN - 1) // ALIGN) * ALIGN + WINA
    pad0 = n_pad - n

    depth_sg = jax.lax.stop_gradient(depths)
    depth_key = jnp.where(counts > 0, depth_sg, jnp.inf)
    (dk_s, perm), pls = payload_sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32)),
        [packed, counts, *(table[:, j] for j in range(nw))],
        num_keys=2,
    )
    packed_s, counts_s = pls[0], pls[1]
    offsets = (jnp.cumsum(counts_s) - counts_s).astype(jnp.int32)
    total = offsets[-1] + counts_s[-1]
    gal = binning.window_anchors(offsets, I)

    rows = [jnp.pad(r, (0, pad0)) for r in pls[2:]]
    # metadata rows ride the one-hot copy with the attributes: camera
    # depth (inf-sanitized — an inf payload would NaN the 0*inf terms of
    # the MXU one-hot contraction) and the owner's GLOBAL input index
    # (exact in f32: the dist gate requires N < 2^24).
    rows.append(jnp.pad(jnp.where(counts_s > 0, dk_s, 0.0), (0, pad0)))
    rows.append(jnp.pad(
        (gidx0 + perm).astype(jnp.float32), (0, pad0),
        constant_values=0.0))
    rows += table_index_rows(offsets, packed_s, n, n_pad, I)
    w_tab = _round8(nw_ext + 5)
    rows += [jnp.zeros((n_pad,), jnp.float32)] * (w_tab - nw_ext - 5)
    tab_am = jnp.stack(rows)

    key, src, attrs = expand_fused(
        tab_am, gal, total, I,
        nw=nw_ext, tiles_x=statics.tiles_x, num_tiles=statics.ntp,
        n_gauss=n, interpret=statics.interpret,
    )
    return (attrs, key, src, total), (perm, src)


def _dist_expand_bwd(statics, res, cot):
    from mtgs_tpu.raster.rasterize import payload_sort
    from mtgs_tpu.raster.segment_sum import dense_segment_sum

    perm, src = res
    g_attrs = cot[0]                      # [w_out, I_s] in expansion order
    nw = statics.nw
    n = statics.n_local
    I = statics.I_s

    w_pad = _round8(nw + 2)
    rows = jnp.concatenate(
        [
            jnp.stack([*(g_attrs[j, :I] for j in range(nw)),
                       jnp.abs(g_attrs[0, :I]), jnp.abs(g_attrs[1, :I])]),
            jnp.zeros((w_pad - nw - 2, I), jnp.float32),
        ]
    )
    sums_t = dense_segment_sum(rows, src, n, interpret=statics.interpret)
    sum_rows = [sums_t[j, :n] for j in range(nw + 2)]
    _, outs = payload_sort((perm,), sum_rows)
    g_table = jnp.stack(outs[:nw], axis=-1)
    absgrad = jnp.stack(outs[nw: nw + 2], axis=-1)
    return (
        g_table, _f0(perm), _f0(perm), jnp.zeros((n,), jnp.float32),
        absgrad, np.zeros((), dtype=jax.dtypes.float0),
    )


_dist_expand.defvjp(_dist_expand_fwd, _dist_expand_bwd)


# ------------------------------------------------------------------------
# Shard plan + the shard_map body.
# ------------------------------------------------------------------------


class DistPlan(NamedTuple):
    n_dev: int
    rows_per: int      # tile rows per band
    ntl: int           # tiles per band (rows_per * tiles_x)
    I_s: int           # per-owner expansion capacity
    I_blk: int         # per (src, dst) all_to_all block
    n_local: int


def dist_shard_plan(config, n_dev: int, n_gauss: int):
    """Static plan for the gaussian-ownership distributed pipeline, or
    None when the shapes don't divide. Gates mirror `_fused_shard_plan`
    plus N % n_dev (contiguous ownership blocks)."""
    from mtgs_tpu.raster.expand_fused import fused_fits

    dist_env = os.environ.get("MTGS_DIST", "auto")
    if n_dev <= 1 or dist_env == "0":
        return None
    # Default policy ("auto"): gaussian ownership wins asymptotically
    # but carries two extra capacity-sized sorts (band grouping + the
    # destination k-way merge); per-shard sort volume is
    # ~(29N + 64I)/n vs the band-replicated path's 27N + 24I/n, so the
    # crossover sits around n~4 (measured on the virtual mesh:
    # results/scaling_r4). Below that the band path is faster; force
    # with MTGS_DIST=1.
    if dist_env == "auto" and n_dev < 8:
        return None
    I = config.max_intersections
    if n_gauss % n_dev or I % n_dev or n_gauss >= (1 << 24):
        return None
    I_s = I // n_dev
    if I_s % 512:
        return None
    rows_per = -(-config.tiles_y // n_dev)
    ntl = rows_per * config.tiles_x
    ntp = n_dev * ntl
    n_local = n_gauss // n_dev
    if not fused_fits(I_s, ntp, max(n_local, 2)):
        return None
    # slack 1.0: the n exchange blocks jointly hold exactly I_s pairs —
    # the same per-band capacity (and truncation-then-grow semantics)
    # the band-replicated path gives one shard. Raising it trades merge
    # sort bytes for skew headroom without a growth round-trip.
    slack = float(os.environ.get("MTGS_BLK_SLACK", "1.0"))
    I_blk = min(I_s, ((int(I_s * slack) // n_dev + 127) // 128) * 128)
    if I_blk < 128:
        return None
    return DistPlan(n_dev, rows_per, ntl, I_s, I_blk, n_local)


def _make_shard_body(config, shard_axis, plan: DistPlan, c_total):
    """The per-device distributed pipeline body. Valid anywhere the mesh
    axis `shard_axis` is bound — wrapped in its own shard_map by
    `rasterize_fused_dist`, or called directly inside an ENCLOSING
    shard_map (the cameras x tiles 2D-mesh composition, where nesting
    shard_maps is not an option)."""
    from mtgs_tpu.raster.expand_fused import slot_bits
    from mtgs_tpu.raster.projection import project_gaussians
    from mtgs_tpu.raster.rasterize import _BlendStatics, _blend

    n_dev, rows_per, ntl, I_s, I_blk, n_local = plan
    nw = NUM_GEOM + c_total
    nw_ext = nw + 2
    sb = slot_bits(I_s)
    ntp = n_dev * ntl
    I_recv = n_dev * I_blk
    cap = binning.padded_capacity(I_recv)
    w_pad = _round8(nw)

    dstat = _DistStatics(
        nw=nw, I_s=I_s, ntp=ntp, tiles_x=config.tiles_x,
        n_local=n_local, interpret=config.interpret,
    )
    bstat = _BlendStatics(
        tile_size=config.tile_size, tiles_x=config.tiles_x,
        backend="pallas", interpret=config.interpret, c_total=c_total,
    )
    sentinel_key = jnp.int32((ntp << sb) | (I_s - 1))

    def shard_fn(mns, qts, scl, opc, cls, tap, snk, vm, Km):
        s = jax.lax.axis_index(shard_axis)
        proj = project_gaussians(
            mns, qts, scl, vm, Km, config.width, config.height,
            near_plane=config.near_plane, far_plane=config.far_plane,
            antialiased=(config.rasterize_mode == "antialiased"),
        )
        m2d = proj.means2d + tap
        op_eff = opc * proj.compensations
        cols_full = cls
        if config.with_depth:
            cols_full = jnp.concatenate(
                [cols_full, proj.depths[:, None]], axis=-1)
        live = proj.valid & (jax.lax.stop_gradient(op_eff) > 0)
        packed, counts = binning.tile_spans(
            jax.lax.stop_gradient(m2d), proj.radii, live,
            width=config.width, height=config.height,
            tile_size=config.tile_size, conics=proj.conics,
            op_eff=jax.lax.stop_gradient(op_eff),
        )
        table = jnp.concatenate(
            [m2d, proj.conics, op_eff[:, None], cols_full], axis=-1
        )
        gidx0 = s * n_local
        attrs, key, src, total_own = _dist_expand(
            dstat, table, packed, counts, proj.depths, snk, gidx0
        )

        # ---- group pairs by destination band (ONE I_s-sized sort) ----
        (key_s,), _, cols_sorted = sort_cols_by(
            (key,), attrs[:nw_ext]
        )
        band_q = (jnp.arange(n_dev + 1, dtype=jnp.int32) * ntl) << sb
        bounds = jnp.searchsorted(key_s, band_q, side="left").astype(jnp.int32)
        needed = bounds[1:] - bounds[:-1]                       # per band
        blk_max = jnp.max(needed)

        # fixed-size exchange blocks: slice each band's run (zero-pad the
        # lane dim so dynamic_slice never clamps), mask rows past the
        # run's true length (their key -> sentinel, cols -> exact zero,
        # so forward contribution AND backward cotangent are zero).
        cols_padded = jnp.pad(cols_sorted, ((0, 0), (0, I_blk)))
        key_padded = jnp.pad(key_s, (0, I_blk),
                             constant_values=sentinel_key)
        blk_cols = []
        blk_keys = []
        lanes = jnp.arange(I_blk, dtype=jnp.int32)
        for b in range(n_dev):
            start = bounds[b]
            cnt = jnp.minimum(needed[b], I_blk)
            cb = jax.lax.dynamic_slice(
                cols_padded, (0, start), (nw_ext, I_blk))
            kb = jax.lax.dynamic_slice(key_padded, (start,), (I_blk,))
            live_b = lanes < cnt
            blk_cols.append(jnp.where(live_b[None, :], cb, 0.0))
            blk_keys.append(jnp.where(live_b, kb, sentinel_key))
        send_cols = jnp.stack(blk_cols)                 # [n, nw_ext, I_blk]
        send_keys = jnp.stack(blk_keys)                 # [n, I_blk]

        recv_cols = jax.lax.all_to_all(
            send_cols, shard_axis, split_axis=0, concat_axis=0)
        recv_keys = jax.lax.all_to_all(
            send_keys, shard_axis, split_axis=0, concat_axis=0)

        # ---- destination merge: (tile, depth, global id) ----
        flat_cols = jnp.transpose(recv_cols, (1, 0, 2)).reshape(
            nw_ext, I_recv)
        flat_keys = recv_keys.reshape(I_recv)
        tile_g = flat_keys >> sb
        depth_m = jax.lax.stop_gradient(flat_cols[nw])
        gidx_m = jax.lax.stop_gradient(flat_cols[nw + 1])
        (tile_srt, _, _), _, merged = sort_cols_by(
            (tile_g, depth_m, gidx_m), flat_cols[:nw]
        )

        base_tile = s * ntl
        q = base_tile + jnp.arange(ntl + 1, dtype=jnp.int32)
        b2 = jnp.searchsorted(tile_srt, q, side="left").astype(jnp.int32)
        starts, tcounts = b2[:-1], b2[1:] - b2[:-1]
        tile_offsets = (starts // CHUNK) * CHUNK
        tile_heads = starts - tile_offsets
        tile_nchunks = jnp.where(
            tcounts > 0, (tile_heads + tcounts + CHUNK - 1) // CHUNK, 0
        ).astype(jnp.int32)

        slab_t = jnp.pad(merged, ((0, w_pad - nw), (0, cap - I_recv)))
        rgb, tfin = _blend(
            bstat, slab_t, tile_offsets, tile_heads, tcounts, tile_nchunks,
            base_tile.astype(jnp.int32).reshape(1),
        )
        # assemble THIS band's image rows locally, so the full image
        # leaves the shard_map row-sharded and the downstream pixel ops
        # (composite, losses) partition instead of running full-size on
        # every device (the XLA cost probe showed ~280 MB/device of
        # replicated [H, W, c] traffic when assembly happened outside).
        ts = config.tile_size
        img = rgb.reshape(rows_per, config.tiles_x, c_total, ts, ts)
        img = img.transpose(0, 3, 1, 4, 2).reshape(
            rows_per * ts, config.tiles_x * ts, c_total)
        t_img = tfin.reshape(rows_per, config.tiles_x, ts, ts)
        t_img = t_img.transpose(0, 2, 1, 3).reshape(
            rows_per * ts, config.tiles_x * ts)
        return (img, t_img, total_own.reshape(1), blk_max.reshape(1),
                m2d, proj.radii, proj.depths)

    return shard_fn


def rasterize_fused_dist(
    config, mesh, shard_axis, plan: DistPlan, c_total,
    means, quats, scales, opacities, colors, viewmat, K, tap2d, sink,
):
    """Full gaussian-ownership distributed render. Returns
    (img [n*rows_per*ts, tiles_x*ts, c] row-sharded, t_img likewise,
    n_isect, means2d, radii, depths) with per-gaussian arrays assembled
    back to input order; the caller slices [:H, :W]."""
    from jax.sharding import PartitionSpec as _P

    shard_fn = _make_shard_body(config, shard_axis, plan, c_total)
    I_blk = plan.I_blk
    P = _P(shard_axis)
    rgb_f, t_f, n_own, blk_max, m2d, radii, depths = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P, P, P, P, P, P, P, _P(), _P()),
        out_specs=(P, P, P, P, P, P, P),
        check_vma=False,
    )(means, quats, scales, opacities, colors, tap2d, sink, viewmat, K)

    # capacity-pressure signal, scaled to the GLOBAL capacity so the
    # trainer's growth check (n_isect > frac * max_intersections) reacts
    # to whichever leg saturates first: owner expansion (I_s per shard)
    # or an exchange block (I_blk per src->band pair).
    I = config.max_intersections
    n_isect = jnp.maximum(
        jnp.max(n_own) * plan.n_dev,
        (jnp.max(blk_max).astype(jnp.float32) * (I / I_blk)).astype(jnp.int32),
    )
    return rgb_f, t_f, n_isect, m2d, radii, depths


def rasterize_fused_dist_inside(
    config, shard_axis, plan: DistPlan, c_total,
    means, quats, scales, opacities, colors, viewmat, K, tap2d, sink,
):
    """The distributed pipeline for callers ALREADY inside a shard_map
    binding `shard_axis` (e.g. one row of a cameras x tiles 2D mesh).

    Inputs are the FULL (row-replicated) arrays; each device slices its
    ownership block, runs the shard body, and all_gathers the band
    renders so every device of the row returns the full image (the
    image-space losses then run row-redundantly — cheap — and their
    backward seeds each band's cotangent n_dev times, which the caller
    must normalize with a pmean over `shard_axis`; see
    parallel/mesh2d.py). Returns the same tuple as
    `rasterize_fused_dist`."""
    n_dev, rows_per, ntl, I_s, I_blk, n_local = plan
    shard_fn = _make_shard_body(config, shard_axis, plan, c_total)
    s = jax.lax.axis_index(shard_axis)

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, s * n_local, n_local, axis=0)

    rgb_l, t_l, n_own, blk_max, m2d_l, radii_l, depths_l = shard_fn(
        sl(means), sl(quats), sl(scales), sl(opacities), sl(colors),
        sl(tap2d), sl(sink), viewmat, K,
    )
    ag = functools.partial(jax.lax.all_gather, axis_name=shard_axis,
                           axis=0, tiled=True)
    I = config.max_intersections
    n_isect = jnp.maximum(
        jax.lax.pmax(n_own[0], shard_axis) * n_dev,
        (jax.lax.pmax(blk_max[0], shard_axis).astype(jnp.float32)
         * (I / I_blk)).astype(jnp.int32),
    )
    return (ag(rgb_l), ag(t_l), n_isect, ag(m2d_l), ag(radii_l),
            ag(depths_l))
