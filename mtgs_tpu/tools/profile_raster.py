"""Rasterizer stage-timing profile on the bench workload (TPU).

Observability tool (SURVEY.md §5 tracing): measures projection /
projection+binning / full forward / full fwd+bwd wall times on the
`bench.py` scene by chaining jitted steps (no per-step host round trip
over the device tunnel), and prints the per-stage deltas. Run with
`python -m mtgs_tpu.tools.profile_raster` on a machine with the TPU
attached; add `--trace DIR` to also capture a `jax.profiler` trace of
the fwd+bwd step for xprof.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--fused", action="store_true",
                    help="profile the attr-payload-sort path")
    args = ap.parse_args(argv)

    # bench.py lives at the repo root (not packaged); resolve relative to
    # this checkout so the tool works from any cwd
    repo_root = str(Path(__file__).resolve().parents[2])
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import bench
    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.raster import RasterizeConfig, binning, rasterize
    from mtgs_tpu.raster.projection import project_gaussians

    W, H = bench.WIDTH, bench.HEIGHT
    means, quats, scales, opac, colors = bench.make_scene()
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = [0, -1, 0]
    c2w[:3, 1] = [0, 0, 1]
    c2w[:3, 2] = [-1, 0, 0]
    c2w[:3, 3] = [-55.0, 0.0, 1.6]
    viewmat = camera_to_gsplat_viewmat(jnp.asarray(c2w))
    K = jnp.asarray(
        [[800.0, 0, W / 2], [0, 800.0, H / 2], [0, 0, 1.0]], jnp.float32)
    cfg = RasterizeConfig(
        width=W, height=H, max_intersections=bench.MAX_ISECT,
        rasterize_mode="antialiased", render_mode="RGB+ED", backend="auto",
        fused=args.fused)
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = (means, quats, scales, opac, colors)

    def chain(out_tree, p):
        # fold a scalar from out back into means so steps chain (no DCE)
        s = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: x.sum() * 1e-30, out_tree))
        m, q, sc, o, c = p
        return (m + s, q, sc, o, c)

    def proj_only(p):
        m, q, s, o, c = p
        pr = project_gaussians(
            m, q, s, viewmat, K, W, H, near_plane=cfg.near_plane,
            far_plane=cfg.far_plane, antialiased=True)
        return chain(
            (pr.means2d, pr.conics, pr.depths, pr.radii, pr.compensations), p)

    def proj_bin(p):
        m, q, s, o, c = p
        pr = project_gaussians(
            m, q, s, viewmat, K, W, H, near_plane=cfg.near_plane,
            far_plane=cfg.far_plane, antialiased=True)
        op = o * pr.compensations
        live = pr.valid & (op > 0)
        b = binning.bin_gaussians(
            pr.means2d, pr.radii, pr.depths, live, width=W, height=H,
            tile_size=cfg.tile_size, max_intersections=cfg.max_intersections,
            conics=pr.conics, op_eff=op)
        return chain(
            (b.gidx.astype(jnp.float32), b.tile_offsets.astype(jnp.float32)), p)

    def fwd_only(p):
        m, q, s, o, c = p
        r, a, _ = rasterize(m, q, s, o, c, viewmat, K, cfg)
        return chain((r, a), p)

    def loss_fn(p):
        m, q, s, o, c = p
        render, alpha, _ = rasterize(m, q, s, o, c, viewmat, K, cfg)
        return jnp.abs(render[..., :3] - target).mean() + 0.1 * alpha.mean()

    def fwdbwd(p):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        return jax.tree.map(lambda x, g: x - 1e-30 * g, p, grads)

    def timeit(name, fn, p):
        f = jax.jit(fn)
        # `chain` folds outputs in at 1e-30 scale — a bitwise no-op in
        # f32. The device tunnel can replay identical (executable, args)
        # executions, so bump one element bitwise-distinctly per
        # iteration (a ~0.03 ms [N,3] copy, negligible vs the stages).
        bump = jax.jit(
            lambda x: (x[0].at[0, 0].add(1e-4),) + tuple(x[1:]))
        jax.block_until_ready(f(p))
        t0 = time.perf_counter()
        x = p
        for _ in range(args.iters):
            x = bump(f(x))
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:24s} {dt:8.2f} ms")
        return dt

    t1 = timeit("projection", proj_only, params)
    t2 = timeit("projection+binning", proj_bin, params)

    if args.fused:
        # fused-path stage decomposition (the fused forward does NOT run
        # bin_gaussians — tile_spans + payload sorts + windowed expand)
        from mtgs_tpu.raster.expand_fused import (
            ALIGN, WINA, expand_fused, table_index_rows)
        from mtgs_tpu.raster.rasterize import _round8, _sort_avoiding_cliff

        N = means.shape[0]
        num_tiles = cfg.tiles_x * cfg.tiles_y
        I = bench.MAX_ISECT

        def upto_spans(p):
            m, q, s, o, c = p
            pr = project_gaussians(
                m, q, s, viewmat, K, W, H, near_plane=cfg.near_plane,
                far_plane=cfg.far_plane, antialiased=True)
            op = o * pr.compensations
            live = pr.valid & (op > 0)
            packed, counts = binning.tile_spans(
                jax.lax.stop_gradient(pr.means2d), pr.radii, live,
                width=W, height=H, tile_size=cfg.tile_size,
                conics=pr.conics, op_eff=jax.lax.stop_gradient(op))
            return chain((packed.astype(jnp.float32),
                          counts.astype(jnp.float32)), p), pr, packed, counts

        def spans_only(p):
            return upto_spans(p)[0]

        def upto_depth_sort(p):
            pc, pr, packed, counts = upto_spans(p)
            nw = 6 + 4
            table = jnp.concatenate(
                [pr.means2d, pr.conics, (p[3] * pr.compensations)[:, None],
                 p[4], pr.depths[:, None]], axis=-1)
            depth_key = jnp.where(counts > 0, pr.depths, jnp.inf)
            srt = _sort_avoiding_cliff(
                (depth_key, jnp.arange(N, dtype=jnp.int32), packed, counts,
                 *(table[:, j] for j in range(table.shape[1]))), num_keys=2)
            return chain(tuple(
                x.astype(jnp.float32) for x in srt[1:4]), p), srt, table.shape[1]

        def depth_sort_only(p):
            return upto_depth_sort(p)[0]

        def upto_expand(p):
            pc, srt, nw = upto_depth_sort(p)
            perm, packed, counts = srt[1], srt[2], srt[3]
            offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
            total = offsets[-1] + counts[-1]
            gal = binning.window_anchors(offsets, I)
            n_pad = ((N + ALIGN - 1) // ALIGN) * ALIGN + WINA
            pad0 = n_pad - N
            rows = [jnp.pad(r, (0, pad0)) for r in srt[4:]]
            rows += table_index_rows(offsets, packed, N, n_pad, I)
            w_tab = _round8(nw + 5)
            rows += [jnp.zeros((n_pad,), jnp.float32)] * (w_tab - nw - 5)
            tab_am = jnp.stack(rows)
            key, src, attrs = expand_fused(
                tab_am, gal, total, I, nw=nw, tiles_x=cfg.tiles_x,
                num_tiles=num_tiles, n_gauss=N)
            return (key, src, attrs, nw)

        def expand_only(p):
            key, src, attrs, nw = upto_expand(p)
            return chain((key.astype(jnp.float32),
                          src.astype(jnp.float32), attrs), p)

        def pair_sort_only(p):
            key, src, attrs, nw = upto_expand(p)
            srt2 = _sort_avoiding_cliff(
                (key, *(attrs[j] for j in range(nw))), num_keys=1)
            return chain(tuple(srt2[1:]), p)

        ts1 = timeit("proj+tile_spans", spans_only, params)
        ts2 = timeit("+depth sort", depth_sort_only, params)
        ts3 = timeit("+expand", expand_only, params)
        ts4 = timeit("+pair sort", pair_sort_only, params)
        t3 = timeit("full forward", fwd_only, params)
        t4 = timeit("full fwd+bwd", fwdbwd, params)
        print(f"\ntile_spans ~{ts1 - t1:.1f} | depth sort ~{ts2 - ts1:.1f} | "
              f"expand ~{ts3 - ts2:.1f} | pair sort ~{ts4 - ts3:.1f} | "
              f"blend fwd ~{t3 - ts4:.1f} | bwd(all) ~{t4 - t3:.1f} ms")
    else:
        t3 = timeit("full forward", fwd_only, params)
        t4 = timeit("full fwd+bwd", fwdbwd, params)
        print(f"\nbinning ~{t2 - t1:.1f} ms | gather+blend fwd ~{t3 - t2:.1f} ms"
              f" | bwd ~{t4 - t3:.1f} ms")

    _roofline(cfg, params, viewmat, K, t3, t4)

    if args.trace:
        from mtgs_tpu.utils.observability import summarize_trace

        f = jax.jit(fwdbwd)
        jax.block_until_ready(f(params))
        n_tr = 5
        with jax.profiler.trace(args.trace):
            x = params
            for _ in range(n_tr):
                x = f(x)
            jax.block_until_ready(x)
        print(f"trace written to {args.trace}; top ops (per step):")
        for ms, cnt, name in summarize_trace(args.trace, top=25, iters=n_tr):
            print(f"  {ms:9.3f} ms  x{cnt:<4d} {name}")



def _roofline(cfg, params, viewmat, K, t_fwd_ms, t_fwdbwd_ms):
    """Speed-of-light estimate for the blend on this workload (VERDICT r1
    item 3): count chunk-iterations from the actual binning, convert to
    MXU FLOPs / VPU element-ops / HBM bytes, and compare against v5e
    peaks. Printed assumptions are explicit so the numbers are auditable.
    """
    import jax
    import jax.numpy as jnp

    from mtgs_tpu.raster import binning
    from mtgs_tpu.raster.chunk_math import CHUNK, NUM_GEOM
    from mtgs_tpu.raster.projection import project_gaussians

    W, H = cfg.width, cfg.height
    m, q, s, o, c = params

    @jax.jit
    def stats(p):
        m, q, s, o, c = p
        pr = project_gaussians(
            m, q, s, viewmat, K, W, H, near_plane=cfg.near_plane,
            far_plane=cfg.far_plane, antialiased=True)
        op = o * pr.compensations
        live = pr.valid & (op > 0)
        b = binning.bin_gaussians(
            pr.means2d, pr.radii, pr.depths, live, width=W, height=H,
            tile_size=cfg.tile_size, max_intersections=cfg.max_intersections,
            conics=pr.conics, op_eff=op)
        return b.n_intersections, b.tile_nchunks.sum()

    n_isect, n_chunks = jax.device_get(stats(params))
    P = cfg.tile_size * cfg.tile_size
    ct = 4 if cfg.with_depth else 3
    nw = NUM_GEOM + ct
    pairs = float(n_chunks) * CHUNK * P

    # per chunk-tile: S matmul [P,6]x[6,C], cumsum [P,C]x[C,C], rgb [ct,C]x[C,P]
    mxu_fwd = float(n_chunks) * 2 * P * CHUNK * (NUM_GEOM + CHUNK + ct)
    # backward replays fwd + gdot/moments/g_col matmuls + second cumsum
    mxu_bwd = mxu_fwd + float(n_chunks) * 2 * P * CHUNK * (ct + NUM_GEOM + ct + CHUNK)
    vpu_fwd = pairs * 25        # exp x2, log1p, cmps, muls (approx op count)
    vpu_bwd = pairs * 40
    hbm = float(n_chunks) * CHUNK * nw * 4  # slab reads (fwd; bwd ~2x +grads)

    V5E_MXU_F32 = 49e12   # bf16 peak 197 TF/s; f32 ~1/4
    V5E_VPU = 4e12        # ~4 ALUs x 8x128 lanes x 0.94 GHz (approx)
    V5E_HBM = 819e9

    sol_fwd = max(mxu_fwd / V5E_MXU_F32, vpu_fwd / V5E_VPU, hbm / V5E_HBM)
    sol_bwd = max(mxu_bwd / V5E_MXU_F32, vpu_bwd / V5E_VPU, 3 * hbm / V5E_HBM)
    print(f"\n--- roofline (v5e assumptions: MXU f32 {V5E_MXU_F32/1e12:.0f} TF/s,"
          f" VPU ~{V5E_VPU/1e12:.0f} T-op/s, HBM {V5E_HBM/1e9:.0f} GB/s) ---")
    print(f"n_intersections={int(n_isect)}  chunk-iters={int(n_chunks)}  "
          f"pair-evals={pairs/1e9:.2f}G")
    print(f"blend fwd : MXU {mxu_fwd/1e9:.1f} GFLOP ({mxu_fwd/V5E_MXU_F32*1e3:.2f} ms)"
          f" | VPU {vpu_fwd/1e9:.1f} G-op ({vpu_fwd/V5E_VPU*1e3:.2f} ms)"
          f" | HBM {hbm/1e6:.0f} MB ({hbm/V5E_HBM*1e3:.2f} ms)")
    print(f"SoL fwd ~{sol_fwd*1e3:.1f} ms vs measured full fwd {t_fwd_ms:.1f} ms"
          f" ({t_fwd_ms/(sol_fwd*1e3):.1f}x off)")
    print(f"SoL fwd+bwd ~{(sol_fwd+sol_bwd)*1e3:.1f} ms vs measured "
          f"{t_fwdbwd_ms:.1f} ms ({t_fwdbwd_ms/((sol_fwd+sol_bwd)*1e3):.1f}x off)")
    rays = W * H
    print(f"SoL rays/s fwd+bwd ~{rays/(sol_fwd+sol_bwd)/1e6:.1f} Mrays/s; "
          f"measured {rays/(t_fwdbwd_ms*1e-3)/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
