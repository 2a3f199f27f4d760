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
        live = pr.valid & (o * pr.compensations > 0)
        b = binning.bin_gaussians(
            pr.means2d, pr.radii, pr.depths, live, width=W, height=H,
            tile_size=cfg.tile_size, max_intersections=cfg.max_intersections)
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
        jax.block_until_ready(f(p))
        t0 = time.perf_counter()
        x = p
        for _ in range(args.iters):
            x = f(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:24s} {dt:8.2f} ms")
        return dt

    t1 = timeit("projection", proj_only, params)
    t2 = timeit("projection+binning", proj_bin, params)
    t3 = timeit("full forward", fwd_only, params)
    t4 = timeit("full fwd+bwd", fwdbwd, params)
    print(f"\nbinning ~{t2 - t1:.1f} ms | gather+blend fwd ~{t3 - t2:.1f} ms"
          f" | bwd ~{t4 - t3:.1f} ms")

    if args.trace:
        f = jax.jit(fwdbwd)
        jax.block_until_ready(f(params))
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(f(params))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
