"""On-chip numerics validation: fused attr-payload-sort path vs classic.

CPU interpret-mode parity lives in tests/test_fused_path.py; Mosaic
lowering can still differ (matmul precision paths, DMA windows), so this
tool compares the two paths ON THE REAL CHIP before the fused default is
flipped: forward render/alpha (expected ~bit-exact: identical slab and
blend inputs) and full parameter gradients + absgrad (expected allclose;
within-gaussian reduction orders differ).

Run: `python -m mtgs_tpu.tools.validate_fused [--n 200000]`.
Exits non-zero on mismatch.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--max-isect", type=int, default=1 << 19)
    args = ap.parse_args(argv)

    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.raster import RasterizeConfig, rasterize

    rng = np.random.default_rng(0)
    n = args.n
    means = jnp.asarray(np.stack([
        rng.uniform(-30, 30, n), rng.uniform(-20, 20, n),
        rng.uniform(-60, -4, n)], -1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(-1.5, 0.5, (n, 3))), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    viewmat = camera_to_gsplat_viewmat(jnp.eye(4))
    W, H = args.width, args.height
    K = jnp.asarray([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1.0]],
                    jnp.float32)
    gw = jnp.asarray(rng.normal(size=(H, W)), jnp.float32)

    def make_cfg(fused):
        return RasterizeConfig(
            width=W, height=H, max_intersections=args.max_isect,
            rasterize_mode="antialiased", render_mode="RGB+ED",
            backend="pallas", fused=fused,
        )

    scene = (means, quats, scales, opac, colors)

    def run(fused):
        cfg = make_cfg(fused)

        @jax.jit
        def fwd(s):
            r, a, info = rasterize(*s, viewmat, K, cfg)
            return r, a, info["n_intersections"]

        def loss(s, sink):
            r, a, _ = rasterize(*s, viewmat, K, cfg, absgrad_sink=sink)
            return jnp.sum(r[..., :3] * gw[..., None]) + 0.3 * jnp.sum(a * gw[..., None])

        sink0 = jnp.zeros((n, 2), jnp.float32)
        grads, sg = jax.jit(jax.grad(loss, argnums=(0, 1)))(scene, sink0)
        r, a, ni = fwd(scene)
        return jax.block_until_ready((r, a, ni, grads, sg))

    rc, ac, nic, gc, sc = run(False)
    rf, af, nif, gf, sf = run(True)

    print(f"n_intersections classic={int(nic)} fused={int(nif)}")
    ok = int(nic) == int(nif)
    dr = float(jnp.abs(rf - rc).max())
    da = float(jnp.abs(af - ac).max())
    print(f"forward max|d| render={dr:.3e} alpha={da:.3e}")
    ok &= dr < 1e-4 and da < 1e-5
    names = ["means", "quats", "scales", "opac", "colors"]
    for name, a_, b_ in zip(names, gc, gf):
        s = max(float(jnp.abs(a_).max()), 1e-3)
        d = float(jnp.abs(b_ - a_).max()) / s
        print(f"grad {name:8s} rel max|d| = {d:.3e}")
        ok &= d < 1e-3
    s = max(float(jnp.abs(sc).max()), 1e-3)
    d = float(jnp.abs(sf - sc).max()) / s
    print(f"absgrad rel max|d| = {d:.3e}")
    ok &= d < 1e-3
    print("VALIDATE", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
