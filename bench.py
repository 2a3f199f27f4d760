"""Benchmark: differentiable rasterization throughput on one TPU chip.

Measures forward+backward rays/s on the MTGS training workload shape:
1M gaussians, 960x540 render (the reference eval protocol: 0.5x scale,
`mtgs/config/MTGS.py:43`), photometric loss, full parameter gradients.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` normalizes by 2.0e6 rays/s fwd+bwd. That constant is an
ESTIMATE, not a measurement (no CUDA GPU exists in this environment and
the MTGS repo publishes no numbers in-repo — BASELINE.md: the baseline is
parity-defined): it corresponds to ~4 full-image iterations/s at this
518k-ray resolution, the iteration-rate class of gsplat-based full-image
3DGS training loops on A100-class hardware at ~1M gaussians (3DGS-style
trainers report 25-40 min for 30k iterations). Treat vs_baseline as
order-of-magnitude context; the absolute rays/s and the roofline report
from `mtgs_tpu.tools.profile_raster` are the load-bearing numbers.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def _await_backend(timeout_s: float = 600.0, poll_s: float = 20.0) -> None:
    """Fail fast (exit 1) if the device backend can't initialize.

    The TPU is reached over a tunnel that can be down; backend init then
    blocks forever inside `jax.devices()`. Probe it in a daemon thread so
    a dead tunnel produces a clear error instead of a silent driver hang.
    """
    import threading

    ready = threading.Event()
    err: list = []

    def probe():
        try:
            jax.devices()
        except Exception as e:  # surface init errors, don't spin on them
            err.append(e)
        finally:
            ready.set()

    threading.Thread(target=probe, daemon=True).start()
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if ready.wait(poll_s):
            if err:
                print(f"# ERROR: device backend init failed: {err[0]!r}",
                      file=sys.stderr)
                sys.exit(1)
            return
        print(f"# waiting for device backend "
              f"({time.time() - t0:.0f}s)...", file=sys.stderr)
    print("# ERROR: device backend unavailable "
          f"after {timeout_s:.0f}s (TPU tunnel down?)", file=sys.stderr)
    sys.exit(1)

BASELINE_RAYS_PER_S = 2.0e6
WIDTH, HEIGHT = 960, 540
N_GAUSS = 1_000_000
MAX_ISECT = 7 << 18  # 1.835M: ~13% above the 1.62M actual with exact
# alpha-support binning (sorts/expand scale with CAPACITY, not load)


def make_scene(seed=0):
    rng = np.random.default_rng(seed)
    # driving-scene-like layout: ground carpet + structures + far shell
    n_ground = N_GAUSS // 2
    n_struct = N_GAUSS // 3
    n_far = N_GAUSS - n_ground - n_struct
    gx = rng.uniform(-60, 60, n_ground)
    gy = rng.uniform(-20, 20, n_ground)
    ground = np.stack([gx, gy, np.zeros_like(gx)], -1)
    struct = np.stack(
        [rng.uniform(-60, 60, n_struct), rng.uniform(-25, 25, n_struct),
         rng.uniform(0, 12, n_struct)], -1)
    theta = rng.uniform(0, 2 * np.pi, n_far)
    phi = rng.uniform(np.pi / 4, np.pi / 2, n_far)
    far = 400.0 * np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1)
    means = jnp.asarray(np.concatenate([ground, struct, far]), jnp.float32)
    scales = jnp.asarray(
        np.concatenate([
            rng.lognormal(-2.3, 0.4, (n_ground, 3)),
            rng.lognormal(-2.0, 0.5, (n_struct, 3)),
            rng.lognormal(0.5, 0.4, (n_far, 3)),
        ]), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(N_GAUSS, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, N_GAUSS), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (N_GAUSS, 3)), jnp.float32)
    return means, quats, scales, opac, colors


def main():
    _await_backend()
    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.raster import RasterizeConfig, rasterize

    means, quats, scales, opac, colors = make_scene()
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = [0, -1, 0]
    c2w[:3, 1] = [0, 0, 1]
    c2w[:3, 2] = [-1, 0, 0]
    c2w[:3, 3] = [-55.0, 0.0, 1.6]
    viewmat = camera_to_gsplat_viewmat(jnp.asarray(c2w))
    K = jnp.asarray(
        [[800.0, 0, WIDTH / 2], [0, 800.0, HEIGHT / 2], [0, 0, 1.0]], jnp.float32)

    import os

    cfg = RasterizeConfig(
        width=WIDTH, height=HEIGHT, max_intersections=MAX_ISECT,
        rasterize_mode="antialiased", render_mode="RGB+ED", backend="auto",
        fused=os.environ.get("MTGS_FUSED", "1") != "0",
    )
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)

    def loss_fn(params):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(m, q, s, o, c, viewmat, K, cfg)
        return jnp.abs(render[..., :3] - target).mean() + 0.1 * alpha.mean()

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    params = (means, quats, scales, opac, colors)

    @jax.jit
    def bench_step(p, t):
        # Step + no-op parameter update in ONE dispatch: chaining steps
        # through the updated params serializes compute while pipelining
        # submission, so one final block covers all steps — no per-step
        # host round-trip over the device tunnel.
        #
        # The update must change the input BITWISE each iteration:
        # x - 1e-30*g is a bitwise no-op in f32, and the device tunnel
        # can replay identical (executable, args) executions under some
        # conditions (a 0.07 ms/step reading was observed,
        # results/onchip/20260821_012844/bench_classic_nodb.log) — so a
        # per-step counter perturbs one element negligibly but
        # distinctly.
        loss, grads = jax.value_and_grad(loss_fn)(p)
        newp = jax.tree.map(lambda x, g: x - 1e-30 * g, p, grads)
        m = newp[0].at[0, 0].add(1e-5 * t)
        return (m,) + tuple(newp[1:]), t + 1.0

    # report intersection load once
    _, _, info = jax.jit(lambda p: rasterize(*p, viewmat, K, cfg))(params)
    n_isect = int(info["n_intersections"])
    print(f"# n_intersections={n_isect} ({n_isect / N_GAUSS:.2f}/gaussian)",
          file=sys.stderr)
    if n_isect > MAX_ISECT:
        print(f"# WARNING: intersection overflow ({n_isect} > {MAX_ISECT})",
              file=sys.stderr)

    # warmup (compile)
    jax.block_until_ready(bench_step(params, jnp.float32(0.0)))

    iters = 20
    t0 = time.perf_counter()
    p, t = params, jnp.float32(1.0)
    for _ in range(iters):
        p, t = bench_step(p, t)
    jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / iters

    rays_per_s = WIDTH * HEIGHT / dt
    print(f"# fwd+bwd step: {dt * 1e3:.2f} ms  ({rays_per_s / 1e6:.2f} Mrays/s)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "rays/s/chip fwd+bwd rasterization (1M gaussians, 960x540)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
