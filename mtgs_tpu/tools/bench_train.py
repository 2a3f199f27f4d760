"""Full-train-step throughput benchmark (one chip).

The headline `bench.py` measures the raw rasterizer fwd+bwd; this tool
measures the COMPLETE MTGS training iteration — scene-graph gather
(multicolor background + skybox + rigid instance), normals as extra
color channels, rasterize forward, photometric/SSIM/depth/NCC/normal/reg
losses, full backward, per-group Adam update, densify-statistics
accumulation — i.e. the `train iters/s` target of BASELINE.md, the TPU
analog of the reference's per-step work
(`mtgs/scene_model/mtgs_scene_graph.py:710-981` forward+losses,
`custom_trainer.py:23` optimizer step, `vanilla_gaussian_splatting.py:448`
stats accumulation in OpenDriveLab/MTGS).

Scene: the synthetic multi-traversal fixture at flagship scale
(defaults ~1M padded gaussians, 960x540, antialiased RGB+ED).

Run (on the chip):  python -m mtgs_tpu.tools.bench_train [--fused]
Smoke (CPU tests):  --n-bg 2000 --width 128 --height 128 --iters 2

Prints per-step timing to stderr and ONE summary JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--n-bg", type=int, default=780_000)
    ap.add_argument("--n-instance", type=int, default=20_000)
    ap.add_argument("--skybox", action="store_true", default=True)
    ap.add_argument("--no-skybox", dest="skybox", action="store_false")
    ap.add_argument("--max-isect", type=int, default=3 << 20)
    ap.add_argument("--skybox-points", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args(argv)

    from mtgs_tpu.data.synthetic import (
        batch_iterator, build_scene_model, make_synthetic_scene,
    )
    from mtgs_tpu.train import control as ctrl
    from mtgs_tpu.train import losses as loss_lib
    from mtgs_tpu.train.trainer import Trainer, TrainerConfig

    t0 = time.perf_counter()
    scene = make_synthetic_scene(
        seed=0, width=args.width, height=args.height,
        n_travels=2, n_frames=3,
        n_bg=args.n_bg, n_instance=args.n_instance,
        extent=60.0, backend=args.backend, n_seed=args.n_bg,
    )
    print(f"# scene built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    params, aux = build_scene_model(
        scene, with_instances=True, with_skybox=args.skybox,
        skybox_points=args.skybox_points,
    )
    print(f"# model init in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    cfg = TrainerConfig(
        width=args.width, height=args.height,
        max_intersections=args.max_isect,
        rasterize_mode="antialiased",
        backend=args.backend, fused=args.fused,
        predict_normals=True,
        control=ctrl.ControlConfig(),
        loss=loss_lib.LossConfig(
            ssim_lambda=0.2, depth_lambda=0.5, ncc_lambda=0.1,
            normal_lambda=0.1, use_normal_loss=True, use_normal_tv_loss=True,
        ),
    )
    trainer = Trainer(cfg, params, aux, batch_iterator(scene))

    it = trainer.data
    batches = [next(it) for _ in range(4)]

    t0 = time.perf_counter()
    trainer.state, metrics = trainer._step_fn(trainer.state, trainer.aux, batches[0])
    jax.block_until_ready(metrics)
    print(f"# compile+first step in {time.perf_counter() - t0:.1f}s; "
          f"n_isect={int(metrics['n_intersections'])} "
          f"gaussians={int(metrics['gaussian_count'])}", file=sys.stderr)

    iters = args.iters
    t0 = time.perf_counter()
    for i in range(iters):
        trainer.state, metrics = trainer._step_fn(
            trainer.state, trainer.aux, batches[i % len(batches)]
        )
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters
    iters_per_s = 1.0 / dt
    print(f"# train step: {dt * 1e3:.2f} ms  ({iters_per_s:.2f} iters/s, "
          f"psnr {float(metrics['psnr']):.2f})", file=sys.stderr)

    print(json.dumps({
        "metric": "full MTGS train iters/s (scene graph + losses + adam, "
                  f"{args.width}x{args.height})",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        # gsplat-based full-image 3DGS trainers run ~3 iters/s at this
        # resolution on A100-class GPUs (see BASELINE.md: parity-defined)
        "vs_baseline": round(iters_per_s / 3.0, 3),
    }))


if __name__ == "__main__":
    main()
