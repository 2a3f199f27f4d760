"""Train one road block end-to-end (the `ns-train mtgs` equivalent).

Counterpart of the reference's per-scene driver
(`mtgs/tools/batch_exp/run_single_road_block.py` + nerfstudio train loop
in OpenDriveLab/MTGS): parse the road block, build the scene model from
the seed clouds, train, checkpoint, and run the full eval producing
`eval_result.json`.

Usage:
    python -m mtgs_tpu.tools.train_scene --data /path/road_block --out runs/x \
        [--method mtgs] [--steps 30001] [--travels 0 1 2] [--eval-travels 3]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_model_from_parsed(scene, method_cfg, sample_cfg):
    """SceneParams/SceneAux from a ParsedScene's seeds + instances."""
    from mtgs_tpu.models.gaussians import (
        init_node_from_points, init_skybox_node, node_capacity,
    )
    from mtgs_tpu.models.scene_graph import InstanceAux, InstanceParams, init_scene

    n_travels = len(scene.train_travel_ids)
    assert scene.seed_xyz is not None, "road block has no seed point cloud"
    bg = init_node_from_points(
        scene.seed_xyz, scene.seed_rgb,
        num_traversals=n_travels, multi_feature_rest=True,
    )
    extent = float(np.abs(scene.seed_xyz).max())
    sky = init_skybox_node(
        num_points=100_000, radius=1000.0, scene_extent=extent,
        num_traversals=n_travels, multi_feature_rest=True,
    )

    inst = None
    rigid = [i for i in scene.instances if i.class_name not in ("pedestrian", "bicycle")]
    if rigid:
        F = scene.num_frame_rows
        cap = max(node_capacity(max(len(i.points) for i in rigid), granule=1024), 1024)
        nodes, quats, trans, present, static, alive, num_alive, sizes = [], [], [], [], [], [], [], []
        for info in rigid:
            node, naux = init_node_from_points(info.points, info.colors, capacity=cap)
            nodes.append(node)
            q = np.zeros((F, 4), np.float32)
            q[:, 0] = 1.0
            t = np.zeros((F, 3), np.float32)
            pr = np.zeros((F,), np.float32)
            # map poses onto THIS split's frame rows by token — positional
            # mapping breaks under eval_2hz/manual_split subsampling
            if info.frame_tokens and scene.frame_row_of_token:
                for f, tok in enumerate(info.frame_tokens):
                    row = scene.frame_row_of_token.get((info.travel_id, tok))
                    if row is not None:
                        q[row] = info.quats[f]
                        t[row] = info.trans[f]
                        pr[row] = float(info.in_frame_mask[f])
            else:  # legacy positional fallback
                rows = np.where(
                    scene.travel_of_frame
                    == scene.travel_index_of_id[info.travel_id])[0]
                m = min(len(rows), len(info.quats))
                q[rows[:m]] = info.quats[:m]
                t[rows[:m]] = info.trans[:m]
                pr[rows[:m]] = info.in_frame_mask[:m].astype(np.float32)
            if info.is_static and info.in_frame_mask.any():
                # single-pose mode (ref rigid_node.py:100-104): mean
                # in-frame pose, visible across its WHOLE traversal
                mask = info.in_frame_mask
                qs = info.quats[mask]
                qs = qs * np.sign(np.sum(qs * qs[:1], axis=1, keepdims=True))
                mq = qs.mean(0)
                mq /= max(np.linalg.norm(mq), 1e-9)
                mt = info.trans[mask].mean(0)
                trav_rows = np.where(
                    scene.travel_of_frame
                    == scene.travel_index_of_id[info.travel_id])[0]
                q[trav_rows] = mq
                t[trav_rows] = mt
                pr[trav_rows] = 1.0
            quats.append(q)
            trans.append(t)
            present.append(pr)
            static.append(float(info.is_static))
            alive.append(naux.alive)
            num_alive.append(naux.num_alive)
            sizes.append(info.size[:3])
        params = InstanceParams(
            node=jax.tree.map(lambda *xs: jnp.stack(xs), *nodes),
            quats=jnp.asarray(np.stack(quats)),
            trans=jnp.asarray(np.stack(trans)),
        )
        iaux = InstanceAux(
            alive=jnp.stack(alive),
            num_alive=jnp.stack(num_alive),
            present=jnp.asarray(np.stack(present)),
            is_static=jnp.asarray(np.asarray(static, np.float32)),
            frame_timestamps=jnp.asarray(scene.frame_timestamps),
            travel_of_frame=jnp.asarray(scene.travel_of_frame),
            sizes=jnp.asarray(np.stack(sizes), jnp.float32),
        )
        inst = (params, iaux)

    num_cams = max(r.cam_idx for r in scene.records) + 1
    return init_scene(
        bg, sky, inst,
        num_cameras=num_cams,
        num_images=scene.num_frame_rows * 16,
    )


def eval_setup(run_dir, *, data=None, step=None, cameras=None):
    """Reload a trained run for eval/render/viewer — the reference's
    `eval_setup` (`mtgs/tools/render.py:222-259`: config.yml + ckpt +
    re-applied camera-pose optimization; render with
    `apply_cam_opt=True` to reproduce the latter).

    Args:
        run_dir: directory written by `main` (run_config.json + ckpts).
        data: override the dataset root recorded in run_config.json.
        step: checkpoint step (default: latest `step-*` in run_dir).

    Returns (params, aux, cfg, scene, run_cfg_dict).
    """
    from mtgs_tpu.configs import method_config
    from mtgs_tpu.data.dataset import SampleConfig
    from mtgs_tpu.data.nuplan import parse_scene
    from mtgs_tpu.train.checkpoint import load_checkpoint_partial

    run_dir = Path(run_dir)
    rc = json.loads((run_dir / "run_config.json").read_text())
    cfg = method_config(rc["method"], width=rc["width"], height=rc["height"],
                        max_steps=rc["steps"])
    parse_kw = {}
    cams = cameras if cameras is not None else rc.get("cameras")
    if cams is not None:
        parse_kw["cameras"] = tuple(cams)
    scene = parse_scene(data or rc["data"], split="train",
                        train_travels=rc.get("travels"),
                        eval_travels=rc.get("eval_travels"), **parse_kw)
    params, aux = build_model_from_parsed(
        scene, cfg, SampleConfig(scale_factor=rc.get("scale", 0.5)))

    ckpts = sorted(run_dir.glob("step-*"))
    if not ckpts:
        raise FileNotFoundError(f"no step-* checkpoints under {run_dir}")
    path = (run_dir / f"step-{step:09d}") if step is not None else ckpts[-1]
    restored = load_checkpoint_partial(path, {"params": params, "aux": aux})
    return restored["params"], restored["aux"], cfg, scene, rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None,
                    help="road block folder (or use --data-config)")
    ap.add_argument("--data-config", default=None,
                    help="RoadBlockConfig .yaml/.yml/.py (the reference's "
                    "data-config layer, nuplan_scripts/utils/config.py:38-108)"
                    " — supplies the road block folder")
    ap.add_argument("--out", required=True)
    ap.add_argument("--method", default="mtgs")
    ap.add_argument("--steps", type=int, default=30001)
    ap.add_argument("--travels", type=int, nargs="*", default=None)
    ap.add_argument("--eval-travels", type=int, nargs="*", default=None)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--balanced-sampler", action="store_true")
    ap.add_argument("--save-every", type=int, default=0,
                    help="periodic checkpoint interval (0 = final only)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest step-* checkpoint in --out")
    ap.add_argument("--stage-scales", type=float, nargs="*", default=None,
                    help="multi-resolution ladder: equal step spans per "
                         "scale, e.g. 0.25 0.5 1.0")
    args = ap.parse_args()

    from mtgs_tpu.configs import method_config, optimizer_table
    from mtgs_tpu.data.dataset import SampleConfig
    from mtgs_tpu.data.loader import batch_from_sample, data_iterator, SampleCache
    from mtgs_tpu.data.nuplan import parse_scene
    from mtgs_tpu.eval.pipeline import evaluate_scene
    from mtgs_tpu.train.checkpoint import (
        save_checkpoint, save_checkpoint_rotating)
    from mtgs_tpu.train.trainer import Trainer

    if args.data_config:
        from mtgs_tpu.preprocess.roadblock_config import load_road_block_config

        rb = load_road_block_config(args.data_config)
        args.data = args.data or str(rb.scene_dir)
    if not args.data:
        ap.error("--data or --data-config required")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    cfg = method_config(args.method, width=args.width, height=args.height,
                        max_steps=args.steps)
    sample_cfg = SampleConfig(scale_factor=args.scale)

    print(f"[train_scene] parsing {args.data}")
    scene = parse_scene(args.data, split="train", train_travels=args.travels,
                        eval_travels=args.eval_travels)
    params, aux = build_model_from_parsed(scene, cfg, sample_cfg)

    stages = factory = data = None
    if args.stage_scales:
        from mtgs_tpu.data.loader import staged_iterator_factory

        span = args.steps // len(args.stage_scales)
        stages = [(k * span, s) for k, s in enumerate(args.stage_scales)]
        factory = staged_iterator_factory(
            scene, sample_cfg, balanced=args.balanced_sampler)
        # the trainer installs factory(stages[0]) before the first step —
        # don't prefetch a full-resolution cache that would be discarded
    else:
        data = data_iterator(scene, sample_cfg, balanced=args.balanced_sampler)
    trainer = Trainer(cfg, params, aux, data,
                      optim_config=optimizer_table(args.steps),
                      data_factory=factory, resolution_stages=stages)

    done_steps = 0
    if args.resume:
        ckpts = sorted(out.glob("step-*"))
        if ckpts:
            from mtgs_tpu.train.checkpoint import load_checkpoint

            template = {
                "params": trainer.state.params,
                "densify": trainer.state.densify,
                "step": jnp.zeros((), jnp.int32),
                "aux": trainer.aux,
                "opt_state": trainer.state.opt_state,
            }
            try:
                restored = load_checkpoint(ckpts[-1], template)
            except Exception:
                # final (stripped) checkpoints carry no optimizer state
                template.pop("opt_state")
                restored = load_checkpoint(ckpts[-1], template)
                restored["opt_state"] = trainer.state.opt_state
            trainer.state = trainer.state.replace(
                params=restored["params"], densify=restored["densify"],
                step=jnp.asarray(restored["step"], jnp.int32),
                opt_state=restored["opt_state"])
            trainer.aux = restored["aux"]
            done_steps = int(restored["step"])
            print(f"[train_scene] resumed from {ckpts[-1].name}")

    t0 = time.time()

    def log(step, metrics):
        el = time.time() - t0
        print(f"[{step:6d}] {el:7.1f}s " +
              " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items())
                       if k in ("total_loss", "psnr", "gaussian_count")),
              flush=True)
        if args.save_every and step and step % args.save_every == 0:
            save_checkpoint_rotating(out, trainer.state, trainer.aux, step)

    trainer.train(max(args.steps - done_steps, 0),
                  log_every=(args.save_every or 100), callback=log)
    # final checkpoint: optimizer state stripped (ref custom_trainer.py)
    save_checkpoint(out / f"step-{args.steps:09d}", trainer.state,
                    trainer.aux, keep_optimizer=False)
    # run metadata so eval_setup / render tools can reload this run
    # standalone (the reference's config.yml, `render.py:229`)
    (out / "run_config.json").write_text(json.dumps(dict(
        method=args.method, data=str(Path(args.data).absolute()),
        steps=args.steps, width=args.width, height=args.height,
        scale=args.scale, travels=args.travels,
        eval_travels=args.eval_travels,
    ), indent=2))

    # full eval on the eval split
    eval_scene = parse_scene(args.data, split="val", train_travels=args.travels,
                             eval_travels=args.eval_travels, load_points=False)
    cache = SampleCache(eval_scene.records, sample_cfg, strategy="on_demand")
    batches = (
        batch_from_sample(r, cache.get(i))
        for i, r in enumerate(eval_scene.records)
    )
    travel_modes = {
        t: ("index" if t in scene.train_travel_ids else "index")
        for t in eval_scene.eval_travel_ids
    }
    result = evaluate_scene(
        trainer.state.params, trainer.aux, cfg, batches,
        output_path=str(out / "eval_result.json"),
    )
    print(json.dumps({k: round(v, 4) for k, v in result.items()}, indent=2))


if __name__ == "__main__":
    main()
