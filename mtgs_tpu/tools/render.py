"""Trajectory / dataset rendering.

Counterpart of `mtgs/tools/render.py` (OpenDriveLab/MTGS): the
`interpolate` mode upsamples a traversal's camera path to a target frame
rate with slerp pose interpolation and renders video frames; `dataset`
renders every split view (optionally side-by-side with ground truth).
Videos are written as PNG frame folders plus an mp4 when ffmpeg exists.
"""

from __future__ import annotations

import dataclasses
import math
import subprocess
from pathlib import Path
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mtgs_tpu.core.quat import quat_to_rotmat, rotmat_to_quat, slerp
from mtgs_tpu.models.scene_graph import SceneAux, SceneParams
from mtgs_tpu.train.trainer import Batch, TrainerConfig, render_view


def frames_to_mp4(frame_dir: str | Path, fps: int,
                  out_name: str = "render.mp4") -> Optional[Path]:
    """Encode `frame_%05d.png` under `frame_dir` with ffmpeg; returns the
    mp4 path, or None when ffmpeg is unavailable (frames remain)."""
    frame_dir = Path(frame_dir)
    out = frame_dir / out_name
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-framerate", str(fps),
             "-i", str(frame_dir / "frame_%05d.png"),
             "-pix_fmt", "yuv420p", str(out)],
            check=True,
        )
        return out
    except (FileNotFoundError, subprocess.CalledProcessError):
        return None


def interpolate_poses(
    c2ws: np.ndarray, timestamps: np.ndarray, target_hz: float = 60.0, source_hz: float = 2.0
) -> tuple[np.ndarray, np.ndarray]:
    """Slerp-upsample a pose trajectory (ref `_get_interpolated_camera_path`,
    `render.py:261-301`). Returns (poses [M,4,4], times [M])."""
    n = len(c2ws)
    factor = max(int(round(target_hz / source_hz)), 1)
    out_poses, out_ts = [], []
    quats = np.asarray(rotmat_to_quat(jnp.asarray(c2ws[:, :3, :3])))
    for i in range(n - 1):
        for k in range(factor):
            t = k / factor
            q = np.asarray(slerp(jnp.asarray(quats[i]), jnp.asarray(quats[i + 1]), jnp.asarray(t)))
            tr = c2ws[i, :3, 3] * (1 - t) + c2ws[i + 1, :3, 3] * t
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = np.asarray(quat_to_rotmat(jnp.asarray(q)))
            m[:3, 3] = tr
            out_poses.append(m)
            out_ts.append(timestamps[i] * (1 - t) + timestamps[i + 1] * t)
    out_poses.append(c2ws[-1])
    out_ts.append(timestamps[-1])
    return np.stack(out_poses), np.asarray(out_ts, np.float32)


def render_trajectory(
    params: SceneParams,
    aux: SceneAux,
    cfg: TrainerConfig,
    poses: np.ndarray,          # [M, 4, 4] scene-frame c2w
    timestamps: np.ndarray,     # [M] normalized
    K: np.ndarray,
    travel_index: int,
    out_dir: str | Path,
    *,
    frame_rows: Optional[np.ndarray] = None,  # per-pose frame row for rigid gating
    fps: int = 30,
    make_video: bool = True,
) -> List[Path]:
    """Render a pose path to PNG frames (+ mp4 if ffmpeg available)."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    H, W = cfg.height, cfg.width

    interp_cfg = cfg.replace(scene=cfg.scene.replace(interp_poses=True))

    @jax.jit
    def render_one(p, a, batch):
        out = render_view(p, a, interp_cfg, batch, jnp.asarray(10**6), training=False)
        return out["rgb_appearance"], out["depth"]

    paths = []
    for i, (pose, ts) in enumerate(zip(poses, timestamps)):
        batch = Batch(
            image=jnp.zeros((H, W, 3), jnp.float32),
            mask=jnp.ones((H, W, 1), jnp.float32),
            c2w=jnp.asarray(pose, jnp.float32),
            K=jnp.asarray(K, jnp.float32),
            cam_idx=jnp.asarray(0, jnp.int32),
            image_idx=jnp.asarray(0, jnp.int32),
            travel_index=jnp.asarray(travel_index, jnp.int32),
            frame_idx=jnp.asarray(
                int(frame_rows[i]) if frame_rows is not None else 0, jnp.int32
            ),
            timestamp=jnp.asarray(float(ts), jnp.float32),
            lidar_depth=jnp.zeros((H, W, 1), jnp.float32),
            pseudo_depth=jnp.zeros((H, W, 1), jnp.float32),
        )
        rgb, _ = render_one(params, aux, batch)
        p = out_dir / f"frame_{i:05d}.png"
        Image.fromarray(np.asarray(jnp.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(p)
        paths.append(p)

    if make_video and paths:
        frames_to_mp4(out_dir, fps)
    return paths


def load_camera_path_json(path: str | Path) -> dict:
    """Parse a viewer camera-path JSON (the `camera-path` render mode,
    ref `RenderCameraPath` in `mtgs/tools/render.py` — nerfstudio's
    keyframed path format: per-frame `camera_to_world` (row-major 16
    floats) + vertical `fov` degrees, plus render size/fps/seconds).

    Returns dict(poses [M, 4, 4], Ks [M, 3, 3], width, height, fps).
    """
    import json

    spec = json.loads(Path(path).read_text())
    W = int(spec.get("render_width", 1920))
    H = int(spec.get("render_height", 1080))
    frames = spec.get("camera_path", [])
    n = len(frames)
    fps = float(spec.get("fps", n / max(float(spec.get("seconds", n / 30.0)), 1e-6)))
    poses = np.zeros((n, 4, 4), np.float32)
    Ks = np.zeros((n, 3, 3), np.float32)
    for i, f in enumerate(frames):
        poses[i] = np.asarray(f["camera_to_world"], np.float32).reshape(4, 4)
        fov = float(f.get("fov", 50.0))
        fy = 0.5 * H / np.tan(0.5 * np.deg2rad(fov))
        Ks[i] = [[fy, 0, W / 2], [0, fy, H / 2], [0, 0, 1]]
    return dict(poses=poses, Ks=Ks, width=W, height=H, fps=fps)


def render_camera_path(
    params: SceneParams,
    aux: SceneAux,
    cfg: TrainerConfig,
    camera_path_json: str | Path,
    out_dir: str | Path,
    *,
    travel_index: int = 0,
    make_video: bool = True,
) -> List[Path]:
    """Render a viewer-authored camera path (`camera-path` subcommand)."""
    spec = load_camera_path_json(camera_path_json)
    cfg = cfg.replace(width=spec["width"], height=spec["height"])
    ts = np.linspace(0.0, 1.0, len(spec["poses"]), dtype=np.float32)
    return render_trajectory(
        params, aux, cfg, spec["poses"], ts, spec["Ks"][0],
        travel_index, out_dir, fps=int(round(spec["fps"])),
        make_video=make_video,
    )


def depth_colormap(depth: np.ndarray, *, near: float = 0.0,
                   far: Optional[float] = None) -> np.ndarray:
    """Turbo-style colormap for metric depth -> uint8 RGB (the
    reference's nerfstudio `colormaps.apply_depth_colormap` role)."""
    d = np.asarray(depth, np.float32).squeeze()
    if far is None:
        valid = d[np.isfinite(d) & (d > 0)]
        far = float(np.percentile(valid, 95.0)) if valid.size else 1.0
    x = np.clip((d - near) / max(far - near, 1e-6), 0.0, 1.0)
    # compact turbo polynomial fit (Google turbo colormap endpoints)
    r = np.clip(1.61 * x ** 0.8 - 0.55 * x ** 3, 0, 1)
    g = np.clip(np.sin(np.pi * x), 0, 1) ** 1.2
    b = np.clip(1.0 - 1.35 * x + 0.45 * np.sin(3 * np.pi * x) * (1 - x), 0, 1)
    rgb = np.nan_to_num(np.stack([r, g, b], -1), nan=0.0)
    return (rgb * 255).astype(np.uint8)


def render_dataset(
    params: SceneParams,
    aux: SceneAux,
    cfg: TrainerConfig,
    batches: Iterable[Batch],
    out_dir: str | Path,
    *,
    outputs: Sequence[str] = ("rgb", "gt", "depth"),
    apply_cam_opt: bool = True,
    step: int = 10**9,
) -> List[Path]:
    """Render every dataset view with the requested layers — the
    `dataset` subcommand (ref `DatasetRender`, `mtgs/tools/render.py:
    569-746`): rgb render, ground truth, and turbo-colormapped depth,
    one subfolder per layer. Trained camera-pose deltas are re-applied
    (the reference's `load_cam_optim_from` path)."""
    from PIL import Image

    out_dir = Path(out_dir)
    render = jax.jit(
        lambda p, b: render_view(
            p, aux, cfg, b, jnp.asarray(step, jnp.int32),
            training=False, apply_cam_opt=apply_cam_opt,
        )
    )
    written: List[Path] = []
    for i, batch in enumerate(batches):
        out = render(params, batch)
        layers = {}
        if "rgb" in outputs:
            layers["rgb"] = np.asarray(
                jnp.clip(out["rgb_appearance"], 0, 1) * 255).astype(np.uint8)
        if "gt" in outputs:
            layers["gt"] = np.asarray(
                jnp.clip(batch.image, 0, 1) * 255).astype(np.uint8)
        if "depth" in outputs:
            layers["depth"] = depth_colormap(np.asarray(out["depth"]))
        for name, img in layers.items():
            p = out_dir / name / f"{i:05d}.png"
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(img).save(p)
            written.append(p)
    return written


def render_interpolated(
    params: SceneParams,
    aux: SceneAux,
    cfg: TrainerConfig,
    scene,                        # ParsedScene
    travel_index: int,
    out_dir: str | Path,
    *,
    cameras: Sequence[str] = ("CAM_L0", "CAM_F0", "CAM_R0"),
    target_hz: float = 60.0,
    source_hz: float = 2.0,
    fps: int = 60,
    make_video: bool = True,
) -> List[Path]:
    """`interpolate` mode (ref `RenderInterpolated`, `mtgs/tools/
    render.py:439-552`): slerp-upsample one traversal's per-camera pose
    path to `target_hz` and write side-by-side camera mosaics (the
    reference concats the front / back 3-camera sets)."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    recs = [r for r in scene.records if r.travel_index == travel_index]
    per_cam = {}
    for name in cameras:
        cam_recs = sorted(
            (r for r in recs if r.cam_name == name), key=lambda r: r.frame_idx)
        if not cam_recs:
            continue
        c2ws = np.stack([r.c2w for r in cam_recs])
        ts = np.asarray([r.timestamp for r in cam_recs], np.float64)
        poses, tsi = interpolate_poses(
            c2ws, ts, target_hz=target_hz, source_hz=source_hz)
        K = cam_recs[0].intrinsic.copy()
        # rescale raw intrinsics onto the render size
        K[0] *= cfg.width / cam_recs[0].width
        K[1] *= cfg.height / cam_recs[0].height
        frame_rows = np.repeat(
            [r.frame_idx for r in cam_recs],
            math.ceil(len(poses) / max(len(cam_recs), 1)))[: len(poses)]
        per_cam[name] = (poses, tsi, K, frame_rows)
    if not per_cam:
        raise ValueError(f"traversal {travel_index} has none of {cameras}")

    n = min(len(v[0]) for v in per_cam.values())
    interp_cfg = cfg.replace(scene=cfg.scene.replace(interp_poses=True))

    @jax.jit
    def render_one(p, batch):
        return render_view(
            p, aux, interp_cfg, batch, jnp.asarray(10**6), training=False
        )["rgb_appearance"]

    paths: List[Path] = []
    H, W = cfg.height, cfg.width
    for i in range(n):
        tiles = []
        for name in cameras:
            if name not in per_cam:
                continue
            poses, tsi, K, frame_rows = per_cam[name]
            batch = Batch(
                image=jnp.zeros((H, W, 3), jnp.float32),
                mask=jnp.ones((H, W, 1), jnp.float32),
                c2w=jnp.asarray(poses[i], jnp.float32),
                K=jnp.asarray(K, jnp.float32),
                cam_idx=jnp.asarray(0, jnp.int32),
                image_idx=jnp.asarray(0, jnp.int32),
                travel_index=jnp.asarray(travel_index, jnp.int32),
                frame_idx=jnp.asarray(int(frame_rows[i]), jnp.int32),
                timestamp=jnp.asarray(float(tsi[i]), jnp.float32),
                lidar_depth=jnp.zeros((H, W, 1), jnp.float32),
                pseudo_depth=jnp.zeros((H, W, 1), jnp.float32),
            )
            rgb = render_one(params, batch)
            tiles.append(
                np.asarray(jnp.clip(rgb, 0, 1) * 255).astype(np.uint8))
        mosaic = np.concatenate(tiles, axis=1)
        p = out_dir / f"frame_{i:05d}.png"
        Image.fromarray(mosaic).save(p)
        paths.append(p)

    if make_video and paths:
        frames_to_mp4(out_dir, fps)
    return paths
