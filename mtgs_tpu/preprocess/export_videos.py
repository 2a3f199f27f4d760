"""Stage 2: per-traversal preview mosaics (+ BEV trajectory inset).

Equivalent of `nuplan_scripts/export_videos.py` (OpenDriveLab/MTGS):
for every traversal, render a camera-mosaic preview video — each frame
is a grid of that frame's camera images plus a bird's-eye-view inset
showing all traversals' trajectories (gray), the current traversal
(colored), and the current ego position (dot). The reference overlays
the nuPlan map; the map API is unavailable here, so the inset shows
trajectories only. Frames are written as PNGs and an mp4 per traversal
when ffmpeg exists (same convention as `mtgs_tpu/tools/render.py`).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from mtgs_tpu.preprocess.video_scene import VideoScene
from mtgs_tpu.tools.preview import _COLORS, trajectory_xy


def _bev_inset(trajs: Dict[int, np.ndarray], current: int, pos: np.ndarray,
               size: int):
    """PIL image: all trajectories gray, `current` colored, dot at pos."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (size, size), (24, 24, 24))
    draw = ImageDraw.Draw(img)
    allxy = np.concatenate(list(trajs.values()))
    lo, hi = allxy.min(0), allxy.max(0)
    span = float(np.maximum(hi - lo, 1e-6).max())
    pad = 10

    def to_px(xy):
        u = pad + (xy[..., 0] - lo[0]) / span * (size - 2 * pad)
        v = size - pad - (xy[..., 1] - lo[1]) / span * (size - 2 * pad)
        return np.stack([u, v], -1)

    for idx, xy in trajs.items():
        px = to_px(xy)
        color = (_COLORS[idx % len(_COLORS)] if idx == current else "#666666")
        draw.line([tuple(p) for p in px], fill=color, width=2 if idx == current else 1)
    p = to_px(pos[None])[0]
    draw.ellipse([p[0] - 4, p[1] - 4, p[0] + 4, p[1] + 4], fill="#ffffff")
    return img


def export_traversal_videos(
    vs: VideoScene,
    *,
    cameras: Optional[Sequence[str]] = None,
    fps: int = 10,
    tile_width: int = 320,
    out_dir: Optional[str | Path] = None,
    make_video: bool = True,
    max_frames: Optional[int] = None,
) -> List[Path]:
    """Write one preview mosaic per traversal; returns written paths."""
    from PIL import Image

    vsd = vs.load()
    out_root = Path(out_dir) if out_dir is not None else vs.root / "preview_videos"
    trajs = {
        int(str(t).split("-")[-1]): trajectory_xy(info)
        for t, info in vsd.items()
    }
    trajs = {k: v for k, v in trajs.items() if len(v)}
    written: List[Path] = []

    for token, info in vsd.items():
        idx = int(str(token).split("-")[-1])
        frames = info.get("frame_infos", [])
        if max_frames is not None:
            frames = frames[:max_frames]
        if not frames:
            continue
        cams = list(cameras) if cameras is not None else sorted(
            frames[0].get("cams", {}).keys())
        ncols = math.ceil(math.sqrt(len(cams) + 1))
        nrows = math.ceil((len(cams) + 1) / ncols)
        vid_dir = out_root / f"traversal_{idx}"
        vid_dir.mkdir(parents=True, exist_ok=True)

        th = None
        for fi, frame in enumerate(frames):
            tiles = []
            for cam in cams:
                ci = frame.get("cams", {}).get(cam)
                tile = None
                if ci is not None:
                    p = vs.root / "raw_images" / ci["data_path"]
                    if p.exists():
                        tile = Image.open(p).convert("RGB")
                if tile is None:
                    tile = Image.new("RGB", (tile_width, tile_width * 9 // 16),
                                     (8, 8, 8))
                w, h = tile.size
                th = tile_width * h // w if th is None else th
                tiles.append(tile.resize((tile_width, th)))
            if "ego2global" in frame:
                pos = np.asarray(frame["ego2global"], np.float64)[:2, 3]
            else:
                pos = np.asarray(
                    frame.get("ego2global_translation",
                              frame.get("can_bus", [0, 0, 0])[:3]),
                    np.float64)[:2]
            bev = _bev_inset(trajs, idx, pos, min(tile_width, th or tile_width))
            tiles.append(bev.resize((tile_width, th or tile_width)))

            mosaic = Image.new("RGB", (ncols * tile_width, nrows * (th or tile_width)))
            for k, tile in enumerate(tiles):
                mosaic.paste(tile, ((k % ncols) * tile_width,
                                    (k // ncols) * (th or tile_width)))
            fp = vid_dir / f"frame_{fi:05d}.png"
            mosaic.save(fp)
            written.append(fp)

        if make_video and written:
            from mtgs_tpu.tools.render import frames_to_mp4

            mp4 = frames_to_mp4(vid_dir, fps, out_name="preview.mp4")
            if mp4 is not None:
                written.append(mp4)
    return written
