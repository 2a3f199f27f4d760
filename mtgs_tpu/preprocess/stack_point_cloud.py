"""RGB point-cloud stacking (stage 8 of the data factory).

numpy rewrite of the reference's seed-cloud builder
(`nuplan_scripts/stack_RGB_point_cloud.py` +
`utils/stack_point_cloud_utils.py` + `utils/nuplan_utils_custom.py` in
OpenDriveLab/MTGS): per frame, split the LiDAR scan into background vs
per-instance boxes, paint points with colors from the (undistorted)
cameras, align per-camera brightness (`v_adjust`), and accumulate a
global background cloud plus per-track instance clouds in box-local
frames. Semantic filtering (dropping sky/person/vehicle points from the
background) applies when semantic maps exist.

Outputs: `stacked_point_cloud/background.pcd.npz` and
`instance_point_cloud/<track>.pcd.npz` (the npz twin of the reference's
.pcd files, readable by `mtgs_tpu.utils.pointcloud.load_pcd`).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mtgs_tpu.utils.pointcloud import save_pcd_npz, voxel_downsample

# cityscapes ids kept in the background cloud (ref: semantic classes < 10,
# i.e. static structure — drops sky(10), person(11+), vehicles(13+))
BACKGROUND_MAX_CLASS = 10


def points_in_boxes(
    pts: np.ndarray, boxes: np.ndarray
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Split ego-frame points into background vs per-box masks.

    boxes: [B, 7] (x, y, z, l, w, h, heading) — ref
    `stack_point_cloud_utils.py:84-155`.
    Returns (background_mask [n], [per-box mask [n]]).
    """
    n = len(pts)
    bg = np.ones(n, bool)
    per_box = []
    for b in boxes:
        c, s = np.cos(-b[6]), np.sin(-b[6])
        local = pts[:, :3] - b[:3]
        lx = local[:, 0] * c - local[:, 1] * s
        ly = local[:, 0] * s + local[:, 1] * c
        m = (
            (np.abs(lx) <= b[3] / 2 + 0.1)
            & (np.abs(ly) <= b[4] / 2 + 0.1)
            & (np.abs(local[:, 2]) <= b[5] / 2 + 0.1)
        )
        per_box.append(m)
        bg &= ~m
    return bg, per_box


def paint_points(
    pts_ego: np.ndarray,
    images: Sequence[np.ndarray],           # undistorted [H, W, 3] float 0..1
    cam2egos: Sequence[np.ndarray],         # [4, 4] cv-frame cam2ego
    Ks: Sequence[np.ndarray],
    semantics: Optional[Sequence[Optional[np.ndarray]]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Color each ego-frame point from the first camera that sees it.

    Ref `get_rgb_point_cloud` (`nuplan_utils_custom.py:174-266`).
    Returns (rgb [n,3] 0..255, seen_mask [n], semantic_label [n] or -1).
    """
    n = len(pts_ego)
    rgb = np.zeros((n, 3), np.float32)
    seen = np.zeros(n, bool)
    sem = np.full(n, -1, np.int32)
    for i, (img, c2e, K) in enumerate(zip(images, cam2egos, Ks)):
        h, w = img.shape[:2]
        e2c = np.linalg.inv(c2e)
        p = pts_ego @ e2c[:3, :3].T + e2c[:3, 3]
        z = p[:, 2]
        ok = z > 0.1
        u = np.zeros(n, np.int32)
        v = np.zeros(n, np.int32)
        u[ok] = (p[ok, 0] / z[ok] * K[0, 0] + K[0, 2]).astype(np.int32)
        v[ok] = (p[ok, 1] / z[ok] * K[1, 1] + K[1, 2]).astype(np.int32)
        ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
        new = ok & ~seen
        rgb[new] = img[v[new], u[new]] * 255.0
        if semantics is not None and semantics[i] is not None:
            sem[new] = semantics[i][v[new], u[new]]
        seen |= new
    return rgb, seen, sem


def brightness_adjust_factors(
    images: Sequence[np.ndarray], reference_idx: int = 0
) -> List[float]:
    """Per-camera V-channel gain aligning brightness to a reference camera
    (ref `adjust_brightness_single_frame`, `nuplan_utils_custom.py:334-424`)."""
    def value(img):
        return float(np.mean(img.max(axis=-1)))  # HSV V = max(R,G,B)

    ref = max(value(images[reference_idx]), 1e-6)
    return [ref / max(value(im), 1e-6) for im in images]


@dataclasses.dataclass
class StackAccumulator:
    """Accumulates background + per-instance clouds across frames
    (ref `stack_point_cloud_utils.py:157-241`)."""

    voxel: float = 0.15
    background_xyz: List[np.ndarray] = dataclasses.field(default_factory=list)
    background_rgb: List[np.ndarray] = dataclasses.field(default_factory=list)
    instances: Dict[str, List[Tuple[np.ndarray, np.ndarray]]] = dataclasses.field(
        default_factory=dict
    )

    def add_frame(
        self,
        pts_ego: np.ndarray,
        rgb: np.ndarray,
        seen: np.ndarray,
        sem: np.ndarray,
        ego2global: np.ndarray,
        boxes: np.ndarray,
        track_tokens: Sequence[str],
    ):
        bg_mask, per_box = points_in_boxes(pts_ego, boxes)
        keep = bg_mask & seen
        if sem is not None:
            keep &= (sem < BACKGROUND_MAX_CLASS) | (sem < 0)
        pts_w = pts_ego[keep] @ ego2global[:3, :3].T + ego2global[:3, 3]
        self.background_xyz.append(pts_w.astype(np.float32))
        self.background_rgb.append(rgb[keep])

        for m, b, tok in zip(per_box, boxes, track_tokens):
            m = m & seen
            if m.sum() < 5:
                continue
            c, s = np.cos(-b[6]), np.sin(-b[6])
            local = pts_ego[m, :3] - b[:3]
            lx = local[:, 0] * c - local[:, 1] * s
            ly = local[:, 0] * s + local[:, 1] * c
            box_local = np.stack([lx, ly, local[:, 2]], -1)
            self.instances.setdefault(tok, []).append(
                (box_local.astype(np.float32), rgb[m])
            )

    def finalize(self, out_dir: str | Path):
        out = Path(out_dir)
        (out / "stacked_point_cloud").mkdir(parents=True, exist_ok=True)
        (out / "instance_point_cloud").mkdir(parents=True, exist_ok=True)
        if self.background_xyz:
            xyz = np.concatenate(self.background_xyz)
            rgb = np.concatenate(self.background_rgb)
            xyz, rgb = voxel_downsample(xyz, rgb, self.voxel)
            save_pcd_npz(out / "stacked_point_cloud" / "background.pcd.npz", xyz, rgb)
        for tok, chunks in self.instances.items():
            xyz = np.concatenate([c[0] for c in chunks])
            rgb = np.concatenate([c[1] for c in chunks])
            xyz, rgb = voxel_downsample(xyz, rgb, self.voxel / 2)
            save_pcd_npz(out / "instance_point_cloud" / f"{tok}.pcd.npz", xyz, rgb)
