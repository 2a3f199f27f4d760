"""Stage 1: road-block scan + traversal ("video") splitting.

Rewrite of the reference's `nuplan_scripts/nuplan_video_processing.py`
core (OpenDriveLab/MTGS) on plain numpy trajectories:

  * `trajectory_intersects_block` — the cheap prefilter that selects
    candidate logs from the one-time log-info cache (ref
    `get_filtered_sensor_data_from_db:398-414`, cache built by
    `misc/generate_nuplan_log_info.py` as jsonl rows
    {log_name, trajectory, lidar_pc_tokens}).
  * `split_in_region_videos` — cut a log's frame sequence into contiguous
    in-region runs at `interval` subsampling (10 Hz / interval), each
    expanded by `expand_buffer` meters of travel beyond the block
    (ref `split_scenes_from_log:56-143`).
  * `sort_and_dedupe_videos` — FrameCentral ordering: the traversal
    containing the central token first, then dedupe traversals whose
    trajectories are within `dedupe_chamfer` m one-directional chamfer
    distance (ref `sort_video_infos:169-234`, threshold 4 m).

The nuPlan-devkit ORM part (building per-frame `frame_info` records with
camera/LiDAR paths from the 20 TB sensor DB) requires the dataset
release and stays behind `build_frame_infos_nuplan` which imports
nuplan-devkit lazily.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from mtgs_tpu.data.nuplan import chamfer_distance


def generate_log_info_cache(
    openscene_root: str | Path,
    output_path: str | Path,
    *,
    splits: Sequence[str] = ("trainval", "test"),
) -> int:
    """Build the log→(trajectory, lidar-pc tokens) jsonl cache from
    OpenScene per-log metadata pickles (ref
    `nuplan_scripts/misc/generate_nuplan_log_info.py`): one row per log
    with log/city/split identifiers, the lidar-pc token sequence, and the
    2-dp-rounded 2D ego trajectory — the index that lets stage 1 find
    road-block traversals without scanning 20 TB of nuPlan DBs.
    Returns the number of rows written."""
    import pickle

    rows = []
    for split in splits:
        folder = Path(openscene_root) / "meta_datas" / split
        if not folder.is_dir():
            continue
        for file in sorted(folder.glob("*.pkl")):
            if not file.is_file():
                continue
            with file.open("rb") as f:
                infos = pickle.load(f)
            if not infos:
                continue
            traj = np.asarray(
                [i["ego2global_translation"] for i in infos], np.float64
            )[:, :2]
            rows.append({
                "log_name": file.stem,
                "log_token": infos[0]["log_token"],
                "city": infos[0]["map_location"],
                "split": split,
                "lidar_pc_tokens": [i["token"] for i in infos],
                "trajectory": np.round(traj, 2).tolist(),
            })
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with open(output_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return len(rows)


def iter_log_info_cache(path: str | Path) -> Iterator[dict]:
    """Yield rows of the log-info jsonl cache."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def trajectory_intersects_block(
    trajectory: np.ndarray, road_block: Sequence[float]
) -> bool:
    """Any point of [N, >=2] trajectory inside (x_min, y_min, x_max, y_max)."""
    t = np.asarray(trajectory)[:, :2]
    x0, y0, x1, y1 = road_block
    inside = (t[:, 0] >= x0) & (t[:, 0] <= x1) & (t[:, 1] >= y0) & (t[:, 1] <= y1)
    return bool(inside.any())


def split_in_region_videos(
    positions: np.ndarray,
    road_block: Sequence[float],
    *,
    interval: int = 1,
    expand_buffer: float = 30.0,
    min_frames: int = 10,
) -> List[np.ndarray]:
    """Split one log's frame positions into in-region traversal index runs.

    Args:
        positions: [N, >=2] ego positions at base rate (10 Hz).
        road_block: (x_min, y_min, x_max, y_max).
        interval: keep every `interval`-th frame (10 Hz / interval).
        expand_buffer: extend each run while cumulative travel distance
            beyond the region stays under this many meters.
        min_frames: drop runs shorter than this (after subsampling).

    Returns list of int index arrays into `positions`.
    """
    pos = np.asarray(positions, np.float64)
    x0, y0, x1, y1 = road_block
    inside = (
        (pos[:, 0] >= x0) & (pos[:, 0] <= x1) & (pos[:, 1] >= y0) & (pos[:, 1] <= y1)
    )
    runs: List[Tuple[int, int]] = []
    i = 0
    n = len(pos)
    while i < n:
        if not inside[i]:
            i += 1
            continue
        j = i
        while j + 1 < n and inside[j + 1]:
            j += 1
        runs.append((i, j))
        i = j + 1

    videos: List[np.ndarray] = []
    for s, e in runs:
        # expand both directions by travel distance
        a = s
        dist = 0.0
        while a > 0 and dist < expand_buffer:
            dist += float(np.linalg.norm(pos[a, :2] - pos[a - 1, :2]))
            a -= 1
        b = e
        dist = 0.0
        while b + 1 < n and dist < expand_buffer:
            dist += float(np.linalg.norm(pos[b + 1, :2] - pos[b, :2]))
            b += 1
        idx = np.arange(a, b + 1)[::interval]
        if len(idx) >= min_frames:
            videos.append(idx)
    return videos


def sort_and_dedupe_videos(
    video_infos: List[dict],
    *,
    central_token: str | None = None,
    dedupe_chamfer: float = 4.0,
) -> List[dict]:
    """FrameCentral traversal ordering + chamfer dedup.

    Each video_info needs `trajectory` [N, 3] and optionally
    `lidar_pc_tokens`. The traversal containing `central_token` sorts
    first; later traversals whose trajectory lies within
    `dedupe_chamfer` m (one-directional chamfer to an earlier kept
    traversal) are dropped (ref `sort_video_infos:169-234`).
    """

    def has_central(v):
        return central_token is not None and central_token in v.get(
            "lidar_pc_tokens", ()
        )

    ordered = sorted(video_infos, key=lambda v: (not has_central(v)))
    kept: List[dict] = []
    for v in ordered:
        traj = np.asarray(v["trajectory"])[:, :2]
        dup = False
        for k in kept:
            ktraj = np.asarray(k["trajectory"])[:, :2]
            if chamfer_distance(traj, ktraj) < dedupe_chamfer:
                dup = True
                break
        if not dup:
            kept.append(v)
    for i, v in enumerate(kept):
        v["video_idx"] = i
    return kept


def scan_log_cache_for_block(
    cache_path: str | Path, road_block: Sequence[float]
) -> List[dict]:
    """All cached logs whose trajectory touches the road block."""
    return [
        row
        for row in iter_log_info_cache(cache_path)
        if trajectory_intersects_block(np.asarray(row["trajectory"]), road_block)
    ]


def build_frame_infos_nuplan(*args, **kwargs):
    """Build full per-frame records from the nuPlan DBs (requires the
    nuplan-devkit + sensor blobs — not present in this environment)."""
    try:
        import nuplan  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "build_frame_infos_nuplan needs nuplan-devkit and the nuPlan "
            "sensor release; this environment has neither. The rest of the "
            "pipeline operates on the video_scene_dict produced from them."
        ) from e
    raise NotImplementedError
