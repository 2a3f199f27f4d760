"""Multi-scene benchmark farm.

Counterpart of the reference's batch harness
(`mtgs/tools/batch_exp/run_base_benchmarking.py` in OpenDriveLab/MTGS):
schedules one `train_scene` run per road block across available
accelerator slots (file-lock based, resumable via existing
eval_result.json), then aggregates per-scene metrics into
seen/unseen/overall tables (`results_summary.csv` + `paste_table.tsv`).

On a multi-host TPU pod, run one farm process per slice partition; the
file locks coordinate shared-filesystem access exactly like the
reference's GPUManager (`run_base_benchmarking.py:22-45`).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional

METRICS = [
    "psnr", "ssim", "cc_psnr", "lpips", "dinov2_sim",
    "depth_RMSE", "depth_absRel", "depth_delta1",
]


class SlotManager:
    """File-lock accelerator-slot allocator (ref GPUManager)."""

    def __init__(self, lock_dir: Path, num_slots: int):
        self.lock_dir = lock_dir
        self.lock_dir.mkdir(parents=True, exist_ok=True)
        self.num_slots = num_slots

    def acquire(self) -> Optional[int]:
        for slot in range(self.num_slots):
            lock = self.lock_dir / f"slot_{slot}.lock"
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return slot
            except FileExistsError:
                continue
        return None

    def release(self, slot: int):
        (self.lock_dir / f"slot_{slot}.lock").unlink(missing_ok=True)


def run_scene(task: dict, out_root: Path, slots: SlotManager, resume: bool) -> dict:
    name = task["name"]
    out_dir = out_root / name
    result_file = out_dir / "eval_result.json"
    if resume and result_file.exists():
        return {"name": name, "status": "cached", **json.loads(result_file.read_text())}

    slot = None
    while slot is None:
        slot = slots.acquire()
        if slot is None:
            time.sleep(10.0)
    try:
        cmd = [
            sys.executable, "-m", "mtgs_tpu.tools.train_scene",
            "--data", task["data"], "--out", str(out_dir),
            "--method", task.get("method", "mtgs"),
            "--steps", str(task.get("steps", 30001)),
        ]
        for key, flag in (("travels", "--travels"), ("eval_travels", "--eval-travels")):
            if task.get(key):
                cmd += [flag] + [str(t) for t in task[key]]
        log = out_dir / "train.log"
        out_dir.mkdir(parents=True, exist_ok=True)
        with open(log, "w") as lf:
            proc = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT)
        if proc.returncode != 0 or not result_file.exists():
            return {"name": name, "status": f"failed({proc.returncode})"}
        return {"name": name, "status": "ok", **json.loads(result_file.read_text())}
    finally:
        slots.release(slot)


def aggregate(results: List[dict], tasks: List[dict], out_root: Path):
    """seen/unseen/overall aggregation (ref :111-183)."""
    rows = []
    for res, task in zip(results, tasks):
        if "psnr" not in res:
            rows.append({"name": res["name"], "status": res.get("status", "?")})
            continue
        row: Dict[str, float] = {"name": res["name"], "status": res["status"]}
        seen = set(task.get("travels") or [])
        for m in METRICS:
            if m in res:
                row[f"overall_{m}"] = res[m]
            seen_vals, unseen_vals = [], []
            for k, v in res.items():
                if k.startswith("trv") and k.endswith(f"_{m}"):
                    trv = int(k[3:].split("_")[0])
                    (seen_vals if trv in seen else unseen_vals).append(v)
            if seen_vals:
                row[f"seen_{m}"] = sum(seen_vals) / len(seen_vals)
            if unseen_vals:
                row[f"unseen_{m}"] = sum(unseen_vals) / len(unseen_vals)
        rows.append(row)

    keys = sorted({k for r in rows for k in r})
    with open(out_root / "results_summary.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    with open(out_root / "paste_table.tsv", "w") as f:
        f.write("\t".join(keys) + "\n")
        for r in rows:
            f.write("\t".join(str(r.get(k, "")) for k in keys) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", required=True, help="JSON file: [{name, data, travels, eval_travels, method, steps}]")
    ap.add_argument("--out", required=True)
    ap.add_argument("--slots", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    tasks = json.loads(Path(args.tasks).read_text())
    out_root = Path(args.out)
    out_root.mkdir(parents=True, exist_ok=True)
    slots = SlotManager(out_root / ".locks", args.slots)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=args.slots) as pool:
        results = list(pool.map(
            lambda t: run_scene(t, out_root, slots, args.resume), tasks
        ))
    aggregate(results, tasks, out_root)
    ok = sum(1 for r in results if r.get("status") in ("ok", "cached"))
    print(f"[farm] {ok}/{len(results)} scenes complete -> {out_root}/results_summary.csv")


if __name__ == "__main__":
    main()
