"""Render tool: camera-path JSON parsing + trajectory rendering.

Ref `mtgs/tools/render.py` (OpenDriveLab/MTGS) subcommands
`camera-path` / `interpolate`.
"""

import json

import numpy as np
import pytest

from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
from mtgs_tpu.tools.render import (
    interpolate_poses,
    load_camera_path_json,
    render_camera_path,
)
from mtgs_tpu.train.trainer import TrainerConfig


def test_load_camera_path_json(tmp_path):
    frames = []
    for i in range(4):
        c2w = np.eye(4)
        c2w[0, 3] = i * 1.0
        frames.append(dict(camera_to_world=c2w.reshape(-1).tolist(), fov=60.0))
    spec = dict(camera_path=frames, render_width=64, render_height=48,
                seconds=2.0)
    p = tmp_path / "path.json"
    p.write_text(json.dumps(spec))
    out = load_camera_path_json(p)
    assert out["poses"].shape == (4, 4, 4)
    assert out["width"] == 64 and out["height"] == 48
    fy = out["Ks"][0][1, 1]
    np.testing.assert_allclose(fy, 0.5 * 48 / np.tan(np.deg2rad(30.0)), rtol=1e-5)
    np.testing.assert_allclose(out["fps"], 2.0)


def test_interpolate_poses_doubles_rate():
    n = 5
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n, dtype=np.float32)
    ts = np.linspace(0, 1, n).astype(np.float32)
    out_poses, out_ts = interpolate_poses(poses, ts, target_hz=4.0, source_hz=2.0)
    assert len(out_poses) == 2 * (n - 1) + 1
    np.testing.assert_allclose(out_poses[1][0, 3], 0.5, atol=1e-5)
    assert np.all(np.diff(out_ts) > 0)


def test_render_camera_path(tmp_path):
    scene = make_synthetic_scene(
        seed=0, width=32, height=32, n_travels=1, n_frames=2, n_bg=150, n_instance=0
    )
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(
        width=32, height=32, max_intersections=1 << 12, backend="xla",
        predict_normals=False,
    )
    from mtgs_tpu.data.synthetic import batch_iterator

    batch = next(batch_iterator(scene))
    c2w = np.asarray(batch.c2w, np.float64)
    frames = [
        dict(camera_to_world=c2w.reshape(-1).tolist(), fov=70.0) for _ in range(2)
    ]
    p = tmp_path / "path.json"
    p.write_text(json.dumps(dict(camera_path=frames, render_width=32,
                                 render_height=32, seconds=1.0)))
    written = render_camera_path(
        params, aux, cfg, p, tmp_path / "out", make_video=False
    )
    assert len(written) == 2
    from PIL import Image

    img = np.asarray(Image.open(written[0]))
    assert img.shape == (32, 32, 3)
    assert img.max() > 0  # rendered something


def test_viewer_page_has_render_panel():
    """Viewer render panel (ref mtgs/custom_viewer/render_panel.py):
    keyframe controls + export of the camera_path JSON schema."""
    from mtgs_tpu.viewer.server import _PAGE

    for token in ("addkf", "clearkf", "exportkf", "camera_to_world",
                  "render_width", "camera_path", "fov"):
        assert token in _PAGE, token


def test_render_dataset_layers(tmp_path):
    """`dataset` render mode (ref DatasetRender): rgb/gt/depth layers."""
    from mtgs_tpu.data.synthetic import (
        batch_iterator, build_scene_model, make_synthetic_scene)
    from mtgs_tpu.tools.render import depth_colormap, render_dataset
    from mtgs_tpu.train.trainer import TrainerConfig

    d = depth_colormap(np.linspace(0, 10, 64).reshape(8, 8))
    assert d.shape == (8, 8, 3) and d.dtype == np.uint8
    assert not (d[0] == d[-1]).all()  # near and far differ

    scene = make_synthetic_scene(seed=0, width=32, height=32, n_travels=1,
                                 n_frames=2, n_bg=128, n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(width=32, height=32, max_intersections=1 << 12,
                        backend="xla", predict_normals=False)
    it = batch_iterator(scene)
    batches = [next(it) for _ in range(2)]
    written = render_dataset(params, aux, cfg, batches, tmp_path)
    assert len(written) == 6
    for layer in ("rgb", "gt", "depth"):
        assert (tmp_path / layer / "00000.png").exists()


def test_render_interpolated_mosaic(tmp_path):
    """`interpolate` mode (ref RenderInterpolated): slerp upsample + the
    side-by-side camera mosaic."""
    import types

    from mtgs_tpu.data.nuplan import ImageRecord
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.tools.render import render_interpolated
    from mtgs_tpu.train.trainer import TrainerConfig

    scene = make_synthetic_scene(seed=0, width=32, height=32, n_travels=1,
                                 n_frames=2, n_bg=128, n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(width=32, height=32, max_intersections=1 << 12,
                        backend="xla", predict_normals=False)

    def rec(cam, f, x):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [x, 0.0, 0.5]
        return ImageRecord(
            image_path="", intrinsic=np.asarray(
                [[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32),
            distortion=np.zeros(5), c2w=c2w, lidar2cam=np.eye(4),
            lidar_path=None, travel_id=0, travel_index=0, frame_idx=f,
            frame_token=f"f{f}", cam_token=f"{cam}{f}", cam_name=cam,
            cam_idx=0, timestamp=f / 2.0, raw_timestamp=f,
            width=32, height=32)

    records = [rec("CAM_F0", f, float(f)) for f in range(2)]
    records += [rec("CAM_L0", f, float(f) + 0.2) for f in range(2)]
    fake = types.SimpleNamespace(records=records)

    paths = render_interpolated(
        params, aux, cfg, fake, 0, tmp_path,
        cameras=("CAM_L0", "CAM_F0"), target_hz=8.0, source_hz=2.0,
        make_video=False)
    assert len(paths) == 5  # (2-1) segment x4 + endpoint
    from PIL import Image
    img = Image.open(paths[0])
    assert img.size == (64, 32)  # two 32px tiles side by side


def test_bench_train_smoke(capsys):
    """The train-throughput bench tool runs end-to-end and emits its JSON
    summary line (tiny scene; the on-chip batch runs it at full scale)."""
    from mtgs_tpu.tools.bench_train import main

    main([
        "--n-bg", "400", "--n-instance", "50", "--width", "64",
        "--height", "64", "--max-isect", "8192", "--iters", "2",
        "--backend", "xla",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["unit"] == "iters/s" and rec["value"] > 0


def test_viewer_outputs_frustums_export():
    """Viewer parity additions (ref custom_viewer: viewer.py:57-540 +
    export_panel.py): output-type selector, camera frustum overlays w/
    train/eval toggle, in-viewer splat/ply/pcd export."""
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.train.trainer import TrainerConfig
    from mtgs_tpu.viewer.server import _PAGE, ViewerServer

    for token in ("output", "frustums", "drawFrustums", "export?format=ply",
                  "export?format=splat"):
        assert token in _PAGE, token

    scene = make_synthetic_scene(seed=0, width=32, height=32, n_travels=1,
                                 n_frames=1, n_bg=100, n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(width=32, height=32, max_intersections=1 << 12,
                        backend="xla", predict_normals=True)
    cams = [{"c2w": scene.c2ws[0, 0][:3].reshape(-1).tolist(), "split": "train"}]
    srv = ViewerServer(params, aux, cfg, travels=[0], cameras=cams)
    assert srv.cameras == cams

    # every output mode renders a JPEG
    for out in ("rgb", "depth", "accumulation", "normal"):
        jpg = srv.render({"px": "0", "py": "0", "pz": "2", "output": out})
        assert jpg[:2] == b"\xff\xd8", out  # JPEG magic

    # export endpoint produces the three formats
    ply, name = srv.export("ply")
    assert name.endswith(".ply") and ply.startswith(b"ply")
    splat, _ = srv.export("splat")
    assert len(splat) > 0
    pcd, _ = srv.export("pcd")
    assert pcd.startswith(b"ply")


def test_method_config_schedule_scales_with_budget():
    """The reference's densify/reset schedule is ratio-preserving under a
    different step budget (campaign_r4b regression: absolute 30k-step
    numbers on a 10k run put the last opacity reset 900 steps before
    eval)."""
    from mtgs_tpu.configs import ITERS, method_config

    ref = method_config("mtgs")
    short = method_config("mtgs", max_steps=10001)
    assert ref.control.stop_split_at == 15000
    assert short.control.stop_split_at == 5000
    assert short.control.sh_degree_interval == 333
    # last reset position: largest sref < stop_split_at with
    # sref % (reset_alpha_every * refine_every) == refine_every
    for cfg, budget in ((ref, ITERS), (short, 10001)):
        cc = cfg.control
        interval = cc.reset_alpha_every * cc.refine_every
        last = max(r for r in range(cc.refine_every, cc.stop_split_at, interval))
        # the reference leaves ~60% of the budget after the last reset
        assert 0.5 < 1 - last / budget < 0.7, (last, budget)
