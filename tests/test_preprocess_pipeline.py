"""Data-factory spine: staged store, traversal splitting, COLMAP IO,
depth codec, and the resumable pipeline driver.

Behavior contracts from OpenDriveLab/MTGS `nuplan_scripts/`:
video_scene_dict_tools.py (staged pickles + filters),
nuplan_video_processing.py (in-region splitting, chamfer dedup),
utils/colmap_utils/ (binary model format, sim3 alignment),
generate_dense_depth.py (2-channel PNG codec).
"""

import numpy as np
import pytest

from mtgs_tpu.preprocess import colmap as cm
from mtgs_tpu.preprocess import video_split as sp
from mtgs_tpu.preprocess.dense_depth import (
    decode_depth_png,
    depth_error_report,
    encode_depth_png,
)
from mtgs_tpu.preprocess.pipeline import run_pipeline
from mtgs_tpu.preprocess.video_scene import VideoScene, apply_filters


def _vsd(n_videos=3, n_frames=20, step=1.0):
    out = {}
    for v in range(n_videos):
        frames = []
        for f in range(n_frames):
            frames.append(
                dict(
                    can_bus=np.array([f * step, v * 10.0, 0.0, 1, 0, 0, 0]),
                    ego2global_translation=[f * step, v * 10.0, 0.0],
                    ego2global_rotation=[1, 0, 0, 0],
                    lidar_path=f"lidar/{v}_{f}.pcd",
                )
            )
        out[f"log-{v}"] = dict(video_token=f"log-{v}", frame_infos=frames)
    return out


def test_staged_store_symlink(tmp_path):
    vs = VideoScene(tmp_path, "block")
    d = _vsd()
    vs.save(d, "raw")
    assert vs.pickle_path.is_symlink()
    assert vs.load()["log-0"]["video_token"] == "log-0"
    d2 = {k: v for k, v in d.items() if k != "log-2"}
    vs.save(d2, "registered")
    assert len(vs.load()) == 2           # canonical link follows the newest
    assert len(vs.load("raw")) == 3      # older stage still addressable
    assert vs.latest_stage() == "registered"


def test_filters():
    d = _vsd(n_videos=3)
    out = apply_filters(
        d, ["filter_by_video_idx"],
        filter_by_video_idx=dict(video_idxs=[0, dict(idx=2, start_frame=5, end_frame=15)]),
    )
    assert set(out) == {"log-0", "log-2"}
    assert len(out["log-2"]["frame_infos"]) == 10

    # parked frames get skipped, bounded runs
    d = _vsd(n_videos=1, n_frames=30, step=0.0)
    out = apply_filters(d, ["filter_low_velocity"])
    skipped = [f.get("skipped") for f in out["log-0"]["frame_infos"]]
    assert sum(bool(s) for s in skipped) > 15
    # a run is broken every max_consecutive frames
    assert not all(skipped[1:])
    out = apply_filters(out, ["filter_skipped_frames"])
    assert len(out["log-0"]["frame_infos"]) < 30

    out = apply_filters(out, ["inject_trajectory"])
    assert out["log-0"]["trajectory"].shape[1] == 3


def test_split_in_region_videos():
    # straight line crossing the block twice
    t = np.linspace(0, 200, 201)
    pos = np.stack([t, np.zeros_like(t)], -1)
    pos[100:130, 1] = 100.0  # detour out of the block
    block = (40.0, -10.0, 160.0, 10.0)
    vids = sp.split_in_region_videos(pos, block, expand_buffer=5.0, min_frames=5)
    assert len(vids) == 2
    for idx in vids:
        # expanded ~5 m beyond the block on both ends
        assert pos[idx[0], 0] < 41.0 or pos[idx[0], 1] > 10
        assert len(idx) >= 5


def test_sort_and_dedupe():
    base = np.stack([np.linspace(0, 100, 50), np.zeros(50), np.zeros(50)], -1)
    videos = [
        dict(trajectory=base + [0, 20, 0], lidar_pc_tokens=["a"]),
        dict(trajectory=base, lidar_pc_tokens=["central"]),
        dict(trajectory=base + [0, 1.0, 0], lidar_pc_tokens=["b"]),  # dup of base
    ]
    kept = sp.sort_and_dedupe_videos(videos, central_token="central")
    assert kept[0]["lidar_pc_tokens"] == ["central"]
    assert len(kept) == 2  # near-duplicate dropped
    assert [v["video_idx"] for v in kept] == [0, 1]


def test_colmap_model_roundtrip(tmp_path):
    cams = {1: cm.Camera(1, "OPENCV", 1920, 1080,
                         np.array([1000.0, 1000.0, 960.0, 540.0, 0.01, -0.01, 0.0, 0.0]))}
    ims = {
        7: cm.Image(7, np.array([1.0, 0, 0, 0]), np.array([0.5, -1.0, 2.0]), 1,
                    "cam/img_000.jpg", np.array([[10.0, 20.0], [30.0, 40.0]]),
                    np.array([3, -1], np.int64)),
    }
    pts = {3: cm.Point3D(3, np.array([1.0, 2.0, 3.0]), np.array([255, 128, 0], np.uint8),
                         0.5, np.array([7], np.uint32), np.array([0], np.uint32))}
    cm.write_model(cams, ims, pts, tmp_path)
    c2, i2, p2 = cm.read_model(tmp_path)
    assert c2[1].model == "OPENCV" and c2[1].width == 1920
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    assert i2[7].name == "cam/img_000.jpg"
    np.testing.assert_allclose(i2[7].xys, ims[7].xys)
    np.testing.assert_array_equal(i2[7].point3D_ids, ims[7].point3D_ids)
    np.testing.assert_allclose(p2[3].xyz, pts[3].xyz)
    assert p2[3].rgb.tolist() == [255, 128, 0]


def test_colmap_database(tmp_path):
    db = cm.ColmapDatabase(tmp_path / "db.sqlite")
    db.add_camera(cm.Camera(1, "PINHOLE", 100, 100, np.array([50.0, 50.0, 50.0, 50.0])))
    db.add_image(cm.Image(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "a.jpg"))
    db.add_image(cm.Image(2, np.array([1.0, 0, 0, 0]), np.ones(3), 1, "b.jpg"))
    db.add_keypoints(1, np.array([[1.0, 2.0], [3.0, 4.0]]))
    db.add_matches(2, 1, np.array([[0, 1]]))  # reversed ids -> swapped cols
    db.commit()
    rows = db.conn.execute("SELECT pair_id, rows, cols FROM matches").fetchall()
    assert rows == [(cm.image_ids_to_pair_id(1, 2), 1, 2)]
    db.close()


def test_umeyama_sim3():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    # ground-truth similarity
    from mtgs_tpu.core.quat import quat_to_rotmat
    import jax.numpy as jnp

    R = np.asarray(quat_to_rotmat(jnp.asarray([0.9, 0.1, -0.2, 0.3])))
    s, t = 2.5, np.array([1.0, -2.0, 3.0])
    dst = s * src @ R.T + t
    s2, R2, t2 = cm.umeyama_sim3(src, dst)
    np.testing.assert_allclose(s2, s, rtol=1e-5)
    np.testing.assert_allclose(R2, R, atol=1e-5)
    np.testing.assert_allclose(t2, t, atol=1e-4)


def test_depth_codec_roundtrip():
    rng = np.random.default_rng(1)
    d = rng.uniform(0.1, 80.0, (32, 32)).astype(np.float32)
    dec = decode_depth_png(encode_depth_png(d))
    np.testing.assert_allclose(dec, d, atol=0.006)  # 1 cm quantization
    # clipping
    assert decode_depth_png(encode_depth_png(np.full((2, 2), 500.0))).max() <= 80.0
    rep = depth_error_report(dec, d)
    assert rep["delta1"] == 1.0 and rep["abs_rel"] < 1e-3


def test_pipeline_driver_skips_unavailable(tmp_path):
    status = run_pipeline(tmp_path, "block", {}, skip_unavailable=True)
    # every stage reported, none crashed the driver
    assert len(status) == 8
    assert all(v.startswith(("ok", "skipped", "failed")) for v in status.values())
    # stages missing external deps are SKIPPED (not failed)
    assert status["video_split"].startswith("skipped")
    assert status["semantic_masks"].startswith("skipped")


def test_preview_html_and_filter(tmp_path):
    """Preview tool (ref nuplan_scripts/preview.py + filter_trajectory.py):
    HTML build + selected_videos filter roundtrip via the staged store."""
    from mtgs_tpu.preprocess.video_scene import VideoScene
    from mtgs_tpu.tools.preview import (
        build_preview_html, filter_trajectory, trajectory_xy)

    vsd = _vsd(n_videos=3, n_frames=20)
    xy = trajectory_xy(vsd["log-1"])
    assert xy.shape == (20, 2) and xy[0, 1] == 10.0

    out = build_preview_html(
        vsd, tmp_path / "preview.html",
        selected=[0, {"idx": 2, "start_frame": 5, "end_frame": 15}],
        road_block=(-5, -5, 30, 30),
    )
    text = out.read_text()
    assert "selected_videos" in text and "polyline" in text
    assert '"n": 20' in text.replace("'", '"') or '"n": 20' in text

    vs = VideoScene(tmp_path, "scene")
    vs.root.mkdir(parents=True, exist_ok=True)
    vs.save(_vsd(), "raw")
    filtered = filter_trajectory(
        vs, [0, {"idx": 2, "start_frame": 5, "end_frame": 15}])
    assert set(filtered) == {"log-0", "log-2"}
    assert len(filtered["log-2"]["frame_infos"]) == 10
    assert vs.load("filtered").keys() == filtered.keys()


def test_generate_log_info_cache(tmp_path):
    """Cache generator (ref misc/generate_nuplan_log_info.py): OpenScene
    per-log pkls -> jsonl consumed by iter_log_info_cache."""
    import pickle
    from mtgs_tpu.preprocess.video_split import (
        generate_log_info_cache, iter_log_info_cache)

    meta = tmp_path / "meta_datas" / "trainval"
    meta.mkdir(parents=True)
    for li in range(2):
        infos = [
            dict(
                token=f"t{li}_{i}",
                log_token=f"log{li}",
                map_location="us-ma-boston",
                ego2global_translation=[100.0 + i + li, 200.0 + 0.123, 0.0],
            )
            for i in range(5)
        ]
        with open(meta / f"2021.05.12.log{li}.pkl", "wb") as f:
            pickle.dump(infos, f)

    out = tmp_path / "nuplan_log_infos.jsonl"
    n = generate_log_info_cache(tmp_path, out)
    assert n == 2
    rows = list(iter_log_info_cache(out))
    assert rows[0]["log_name"] == "2021.05.12.log0"
    assert rows[0]["split"] == "trainval"
    assert len(rows[0]["lidar_pc_tokens"]) == 5
    assert rows[0]["trajectory"][1] == [101.0, 200.12]


def test_export_traversal_videos(tmp_path):
    """Stage 2 (ref nuplan_scripts/export_videos.py): camera mosaic + BEV
    trajectory inset per traversal."""
    import pickle

    from PIL import Image

    from mtgs_tpu.preprocess.export_videos import export_traversal_videos
    from mtgs_tpu.preprocess.video_scene import VideoScene

    rng = np.random.default_rng(0)
    vs = VideoScene(tmp_path, "scene")
    (vs.root / "raw_images").mkdir(parents=True)
    vsd = _vsd(n_videos=2, n_frames=3)
    for info in vsd.values():
        for f, frame in enumerate(info["frame_infos"]):
            rel = f"{info['video_token']}_{f}.jpg"
            Image.fromarray(
                (rng.random((36, 64, 3)) * 255).astype(np.uint8)).save(
                vs.root / "raw_images" / rel)
            frame["cams"] = {"CAM_F0": dict(data_path=rel),
                             "CAM_L0": dict(data_path=rel)}
    vs.save(vsd, "raw")

    written = export_traversal_videos(
        vs, tile_width=64, make_video=False, max_frames=2)
    pngs = [p for p in written if p.suffix == ".png"]
    assert len(pngs) == 2 * 2  # 2 traversals x 2 frames
    img = Image.open(pngs[0])
    # 2 cams + BEV inset -> 2x2 grid of 64-wide tiles
    assert img.size[0] == 128


def test_convex_overlap_area():
    from mtgs_tpu.preprocess.colmap import convex_overlap_area

    sq = np.asarray([[0, 0], [2, 0], [2, 2], [0, 2]], np.float64)
    shifted = sq + [1.0, 1.0]
    assert abs(convex_overlap_area(sq, shifted) - 1.0) < 1e-9
    assert convex_overlap_area(sq, sq + [5.0, 0.0]) == 0.0
    # winding-order independent
    assert abs(convex_overlap_area(sq[::-1], shifted) - 1.0) < 1e-9


def test_build_fixed_pose_model(tmp_path):
    """Fixed-pose COLMAP model build (ref ba_multi_traversal.py:57-213):
    per-vehicle cameras, ~10-unit pose scaling, w2c quats, FOV pairs."""
    from mtgs_tpu.preprocess.colmap import (
        build_fixed_pose_model, read_model)

    import jax.numpy as jnp

    from mtgs_tpu.core.quat import rotmat_to_quat

    K = np.asarray([[800.0, 0, 960], [0, 800.0, 540], [0, 0, 1]])
    # camera +z along ego +x (forward), +x along ego -y, +y along ego -z
    R_c2e = np.asarray([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    q_c2e = [float(x) for x in np.asarray(
        rotmat_to_quat(jnp.asarray(R_c2e, jnp.float32)))]
    vsd = {}
    for v in range(2):
        frames = []
        for f in range(3):
            ego2global = np.eye(4)
            ego2global[:3, 3] = [f * 5.0, v * 2.0, 0.0]
            frames.append(dict(
                token=f"t{v}_{f}", ego2global=ego2global,
                cams={"CAM_F0": dict(
                    data_path=f"img_{v}_{f}.jpg",
                    cam_intrinsic=K,
                    distortion=np.asarray([0.1, -0.05, 0.001, 0.002, 0.0]),
                    sensor2ego_rotation=q_c2e,
                    sensor2ego_translation=[1.0, 0.0, 1.5],
                )},
            ))
        vsd[f"blk-{v}"] = dict(video_token=f"blk-{v}", vehicle_name=f"veh{v}",
                               frame_infos=frames)

    cams, imgs, pairs, scale = build_fixed_pose_model(
        vsd, tmp_path, block_size=200.0)
    assert scale == 10.0 / 200.0
    assert len(cams) == 2          # one per (vehicle, cam)
    assert len(imgs) == 6
    assert pairs                   # forward-facing cams overlap
    # model roundtrip + pose inversion check
    c2, i2, p2 = read_model(tmp_path / "sparse_model")
    assert len(c2) == 2 and len(i2) == 6
    img = next(iter(i2.values()))
    from mtgs_tpu.core.quat import quat_to_rotmat
    import jax.numpy as jnp
    R = np.asarray(quat_to_rotmat(jnp.asarray(img.qvec, jnp.float32)))
    cam_pos_world = -R.T @ img.tvec   # scaled world frame
    # camera 0 of vehicle 0 frame 0 sits at ego + cam offset, x1 scale
    assert np.isfinite(cam_pos_world).all()
    assert (tmp_path / "image_pairs.txt").exists()
    assert (tmp_path / "database.db").exists()


def test_road_block_config_yaml_roundtrip(tmp_path):
    """RoadBlockConfig (ref nuplan_scripts/utils/config.py:38-108): plain
    YAML roundtrip + stage-config derivation."""
    from mtgs_tpu.preprocess.roadblock_config import (
        RoadBlockConfig, load_road_block_config, save_yaml)

    cfg = RoadBlockConfig(
        road_block_name="road_block-1_2_3_4",
        road_block=(1.0, 2.0, 3.0, 4.0),
        city="us-ma-boston",
        data_root=str(tmp_path),
        selected_videos=(0, 1, 5),
        expand_buffer=30.0,
        use_colmap_ba=True,
    )
    save_yaml(cfg, tmp_path / "rb.yaml")
    back = load_road_block_config(tmp_path / "rb.yaml")
    assert back == cfg
    stages = back.to_stage_config()
    assert stages["video_split"]["road_block"] == (1.0, 2.0, 3.0, 4.0)
    assert stages["colmap"]["use_colmap_ba"] is True
    assert back.scene_dir == tmp_path / "road_block-1_2_3_4"


def test_road_block_config_reads_reference_tagged_yaml(tmp_path):
    """The paper's shipped configs use `!!python/object:` tags
    (docs/prepare_dataset.md:56-81) — they must load without executing
    python object construction."""
    from mtgs_tpu.preprocess.roadblock_config import load_road_block_config

    (tmp_path / "ref.yml").write_text(
        "!!python/object:nuplan_scripts.utils.config.RoadBlockConfig\n"
        "city: us-ma-boston\n"
        "data_root: ./data/MTGS\n"
        "interval: 1\n"
        "reconstruct_buffer: 0\n"
        "expand_buffer: 0\n"
        "exclude_bad_registration: false\n"
        "use_colmap_ba: false\n"
        "collect_raw: false\n"
        "split: trainval\n"
        "road_block: !!python/tuple\n"
        "- 331120\n"
        "- 4690660\n"
        "- 331190\n"
        "- 4690710\n"
        "road_block_name: road_block-331220_4690660_331190_4690710\n"
        "selected_videos: !!python/tuple\n"
        "- 0\n"
        "- 1\n"
        "- 2\n"
    )
    cfg = load_road_block_config(tmp_path / "ref.yml")
    assert cfg.road_block == (331120, 4690660, 331190, 4690710)
    assert cfg.selected_videos == (0, 1, 2)
    assert cfg.exclude_bad_registration is False
    assert cfg.road_block_name.startswith("road_block-331220")


def test_road_block_config_py_module(tmp_path):
    """`.py` config modules expose `config` (ref config.py:98-104)."""
    from mtgs_tpu.preprocess.roadblock_config import load_road_block_config

    (tmp_path / "cfg.py").write_text(
        "from mtgs_tpu.preprocess.roadblock_config import RoadBlockConfig\n"
        "config = RoadBlockConfig(road_block_name='rb', "
        "road_block=(0, 0, 10, 10), city='sg-one-north')\n"
    )
    cfg = load_road_block_config(tmp_path / "cfg.py")
    assert cfg.city == "sg-one-north"
    assert cfg.road_block == (0, 0, 10, 10)


def test_rolling_shutter_cam_to_ego():
    """Rolling-shutter pose compensation (nuplan_utils_custom.py:150-156):
    the camera extrinsic is re-expressed in the LiDAR sweep's ego frame
    using the ego pose nearest to img_ts + shutter."""
    from mtgs_tpu.preprocess.video_split import (
        nearest_ego_pose, pose_matrix, rolling_shutter_cam_to_ego)

    # ego drives +x at 10 m/s; poses every 0.1 s
    ts = np.arange(10) * 1e5  # us
    poses = np.stack([pose_matrix([i * 1.0, 0, 0], [1, 0, 0, 0])
                      for i in range(10)])
    lidar_e2g = poses[2]          # sweep at t=0.2 s (x=2)
    cam_calib = pose_matrix([0.5, 0, 1.5], [1, 0, 0, 0])

    # image at the same time, zero shutter: pure calibration
    c2e = rolling_shutter_cam_to_ego(
        2e5, lidar_e2g, ts, poses, cam_calib, rolling_shutter_s=0.0)
    np.testing.assert_allclose(c2e, cam_calib, atol=1e-9)

    # shutter pushes the lookup to the next pose (t=0.3 s, x=3): the
    # camera appears 1 m further along +x in the lidar ego frame
    c2e = rolling_shutter_cam_to_ego(
        2e5, lidar_e2g, ts, poses, cam_calib, rolling_shutter_s=0.1)
    np.testing.assert_allclose(c2e[0, 3], 1.5, atol=1e-9)
    np.testing.assert_allclose(c2e[:3, :3], np.eye(3), atol=1e-9)

    # nearest lookup: 0.24 s rounds down to pose 2, 0.26 s up to pose 3
    np.testing.assert_allclose(nearest_ego_pose(ts, poses, 2.4e5)[0, 3], 2.0)
    np.testing.assert_allclose(nearest_ego_pose(ts, poses, 2.6e5)[0, 3], 3.0)


def test_build_video_record_assembly():
    """Frame-record assembly (nuplan_video_processing.py:260-347):
    road-block-local translations, out_of_region skip flag, broken-camera
    frames dropped, lidar2global chain."""
    from mtgs_tpu.preprocess.video_split import build_video_record

    road_block = (100.0, 200.0, 140.0, 240.0)  # center (120, 220)

    def frame(tok, x, y, t):
        can_bus = np.zeros(18)
        can_bus[:3] = [x, y, 1.0]
        can_bus[3] = 1.0  # identity quat wxyz
        return dict(
            token=tok, timestamp=t, log_name="log", log_token="lt",
            lidar_path=f"{tok}.pcd", can_bus=can_bus,
            lidar2ego_translation=[0.1, 0.0, 1.8],
            lidar2ego_rotation=[1, 0, 0, 0],
        )

    cams8 = {f"CAM_{i}": dict(data_path=f"c{i}.jpg") for i in range(8)}
    frames = [
        frame("a", 120.0, 220.0, 1_000_000),   # center, in region
        frame("b", 90.0, 220.0, 1_100_000),    # 10 m out of block+buffer
        frame("c", 121.0, 221.0, 1_200_000),   # in region, broken cams
    ]
    rec = build_video_record(
        dict(video_token="v0", log_name="log", log_token="lt"),
        frames, [cams8, cams8, {"CAM_0": {}}],
        road_block=road_block, reconstruct_buffer=5.0, baseline_z=1.0,
    )
    # broken-camera frame dropped entirely
    assert [f["token"] for f in rec["frame_infos"]] == ["a", "b"]
    fa, fb = rec["frame_infos"]
    assert fa["skipped"] is False
    assert fb["skipped"] == "out_of_region"
    # translations are road-block-local (center + baseline z removed)
    np.testing.assert_allclose(fa["ego2global_translation"], [0, 0, 0])
    np.testing.assert_allclose(fb["ego2global_translation"], [-30, 0, 0])
    # lidar2global = ego2global @ lidar2ego
    np.testing.assert_allclose(
        fa["lidar2global"][:3, 3], [0.1, 0.0, 1.8], atol=1e-12)
    np.testing.assert_allclose(rec["global2world_translation"], [120, 220, 1.0])
    assert rec["start_ts"] == 1_000_000 and rec["end_ts"] == 1_200_000
