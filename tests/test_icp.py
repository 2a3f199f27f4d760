"""Native ICP core: odometry on a synthetic world + alignment/gate logic."""

import numpy as np
import pytest

from mtgs_tpu.preprocess.lidar_registration import (
    LidarOdometry,
    register_traversals,
    trajectory_errors,
    umeyama_rigid,
)


def make_world(n=6000, seed=0):
    """A structured synthetic world: ground + walls + boxes. The box
    faces constrain all translation axes strongly (a pure plane/wall
    world lets point-to-point ICP slide along the featureless axis)."""
    rng = np.random.default_rng(seed)
    ground = np.stack([
        rng.uniform(-60, 60, n), rng.uniform(-20, 20, n),
        rng.normal(0, 0.03, n)], -1)
    walls = np.stack([
        rng.uniform(-60, 60, n // 2),
        np.where(rng.random(n // 2) > 0.5, 18.0, -18.0) + rng.normal(0, 0.05, n // 2),
        rng.uniform(0, 6, n // 2)], -1)
    boxes = []
    for bx in range(-55, 60, 9):
        cy = float(rng.uniform(-14, 14))
        m = 400
        face = rng.integers(0, 4)
        u = rng.uniform(-1.5, 1.5, m)
        z = rng.uniform(0, 4, m)
        for face in range(4):
            if face == 0:
                pts = np.stack([np.full(m, bx - 1.5), cy + u, z], -1)
            elif face == 1:
                pts = np.stack([np.full(m, bx + 1.5), cy + u, z], -1)
            elif face == 2:
                pts = np.stack([bx + u, np.full(m, cy - 1.5), z], -1)
            else:
                pts = np.stack([bx + u, np.full(m, cy + 1.5), z], -1)
            boxes.append(pts + rng.normal(0, 0.02, (m, 3)))
    return np.concatenate([ground, walls] + boxes)


def scan_from(world, pose, rng, max_range=80.0):
    """Simulate a scan: world points within range, in sensor frame."""
    inv = np.linalg.inv(pose)
    local = world @ inv[:3, :3].T + inv[:3, 3]
    r = np.linalg.norm(local, axis=1)
    keep = (r < max_range) & (r > 2.0)
    pts = local[keep] + rng.normal(0, 0.01, (keep.sum(), 3))
    return pts.astype(np.float32)


def drive_poses(n_frames, lane_y=0.0, step=1.5):
    poses = []
    for f in range(n_frames):
        T = np.eye(4)
        ang = 0.01 * f
        c, s = np.cos(ang), np.sin(ang)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = [-20 + step * f, lane_y, 1.8]
        poses.append(T)
    return np.stack(poses)


@pytest.fixture(scope="module")
def world():
    return make_world()


def test_odometry_corrects_gps_noise(world):
    """Scans pre-transformed with NOISY GPS; ICP must find the correction
    (the MTGSDataset convention: the estimate is E(f) with
    E @ pre_noisy ~ true relative pose)."""
    rng = np.random.default_rng(1)
    poses = drive_poses(12)
    rel = np.einsum("ij,njk->nik", np.linalg.inv(poses[0]), poses)
    noisy_rel = rel.copy()
    noise = rng.normal(0, 0.1, (len(poses), 3))
    noise[0] = 0
    noisy_rel[:, :3, 3] += noise
    odom = LidarOdometry(voxel_size=0.8, max_range=100.0, min_range=2.0)
    est = []
    for f in range(len(poses)):
        scan = scan_from(world, poses[f], rng)
        pre = noisy_rel[f]
        ref_scan = scan @ pre[:3, :3].T + pre[:3, 3]
        E = odom.register_scan(ref_scan.astype(np.float32))
        est.append(E @ pre)
    est = np.stack(est)
    err = trajectory_errors(est, rel)
    # corrected track must beat the raw noisy GPS
    raw = trajectory_errors(noisy_rel, rel)
    assert err["ATE"] < raw["ATE"] * 0.7, (err, raw)
    assert err["ATE"] < 0.12, err


def test_umeyama_exact():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(50, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([3.0, -2.0, 0.5])
    dst = src @ R.T + t
    T = umeyama_rigid(src, dst)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-8)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-8)


def test_register_traversals_gate(world):
    rng = np.random.default_rng(3)
    scans, gps = {}, {}
    for travel, lane in ((0, -1.0), (1, 1.0)):
        poses = drive_poses(8, lane_y=lane)
        scans[travel] = [
            scan_from(world, poses[f], rng).astype(np.float32)
            for f in range(len(poses))
        ]
        gps[travel] = poses
    refined, errors, excluded = register_traversals(
        scans, gps, voxel_size=0.8, epe_gate=5.0, ate_gate=2.0)
    assert not excluded, (errors, excluded)
    for t in (0, 1):
        # refined tracks stay close to GPS (synthetic GPS is exact)
        d = np.linalg.norm(refined[t][:, :3, 3] - gps[t][:len(refined[t]), :3, 3], axis=1)
        assert d.mean() < 0.5, (t, d.mean(), errors[t])
