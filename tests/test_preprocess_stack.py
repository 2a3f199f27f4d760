"""Point-cloud stacking stage: box splitting, painting, accumulation."""

import numpy as np

from mtgs_tpu.preprocess.stack_point_cloud import (
    StackAccumulator,
    brightness_adjust_factors,
    paint_points,
    points_in_boxes,
)
from mtgs_tpu.utils.pointcloud import load_pcd


def test_points_in_boxes():
    pts = np.array([[0.0, 0, 0], [5.0, 0, 0], [5.0, 0.4, 0.2], [10.0, 0, 0]])
    boxes = np.array([[5.0, 0, 0, 2.0, 1.5, 1.0, 0.0]])
    bg, per = points_in_boxes(pts, boxes)
    assert list(bg) == [True, False, False, True]
    assert list(per[0]) == [False, True, True, False]


def test_points_in_rotated_box():
    # box rotated 90deg: length along y
    boxes = np.array([[0.0, 0, 0, 4.0, 1.0, 1.0, np.pi / 2]])
    pts = np.array([[0.0, 1.8, 0], [1.8, 0.0, 0]])
    bg, per = points_in_boxes(pts, boxes)
    assert per[0][0] and not per[0][1]


def test_paint_points_and_accumulate(tmp_path):
    rng = np.random.default_rng(0)
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    img = np.zeros((48, 64, 3), np.float32)
    img[:, :32] = [1.0, 0, 0]
    img[:, 32:] = [0, 1.0, 0]
    cam2ego = np.eye(4)  # camera at ego origin, cv frame = ego frame here
    pts = np.array([[-0.5, 0.0, 5.0], [0.5, 0.0, 5.0], [0.0, 0.0, -5.0]])
    rgb, seen, sem = paint_points(pts, [img], [cam2ego], [K])
    assert seen[0] and seen[1] and not seen[2]
    np.testing.assert_allclose(rgb[0], [255, 0, 0])
    np.testing.assert_allclose(rgb[1], [0, 255, 0])

    acc = StackAccumulator(voxel=0.1)
    boxes = np.array([[0.5, 0.0, 5.0, 1.0, 1.0, 12.0, 0.0]])
    acc.add_frame(pts, rgb, seen, sem, np.eye(4), boxes, ["trk"])
    acc.finalize(tmp_path)
    xyz, rgbl = load_pcd(tmp_path / "stacked_point_cloud" / "background.pcd.npz")
    assert len(xyz) == 1  # only the red point stays background
    # the instance saw <5 points -> no file written (ref filter)
    assert not (tmp_path / "instance_point_cloud" / "trk.pcd.npz").exists()


def test_brightness_factors():
    bright = np.full((8, 8, 3), 0.8, np.float32)
    dark = np.full((8, 8, 3), 0.4, np.float32)
    f = brightness_adjust_factors([bright, dark])
    assert abs(f[0] - 1.0) < 1e-6
    assert abs(f[1] - 2.0) < 1e-6
