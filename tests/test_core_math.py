"""Golden tests for core math: quaternions, SH, cameras."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgs_tpu.core import (
    camera_to_gsplat_viewmat,
    eval_sh,
    num_sh_bases,
    quat_mult,
    quat_to_rotmat,
    random_quats,
    rgb_to_sh,
    rotate_vector_to_vector,
    rotmat_to_quat,
    sh_to_rgb,
    slerp,
)
from mtgs_tpu.core.camera import (
    PinholeCamera,
    backproject_depth,
    distort_opencv,
    project_points,
    undistort_points,
    world_to_camera,
)


def test_quat_rotmat_roundtrip():
    q = random_quats(jax.random.key(0), 64)
    R = quat_to_rotmat(q)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)
    q2 = rotmat_to_quat(R)
    # equality up to sign
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_mult_matches_rotmat_composition():
    k1, k2 = jax.random.split(jax.random.key(1))
    qa, qb = random_quats(k1, 16), random_quats(k2, 16)
    R = quat_to_rotmat(quat_mult(qa, qb))
    R2 = quat_to_rotmat(qa) @ quat_to_rotmat(qb)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    q0 = jnp.array([1.0, 0, 0, 0])
    q1 = jnp.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0])  # 90 deg about x
    np.testing.assert_allclose(slerp(q0, q1, jnp.array(0.0)), q0, atol=1e-6)
    np.testing.assert_allclose(slerp(q0, q1, jnp.array(1.0)), q1, atol=1e-6)
    mid = slerp(q0, q1, jnp.array(0.5))
    expect = jnp.array([np.cos(np.pi / 8), np.sin(np.pi / 8), 0, 0])
    np.testing.assert_allclose(mid, expect, atol=1e-6)


def test_sh_bases_and_dc():
    assert [num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]
    rgb = jnp.array([0.25, 0.5, 0.75])
    np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, atol=1e-6)
    # degree-0 eval: color independent of direction, equals dc*C0 + 0.5
    coeffs = jnp.zeros((5, 16, 3)).at[:, 0, :].set(rgb_to_sh(rgb))
    dirs = jax.random.normal(jax.random.key(2), (5, 3))
    out = eval_sh(3, coeffs, dirs)
    np.testing.assert_allclose(out, np.broadcast_to(rgb, out.shape), atol=1e-5)


def test_sh_degree1_varies_linearly_with_dir():
    coeffs = jnp.zeros((1, 4, 1)).at[0, 2, 0].set(1.0)  # the z-linear basis
    up = eval_sh(1, coeffs, jnp.array([[0.0, 0, 1]]))
    down = eval_sh(1, coeffs, jnp.array([[0.0, 0, -1]]))
    np.testing.assert_allclose((up - 0.5), -(down - 0.5), atol=1e-6)


def test_rotate_vector_to_vector():
    k = jax.random.key(3)
    v1 = jax.random.normal(k, (32, 3))
    v2 = jax.random.normal(jax.random.key(4), (32, 3))
    R = rotate_vector_to_vector(v1, v2)
    v1n = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v2n = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
    out = jnp.einsum("nij,nj->ni", R, v1n)
    np.testing.assert_allclose(out, v2n, atol=1e-5)


def test_viewmat_scene_frame():
    # camera at origin looking along -z (scene frame): a point at z=-5 must
    # land at cv-frame z=+5 in front of the camera, centered.
    c2w = jnp.eye(4)
    vm = camera_to_gsplat_viewmat(c2w)
    p = world_to_camera(jnp.array([[0.0, 0, -5.0]]), vm)
    np.testing.assert_allclose(p, [[0.0, 0.0, 5.0]], atol=1e-6)


def test_project_backproject_roundtrip():
    K = jnp.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1]])
    cam = PinholeCamera(
        fx=jnp.array(100.0), fy=jnp.array(100.0), cx=jnp.array(32.0),
        cy=jnp.array(24.0), c2w=jnp.eye(4), width=64, height=48,
    )
    np.testing.assert_allclose(cam.K, K, atol=1e-6)
    depth = jnp.full((48, 64), 3.0)
    pts = backproject_depth(depth, K)  # cv camera frame
    pix = project_points(pts.reshape(-1, 3), K).reshape(48, 64, 2)
    us = jnp.arange(64) + 0.5
    vs = jnp.arange(48) + 0.5
    np.testing.assert_allclose(pix[..., 0], np.broadcast_to(us, (48, 64)), atol=1e-4)
    np.testing.assert_allclose(pix[..., 1], np.broadcast_to(vs[:, None], (48, 64)), atol=1e-4)


def test_distortion_roundtrip():
    dist = jnp.array([0.1, -0.05, 0.01, -0.01, 0.02])
    xy = jax.random.uniform(jax.random.key(5), (100, 2), minval=-0.4, maxval=0.4)
    xy_d = distort_opencv(xy, dist)
    xy_u = undistort_points(xy_d, dist, iters=20)
    np.testing.assert_allclose(xy_u, xy, atol=1e-5)


def test_camera_velocity_in_world():
    """omega x r lever arm + world rotation (ref camera_utils.py:295-338)."""
    from mtgs_tpu.core.camera import camera_velocity_in_world

    cam2ego = jnp.eye(4).at[:3, 3].set(jnp.asarray([2.0, 0.0, 1.0]))
    # ego yawing at 1 rad/s, moving +x at 10 m/s; world frame rotated 90deg
    ego2global = jnp.asarray(
        [[0.0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    v, w = camera_velocity_in_world(
        jnp.asarray([10.0, 0, 0]), jnp.asarray([0.0, 0, 1.0]),
        cam2ego, ego2global)
    # v_ego-frame = (10,0,0) + (0,0,1)x(2,0,1) = (10,2,0); world-rotated
    np.testing.assert_allclose(np.asarray(v), [-2.0, 10.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), [0.0, 0.0, 1.0], atol=1e-6)
