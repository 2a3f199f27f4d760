"""Camera models and pose-frame conversions.

Replaces the used subset of nerfstudio `Cameras` plus the reference's
camera helpers (`mtgs/utils/camera_utils.py` in OpenDriveLab/MTGS):
pinhole intrinsics, the OpenCV<->scene-frame axis flip, the gsplat-style
world->camera view matrix build (`mtgs/scene_model/mtgs_scene_graph.py:602-613`),
back-projection, and OpenCV radial-tangential distortion (numpy-only —
no cv2 dependency).

Frame conventions
-----------------
* **scene frame** (nerfstudio-style camera-to-world): camera x right,
  y up, z backward — the camera looks along -z.
* **cv frame** (OpenCV/gsplat): x right, y down, z forward.
The flip between the two is `diag(1, -1, -1)` applied to the rotation
columns, exactly the reference's `R_edit`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

# diag(1,-1,-1): scene-frame camera axes -> cv-frame camera axes.
_FLIP_YZ = jnp.diag(jnp.array([1.0, -1.0, -1.0]))


@struct.dataclass
class PinholeCamera:
    """One pinhole camera (a pytree; all fields are arrays, batchable).

    Attributes:
        fx, fy, cx, cy: intrinsics (scalars or [...]-batched).
        width, height: static python ints (pytree aux data) — image size.
        c2w: [..., 4, 4] camera-to-world in the *scene frame* (z backward).
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    c2w: jax.Array
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    @property
    def K(self) -> jax.Array:
        """[..., 3, 3] intrinsics matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        row0 = jnp.stack([self.fx, z, self.cx], axis=-1)
        row1 = jnp.stack([z, self.fy, self.cy], axis=-1)
        row2 = jnp.stack([z, z, o], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)

    def rescale(self, scale: float) -> "PinholeCamera":
        """Rescale output resolution (reference: `rescale_output_resolution`)."""
        return self.replace(
            fx=self.fx * scale,
            fy=self.fy * scale,
            cx=self.cx * scale,
            cy=self.cy * scale,
            width=int(round(self.width * scale)),
            height=int(round(self.height * scale)),
        )


def opencv_to_scene_frame(c2w_cv: jax.Array) -> jax.Array:
    """Convert an OpenCV-convention camera-to-world to the scene frame.

    [..., 4, 4] -> [..., 4, 4]; right-multiplies rotation by diag(1,-1,-1)
    (reference: `mtgs/utils/camera_utils.py:276-293` applies the same flip
    when building poses from nuPlan extrinsics).
    """
    out = c2w_cv.at[..., :3, 1:3].multiply(-1.0)
    return out


def scene_to_opencv_frame(c2w_scene: jax.Array) -> jax.Array:
    """Inverse of `opencv_to_scene_frame` (the flip is an involution)."""
    return c2w_scene.at[..., :3, 1:3].multiply(-1.0)


def camera_to_gsplat_viewmat(c2w_scene: jax.Array) -> jax.Array:
    """Scene-frame camera-to-world -> cv-frame world-to-camera (viewmat).

    The analytic inverse with the y/z flip, matching the reference's build
    at `mtgs/scene_model/mtgs_scene_graph.py:602-613`: R <- R @ diag(1,-1,-1),
    then viewmat = [[R^T, -R^T t], [0, 1]].
    """
    R = c2w_scene[..., :3, :3] @ _FLIP_YZ.astype(c2w_scene.dtype)
    t = c2w_scene[..., :3, 3:4]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -R_inv @ t
    top = jnp.concatenate([R_inv, t_inv], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=c2w_scene.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def world_to_camera(points: jax.Array, viewmat: jax.Array) -> jax.Array:
    """Transform world points into cv camera frame. [N,3], [4,4] -> [N,3]."""
    return points @ viewmat[:3, :3].T + viewmat[:3, 3]


def project_points(points_cam: jax.Array, K: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Pinhole-project cv-frame camera points to pixels. [N,3] -> [N,2]."""
    z = jnp.maximum(points_cam[..., 2:3], eps)
    xy = points_cam[..., :2] / z
    return xy * jnp.stack([K[0, 0], K[1, 1]]) + jnp.stack([K[0, 2], K[1, 2]])


def backproject_depth(
    depth: jax.Array,
    K: jax.Array,
    c2w_scene: Optional[jax.Array] = None,
) -> jax.Array:
    """Back-project a depth map to 3D points.

    Reference: `mtgs/utils/camera_utils.py:96-148` (`get_means3d_backproj`).

    Args:
        depth: [H, W] or [H, W, 1] z-depth in the cv camera frame.
        K: [3, 3] intrinsics.
        c2w_scene: optional [4, 4] scene-frame camera-to-world; if given,
            points are returned in world coordinates, else cv camera frame.

    Returns:
        [H, W, 3] points.
    """
    if depth.ndim == 3:
        depth = depth[..., 0]
    H, W = depth.shape
    xs = (jnp.arange(W, dtype=depth.dtype) + 0.5 - K[0, 2]) / K[0, 0]
    ys = (jnp.arange(H, dtype=depth.dtype) + 0.5 - K[1, 2]) / K[1, 1]
    grid_x, grid_y = jnp.meshgrid(xs, ys)
    pts_cam = jnp.stack([grid_x * depth, grid_y * depth, depth], axis=-1)
    if c2w_scene is None:
        return pts_cam
    c2w_cv = scene_to_opencv_frame(c2w_scene)
    return pts_cam @ c2w_cv[:3, :3].T + c2w_cv[:3, 3]


def distort_opencv(
    xy: jax.Array, dist: jax.Array
) -> jax.Array:
    """Apply OpenCV radial-tangential distortion to normalized coords.

    Args:
        xy: [..., 2] normalized (undistorted) image-plane coordinates.
        dist: [>=4] distortion coefficients (k1, k2, p1, p2[, k3]).

    Returns:
        [..., 2] distorted normalized coordinates.
    """
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    k3 = dist[4] if dist.shape[0] > 4 else jnp.zeros(())
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(
    xy_d: jax.Array, dist: jax.Array, iters: int = 8
) -> jax.Array:
    """Invert `distort_opencv` by fixed-point iteration (cv2-style)."""
    x = xy_d

    def body(_, x):
        d = distort_opencv(x, dist) - x
        return xy_d - d

    return jax.lax.fori_loop(0, iters, body, x)


def redistort_image(
    image: jax.Array,
    K_raw: jax.Array,
    dist: jax.Array,
    K_und: jax.Array,
    out_hw: tuple[int, int] | None = None,
) -> jax.Array:
    """Warp an undistorted render back onto the RAW camera geometry.

    Equivalent of the reference's `invert_distortion`
    (`mtgs/utils/camera_utils.py:340-356` in OpenDriveLab/MTGS, built on
    cv2.initInverseRectificationMap): for every pixel of the raw grid,
    normalize with the raw intrinsics, apply the forward distortion, and
    bilinearly sample the undistorted image at the `K_und` projection of
    that distorted coordinate.

    Args:
        image: [H, W, C] undistorted render.
        K_raw: [3, 3] raw camera intrinsics.
        dist: [>=4] OpenCV distortion coefficients.
        K_und: [3, 3] intrinsics of the undistorted render.
        out_hw: raw (height, width); defaults to the render's.
    """
    H, W = image.shape[:2]
    oh, ow = out_hw if out_hw is not None else (H, W)
    u = jnp.arange(ow, dtype=jnp.float32)
    v = jnp.arange(oh, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    x = (uu - K_raw[0, 2]) / K_raw[0, 0]
    y = (vv - K_raw[1, 2]) / K_raw[1, 1]
    xy_d = distort_opencv(jnp.stack([x, y], axis=-1), jnp.asarray(dist))
    us = xy_d[..., 0] * K_und[0, 0] + K_und[0, 2]
    vs = xy_d[..., 1] * K_und[1, 1] + K_und[1, 2]

    # bilinear sample with zero padding outside the render
    u0 = jnp.floor(us)
    v0 = jnp.floor(vs)
    fu = us - u0
    fv = vs - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(vi, ui):
        ok = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        val = image[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
        return jnp.where(ok[..., None], val, 0.0)

    out = (
        tap(v0i, u0i) * ((1 - fu) * (1 - fv))[..., None]
        + tap(v0i, u0i + 1) * (fu * (1 - fv))[..., None]
        + tap(v0i + 1, u0i) * ((1 - fu) * fv)[..., None]
        + tap(v0i + 1, u0i + 1) * (fu * fv)[..., None]
    )
    return out


def camera_velocity_in_world(
    ego_linear_velocity: jax.Array,    # [3] in ego frame
    ego_angular_velocity: jax.Array,   # [3] in ego frame
    cam2ego: jax.Array,                # [4, 4]
    ego2global: jax.Array,             # [4, 4]
) -> tuple[jax.Array, jax.Array]:
    """Camera linear + angular velocity in the world frame from CAN-bus
    ego rates (ref `calculate_camera_velocity_in_world`,
    `mtgs/utils/camera_utils.py:295-338`): the camera rides the rigid ego
    body, so v_cam = v_ego + omega x r_cam, both rotated to world."""
    v = jnp.asarray(ego_linear_velocity, jnp.float32)
    w = jnp.asarray(ego_angular_velocity, jnp.float32)
    r = cam2ego[:3, 3]
    R = ego2global[:3, :3]
    v_cam_ego = v + jnp.cross(w, r)
    return R @ v_cam_ego, R @ w
