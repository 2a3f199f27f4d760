"""Camera pose optimization: SO3xR3 tangent-space deltas.

Re-provides the nerfstudio `CameraOptimizer` surface the reference uses
(`mtgs/config/MTGS.py:97-99` mode='SO3xR3'; applied per render at
`mtgs/scene_model/mtgs_scene_graph.py:578-581`; exp-map reuse at
`mtgs/dataset/nuplan_dataparser.py:405-411`): a per-image 6-vector
[tangent rotation | translation] exponentiated to an SE(3) adjustment
right-multiplied onto the camera-to-world matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exp_map_so3xr3(tangent: jax.Array) -> jax.Array:
    """SO(3)xR(3) exponential: [..., 6] -> [..., 3, 4] (R | t).

    The rotation block is the SO(3) exponential of tangent[..., :3]; the
    translation is tangent[..., 3:] verbatim (nerfstudio's SO3xR3 —
    NOT the fully-coupled SE(3) exp).
    """
    w = tangent[..., :3]
    t = tangent[..., 3:]
    # epsilon-safe angle + "double-where": the small-angle branch must not
    # see theta ~ 0 even unselected, or its NaN gradients leak through
    # jnp.where (jnp.linalg.norm has a NaN grad at exactly 0, which is the
    # initialization of every pose delta).
    sq = jnp.sum(w * w, axis=-1, keepdims=True)
    small = sq < 1e-14
    theta = jnp.sqrt(jnp.where(small, 1.0, sq))
    a = jnp.where(small, 1.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, sq))
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), K.shape)
    R = eye + a[..., None] * K + b[..., None] * (K @ K)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def apply_camera_opt(c2w: jax.Array, tangent: jax.Array) -> jax.Array:
    """Right-multiply the pose adjustment onto a [4, 4]/[...,4,4] c2w
    (nerfstudio `CameraOptimizer.apply_to_camera`)."""
    adj34 = exp_map_so3xr3(tangent)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], c2w.dtype), adj34.shape[:-2] + (1, 4)
    )
    adj = jnp.concatenate([adj34, bottom], axis=-2)
    return c2w @ adj


def camera_opt_penalty(
    camera_opt: jax.Array, trans_weight: float, rot_weight: float
) -> jax.Array:
    """Pose-delta regularization (nerfstudio CameraOptimizer.get_loss_dict):
    mean norms of the translation and rotation tangents.

    Uses an epsilon-safe norm: jnp.linalg.norm has a NaN gradient at the
    exact zero the parameters are initialized to (torch subgradients 0
    there), which would poison the whole model on step one.
    """
    def safe_norm(x):
        return jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-12)

    rot = safe_norm(camera_opt[..., :3]).mean()
    trans = safe_norm(camera_opt[..., 3:]).mean()
    return trans_weight * trans + rot_weight * rot
