"""EWA perspective projection of 3D Gaussians to screen space.

The jnp (autodiff) half of the rasterizer: world-space Gaussians ->
2D means, conics (inverse 2D covariances), depths, radii and opacity
compensation. Semantics follow gsplat v1.4's `fully_fused_projection`
(the CUDA op behind the reference call at
`mtgs/scene_model/mtgs_scene_graph.py:640-662`): FOV-clamped perspective
Jacobian, +0.3px low-pass blur, `classic` vs `antialiased` opacity
compensation, 3-sigma radius, near/far culling. Gradients (w.r.t. means,
quats, scales, opacities and the view matrix — the camera-optimizer path)
come from jax autodiff; no custom kernels needed here, XLA fuses this
elementwise pipeline well.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mtgs_tpu.core.quat import quat_to_rotmat


@struct.dataclass
class ProjectedGaussians:
    """Per-gaussian screen-space quantities, in input order. All [N, ...]."""

    means2d: jax.Array      # [N, 2] pixel coordinates
    conics: jax.Array       # [N, 3] inverse 2D covariance (cxx, cxy, cyy)
    depths: jax.Array       # [N] camera-frame z depth
    radii: jax.Array        # [N] int32 3-sigma screen radius (0 => culled)
    compensations: jax.Array  # [N] antialiasing opacity compensation (1 if classic)
    valid: jax.Array        # [N] bool — survives frustum/det culling


def quat_scale_to_covar(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """3D covariance from quaternion + scale. [N,4],[N,3] -> [N,3,3]."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def _camera_covar_entries(quats, scales, R_cw):
    """Upper-triangle entries of A diag(s^2) A^T with A = R_cw @ R(quat).

    Fully elementwise over [N] arrays — the batched [N,3,3] dot_general
    formulation costs ~18 ms/step at 1M gaussians in layout copies +
    small-matmul overhead on TPU; this expansion fuses into the
    surrounding projection pipeline on the VPU.
    """
    q = quats / jnp.sqrt(jnp.sum(quats * quats, -1, keepdims=True) + 1e-24)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # rotation-matrix entries of R(quat) (rows m, cols k)
    r = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    # A = R_cw @ R(quat): A[i][k] = sum_m R_cw[i,m] r[m][k] (R_cw scalars)
    A = [
        [
            R_cw[i, 0] * r[0][k] + R_cw[i, 1] * r[1][k] + R_cw[i, 2] * r[2][k]
            for k in range(3)
        ]
        for i in range(3)
    ]
    s2 = scales * scales
    s2k = [s2[:, 0], s2[:, 1], s2[:, 2]]

    def cov(i, j):
        return sum(s2k[k] * A[i][k] * A[j][k] for k in range(3))

    return cov(0, 0), cov(0, 1), cov(0, 2), cov(1, 1), cov(1, 2), cov(2, 2)


def project_gaussians(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    viewmat: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    *,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    antialiased: bool = False,
    radius_clip: float = 0.0,
) -> ProjectedGaussians:
    """Project 3D Gaussians to screen space (EWA splatting).

    Args:
        means: [N, 3] world-space centers.
        quats: [N, 4] rotations (wxyz, need not be normalized).
        scales: [N, 3] linear (already exp'd) scales.
        viewmat: [4, 4] world-to-camera, cv convention (z forward).
        K: [3, 3] intrinsics.
        width, height: image size (static).
        near_plane, far_plane: depth culling range.
        eps2d: screen-space low-pass blur added to the 2D covariance
            (0.3 px, the classic 3DGS dilation).
        antialiased: if True, compute the opacity compensation factor
            sqrt(det(cov2d)/det(cov2d + eps2d I)) (gsplat `antialiased` mode);
            if False compensation is 1 (gsplat `classic`).
        radius_clip: cull gaussians with screen radius <= this.

    Returns:
        ProjectedGaussians, in input order; culled entries have valid=False
        and radii=0.
    """
    dtype = means.dtype
    R_cw = viewmat[:3, :3]
    t_cw = viewmat[:3, 3]
    mean_c = means @ R_cw.T + t_cw  # [N, 3]
    z = mean_c[:, 2]

    # 3D covariance in camera frame, as elementwise entry formulas (no
    # [N, 3, 3] batched dots — see _camera_covar_entries).
    c00, c01, c02, c11, c12, c22 = _camera_covar_entries(quats, scales, R_cw)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # FOV-clamped tangent for the perspective Jacobian (gsplat persp_proj):
    # the clamp bounds tx/tz so the Jacobian of off-screen gaussians stays sane.
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy

    # z-safe reciprocal: gaussians at/behind the near plane are culled, but
    # their VJP would still produce inf * 0 = NaN through 1/z terms.
    z_ok = z > near_plane
    z_safe = jnp.where(z_ok, z, 1.0)
    rz = 1.0 / z_safe
    tx = z_safe * jnp.clip(mean_c[:, 0] * rz, -lim_x_neg, lim_x_pos)
    ty = z_safe * jnp.clip(mean_c[:, 1] * rz, -lim_y_neg, lim_y_pos)

    rz2 = rz * rz
    # J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2

    # cov2d = J covar_c J^T, expanded to avoid materializing [N, 2, 3].
    v00 = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    v01 = j11 * (j00 * c01 + j02 * c12) + j12 * (j00 * c02 + j02 * c22)
    v11 = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    det_orig = v00 * v11 - v01 * v01
    v00b = v00 + eps2d
    v11b = v11 + eps2d
    det_blur = v00b * v11b - v01 * v01

    if antialiased:
        # double-where: sqrt has an infinite gradient at 0, and culled
        # (zero-cotangent) gaussians would still turn 0 * inf into NaN.
        ratio = det_orig / jnp.maximum(det_blur, 1e-32)
        pos = ratio > 0.0
        compensations = jnp.where(
            pos, jnp.sqrt(jnp.where(pos, ratio, 1.0)), 0.0
        )
    else:
        compensations = jnp.ones_like(det_blur)

    # det-safe inverse: degenerate (culled) covariances otherwise yield
    # inf-scale conics whose zero-cotangent VJP still NaNs.
    det_ok = det_blur > 1e-16
    det_safe = jnp.where(det_ok, det_blur, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([v11b * inv_det, -v01 * inv_det, v00b * inv_det], axis=-1)

    # 3-sigma screen radius from the larger eigenvalue of the blurred cov2d.
    b = 0.5 * (v00b + v11b)
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det_blur, 0.01))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(v1))

    means2d = jnp.stack(
        [fx * mean_c[:, 0] * rz + cx, fy * mean_c[:, 1] * rz + cy], axis=-1
    )

    valid = z_ok & (z < far_plane) & det_ok
    valid &= radius_f > radius_clip
    # inside-image test (bbox overlap)
    valid &= (means2d[:, 0] + radius_f > 0) & (means2d[:, 0] - radius_f < width)
    valid &= (means2d[:, 1] + radius_f > 0) & (means2d[:, 1] - radius_f < height)

    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return ProjectedGaussians(
        means2d=means2d.astype(dtype),
        conics=conics.astype(dtype),
        depths=z.astype(dtype),
        radii=radii,
        compensations=compensations.astype(dtype),
        valid=valid,
    )
