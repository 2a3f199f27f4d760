"""Quaternion math (wxyz convention), batched and differentiable.

Provides the quaternion subset of the reference's GS math utilities
(`mtgs/scene_model/gaussian_model/utils.py:14-233` in OpenDriveLab/MTGS):
quat<->rotmat, Hamilton product, slerp, random quats, Rodrigues
vector-to-vector rotation — re-derived in jnp with `...`-batched shapes so
every function works under vmap/jit/grad without loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions along the last axis. [..., 4] -> [..., 4].

    Epsilon-safe under autodiff: sqrt(sum+eps^2) instead of linalg.norm,
    whose gradient is NaN at the exact-zero quats that padded/dead array
    rows carry (their zero cotangents would still propagate 0 * NaN)."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps * eps)
    return q / norm


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit-norm-insensitive quaternion (w,x,y,z) to rotation matrix.

    [..., 4] -> [..., 3, 3]. Normalizes internally.
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix to quaternion (w,x,y,z), branch-free.

    [..., 3, 3] -> [..., 4]. Uses the Shepperd/branchless formulation:
    compute all four candidate quaternions and select the numerically best
    (largest pivot) with `where`, so it is jit/vmap safe (the reference's
    loop-based `matrix_to_quaternion` is host-Python; this is the TPU-idiomatic
    equivalent).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q*q_i formulations; pick the one with largest diagonal
    # pivot for numerical stability.
    qw = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5  # [..., 4] candidate magnitudes

    # candidate 0: pivot w
    c0 = jnp.stack(
        [qw[..., 0], (m21 - m12) / (4.0 * qw[..., 0]), (m02 - m20) / (4.0 * qw[..., 0]), (m10 - m01) / (4.0 * qw[..., 0])],
        axis=-1,
    )
    # candidate 1: pivot x
    c1 = jnp.stack(
        [(m21 - m12) / (4.0 * qw[..., 1]), qw[..., 1], (m01 + m10) / (4.0 * qw[..., 1]), (m02 + m20) / (4.0 * qw[..., 1])],
        axis=-1,
    )
    # candidate 2: pivot y
    c2 = jnp.stack(
        [(m02 - m20) / (4.0 * qw[..., 2]), (m01 + m10) / (4.0 * qw[..., 2]), qw[..., 2], (m12 + m21) / (4.0 * qw[..., 2])],
        axis=-1,
    )
    # candidate 3: pivot z
    c3 = jnp.stack(
        [(m10 - m01) / (4.0 * qw[..., 3]), (m02 + m20) / (4.0 * qw[..., 3]), (m12 + m21) / (4.0 * qw[..., 3]), qw[..., 3]],
        axis=-1,
    )
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # [..., 4cand, 4]
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_mult(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1*q2 in (w,x,y,z). [..., 4] x [..., 4] -> [..., 4]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v by quaternions q. [..., 4], [..., 3] -> [..., 3]."""
    q = quat_normalize(q)
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def random_quats(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniformly random unit quaternions [n, 4] (Shoemake's method)."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (n,), dtype=dtype)
    v = jax.random.uniform(k2, (n,), dtype=dtype) * 2.0 * jnp.pi
    w = jax.random.uniform(k3, (n,), dtype=dtype) * 2.0 * jnp.pi
    return jnp.stack(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(v),
            jnp.sqrt(1.0 - u) * jnp.cos(v),
            jnp.sqrt(u) * jnp.sin(w),
            jnp.sqrt(u) * jnp.cos(w),
        ],
        axis=-1,
    )


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Spherical linear interpolation between unit quaternions.

    q0, q1: [..., 4]; t: [...] or [..., 1] in [0, 1]. Handles the
    antipodal sign flip and falls back to lerp for nearly-parallel inputs
    (behavioural contract of the reference's `interpolate_quats`,
    `gaussian_model/utils.py:201-233`).
    """
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    if t.ndim == q0.ndim - 1:
        t = t[..., None]
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot_c = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot_c, 0.0, 1.0 - eps))
    sin_theta = jnp.sin(theta)
    near = dot > 1.0 - eps
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, eps))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, eps))
    return quat_normalize(w0 * q0 + w1 * q1)


def rotate_vector_to_vector(v1: jax.Array, v2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rotation matrix sending direction v1 to direction v2 (Rodrigues).

    [..., 3] x [..., 3] -> [..., 3, 3]. Branch-free handling of the
    antiparallel case (reference: `gaussian_model/utils.py:120-151`).
    """
    a = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), eps)
    b = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), eps)
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1)  # cos
    s2 = jnp.sum(v * v, axis=-1)  # sin^2

    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(vx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -vz, vy], axis=-1),
            jnp.stack([vz, zeros, -vx], axis=-1),
            jnp.stack([-vy, vx, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v1.dtype), K.shape)
    factor = jnp.where(s2 > eps, (1.0 - c) / jnp.maximum(s2, eps), 0.5)
    R = eye + K + factor[..., None, None] * (K @ K)
    # antiparallel: rotate pi around any axis orthogonal to a
    ortho = jnp.cross(a, jnp.where(jnp.abs(a[..., :1]) < 0.9, jnp.array([1.0, 0, 0], a.dtype), jnp.array([0, 1.0, 0], a.dtype)))
    ortho = ortho / jnp.maximum(jnp.linalg.norm(ortho, axis=-1, keepdims=True), eps)
    R_pi = 2.0 * ortho[..., :, None] * ortho[..., None, :] - eye
    anti = (c < -1.0 + 1e-6)[..., None, None]
    return jnp.where(anti, R_pi, R)
