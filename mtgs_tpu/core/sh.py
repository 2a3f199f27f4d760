"""Real spherical harmonics (degree <= 3) for view-dependent Gaussian color.

TPU-native replacement for the reference's `gsplat.spherical_harmonics`
CUDA op (called at `mtgs/scene_model/gaussian_model/vanilla_gaussian_splatting.py:16,317`
in OpenDriveLab/MTGS) and the `RGB2SH/SH2RGB/num_sh_bases` helpers
(`gaussian_model/utils.py:83-95`). Closed-form basis, evaluated as one
batched matvec over the coefficient axis — vectorizes cleanly on the VPU
and fuses with the surrounding projection math under jit.

Convention matches the standard 3DGS SH tables: color = clamp(SH·basis + 0.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Standard 3DGS real-SH constants.
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    """Number of SH basis functions for a max degree (0->1, 1->4, 2->9, 3->16)."""
    return (degree + 1) ** 2


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    """RGB in [0,1] to DC SH coefficient."""
    return (rgb - 0.5) / _C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    """DC SH coefficient to RGB."""
    return sh * _C0 + 0.5


def sh_basis(degree: int, dirs: jax.Array) -> jax.Array:
    """Evaluate the real SH basis at unit directions.

    Args:
        degree: max SH degree in [0, 3] (static).
        dirs: [..., 3] unit view directions.

    Returns:
        [..., num_sh_bases(degree)] basis values.
    """
    if not 0 <= degree <= 3:
        raise ValueError(f"SH degree must be in [0,3], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [_C0 * one]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(degree: int, coeffs: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH color at view directions.

    Mirrors gsplat's `spherical_harmonics(degrees_to_use, viewdirs, coeffs)`
    semantics: `coeffs` may carry bases for a higher max degree than
    `degree`; only the first num_sh_bases(degree) are used.

    Args:
        degree: degree to use (static int in [0, 3]).
        coeffs: [..., K, C] SH coefficients with K >= num_sh_bases(degree).
        dirs: [..., 3] view directions (need not be normalized).

    Returns:
        [..., C] colors, offset by +0.5 (3DGS convention), NOT clamped.
    """
    n = num_sh_bases(degree)
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    basis = sh_basis(degree, d)  # [..., n]
    # broadcast multiply-reduce (see scene_graph.py: the batched-tiny
    # matmul lowering of the einsum form is pathologically slow on TPU)
    return (basis[..., :, None] * coeffs[..., :n, :]).sum(-2) + 0.5
