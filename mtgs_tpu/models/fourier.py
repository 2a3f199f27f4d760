"""Fourier (IDFT) time-conditioned colors for rigid nodes + velocities.

JAX rewrites of the reference's optional rigid-node features
(OpenDriveLab/MTGS):
  * `IDFT` basis + `get_fourier_features` (`gaussian_model/utils.py:335-352`,
    `rigid_node.py:217-236`): features_dc stored as [n, F_dim, 3] Fourier
    coefficients, combined per frame with the IDFT basis at the normalized
    timestamp — lets a vehicle's base color vary over time (brake lights,
    reflections).
  * finite-difference instance velocities (`rigid_node.py:168-204`) for
    motion-aware losses/rendering.
  * scene-edit helpers (`rigid_node.py:398-421`): rigid-transform an
    instance's whole trajectory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mtgs_tpu.core.quat import quat_mult, quat_normalize, quat_rotate


def idft_basis(t: jax.Array, dim: int) -> jax.Array:
    """IDFT feature basis at normalized times t (`utils.py:335-352`).

    [...,] -> [..., dim]: even entries cos(t * k * 2pi / dim), odd entries
    sin(t * (k+1) * 2pi / dim).
    """
    k = jnp.arange(dim)
    even = (k % 2 == 0)
    freq = jnp.where(even, k, k + 1) * (2.0 * jnp.pi / dim)
    ang = t[..., None] * freq
    return jnp.where(even, jnp.cos(ang), jnp.sin(ang))


def fourier_features_dc(
    coeffs: jax.Array,   # [n, F_dim, 3]
    t: jax.Array,        # [] normalized timestamp
) -> jax.Array:
    """Per-frame dc features from Fourier coefficients (`rigid_node.py:217-236`)."""
    basis = idft_basis(jnp.atleast_1d(t), coeffs.shape[1])[0]  # [F_dim]
    return jnp.einsum("nfc,f->nc", coeffs, basis)


def init_fourier_dc(features_dc: jax.Array, fourier_dim: int) -> jax.Array:
    """Lift static dc features [..., 3] to IDFT coefficients
    [..., fourier_dim, 3] that reproduce them at every t: basis entry 0 is
    cos(0)=1, so coefficient 0 carries the static dc and the higher
    harmonics start at zero (matches the reference's reshape-init of
    `features_dc` when `fourier_features_enabled`, `rigid_node.py:75-86`)."""
    coeffs = jnp.zeros(features_dc.shape[:-1] + (fourier_dim, 3), features_dc.dtype)
    return coeffs.at[..., 0, :].set(features_dc)


def instance_velocities(
    quats: jax.Array,        # [I, F, 4] per-frame poses
    trans: jax.Array,        # [I, F, 3]
    timestamps: jax.Array,   # [F]
    frame_idx: jax.Array,    # []
    means_local: jax.Array,  # [I, cap, 3]
) -> jax.Array:
    """Finite-difference world velocity of each gaussian at a frame
    (`rigid_node.py:168-204`): v = (x_w(f+1) - x_w(f-1)) / (t_+ - t_-),
    one-sided at trajectory ends."""
    F = trans.shape[1]
    f0 = jnp.clip(frame_idx - 1, 0, F - 1)
    f1 = jnp.clip(frame_idx + 1, 0, F - 1)

    def world(f):
        q = quat_normalize(jnp.take(quats, f, axis=1))[:, None, :]
        t = jnp.take(trans, f, axis=1)[:, None, :]
        return quat_rotate(q, means_local) + t

    dt = jnp.take(timestamps, f1) - jnp.take(timestamps, f0)
    dt = jnp.where(jnp.abs(dt) < 1e-9, 1.0, dt)
    return (world(f1) - world(f0)) / dt


def edit_translate(trans: jax.Array, instance: int, offset: jax.Array) -> jax.Array:
    """Shift one instance's whole trajectory (`rigid_node.py:398-407`)."""
    return trans.at[instance].add(offset)


def edit_rotate(
    quats: jax.Array, trans: jax.Array, instance: int, rot_quat: jax.Array,
    pivot: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Rotate one instance's trajectory about a pivot (`rigid_node.py:409-421`)."""
    q = quats[instance]
    t = trans[instance]
    new_q = quat_mult(rot_quat[None, :], q)
    new_t = quat_rotate(rot_quat[None, :], t - pivot) + pivot
    return quats.at[instance].set(new_q), trans.at[instance].set(new_t)
