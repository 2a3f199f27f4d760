"""Per-camera appearance (exposure) model.

JAX rewrite of the reference's `LearnableExposureRGBModel`
(`mtgs/scene_model/module/appearance.py:73-87` in OpenDriveLab/MTGS,
VastGaussian-style): a learnable per-camera 3x4 affine color transform
applied to the rendered image, `out = img @ M[:, :3]^T + M[:, 3]`,
clamped to [0, 1]. Identity-initialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_exposure(num_cameras: int) -> jax.Array:
    """[num_cameras, 3, 4] identity affines."""
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    return jnp.broadcast_to(eye, (num_cameras, 3, 4)).copy()


def apply_exposure(appearance: jax.Array, rgb: jax.Array, cam_idx: jax.Array) -> jax.Array:
    """Apply one camera's affine to an [H, W, 3] image; clamp to [0, 1]."""
    M = jnp.take(appearance, cam_idx, axis=0)  # [3, 4]
    out = rgb @ M[:, :3].T + M[:, 3]
    return jnp.clip(out, 0.0, 1.0)
