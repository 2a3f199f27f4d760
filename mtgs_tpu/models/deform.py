"""Deformation MLP for pedestrian/cyclist nodes.

JAX rewrite of the reference's `ConditionalDeformNetwork`
(`mtgs/scene_model/gaussian_model/utils.py:286-333` in OpenDriveLab/MTGS)
and its use in `deformable_node.py:173-201`: an 8x256 ReLU MLP with a
mid-skip, fed NeRF positional encodings of (normalized canonical xyz,
normalized timestamp) plus a per-instance embedding, predicting
(delta_xyz, delta_quat, delta_scale). Runs batched over all stacked
deformable instances (one big MXU matmul chain instead of per-node
module calls).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

X_MULTIRES = 10
T_MULTIRES = 10
HIDDEN = 256
DEPTH = 8
SKIP = DEPTH // 2


def posenc(x: jax.Array, num_freqs: int) -> jax.Array:
    """NeRF positional encoding incl. input (reference Embedder,
    `utils.py:235-283`): [..., d] -> [..., d * (1 + 2 * num_freqs)]."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    ang = x[..., None, :] * freqs[:, None]  # [..., F, d]
    enc = jnp.concatenate(
        [jnp.sin(ang), jnp.cos(ang)], axis=-2
    ).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)


def _in_dim(embed_dim: int) -> int:
    return 3 * (1 + 2 * X_MULTIRES) + 1 * (1 + 2 * T_MULTIRES) + embed_dim


@struct.dataclass
class DeformMLPParams:
    """Weights of the conditional deformation network."""

    w: Tuple[jax.Array, ...]       # hidden layer weights
    b: Tuple[jax.Array, ...]
    w_xyz: jax.Array               # [H, 3]
    b_xyz: jax.Array
    w_quat: jax.Array              # [H, 4]
    b_quat: jax.Array
    w_scale: jax.Array             # [H, 3]
    b_scale: jax.Array


def init_deform_mlp(key: jax.Array, embed_dim: int = 16) -> DeformMLPParams:
    d_in = _in_dim(embed_dim)
    dims = [d_in] + [HIDDEN] * DEPTH
    ws, bs = [], []
    keys = jax.random.split(key, DEPTH + 3)
    for i in range(DEPTH):
        fan_in = dims[i] + (d_in if i == SKIP else 0)
        ws.append(
            jax.random.normal(keys[i], (fan_in, HIDDEN)) * jnp.sqrt(2.0 / fan_in)
        )
        bs.append(jnp.zeros((HIDDEN,)))
    z = lambda k, n: jax.random.normal(k, (HIDDEN, n)) * 1e-4  # near-identity start
    return DeformMLPParams(
        w=tuple(ws), b=tuple(bs),
        w_xyz=z(keys[-3], 3), b_xyz=jnp.zeros((3,)),
        w_quat=z(keys[-2], 4), b_quat=jnp.zeros((4,)),
        w_scale=z(keys[-1], 3), b_scale=jnp.zeros((3,)),
    )


def deform_mlp(
    mlp: DeformMLPParams, x: jax.Array, t: jax.Array, cond: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Forward the deform net.

    Args:
        x: [..., 3] normalized canonical positions.
        t: [..., 1] normalized timestamps.
        cond: [..., E] instance embeddings.

    Returns:
        (delta_xyz [...,3], delta_quat [...,4], delta_scale [...,3]).
    """
    inp = jnp.concatenate([posenc(x, X_MULTIRES), posenc(t, T_MULTIRES), cond], axis=-1)
    h = inp
    for i in range(DEPTH):
        if i == SKIP:
            h = jnp.concatenate([h, inp], axis=-1)
        h = jax.nn.relu(h @ mlp.w[i] + mlp.b[i])
    return (
        h @ mlp.w_xyz + mlp.b_xyz,
        h @ mlp.w_quat + mlp.b_quat,
        h @ mlp.w_scale + mlp.b_scale,
    )


def apply_deform(
    mlp: DeformMLPParams,
    canonical_means: jax.Array,   # [I, cap, 3] (treated as constants: the
                                  # reference freezes canonical xyz once
                                  # deformation starts, deformable_node.py:95-104)
    embeddings: jax.Array,        # [I, E]
    timestamp: jax.Array,         # [] normalized
    *,
    xyz_bound: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Evaluate deformation offsets for all stacked instances."""
    I, cap, _ = canonical_means.shape
    x = jax.lax.stop_gradient(canonical_means) * (2.0 / xyz_bound)
    t = jnp.broadcast_to(timestamp, (I, cap, 1)).astype(x.dtype)
    cond = jnp.broadcast_to(embeddings[:, None, :], (I, cap, embeddings.shape[-1]))
    return deform_mlp(mlp, x, t, cond)
