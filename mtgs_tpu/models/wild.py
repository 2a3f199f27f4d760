"""WildGaussians-style appearance: per-image embedding + color MLP.

JAX rewrite of the reference's `use_wild_gaussians` path
(`mtgs/scene_model/mtgs_scene_graph.py:308-318,613-632` in
OpenDriveLab/MTGS): a per-train-image 32-d embedding concatenated with
each gaussian's base color and its first 24 SH-rest coefficients, run
through a 3-layer MLP that outputs a per-gaussian color offset and
multiplier: `color = rgb * (1 + mul) + offset` (both scaled by 0.01).
Used instead of SH view-dependent color by the WildGaussians baseline
config.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mtgs_tpu.core.sh import sh_to_rgb

EMBED_DIM = 32
HIDDEN = 128
IN_DIM = EMBED_DIM + 3 + 6 * 4  # embedding + rgb + 24 rest coefficients


@struct.dataclass
class WildAppearanceParams:
    embeddings: jax.Array   # [num_images, 32]
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array
    w3: jax.Array
    b3: jax.Array


def init_wild(key: jax.Array, num_images: int) -> WildAppearanceParams:
    k = jax.random.split(key, 4)
    he = lambda kk, i, o: jax.random.normal(kk, (i, o)) * jnp.sqrt(2.0 / i)
    return WildAppearanceParams(
        embeddings=jax.random.normal(k[0], (num_images, EMBED_DIM)) * 0.01,
        w1=he(k[1], IN_DIM, HIDDEN), b1=jnp.zeros((HIDDEN,)),
        w2=he(k[2], HIDDEN, HIDDEN), b2=jnp.zeros((HIDDEN,)),
        w3=jax.random.normal(k[3], (HIDDEN, 6)) * 1e-3, b3=jnp.zeros((6,)),
    )


def wild_colors(
    params: WildAppearanceParams,
    features_dc: jax.Array,     # [N, 3]
    features_rest: jax.Array,   # [N, K-1, 3]
    image_idx: jax.Array,       # [] int32
) -> jax.Array:
    """Per-gaussian colors with the per-image appearance MLP applied."""
    rgb = jnp.clip(sh_to_rgb(features_dc), 0.0, 1.0)
    rest = features_rest.reshape(features_rest.shape[0], -1)[:, :24]
    emb = jnp.broadcast_to(
        jnp.take(params.embeddings, image_idx, axis=0), (rgb.shape[0], EMBED_DIM)
    )
    x = jnp.concatenate([rgb, rest, emb], axis=-1)
    h = jax.nn.relu(x @ params.w1 + params.b1)
    h = jax.nn.relu(h @ params.w2 + params.b2)
    out = (h @ params.w3 + params.b3) * 0.01
    offset, mul = out[:, :3], out[:, 3:]
    return rgb * (1.0 + mul) + offset
