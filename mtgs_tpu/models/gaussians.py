"""Padded Gaussian parameter stores (the pytree "gauss_params").

TPU-native counterpart of the reference's per-node
`torch.nn.ParameterDict` (`mtgs/scene_model/gaussian_model/
vanilla_gaussian_splatting.py:174-196` in OpenDriveLab/MTGS): each node
holds raw (pre-activation) parameter arrays padded to a fixed capacity,
with a separate float "alive" mask in the aux tree. Densification
(`train/control.py`) recompacts within capacity and grows capacity
outside jit — N changes every refine step in the reference; here the
*array* shapes stay static between re-jits.

Parameter semantics match the reference exactly:
    means        [cap, 3]   world positions
    scales       [cap, 3]   log-scales (exp activation; [cap, 1] marbles)
    quats        [cap, 4]   wxyz, normalized on use
    features_dc  [cap, 3]   SH degree-0 coefficients
    features_rest[cap, K-1, 3] or [cap, T, K-1, 3] (multi-traversal)
    opacities    [cap, 1]   logits (sigmoid activation)
    features_adapters [cap, T, 3]  per-traversal dc offsets (multicolor)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mtgs_tpu.core.quat import quat_normalize
from mtgs_tpu.core.sh import num_sh_bases, rgb_to_sh


@struct.dataclass
class GaussianNodeParams:
    """Learnable parameters of one node (all-float pytree)."""

    means: jax.Array
    scales: jax.Array
    quats: jax.Array
    features_dc: jax.Array
    features_rest: jax.Array
    opacities: jax.Array
    # [cap, T, 3] per-traversal dc adapters; zeros-[cap, 0, 3] for vanilla.
    features_adapters: jax.Array
    # [cap, F_dim, 3] Fourier (IDFT) time-conditioned dc coefficients for
    # rigid nodes (ref `rigid_node.py:217-236`); zeros-[cap, 0, 3] when
    # disabled. Lives on the node so densification's row gather moves /
    # grows it with every other per-gaussian leaf.
    fourier_dc: jax.Array = None  # type: ignore[assignment]

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def multicolor(self) -> bool:
        # T axis is second-to-last in BOTH layouts: [cap, T, 3] and
        # stacked [I, cap, T, 3] (shape[1] would read `cap` there)
        return self.features_adapters.shape[-2] > 0

    @property
    def fourier(self) -> bool:
        return self.fourier_dc is not None and self.fourier_dc.shape[-2] > 0

    @property
    def multi_feature_rest(self) -> bool:
        # per-traversal rest has exactly one more axis than adapters:
        # [cap(,T),K-1,3] vs adapters [cap,T,3]; holds for stacked nodes
        return self.features_rest.ndim == self.features_adapters.ndim + 1


@struct.dataclass
class NodeAux:
    """Non-learnable per-node state."""

    alive: jax.Array        # [cap] float32 0/1
    num_alive: jax.Array    # [] int32


def node_capacity(n: int, granule: int = 4096) -> int:
    """Round a live count up to the padded array capacity."""
    return max(granule, ((n + granule - 1) // granule) * granule)


def knn_mean_distance(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean distance to the k nearest neighbors (host-side, scipy).

    Replaces the reference's sklearn kNN scale init
    (`vanilla_gaussian_splatting.py:372-390`).
    """
    from scipy.spatial import cKDTree

    if len(points) <= k:
        return np.full((len(points),), 0.1, dtype=np.float32)
    tree = cKDTree(points)
    d, _ = tree.query(points, k=k + 1)  # first hit is the point itself
    return d[:, 1:].mean(axis=1).astype(np.float32)


def init_node_from_points(
    xyz: np.ndarray,
    rgb: np.ndarray,
    *,
    capacity: Optional[int] = None,
    sh_degree: int = 3,
    num_traversals: int = 0,
    multi_feature_rest: bool = False,
    init_opacity: float = 0.1,
    seed: int = 0,
    isotropic: bool = False,
    fourier_dim: int = 0,
) -> tuple[GaussianNodeParams, NodeAux]:
    """Seed a node from a colored point cloud.

    Mirrors `vanilla_gaussian_splatting.py:114-196` /
    `multi_color_gaussian_splatting.py:48-71`: SH dc from RGB, kNN mean
    distance as isotropic log-scale, random quats, opacity logit(0.1);
    multicolor nodes get zero per-traversal adapters and (optionally)
    per-traversal SH rest coefficients.

    Args:
        xyz: [n, 3] float seed positions.
        rgb: [n, 3] uint8-range colors (0..255).
        capacity: padded capacity (defaults to node_capacity(n)).
        num_traversals: 0 for a vanilla node; > 0 for multicolor.
        fourier_dim: > 0 enables Fourier time-conditioned dc on this node
            (rigid vehicles): coefficient 0 carries the seed color, higher
            harmonics start at zero (ref `rigid_node.py:75-86,217-236`).
    """
    n = len(xyz)
    cap = capacity or node_capacity(n)
    if n > cap:
        raise ValueError(f"{n} points exceed capacity {cap}")
    dim_sh = num_sh_bases(sh_degree)
    rng = np.random.default_rng(seed)

    means = np.zeros((cap, 3), np.float32)
    means[:n] = xyz
    dc = np.zeros((cap, 3), np.float32)
    dc[:n] = np.asarray(rgb_to_sh(jnp.asarray(rgb, jnp.float32) / 255.0))

    if num_traversals > 0 and multi_feature_rest:
        rest = np.zeros((cap, num_traversals, dim_sh - 1, 3), np.float32)
    else:
        rest = np.zeros((cap, dim_sh - 1, 3), np.float32)
    adapters = np.zeros((cap, num_traversals, 3), np.float32)

    # scale_dim=1 "Gaussian marbles" stores one tied log-scale per
    # gaussian (ref `vanilla_gaussian_splatting.py:74-79,185-196`)
    scale_dim = 1 if isotropic else 3
    scales = np.full((cap, scale_dim), -5.0, np.float32)
    if n > 0:
        avg = np.maximum(knn_mean_distance(np.asarray(xyz)), 1e-7)
        scales[:n] = np.log(avg)[:, None]

    # Shoemake uniform random quats
    u, v, w = rng.random((3, cap)).astype(np.float32)
    quats = np.stack(
        [
            np.sqrt(1 - u) * np.sin(2 * np.pi * v),
            np.sqrt(1 - u) * np.cos(2 * np.pi * v),
            np.sqrt(u) * np.sin(2 * np.pi * w),
            np.sqrt(u) * np.cos(2 * np.pi * w),
        ],
        axis=-1,
    )

    logit = float(np.log(init_opacity / (1.0 - init_opacity)))
    opac = np.full((cap, 1), logit, np.float32)

    fourier = np.zeros((cap, fourier_dim, 3), np.float32)
    if fourier_dim > 0:
        fourier[:, 0, :] = dc  # IDFT basis[0] = cos(0) = 1

    params = GaussianNodeParams(
        means=jnp.asarray(means),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        features_dc=jnp.asarray(dc),
        features_rest=jnp.asarray(rest),
        opacities=jnp.asarray(opac),
        features_adapters=jnp.asarray(adapters),
        fourier_dc=jnp.asarray(fourier),
    )
    alive = np.zeros((cap,), np.float32)
    alive[:n] = 1.0
    aux = NodeAux(alive=jnp.asarray(alive), num_alive=jnp.asarray(n, jnp.int32))
    return params, aux


def init_skybox_node(
    *,
    num_points: int = 100_000,
    radius: float = 1000.0,
    skybox_type: str = "spheric",
    scene_extent: float = 100.0,
    sh_degree: int = 3,
    num_traversals: int = 0,
    multi_feature_rest: bool = False,
    seed: int = 1,
) -> tuple[GaussianNodeParams, NodeAux]:
    """Skybox shell init (reference `skybox_gaussian_splatting.py:42-96`):
    points sampled on/in a far shell, phi in [pi/4, pi/2], white color."""
    rng = np.random.default_rng(seed)
    radius = max(radius, scene_extent * 2.0)
    if skybox_type == "spheric":
        radii = np.full(num_points, radius)
    elif skybox_type == "volumetric":
        radii = rng.random(num_points) * radius
    else:  # homocentric shell
        radii = scene_extent + rng.random(num_points) * (radius - scene_extent)
    theta = rng.random(num_points) * 2 * np.pi
    phi = rng.random(num_points) * np.pi / 4 + np.pi / 4
    xyz = np.stack(
        [
            radii * np.sin(phi) * np.cos(theta),
            radii * np.sin(phi) * np.sin(theta),
            radii * np.cos(phi),
        ],
        axis=-1,
    ).astype(np.float32)
    rgb = np.full((num_points, 3), 255.0, np.float32)
    return init_node_from_points(
        xyz, rgb,
        capacity=node_capacity(num_points),
        sh_degree=sh_degree,
        num_traversals=num_traversals,
        multi_feature_rest=multi_feature_rest,
        seed=seed,
    )


# ---------------------------------------------------------------- activations

def get_scales(p: GaussianNodeParams) -> jax.Array:
    s = jnp.exp(p.scales)
    if s.shape[-1] == 1:  # isotropic marbles: broadcast the tied scale
        s = jnp.broadcast_to(s, (s.shape[0], 3))
    return s


def get_opacities(p: GaussianNodeParams, aux: NodeAux) -> jax.Array:
    return jax.nn.sigmoid(p.opacities[:, 0]) * aux.alive


def get_quats(p: GaussianNodeParams) -> jax.Array:
    return quat_normalize(p.quats)
