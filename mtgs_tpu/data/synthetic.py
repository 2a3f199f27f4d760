"""Synthetic multi-traversal scenes for tests and benchmarks.

The reference has no test suite or fixture system (SURVEY.md §4); this
module creates one: a procedurally-generated ground-truth gaussian scene
(textured ground plane + random floaters + a moving "vehicle" cluster),
rendered through our own oracle-verified rasterizer into a full
multi-traversal dataset — per-traversal color shifts exercise the
appearance adapters, the moving cluster exercises rigid nodes, rendered
depth stands in for LiDAR depth. Training on it end-to-end validates the
whole stack with a measurable PSNR signal, no nuPlan data required.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
from mtgs_tpu.raster import RasterizeConfig, rasterize
from mtgs_tpu.train.trainer import Batch


@dataclasses.dataclass
class SyntheticScene:
    """Ground-truth gaussians + rendered multi-traversal dataset."""

    width: int
    height: int
    n_travels: int
    n_frames: int                 # frames per traversal
    images: np.ndarray            # [T, F, H, W, 3]
    depths: np.ndarray            # [T, F, H, W, 1]
    masks: np.ndarray             # [T, F, H, W, 1]
    c2ws: np.ndarray              # [T, F, 4, 4]
    K: np.ndarray                 # [3, 3]
    timestamps: np.ndarray        # [T, F] normalized per traversal
    # seeds for model init
    seed_xyz: np.ndarray          # [n, 3]
    seed_rgb: np.ndarray          # [n, 3] 0..255
    instance_xyz: np.ndarray      # [m, 3] local frame
    instance_rgb: np.ndarray      # [m, 3]
    instance_quats: np.ndarray    # [F_total, 4] per global frame row
    instance_trans: np.ndarray    # [F_total, 3]
    instance_present: np.ndarray  # [F_total]
    instance_size: np.ndarray     # [3]

    @property
    def frame_rows(self) -> int:
        return self.n_travels * self.n_frames

    def frame_row(self, travel: int, frame: int) -> int:
        return travel * self.n_frames + frame


def _gt_gaussians(key, n_bg: int, extent: float, ground_scale: float = 0.4,
                  color_noise: float = 0.0):
    ks = jax.random.split(key, 9)
    # ground plane: flattened gaussians on z = 0 with a smooth color field
    n_ground = n_bg // 2
    gx = jax.random.uniform(ks[0], (n_ground,), minval=-extent, maxval=extent)
    gy = jax.random.uniform(ks[1], (n_ground,), minval=-extent, maxval=extent)
    ground = jnp.stack([gx, gy, jnp.zeros_like(gx)], -1)
    gcol = jnp.stack(
        [
            0.5 + 0.4 * jnp.sin(gx * 0.7),
            0.5 + 0.4 * jnp.cos(gy * 0.9),
            0.4 + 0.3 * jnp.sin((gx + gy) * 0.5),
        ],
        -1,
    )
    if color_noise > 0:
        # per-gaussian speckle: high-frequency texture the reconstruction
        # can only resolve by densifying (the smooth palette alone trains
        # to high PSNR at seed density, leaving no densify signal)
        gcol = jnp.clip(
            gcol
            + color_noise
            * jax.random.uniform(ks[8], (n_ground, 3), minval=-1.0, maxval=1.0),
            0.0, 1.0,
        )
    gscale = jnp.stack(
        [jnp.full((n_ground,), ground_scale), jnp.full((n_ground,), ground_scale),
         jnp.full((n_ground,), min(0.05, ground_scale / 4))], -1
    )
    # floaters: random blobs above the plane
    n_f = n_bg - n_ground
    fl = jnp.stack(
        [
            jax.random.uniform(ks[2], (n_f,), minval=-extent, maxval=extent),
            jax.random.uniform(ks[3], (n_f,), minval=-extent, maxval=extent),
            jax.random.uniform(ks[4], (n_f,), minval=0.5, maxval=5.0),
        ],
        -1,
    )
    fcol = jax.random.uniform(ks[5], (n_f, 3), minval=0.1, maxval=0.9)
    fscale = jnp.exp(jax.random.normal(ks[6], (n_f, 3)) * 0.3 - 1.2)
    means = jnp.concatenate([ground, fl])
    colors = jnp.concatenate([gcol, fcol])
    scales = jnp.concatenate([gscale, fscale])
    quats = jnp.concatenate(
        [jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n_ground, 1)),
         jax.random.normal(ks[7], (n_f, 4))]
    )
    opac = jnp.full((n_bg,), 0.9)
    return means, quats, scales, opac, colors


def _instance_gaussians(key, m: int):
    """A box-ish cluster (the 'vehicle'), local frame, size ~ (4, 2, 1.5)."""
    ks = jax.random.split(key, 3)
    xyz = jax.random.uniform(ks[0], (m, 3), minval=-0.5, maxval=0.5) * jnp.array(
        [4.0, 2.0, 1.5]
    )
    col = jnp.tile(jnp.array([[0.85, 0.15, 0.1]]), (m, 1)) + 0.1 * jax.random.normal(
        ks[1], (m, 3)
    )
    scales = jnp.exp(jax.random.normal(ks[2], (m, 3)) * 0.2 - 1.8)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (m, 1))
    opac = jnp.full((m,), 0.95)
    return xyz, quats, scales, opac, jnp.clip(col, 0, 1)


def make_synthetic_scene(
    seed: int = 0,
    *,
    width: int = 96,
    height: int = 64,
    n_travels: int = 2,
    n_frames: int = 4,
    n_bg: int = 1500,
    n_instance: int = 150,
    extent: float = 12.0,
    backend: str = "auto",
    n_seed: int | None = None,
    ground_scale: float = 0.4,
    color_noise: float = 0.0,
    gt_max_intersections: int = 1 << 17,
) -> SyntheticScene:
    """`n_seed` caps the seed-point subsample (default 1200 — small
    fixtures for tests); pass n_seed=n_bg for benchmark-scale models.
    `ground_scale`/`color_noise` control GT texture frequency (small
    scale + speckle drives densification in training campaigns); size
    `gt_max_intersections` to the GT population so ground-truth renders
    don't truncate."""
    key = jax.random.key(seed)
    kb, ki = jax.random.split(key)
    bg = _gt_gaussians(kb, n_bg, extent, ground_scale, color_noise)
    ixyz, iquat, iscale, iopac, icol = _instance_gaussians(ki, n_instance)

    K = np.array(
        [[0.9 * width, 0, width / 2], [0, 0.9 * width, height / 2], [0, 0, 1.0]],
        np.float32,
    )
    cfg = RasterizeConfig(
        width=width, height=height, max_intersections=gt_max_intersections,
        render_mode="RGB+ED", backend=backend,
    )

    F_total = n_travels * n_frames
    images = np.zeros((n_travels, n_frames, height, width, 3), np.float32)
    depths = np.zeros((n_travels, n_frames, height, width, 1), np.float32)
    c2ws = np.zeros((n_travels, n_frames, 4, 4), np.float32)
    timestamps = np.zeros((n_travels, n_frames), np.float32)
    inst_quats = np.zeros((F_total, 4), np.float32)
    inst_trans = np.zeros((F_total, 3), np.float32)
    inst_present = np.ones((F_total,), np.float32)

    # per-traversal color gain (what the adapters must absorb)
    gains = 1.0 + 0.15 * np.linspace(-1, 1, n_travels)[:, None] * np.array([[1.0, -0.5, 0.3]])

    render = jax.jit(
        lambda m, q, s, o, c, vm: rasterize(m, q, s, o, c, vm, jnp.asarray(K), cfg)
    )

    for t in range(n_travels):
        lane_y = -1.0 + 2.0 * t / max(n_travels - 1, 1)
        for f in range(n_frames):
            # camera drives along +x, 1.6 m up, looking forward (-z is view dir
            # in scene frame; build a c2w whose -z axis points along +x world)
            cam_x = -8.0 + 3.0 * f
            c2w = np.eye(4, dtype=np.float32)
            # scene-frame camera: x right(-y world), y up(z world), z backward(-x world)
            c2w[:3, 0] = [0, -1, 0]
            c2w[:3, 1] = [0, 0, 1]
            c2w[:3, 2] = [-1, 0, 0]
            c2w[:3, 3] = [cam_x, lane_y, 1.6]
            c2ws[t, f] = c2w
            ts = f / max(n_frames - 1, 1)
            timestamps[t, f] = ts
            row = t * n_frames + f

            # instance drives the other way
            itr = np.array([6.0 - 2.5 * f, 1.5 - lane_y * 0.5, 0.75], np.float32)
            ang = 0.05 * f
            iq = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)], np.float32)
            inst_quats[row] = iq
            inst_trans[row] = itr

            # world-space instance gaussians for gt render
            from mtgs_tpu.core.quat import quat_mult, quat_rotate

            iw_means = np.asarray(
                quat_rotate(jnp.asarray(iq)[None], ixyz) + jnp.asarray(itr)
            )
            iw_quats = np.asarray(quat_mult(jnp.asarray(iq)[None], iquat))

            means = jnp.concatenate([bg[0], jnp.asarray(iw_means)])
            quats = jnp.concatenate([bg[1], jnp.asarray(iw_quats)])
            scales = jnp.concatenate([bg[2], iscale])
            opacs = jnp.concatenate([bg[3], iopac])
            cols = jnp.concatenate([bg[4] * jnp.asarray(gains[t]), icol])
            cols = jnp.clip(cols, 0, 1)

            vm = camera_to_gsplat_viewmat(jnp.asarray(c2w))
            r, a, _ = render(means, quats, scales, opacs, cols, vm)
            images[t, f] = np.asarray(jnp.clip(r[..., :3], 0, 1))
            depths[t, f] = np.asarray(
                np.where(np.asarray(a) > 0.5, np.asarray(r[..., -1:]), 0.0)
            )

    masks = np.ones((n_travels, n_frames, height, width, 1), np.float32)

    rng = np.random.default_rng(seed + 1)
    # noisy seed points (the "LiDAR+SfM" stand-in)
    sub = rng.choice(n_bg, size=min(n_bg, n_seed or 1200), replace=False)
    seed_xyz = np.asarray(bg[0])[sub] + rng.normal(0, 0.05, (len(sub), 3)).astype(np.float32)
    seed_rgb = np.clip(np.asarray(bg[4])[sub] * 255.0 + rng.normal(0, 10, (len(sub), 3)), 0, 255)

    return SyntheticScene(
        width=width, height=height, n_travels=n_travels, n_frames=n_frames,
        images=images, depths=depths, masks=masks, c2ws=c2ws, K=K,
        timestamps=timestamps,
        seed_xyz=seed_xyz.astype(np.float32), seed_rgb=seed_rgb.astype(np.float32),
        instance_xyz=np.asarray(ixyz), instance_rgb=np.clip(np.asarray(icol) * 255, 0, 255),
        instance_quats=inst_quats, instance_trans=inst_trans,
        instance_present=inst_present, instance_size=np.array([4.0, 2.0, 1.5], np.float32),
    )


def batch_iterator(scene: SyntheticScene, seed: int = 0) -> Iterator[Batch]:
    """Shuffled epoch iterator over (travel, frame) views."""
    rng = np.random.default_rng(seed)
    pairs = [(t, f) for t in range(scene.n_travels) for f in range(scene.n_frames)]
    while True:
        order = rng.permutation(len(pairs))
        for i in order:
            t, f = pairs[i]
            row = scene.frame_row(t, f)
            yield Batch(
                image=jnp.asarray(scene.images[t, f]),
                mask=jnp.asarray(scene.masks[t, f]),
                c2w=jnp.asarray(scene.c2ws[t, f]),
                K=jnp.asarray(scene.K),
                cam_idx=jnp.asarray(0, jnp.int32),
                image_idx=jnp.asarray(row, jnp.int32),
                travel_index=jnp.asarray(t, jnp.int32),
                frame_idx=jnp.asarray(row, jnp.int32),
                timestamp=jnp.asarray(scene.timestamps[t, f]),
                lidar_depth=jnp.asarray(scene.depths[t, f]),
                pseudo_depth=jnp.asarray(scene.depths[t, f]),
            )


def build_scene_model(scene: SyntheticScene, *, with_instances: bool = True,
                      with_skybox: bool = False, capacity: int | None = None,
                      wild_appearance: bool = False, skybox_points: int = 2048):
    """Initialize SceneParams/SceneAux from a synthetic scene's seeds."""
    from mtgs_tpu.models.gaussians import (
        init_node_from_points, init_skybox_node, node_capacity,
    )
    from mtgs_tpu.models.scene_graph import (
        InstanceAux, InstanceParams, init_scene,
    )

    bg = init_node_from_points(
        scene.seed_xyz, scene.seed_rgb,
        capacity=capacity or node_capacity(len(scene.seed_xyz)),
        num_traversals=scene.n_travels, multi_feature_rest=True,
    )
    sky = None
    if with_skybox:
        sky = init_skybox_node(
            num_points=skybox_points, radius=300.0, scene_extent=20.0,
            num_traversals=scene.n_travels, multi_feature_rest=True,
        )
    inst = None
    if with_instances:
        node, naux = init_node_from_points(
            scene.instance_xyz, scene.instance_rgb,
            capacity=node_capacity(len(scene.instance_xyz), granule=1024),
        )
        # noisy init poses (pose optimization must recover them)
        rng = np.random.default_rng(7)
        q0 = scene.instance_quats + rng.normal(0, 0.01, scene.instance_quats.shape)
        t0 = scene.instance_trans + rng.normal(0, 0.05, scene.instance_trans.shape)
        params = InstanceParams(
            node=jax.tree.map(lambda a: a[None], node),
            quats=jnp.asarray(q0, jnp.float32)[None],
            trans=jnp.asarray(t0, jnp.float32)[None],
        )
        F_total = scene.frame_rows
        iaux = InstanceAux(
            alive=naux.alive[None],
            num_alive=naux.num_alive[None],
            present=jnp.asarray(scene.instance_present)[None],
            is_static=jnp.zeros((1,), jnp.float32),
            frame_timestamps=jnp.asarray(scene.timestamps.reshape(-1)),
            travel_of_frame=jnp.repeat(
                jnp.arange(scene.n_travels, dtype=jnp.int32), scene.n_frames
            ),
            sizes=jnp.asarray(scene.instance_size)[None],
        )
        inst = (params, iaux)

    return init_scene(
        bg, sky, inst,
        num_cameras=1, num_images=scene.frame_rows,
        wild_appearance=wild_appearance,
    )
