"""The multi-traversal Gaussian scene graph: composition of padded nodes.

TPU-first rewrite of `mtgs/scene_model/mtgs_scene_graph.py:207-461`
(OpenDriveLab/MTGS): instead of a dict of per-instance torch Modules that
return variable-size tensors (or None) per frame, every node is a padded
fixed-capacity block and composition is a static-slice concatenation:

    [ background | skybox | instance 0 | instance 1 | ... ]

Frame/traversal gating is multiplicative on opacity (absent instance =>
opacity 0, culled by the rasterizer's alpha floor), so ONE jitted render
graph serves every (travel, frame) combination. Rigid instances are
*stacked* — all per-instance arrays share a capacity and carry a leading
instance axis, so pose transforms vectorize instead of looping nodes.

Node kinds vs the reference:
    background  multicolor node (per-traversal dc adapters + SH rest)
    skybox      multicolor node with shell init / far cull policy
    instances   rigid vehicle nodes w/ per-frame optimizable poses, slerp
                interpolation, static-vehicle single-pose mode
    deformable  pedestrian nodes + deform MLP (see models/deform.py)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mtgs_tpu.core.quat import quat_mult, quat_normalize, quat_rotate, slerp
from mtgs_tpu.core.sh import num_sh_bases, sh_basis
from mtgs_tpu.models import deform as deform_lib
from mtgs_tpu.models import wild as wild_lib
from mtgs_tpu.models.gaussians import (
    GaussianNodeParams,
    NodeAux,
    get_opacities,
    get_quats,
    get_scales,
)


@struct.dataclass
class InstanceParams:
    """Stacked rigid instances: node leaves carry a leading [I] axis."""

    node: GaussianNodeParams            # [I, cap, ...]
    quats: jax.Array                    # [I, F, 4] per-frame pose rotations
    trans: jax.Array                    # [I, F, 3] per-frame pose translations


@struct.dataclass
class InstanceAux:
    alive: jax.Array                    # [I, cap]
    num_alive: jax.Array                # [I]
    present: jax.Array                  # [I, F] float 0/1
    is_static: jax.Array                # [I] float 0/1 (single-pose mode)
    frame_timestamps: jax.Array         # [F] normalized timestamps
    travel_of_frame: jax.Array          # [F] int32 traversal id per frame row
    sizes: jax.Array                    # [I, 3] box dimensions (l, w, h)


@struct.dataclass
class DeformableParams:
    """Stacked deformable (pedestrian/cyclist) instances + shared MLP."""

    node: GaussianNodeParams            # [I, cap, ...] canonical gaussians
    quats: jax.Array                    # [I, F, 4]
    trans: jax.Array                    # [I, F, 3]
    embeddings: jax.Array               # [I, embed_dim]
    mlp: deform_lib.DeformMLPParams


@struct.dataclass
class SceneParams:
    """The full learnable tree (float leaves only)."""

    background: GaussianNodeParams
    skybox: Optional[GaussianNodeParams]
    instances: Optional[InstanceParams]
    deformables: Optional[DeformableParams]
    appearance: jax.Array               # [num_cams, 3, 4] exposure affine
    camera_opt: jax.Array               # [num_images, 6] SO3xR3 deltas
    # WildGaussians baseline: per-image embedding + color MLP replacing
    # SH view dependence on the multicolor nodes (ref
    # `mtgs_scene_graph.py:308-318,613-632`); None for the other methods.
    wild: Optional[wild_lib.WildAppearanceParams] = None


@struct.dataclass
class SceneAux:
    background: NodeAux
    skybox: Optional[NodeAux]
    instances: Optional[InstanceAux]
    deformables: Optional[InstanceAux]


class SceneConfig(struct.PyTreeNode):
    """Static scene-graph settings (not a pytree — all aux data)."""

    sh_degree: int = struct.field(pytree_node=False, default=3)
    travel_mode: str = struct.field(pytree_node=False, default="index")
    # "index" | "mean" | "null" — eval fallback for unseen traversals
    # (reference multi_color_gaussian_splatting.py:103-117)
    interp_poses: bool = struct.field(pytree_node=False, default=False)
    predict_normals: bool = struct.field(pytree_node=False, default=False)
    deform_enabled: bool = struct.field(pytree_node=False, default=False)
    deform_xyz_bound: float = struct.field(pytree_node=False, default=4.0)


@struct.dataclass
class ViewInputs:
    """Per-render traced inputs."""

    travel_index: jax.Array             # [] int32 traversal embedding index
    frame_idx: jax.Array                # [] int32 global frame row
    timestamp: jax.Array                # [] float normalized timestamp
    cam_pos: jax.Array                  # [3] camera origin (world)
    sh_mask: jax.Array                  # [num_sh_bases] 0/1 degree-ramp mask
    image_idx: jax.Array = 0            # [] int32 image row (wild appearance)


def node_segments(params: SceneParams) -> List[Tuple[str, int, int]]:
    """Static (name, start, end) slices of each node in the concatenation."""
    segs = []
    off = 0

    def add(name, cap):
        nonlocal off
        segs.append((name, off, off + cap))
        off += cap

    add("background", params.background.capacity)
    if params.skybox is not None:
        add("skybox", params.skybox.capacity)
    if params.instances is not None:
        icap = params.instances.node.means.shape[1]
        for i in range(params.instances.node.means.shape[0]):
            add(f"instance_{i}", icap)
    if params.deformables is not None:
        dcap = params.deformables.node.means.shape[1]
        for i in range(params.deformables.node.means.shape[0]):
            add(f"deformable_{i}", dcap)
    return segs


def _multicolor_features(
    p: GaussianNodeParams, travel_index: jax.Array, mode: str
) -> Tuple[jax.Array, jax.Array]:
    """Per-traversal (features_dc, features_rest) selection.

    Mirrors `multi_color_gaussian_splatting.py:77-87` incl. eval fallbacks.
    """
    if not p.multicolor:
        return p.features_dc, p.features_rest
    if mode == "index":
        dc = p.features_dc + jnp.take(p.features_adapters, travel_index, axis=1)
        rest = (
            jnp.take(p.features_rest, travel_index, axis=1)
            if p.multi_feature_rest
            else p.features_rest
        )
    elif mode == "mean":
        dc = p.features_dc + p.features_adapters.mean(axis=1)
        rest = p.features_rest.mean(axis=1) if p.multi_feature_rest else p.features_rest
    elif mode == "null":
        dc = p.features_dc
        # only the PER-TRAVERSAL rest is nulled; a shared rest stays
        # (ref multi_color_gaussian_splatting.py:85-87)
        rest = (
            jnp.zeros_like(p.features_rest[:, 0])
            if p.multi_feature_rest
            else p.features_rest
        )
    else:
        raise ValueError(f"unknown travel_mode {mode}")
    return dc, rest


def _eval_colors(
    means: jax.Array,
    features_dc: jax.Array,
    features_rest: jax.Array,
    cam_pos: jax.Array,
    sh_mask: jax.Array,
) -> jax.Array:
    """Masked-degree SH color eval (reference `get_rgbs`,
    `vanilla_gaussian_splatting.py:309-322`; degree ramp as a traced
    basis mask so one jit serves all ramp stages)."""
    coeffs = jnp.concatenate([features_dc[..., None, :], features_rest], axis=-2)
    dirs = jax.lax.stop_gradient(means) - cam_pos
    dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, -1, keepdims=True) + 1e-24)
    basis = sh_basis(3, dirs) * sh_mask  # [n, 16]
    k = coeffs.shape[-2]
    # broadcast multiply-reduce, NOT einsum: the per-row [1,16]@[16,3]
    # batched matmul this einsum lowers to costs ~2.5 s at 262k rows on
    # TPU (0.5 s even at bf16 precision); the elementwise form is sub-ms
    rgb = (basis[..., :k, None] * coeffs).sum(-2) + 0.5
    return jnp.clip(rgb, 0.0, 1.0)


def _instance_pose(
    inst_quats: jax.Array,   # [I, F, 4]
    inst_trans: jax.Array,   # [I, F, 3]
    aux: InstanceAux,
    view: ViewInputs,
    interp: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-instance pose for this view -> (quat [I,4], trans [I,3], gate [I]).

    Gather at frame_idx, or slerp between the two frames bracketing the
    timestamp (reference `rigid_node.py:127-166`); static instances always
    use their frame-0 pose (single-pose mode, `rigid_node.py:100-104`).
    """
    if interp:
        ts = aux.frame_timestamps  # [F]
        # restrict to frames of this view's traversal
        same_travel = aux.travel_of_frame == view.travel_index
        diffs = view.timestamp - ts
        big = jnp.float32(1e9)
        prev_key = jnp.where(same_travel & (diffs >= 0), diffs, big)
        next_key = jnp.where(same_travel & (diffs <= 0), -diffs, big)
        prev_f = jnp.argmin(prev_key)
        next_f = jnp.argmin(next_key)
        denom = ts[next_f] - ts[prev_f]
        t = jnp.where(jnp.abs(denom) < 1e-9, 0.0, (view.timestamp - ts[prev_f]) / jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom))
        q0 = inst_quats[:, prev_f]
        q1 = inst_quats[:, next_f]
        q = slerp(q0, q1, jnp.broadcast_to(t, q0.shape[:-1]))
        tr = inst_trans[:, prev_f] * (1 - t) + inst_trans[:, next_f] * t
        gate = aux.present[:, prev_f] * aux.present[:, next_f]
    else:
        q = jnp.take(inst_quats, view.frame_idx, axis=1)   # [I, 4]
        tr = jnp.take(inst_trans, view.frame_idx, axis=1)  # [I, 3]
        gate = jnp.take(aux.present, view.frame_idx, axis=1)
    # Static single-pose mode (ref rigid_node.py:100-104): the builders
    # broadcast the mean in-frame pose over all of the instance's OWN
    # traversal's rows with present=1 there, so gradient ties to one
    # anchor row and visibility stays traversal-gated (the reference
    # renders a node only when travel_id matches, get_gaussians :258).
    static = aux.is_static[:, None]
    anchor = jnp.argmax(aux.present, axis=1)  # first present row
    q_st = jnp.take_along_axis(inst_quats, anchor[:, None, None], axis=1)[:, 0]
    t_st = jnp.take_along_axis(inst_trans, anchor[:, None, None], axis=1)[:, 0]
    q = static * q_st + (1 - static) * q
    tr = static * t_st + (1 - static) * tr
    # no visibility override: `present` (1 across the static instance's
    # traversal, 0 elsewhere) already encodes the travel gate
    return quat_normalize(q), tr, gate


def _collect_instances(
    node: GaussianNodeParams,  # leaves [I, cap, ...]
    alive: jax.Array,          # [I, cap]
    pose_q: jax.Array,         # [I, 4]
    pose_t: jax.Array,         # [I, 3]
    gate: jax.Array,           # [I]
    view: ViewInputs,
    local_offsets: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
):
    """World-space gaussians for stacked instances, flattened to [I*cap, ...].

    local_offsets: optional (dxyz [I,cap,3], dquat [I,cap,4-delta],
    dscale [I,cap,3]) from the deformation MLP. When the node carries
    Fourier dc coefficients (`node.fourier`), the per-view dc is their
    IDFT combination at `view.timestamp` (ref `rigid_node.py:217-236`).
    """
    I, cap = node.means.shape[:2]
    means_l = node.means
    quats_l = quat_normalize(node.quats)
    scales_l = jnp.exp(node.scales)
    if local_offsets is not None:
        dxyz, dquat, dscale = local_offsets
        means_l = means_l + dxyz
        quats_l = quat_normalize(quats_l + dquat)
        scales_l = scales_l * jnp.exp(dscale)
    means_w = quat_rotate(pose_q[:, None, :], means_l) + pose_t[:, None, :]
    quats_w = quat_mult(pose_q[:, None, :], quats_l)
    opac = jax.nn.sigmoid(node.opacities[..., 0]) * alive * gate[:, None]

    dc, rest = node.features_dc, node.features_rest
    if node.fourier:
        from mtgs_tpu.models.fourier import fourier_features_dc

        dc = fourier_features_dc(
            node.fourier_dc.reshape(I * cap, *node.fourier_dc.shape[2:]),
            view.timestamp,
        ).reshape(I, cap, 3)
    colors = _eval_colors(
        means_w.reshape(I * cap, 3),
        dc.reshape(I * cap, 3),
        rest.reshape(I * cap, *rest.shape[2:]),
        view.cam_pos,
        view.sh_mask,
    )
    return (
        means_w.reshape(I * cap, 3),
        quats_w.reshape(I * cap, 4),
        scales_l.reshape(I * cap, 3),
        opac.reshape(I * cap),
        colors,
    )


def collect_gaussians(
    params: SceneParams,
    aux: SceneAux,
    cfg: SceneConfig,
    view: ViewInputs,
) -> Dict[str, jax.Array]:
    """Concatenate all nodes' world-space gaussians for one view.

    The static-shape counterpart of `MTGSSceneModel.get_gaussians`
    (`mtgs_scene_graph.py:408-461`). Returns dict with means [N,3],
    quats [N,4], scales [N,3], opacities [N], colors [N,3].
    """
    outs = []

    def node_colors(p, dc, rest):
        if params.wild is not None:
            # WildGaussians: per-image embedding + MLP instead of SH
            r3 = rest if rest.ndim == 3 else rest[:, 0]
            return wild_lib.wild_colors(params.wild, dc, r3, view.image_idx)
        return _eval_colors(p.means, dc, rest, view.cam_pos, view.sh_mask)

    # background
    p = params.background
    dc, rest = _multicolor_features(p, view.travel_index, cfg.travel_mode)
    outs.append((
        p.means,
        get_quats(p),
        get_scales(p),
        get_opacities(p, aux.background),
        node_colors(p, dc, rest),
    ))

    if params.skybox is not None:
        p = params.skybox
        dc, rest = _multicolor_features(p, view.travel_index, cfg.travel_mode)
        outs.append((
            p.means,
            get_quats(p),
            get_scales(p),
            get_opacities(p, aux.skybox),
            node_colors(p, dc, rest),
        ))

    if params.instances is not None:
        q, t, gate = _instance_pose(
            params.instances.quats, params.instances.trans,
            aux.instances, view, cfg.interp_poses,
        )
        outs.append(
            _collect_instances(
                params.instances.node, aux.instances.alive, q, t, gate, view,
            )
        )

    if params.deformables is not None:
        d = params.deformables
        q, t, gate = _instance_pose(d.quats, d.trans, aux.deformables, view, cfg.interp_poses)
        offsets = None
        node = d.node
        if cfg.deform_enabled:
            # canonical xyz are FROZEN once deformation starts (ref
            # deformable_node.py:95-104): gradients flow to the MLP
            # offsets / embeddings, not to the canonical means (the
            # trainer additionally zeroes their Adam update so momentum
            # can't keep drifting them)
            node = node.replace(means=jax.lax.stop_gradient(node.means))
            offsets = deform_lib.apply_deform(
                d.mlp, node.means, d.embeddings, view.timestamp,
                xyz_bound=cfg.deform_xyz_bound,
            )
        outs.append(
            _collect_instances(node, aux.deformables.alive, q, t, gate, view, offsets)
        )

    means, quats, scales, opac, colors = (
        jnp.concatenate([o[i] for o in outs], axis=0) for i in range(5)
    )
    return dict(means=means, quats=quats, scales=scales, opacities=opac, colors=colors)


def init_scene(
    background: Tuple[GaussianNodeParams, NodeAux],
    skybox: Optional[Tuple[GaussianNodeParams, NodeAux]] = None,
    instances: Optional[Tuple[InstanceParams, InstanceAux]] = None,
    deformables: Optional[Tuple[DeformableParams, InstanceAux]] = None,
    *,
    num_cameras: int = 1,
    num_images: int = 1,
    wild_appearance: bool = False,
) -> Tuple[SceneParams, SceneAux]:
    """Assemble SceneParams/SceneAux from per-node inits."""
    from mtgs_tpu.models.appearance import init_exposure

    params = SceneParams(
        background=background[0],
        skybox=None if skybox is None else skybox[0],
        instances=None if instances is None else instances[0],
        deformables=None if deformables is None else deformables[0],
        appearance=init_exposure(num_cameras),
        camera_opt=jnp.zeros((num_images, 6), jnp.float32),
        wild=wild_lib.init_wild(jax.random.key(0), num_images)
        if wild_appearance
        else None,
    )
    auxs = SceneAux(
        background=background[1],
        skybox=None if skybox is None else skybox[1],
        instances=None if instances is None else instances[1],
        deformables=None if deformables is None else deformables[1],
    )
    return params, auxs


# ------------------------------------------------------------- scene edit
def translate_instance(
    params: SceneParams, instance: int, offset, *, deformable: bool = False
) -> SceneParams:
    """Move one rigid/deformable instance by `offset` (world frame) in
    every frame. Functional equivalent of the reference's scene-edit
    `translate` (`rigid_node.py:398-403`), applied to the per-frame world
    pose instead of mutating local means + compensating the pose."""
    field = "deformables" if deformable else "instances"
    block = getattr(params, field)
    if block is None:
        raise ValueError(f"scene has no {field}")
    off = jnp.asarray(offset, jnp.float32).reshape(3)
    new = block.replace(trans=block.trans.at[instance].add(off))
    return params.replace(**{field: new})


def rotate_instance(
    params: SceneParams, instance: int, quat, *, deformable: bool = False
) -> SceneParams:
    """Rotate one instance about its own center by quaternion `quat`
    (wxyz) in every frame (ref `rigid_node.py:405-421`): the per-frame
    pose rotation is pre-multiplied; translations are unchanged because
    the rotation is about the instance origin."""
    field = "deformables" if deformable else "instances"
    block = getattr(params, field)
    if block is None:
        raise ValueError(f"scene has no {field}")
    q = quat_normalize(jnp.asarray(quat, jnp.float32).reshape(4))
    new_q = quat_mult(q[None, :], block.quats[instance])
    new = block.replace(quats=block.quats.at[instance].set(new_q))
    return params.replace(**{field: new})
