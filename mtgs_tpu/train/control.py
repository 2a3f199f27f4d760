"""Adaptive density control: split / duplicate / cull on padded arrays.

TPU-first rewrite of the reference's refinement machinery
(`mtgs/scene_model/gaussian_model/vanilla_gaussian_splatting.py:448-699`
in OpenDriveLab/MTGS). The reference reallocates torch tensors and
surgically edits optimizer state every `refine_every` steps; here the
arrays are fixed-capacity and refinement is ONE jitted compaction:

  1. per-step stat accumulation (`after_train`, ref :448-474): visible
     mask from radii/opacity, absgrad-norm accumulation, max screen size;
  2. every refine step, build a static candidate table of
     `cap * (1 + n_split + 1)` INDEX rows — keep rows, split-child rows,
     dup-child rows — mark validity, stable-argsort valid rows to the
     front, and gather+transform parameters once. Adam moments follow the
     same gather (kept rows carry state; new rows zeroed — exactly
     `dup_in_optim`'s zero-init, ref :392-446). No host round-trip, no
     reallocation: capacity growth happens outside jit only when the live
     count approaches capacity.

Culling rules mirror the reference: alpha floor, world-size (with the
40x far-background exemption, ref :579-623 — generalized to a per-node
(far_dist, far_scale_factor), which also expresses the skybox node's
custom cull, `skybox_gaussian_splatting.py:130-163`), screen-size, and
periodic opacity-logit clamp reset with Adam-moment zeroing (ref :555-573).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mtgs_tpu.core.quat import quat_rotate
from mtgs_tpu.models.gaussians import GaussianNodeParams, NodeAux


class ControlConfig(struct.PyTreeNode):
    """Densify control settings (`GaussianSplattingControlConfig`,
    `mtgs/config/MTGS.py:57-75`)."""

    densify_from_iter: int = struct.field(pytree_node=False, default=500)
    refine_every: int = struct.field(pytree_node=False, default=100)
    stop_split_at: int = struct.field(pytree_node=False, default=15000)
    reset_alpha_every: int = struct.field(pytree_node=False, default=30)
    continue_cull_post_densification: bool = struct.field(pytree_node=False, default=False)
    cull_alpha_thresh: float = struct.field(pytree_node=False, default=0.005)
    cull_scale_thresh: float = struct.field(pytree_node=False, default=0.5)
    densify_size_thresh: float = struct.field(pytree_node=False, default=0.2)
    densify_grad_thresh: float = struct.field(pytree_node=False, default=0.001)
    n_split_samples: int = struct.field(pytree_node=False, default=2)
    clone_sample_means: bool = struct.field(pytree_node=False, default=True)
    stop_screen_size_at: int = struct.field(pytree_node=False, default=15000)
    cull_screen_size: float = struct.field(pytree_node=False, default=150.0)
    split_screen_size: float = struct.field(pytree_node=False, default=100.0)
    sh_degree: int = struct.field(pytree_node=False, default=3)
    sh_degree_interval: int = struct.field(pytree_node=False, default=1000)
    use_abs_grad: bool = struct.field(pytree_node=False, default=True)
    # far-background cull exemption: scale thresh multiplied by
    # far_scale_factor for gaussians farther than far_dist from origin.
    far_dist: float = struct.field(pytree_node=False, default=100.0)
    far_scale_factor: float = struct.field(pytree_node=False, default=40.0)


@struct.dataclass
class DensifyState:
    """Per-node running statistics between refine steps ([cap] each)."""

    xys_grad_norm: jax.Array
    vis_counts: jax.Array
    max_2dsize: jax.Array

    @classmethod
    def zeros(cls, cap: int) -> "DensifyState":
        # three distinct buffers — sharing one would break jit donation
        return cls(
            xys_grad_norm=jnp.zeros((cap,), jnp.float32),
            vis_counts=jnp.zeros((cap,), jnp.float32),
            max_2dsize=jnp.zeros((cap,), jnp.float32),
        )


def accumulate_stats(
    state: DensifyState,
    absgrad: jax.Array,       # [cap, 2] this step's means2d (abs)grad slice
    radii: jax.Array,         # [cap] screen radii
    opacities: jax.Array,     # [cap] effective opacities (0 for gated-out)
    image_wh: Tuple[int, int],
) -> DensifyState:
    """Per-step stat update (`after_train`, ref :448-474; grad scaling as
    `update_submodel_statistics`, `mtgs_scene_graph.py:1157-1183`)."""
    w, h = image_wh
    visible = ((radii > 0) & (opacities > 0)).astype(jnp.float32)
    g = jnp.linalg.norm(
        absgrad * jnp.array([w * 0.5, h * 0.5], absgrad.dtype), axis=-1
    )
    return DensifyState(
        xys_grad_norm=state.xys_grad_norm + g * visible,
        vis_counts=state.vis_counts + visible,
        max_2dsize=jnp.maximum(state.max_2dsize, radii.astype(jnp.float32) * visible),
    )


class RefineOut(NamedTuple):
    params: GaussianNodeParams
    aux: NodeAux
    mu: GaussianNodeParams
    nu: GaussianNodeParams
    state: DensifyState
    n_split: jax.Array
    n_dup: jax.Array
    n_cull: jax.Array
    overflow: jax.Array   # candidates dropped due to capacity


def _gather_node(p: GaussianNodeParams, idx: jax.Array) -> GaussianNodeParams:
    return jax.tree.map(lambda a: a[idx], p)


def _refine_masks(
    params: GaussianNodeParams,
    aux: NodeAux,
    state: DensifyState,
    cfg: ControlConfig,
    *,
    do_densify: bool,
    do_cull_big: bool,
    use_screen_size: bool,
):
    """Shared split/dup/cull decision masks (the criteria of ref
    `vanilla_gaussian_splatting.py:476-623`). Factored out so the Trainer
    can COUNT candidates before committing to an output capacity — the
    host-side growth decision that makes densification unbounded (the
    reference reallocates tensors freely, :635-699)."""
    cap = params.capacity
    alive = aux.alive > 0

    avg_grad = state.xys_grad_norm / jnp.maximum(state.vis_counts, 1.0)
    high = (avg_grad > cfg.densify_grad_thresh) & alive
    scale_max = jnp.exp(params.scales).max(axis=-1)
    big = scale_max > cfg.densify_size_thresh

    if do_densify:
        # screen-size oversize widens the SPLIT criterion but still
        # requires high accumulated gradient (ref
        # `vanilla_gaussian_splatting.py:500-516`: `splits |= max2d >
        # split_screen_size` then `splits &= high_grads`) — otherwise
        # converged large splats re-split unconditionally every pass
        big_split = big
        if use_screen_size:
            big_split = big_split | (state.max_2dsize > cfg.split_screen_size)
        splits = high & big_split
        dups = high & (~big)
    else:
        splits = jnp.zeros((cap,), bool)
        dups = jnp.zeros((cap,), bool)

    # cull (ref cull_gaussians :579-623); split originals are removed.
    culls = (jax.nn.sigmoid(params.opacities[:, 0]) < cfg.cull_alpha_thresh) & alive
    if do_cull_big:
        far = jnp.linalg.norm(params.means, axis=-1) > cfg.far_dist
        thresh = jnp.where(far, cfg.far_scale_factor, 1.0) * cfg.cull_scale_thresh
        toobig = scale_max > thresh
        if use_screen_size:
            toobig = toobig | (state.max_2dsize > cfg.cull_screen_size)
        culls = culls | (toobig & alive)
    culls = culls | splits

    keep = alive & (~culls)
    # children inherit the parent's opacity; the reference culls the
    # CONCATENATED set by alpha in the same pass, so sub-threshold
    # children must not be emitted at all
    alpha_ok = jax.nn.sigmoid(params.opacities[:, 0]) >= cfg.cull_alpha_thresh
    return keep, splits, dups, culls, alpha_ok, alive


def count_refine_candidates(
    params: GaussianNodeParams,
    aux: NodeAux,
    state: DensifyState,
    cfg: ControlConfig,
    *,
    do_densify: bool,
    do_cull_big: bool,
    use_screen_size: bool,
) -> jax.Array:
    """Number of rows the next `refine_node` pass wants to emit.

    The Trainer runs this cheap [cap]-vector pass first, pulls the count
    to the host, and picks a (possibly larger) static output capacity —
    so refinement never silently drops split/dup candidates."""
    keep, splits, dups, _, alpha_ok, _ = _refine_masks(
        params, aux, state, cfg,
        do_densify=do_densify, do_cull_big=do_cull_big,
        use_screen_size=use_screen_size,
    )
    ns = cfg.n_split_samples
    return (
        keep.sum() + ns * (splits & alpha_ok).sum() + (dups & alpha_ok).sum()
    ).astype(jnp.int32)


def refine_node(
    key: jax.Array,
    params: GaussianNodeParams,
    aux: NodeAux,
    mu: GaussianNodeParams,
    nu: GaussianNodeParams,
    state: DensifyState,
    cfg: ControlConfig,
    step: jax.Array,
    *,
    do_densify: bool,
    do_cull_big: bool,
    use_screen_size: bool,
    out_cap: Optional[int] = None,
) -> RefineOut:
    """One refinement pass over one node (jitted, static capacity).

    Args:
        do_densify: static — step within [densify_from_iter, stop_split_at).
        do_cull_big: static — past the first reset interval (ref :591).
        use_screen_size: static — step < stop_screen_size_at.
        out_cap: static output capacity (>= cap). When larger, the node's
            arrays — params, Adam moments, alive mask, densify state —
            GROW in this same gather, replacing the reference's tensor
            reallocation + optimizer surgery (`dup_in_optim`, ref
            :392-446) with a shape change between jits.
    """
    cap = params.capacity
    out_cap = cap if out_cap is None else out_cap
    if out_cap < cap:
        raise ValueError(f"out_cap {out_cap} < capacity {cap}")

    keep, splits, dups, culls, alpha_ok, alive = _refine_masks(
        params, aux, state, cfg,
        do_densify=do_densify, do_cull_big=do_cull_big,
        use_screen_size=use_screen_size,
    )

    # ---- candidate index table: [keep rows | split children | dup rows] --
    ns = cfg.n_split_samples
    slot = jnp.arange(cap, dtype=jnp.int32)
    cand_src = jnp.concatenate([slot] * (1 + ns + 1))
    cand_kind = jnp.concatenate(
        [jnp.zeros(cap, jnp.int32)]
        + [jnp.ones(cap, jnp.int32)] * ns
        + [jnp.full((cap,), 2, jnp.int32)]
    )
    cand_valid = jnp.concatenate(
        [keep] + [splits & alpha_ok] * ns + [dups & alpha_ok])

    # stable partition: valid rows to the front, preserving order
    order = jnp.argsort(~cand_valid, stable=True)
    n_valid = cand_valid.sum()
    take = order[:out_cap]
    src = cand_src[take]
    kind = cand_kind[take]
    row_alive = jnp.arange(out_cap) < jnp.minimum(n_valid, out_cap)

    gp = _gather_node(params, src)

    # split/dup-sampled means: mean + R (scale * eps)
    eps = jax.random.normal(key, (out_cap, 3), params.means.dtype)
    sampled = gp.means + quat_rotate(gp.quats, jnp.exp(gp.scales) * eps)
    is_split = kind == 1
    sample_mean = is_split | ((kind == 2) & cfg.clone_sample_means)
    new_means = jnp.where(sample_mean[:, None], sampled, gp.means)
    new_scales = jnp.where(
        is_split[:, None], gp.scales - jnp.log(1.6), gp.scales
    )

    new_params = gp.replace(means=new_means, scales=new_scales)
    # dead rows zeroed (keeps padded data clean); quats get identity w and
    # opacity logits a large negative so dead rows stay inert numerically
    row_alive_f = row_alive.astype(params.means.dtype)
    new_params = jax.tree.map(
        lambda a: a * row_alive_f.reshape((out_cap,) + (1,) * (a.ndim - 1)), new_params
    )
    dead = 1.0 - row_alive_f
    new_params = new_params.replace(
        quats=new_params.quats + dead[:, None] * jnp.array([1.0, 0, 0, 0], new_params.quats.dtype),
        opacities=new_params.opacities - dead[:, None] * 10.0,
        scales=new_params.scales - dead[:, None] * 10.0,
    )

    keep_state = ((kind == 0) & row_alive).astype(params.means.dtype)
    mask_state = lambda a: a * keep_state.reshape((out_cap,) + (1,) * (a.ndim - 1))
    new_mu = jax.tree.map(mask_state, _gather_node(mu, src))
    new_nu = jax.tree.map(mask_state, _gather_node(nu, src))

    new_aux = NodeAux(
        alive=row_alive_f, num_alive=jnp.minimum(n_valid, out_cap).astype(jnp.int32)
    )
    return RefineOut(
        params=new_params,
        aux=new_aux,
        mu=new_mu,
        nu=new_nu,
        state=DensifyState.zeros(out_cap),
        n_split=splits.sum(),
        n_dup=dups.sum(),
        n_cull=(culls & alive).sum(),
        overflow=jnp.maximum(n_valid - out_cap, 0),
    )


def reset_opacities(
    params: GaussianNodeParams,
    mu: GaussianNodeParams,
    nu: GaussianNodeParams,
    cfg: ControlConfig,
) -> Tuple[GaussianNodeParams, GaussianNodeParams, GaussianNodeParams]:
    """Opacity reset: clamp logits to logit(2*cull_alpha) and zero the
    opacity Adam moments (ref :555-573)."""
    reset_val = 2.0 * cfg.cull_alpha_thresh
    logit = jnp.log(reset_val / (1.0 - reset_val))
    new = params.replace(opacities=jnp.minimum(params.opacities, logit))
    mu = mu.replace(opacities=jnp.zeros_like(mu.opacities))
    nu = nu.replace(opacities=jnp.zeros_like(nu.opacities))
    return new, mu, nu


def sh_degree_mask(step: jax.Array, cfg: ControlConfig) -> jax.Array:
    """[16] 0/1 mask enabling SH bases up to the ramped degree
    (ref `get_rgbs`: n = min(step // interval, sh_degree))."""
    n = jnp.minimum(step // cfg.sh_degree_interval, cfg.sh_degree)
    degs = jnp.array([0] + [1] * 3 + [2] * 5 + [3] * 7, jnp.int32)
    return (degs <= n).astype(jnp.float32)
