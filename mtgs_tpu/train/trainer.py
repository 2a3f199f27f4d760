"""The training engine: jitted train step + host-side control loop.

Replaces the reference's nerfstudio Trainer/VanillaPipeline stack
(`mtgs/scene_model/custom_trainer.py`, `custom_pipeline.py` in
OpenDriveLab/MTGS) with a functional design:

  * `render_view` — the full forward: camera-opt -> scene-graph collect ->
    rasterize -> background composite -> exposure (the jax mirror of
    `MTGSSceneModel.get_outputs`, `mtgs_scene_graph.py:547-706`).
  * `train_step` — ONE jitted function: loss, gradients (including the
    absgrad densify signal via the rasterizer's gradient sinks), Adam
    update, densify-stat accumulation, metrics. The reference needs
    retain_grad + four callbacks per step; here it is one XLA program.
  * `Trainer` — host loop: feeds batches, triggers the jitted refine /
    opacity-reset passes on the reference's schedule, grows node
    capacities and intersection buffers outside jit when they fill up.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
from mtgs_tpu.models.appearance import apply_exposure
from mtgs_tpu.models.gaussians import GaussianNodeParams, NodeAux
from mtgs_tpu.models.scene_graph import (
    SceneAux,
    SceneConfig,
    SceneParams,
    ViewInputs,
    collect_gaussians,
    node_segments,
)
from mtgs_tpu.raster import RasterizeConfig, rasterize
from mtgs_tpu.train import camera_opt as cam_opt_lib
from mtgs_tpu.train import control as ctrl
from mtgs_tpu.train import losses as loss_lib
from mtgs_tpu.train import optim as optim_lib

_LOG = logging.getLogger(__name__)


class TrainerConfig(struct.PyTreeNode):
    width: int = struct.field(pytree_node=False, default=960)
    height: int = struct.field(pytree_node=False, default=540)
    tile_size: int = struct.field(pytree_node=False, default=32)
    max_intersections: int = struct.field(pytree_node=False, default=1 << 21)
    rasterize_mode: str = struct.field(pytree_node=False, default="antialiased")
    backend: str = struct.field(pytree_node=False, default="auto")
    fused: bool = struct.field(pytree_node=False, default=True)
    interpret: bool = struct.field(pytree_node=False, default=False)
    max_steps: int = struct.field(pytree_node=False, default=30001)
    predict_normals: bool = struct.field(pytree_node=False, default=True)
    background_color: float = struct.field(pytree_node=False, default=0.0)
    # ---- capacity growth (the reference grows N freely by reallocating
    # tensors, `vanilla_gaussian_splatting.py:635-699`; here the Trainer
    # counts refine candidates first and re-jits at a larger static
    # capacity when they would overflow). Geometric growth + granule
    # rounding bounds the number of recompiles to O(log(final/seed)).
    auto_grow: bool = struct.field(pytree_node=False, default=True)
    grow_granule: int = struct.field(pytree_node=False, default=4096)
    grow_factor: float = struct.field(pytree_node=False, default=1.5)
    # intersection buffer auto-growth: grow when the measured
    # n_intersections exceeds isect_grow_frac * max_intersections.
    isect_grow_frac: float = struct.field(pytree_node=False, default=0.85)
    isect_grow_factor: float = struct.field(pytree_node=False, default=1.5)
    # Speculative background compilation: on this environment every jit
    # compile is served by a REMOTE AOT compiler (campaign_r4 measured
    # 19 min for one step_fn), but compiling does not occupy the
    # device — so the trainer precompiles the shapes it can predict
    # (the next resolution-ladder stage; grown node/intersection
    # capacities once they pass spec_frac full) in a daemon thread,
    # populating the persistent compilation cache so the real re-jit is
    # a disk hit instead of a multi-minute training stall. None = auto
    # (enabled off-CPU).
    speculative_compile: Optional[bool] = struct.field(
        pytree_node=False, default=None)
    spec_frac: float = struct.field(pytree_node=False, default=0.5)
    loss: loss_lib.LossConfig = struct.field(
        pytree_node=False, default_factory=loss_lib.LossConfig
    )
    control: ctrl.ControlConfig = struct.field(
        pytree_node=False, default_factory=ctrl.ControlConfig
    )
    # per-node control override cascade (the reference merges global
    # `control` defaults with per-node non-None fields,
    # `_update_gaussian_cfg`, mtgs_scene_graph.py:194-205). None =>
    # inherit `control`; the skybox additionally gets its far-cull
    # specialization applied on top unless overridden here.
    # one-time deformation enable (ref deformable_node.py:221-227: the
    # deform MLP is inert until `use_deformgs_after`, then canonical xyz
    # freeze). None = never flip; the host loop re-jits once at this
    # step with scene.deform_enabled=True.
    deform_enable_step: Optional[int] = struct.field(
        pytree_node=False, default=None)
    skybox_control: Optional[ctrl.ControlConfig] = struct.field(
        pytree_node=False, default=None)
    instances_control: Optional[ctrl.ControlConfig] = struct.field(
        pytree_node=False, default=None)
    deformables_control: Optional[ctrl.ControlConfig] = struct.field(
        pytree_node=False, default=None)
    scene: SceneConfig = struct.field(pytree_node=False, default_factory=SceneConfig)

    def node_control(self, node: str) -> ctrl.ControlConfig:
        """Resolved ControlConfig for a node kind."""
        if node == "skybox":
            if self.skybox_control is not None:
                return self.skybox_control
            # default skybox policy: no far-background cull exemption
            # (its own radius-based cull threshold, skybox_gaussian_
            # splatting.py:130-163)
            return dataclasses.replace(
                self.control, far_dist=1e8, far_scale_factor=1.0)
        if node == "instances":
            return self.instances_control or self.control
        if node == "deformables":
            return self.deformables_control or self.control
        return self.control

    def raster_config(self) -> RasterizeConfig:
        return RasterizeConfig(
            width=self.width,
            height=self.height,
            tile_size=self.tile_size,
            max_intersections=self.max_intersections,
            rasterize_mode=self.rasterize_mode,
            render_mode="RGB+ED",
            backend=self.backend,
            fused=self.fused,
            interpret=self.interpret,
        )


@struct.dataclass
class Batch:
    """One training view (all traced)."""

    image: jax.Array                 # [H, W, 3] float in [0, 1]
    mask: jax.Array                  # [H, W, 1] float 0/1
    c2w: jax.Array                   # [4, 4] scene-frame camera-to-world
    K: jax.Array                     # [3, 3]
    cam_idx: jax.Array               # [] int32 physical camera id
    image_idx: jax.Array             # [] int32 image row (camera_opt index)
    travel_index: jax.Array          # [] int32
    frame_idx: jax.Array             # [] int32
    timestamp: jax.Array             # [] float32
    lidar_depth: Optional[jax.Array] = None    # [H, W, 1]
    pseudo_depth: Optional[jax.Array] = None   # [H, W, 1]


@struct.dataclass
class TrainState:
    params: SceneParams
    opt_state: Any
    densify: Dict[str, ctrl.DensifyState]
    step: jax.Array
    key: jax.Array


def render_view(
    params: SceneParams,
    aux: SceneAux,
    cfg: TrainerConfig,
    batch: Batch,
    step: jax.Array,
    *,
    training: bool = True,
    tap2d: Optional[jax.Array] = None,
    absgrad_sink: Optional[jax.Array] = None,
    travel_mode: Optional[str] = None,
    apply_cam_opt: Optional[bool] = None,
    mesh=None,
    mesh_axis: str = "tile",
    inside_shard_map: bool = False,
) -> Dict[str, jax.Array]:
    """Full forward pass for one camera (ref `get_outputs`).

    Args:
        apply_cam_opt: apply the trained SO3xR3 pose delta for
            `batch.image_idx`. Defaults to `training`; set True at
            eval/render time to reproduce the reference's
            `load_cam_optim_from` re-application of optimized poses
            (`nuplan_dataparser.py:399-411`).
        mesh / mesh_axis: shard THIS camera's rasterization per tile-row
            band across `mesh_axis` (the whole intersection pipeline
            runs under shard_map — see `rasterize`'s mesh docs). Makes
            the full loss stack trainable with one camera's tiles spread
            over chips (SURVEY §2.4).
    """
    c2w = batch.c2w
    use_cam_opt = training if apply_cam_opt is None else apply_cam_opt
    if use_cam_opt:
        c2w = cam_opt_lib.apply_camera_opt(c2w, params.camera_opt[batch.image_idx])
    scene_cfg = cfg.scene
    if travel_mode is not None:
        scene_cfg = dataclasses.replace(scene_cfg, travel_mode=travel_mode)

    view = ViewInputs(
        travel_index=batch.travel_index,
        frame_idx=batch.frame_idx,
        timestamp=batch.timestamp,
        cam_pos=c2w[:3, 3],
        sh_mask=ctrl.sh_degree_mask(step, cfg.control),
        image_idx=batch.image_idx,
    )
    g = collect_gaussians(params, aux, scene_cfg, view)

    colors = g["colors"]
    if cfg.predict_normals:
        from mtgs_tpu.core.quat import quat_to_rotmat

        normals = loss_lib.gaussian_camera_normals(
            g["scales"], quat_to_rotmat(g["quats"]), g["means"],
            c2w[:3, 3], c2w[:3, :3],
        )
        colors = jnp.concatenate([colors, normals], axis=-1)

    viewmat = camera_to_gsplat_viewmat(c2w)
    render, alpha, info = rasterize(
        g["means"], g["quats"], g["scales"], g["opacities"], colors,
        viewmat, batch.K, cfg.raster_config(),
        tap2d=tap2d, absgrad_sink=absgrad_sink,
        mesh=mesh, shard_axis=mesh_axis, inside_shard_map=inside_shard_map,
    )

    bg = jnp.full((3,), cfg.background_color, render.dtype)
    rgb = jnp.clip(render[..., :3] + (1.0 - alpha) * bg, 0.0, 1.0)
    rgb_appearance = apply_exposure(params.appearance, rgb, batch.cam_idx)

    depth = render[..., -1:]
    # threshold 1e-6 (not 0): below it the ED normalization divides by
    # the 1e-10 clamp instead of alpha, yielding near-zero depths with
    # explosive 1/depth-loss gradients (the campaign_r3 NaN); such
    # pixels are treated like empty ones
    depth = jnp.where(alpha > 1e-6, depth, jax.lax.stop_gradient(depth).max())

    out = dict(
        rgb=rgb,
        rgb_appearance=rgb_appearance,
        depth=depth,
        accumulation=alpha,
        background=bg,
        radii=info["radii"],
        means2d=info["means2d"],
        n_intersections=info["n_intersections"],
        gaussians=g,
    )
    if cfg.predict_normals:
        n = render[..., 3:6]
        # epsilon-safe normalize: empty (alpha=0) pixels have exactly-zero
        # normals, and linalg.norm's gradient NaNs there (the unmasked TV
        # term backprops through every pixel).
        n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
        out["normal"] = (n + 1.0) / 2.0
    return out


def _scene_losses(
    params: SceneParams, aux: SceneAux, out: Dict[str, jax.Array], cfg: TrainerConfig,
    step: jax.Array,
) -> Dict[str, jax.Array]:
    """Parameter-space regularizers (ref `get_loss_dict` tail,
    `mtgs_scene_graph.py:937-981` + camera-opt penalty)."""
    losses: Dict[str, jax.Array] = {}
    lcfg = cfg.loss
    g = out["gaussians"]
    alive = (g["opacities"] > 0).astype(g["scales"].dtype)
    if lcfg.two_d_gaussians:
        losses["two_d_reg"] = loss_lib.two_d_reg(g["scales"], alive)
    if lcfg.sharp_shape_reg_lambda > 0:
        # interval-gated: the reference applies this regularizer only
        # every sharp_shape_reg_step_interval steps (:969-981)
        every = jnp.asarray(
            step % lcfg.sharp_shape_reg_step_interval == 0,
            g["scales"].dtype,
        )
        losses["sharp_shape"] = every * (
            lcfg.sharp_shape_reg_lambda * loss_lib.sharp_shape_reg(
                g["scales"], alive, lcfg.sharp_shape_max_ratio,
                lcfg.two_d_gaussians,
            )
        )
    if lcfg.oob_lambda > 0 and params.instances is not None:
        losses["oob"] = lcfg.oob_lambda * loss_lib.oob_loss(
            params.instances.node.means,
            params.instances.node.opacities,
            aux.instances.alive,
            aux.instances.sizes,
            lcfg.oob_tolerance,
        )
    if lcfg.adapter_lambda > 0:
        total = jnp.abs(params.background.features_adapters).sum()
        if params.skybox is not None:
            total = total + jnp.abs(params.skybox.features_adapters).sum()
        losses["adapter"] = lcfg.adapter_lambda * total
    losses["camera_opt"] = cam_opt_lib.camera_opt_penalty(
        params.camera_opt, lcfg.camera_opt_trans_penalty, lcfg.camera_opt_rot_penalty
    )
    return losses


def loss_and_grads(
    params: SceneParams, aux: SceneAux, cfg: TrainerConfig, batch: Batch,
    step: jax.Array, *, mesh=None, mesh_axis: str = "tile",
    inside_shard_map: bool = False,
):
    """Loss + parameter gradients + absgrad densify signal for one view.

    Shared by the single-device and data-parallel train steps. The
    absgrad sink is an extra differentiated argument of the SAME vjp, so
    one rasterizer backward yields parameter grads and the densify
    signal together (nesting value_and_grad would instead linearize the
    Pallas backward, which has no JVP rule)."""

    def loss_fn(p: SceneParams, sink: jax.Array):
        out = render_view(p, aux, cfg, batch, step, absgrad_sink=sink,
                          mesh=mesh, mesh_axis=mesh_axis,
                          inside_shard_map=inside_shard_map)
        losses = loss_lib.compute_losses(
            cfg.loss,
            gt_img=batch.image,
            pred_img=out["rgb"],
            pred_img_appearance=out["rgb_appearance"],
            mask=batch.mask,
            pred_depth=out["depth"],
            gt_lidar_depth=batch.lidar_depth,
            gt_pseudo_depth=batch.pseudo_depth,
            pred_normal=out.get("normal"),
            K=batch.K,
        )
        losses.update(_scene_losses(p, aux, out, cfg, step))
        total = sum(losses.values())
        return total, (losses, out)

    sink0 = jnp.zeros((_total_capacity(params), 2), jnp.float32)
    (total, (losses, out)), (grads, sink_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, sink0)
    return total, losses, out, sink_grad, grads


def make_train_step(cfg: TrainerConfig, optimizer, mesh=None,
                    mesh_axis: str = "tile"):
    """Build the jitted train step. `aux` is a traced argument, so
    refinement (which rewrites alive masks) does NOT retrigger
    compilation — only capacity growth (shape change) does. With `mesh`,
    the step trains ONE camera with its tiles sharded across
    `mesh_axis` (full loss stack + densify stats; VERDICT r2 item 5)."""

    def step_fn(state: TrainState, aux: SceneAux, batch: Batch):
        total, losses, out, sink_grad, grads = loss_and_grads(
            state.params, aux, cfg, batch, state.step,
            mesh=mesh, mesh_axis=mesh_axis,
        )

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        if cfg.scene.deform_enabled and state.params.deformables is not None:
            # canonical-xyz hard freeze while deformation is active (ref
            # deformable_node.py:95-104): the render path already
            # stop-gradients them; zero the UPDATE too, because Adam
            # momentum would otherwise keep drifting the frozen params
            # for ~1/(1-b1) steps after their grads go to zero
            updates = updates.replace(
                deformables=updates.deformables.replace(
                    node=updates.deformables.node.replace(
                        means=jnp.zeros_like(
                            updates.deformables.node.means))))
        params = optax.apply_updates(state.params, updates)

        # densify statistics per node segment
        densify = _accumulate_all(
            state.params, state.densify, sink_grad,
            out["radii"], out["gaussians"]["opacities"], (cfg.width, cfg.height),
        )

        metrics = {k: v for k, v in losses.items()}
        mse = loss_lib.masked_mean(
            (batch.image - out["rgb_appearance"]) ** 2, batch.mask
        )
        metrics["psnr"] = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
        metrics["total_loss"] = total
        metrics["n_intersections"] = out["n_intersections"]
        metrics["gaussian_count"] = sum(
            jnp.sum(a.alive)
            for a in [aux.background, aux.skybox]
            if a is not None
        ) + (jnp.sum(aux.instances.alive) if aux.instances is not None else 0.0)

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            densify=densify,
            step=state.step + 1,
            key=state.key,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def _total_capacity(params: SceneParams) -> int:
    segs = node_segments(params)
    return segs[-1][2]


def _accumulate_all(params, densify, sink_grad, radii, opac, wh):
    """Route per-segment absgrad/radii slices into each node's stats."""
    new = dict(densify)
    segs = node_segments(params)
    for name, s, e in segs:
        if name == "background":
            new["background"] = ctrl.accumulate_stats(
                densify["background"], sink_grad[s:e], radii[s:e], opac[s:e], wh
            )
        elif name == "skybox":
            new["skybox"] = ctrl.accumulate_stats(
                densify["skybox"], sink_grad[s:e], radii[s:e], opac[s:e], wh
            )
    # stacked instances: contiguous block [I, cap]
    inst_segs = [(s, e) for n, s, e in segs if n.startswith("instance_")]
    if inst_segs:
        s0, e1 = inst_segs[0][0], inst_segs[-1][1]
        I = len(inst_segs)
        cap = (e1 - s0) // I
        new["instances"] = jax.tree.map(
            lambda old, upd: upd,
            densify["instances"],
            jax.vmap(ctrl.accumulate_stats, in_axes=(0, 0, 0, 0, None))(
                densify["instances"],
                sink_grad[s0:e1].reshape(I, cap, 2),
                radii[s0:e1].reshape(I, cap),
                opac[s0:e1].reshape(I, cap),
                wh,
            ),
        )
    def_segs = [(s, e) for n, s, e in segs if n.startswith("deformable_")]
    if def_segs:
        s0, e1 = def_segs[0][0], def_segs[-1][1]
        I = len(def_segs)
        cap = (e1 - s0) // I
        new["deformables"] = jax.vmap(ctrl.accumulate_stats, in_axes=(0, 0, 0, 0, None))(
            densify["deformables"],
            sink_grad[s0:e1].reshape(I, cap, 2),
            radii[s0:e1].reshape(I, cap),
            opac[s0:e1].reshape(I, cap),
            wh,
        )
    return new


def _node_caps_of(params: SceneParams):
    return (
        params.background.capacity,
        None if params.skybox is None else params.skybox.capacity,
        None if params.instances is None
        else params.instances.node.means.shape[1],
        None if params.deformables is None
        else params.deformables.node.means.shape[1],
    )


def _make_densify(params: SceneParams):
    densify = {"background": ctrl.DensifyState.zeros(params.background.capacity)}
    if params.skybox is not None:
        densify["skybox"] = ctrl.DensifyState.zeros(params.skybox.capacity)
    if params.instances is not None:
        I, cap = params.instances.node.means.shape[:2]
        densify["instances"] = jax.vmap(lambda _: ctrl.DensifyState.zeros(cap))(
            jnp.arange(I)
        )
    if params.deformables is not None:
        I, cap = params.deformables.node.means.shape[:2]
        densify["deformables"] = jax.vmap(lambda _: ctrl.DensifyState.zeros(cap))(
            jnp.arange(I)
        )
    return densify


class Trainer:
    """Host-side control loop (ref `CustomTrainer.train`)."""

    def __init__(
        self,
        cfg: TrainerConfig,
        params: SceneParams,
        aux: SceneAux,
        data: Optional[Iterator[Batch]],
        optim_config: Optional[optim_lib.OptimConfig] = None,
        seed: int = 0,
        data_factory=None,
        resolution_stages=None,
        mesh=None,
        mesh_axis: str = "tile",
    ):
        """`resolution_stages` enables the multi-resolution training
        ladder (ref `custom_datamanager.py:143-152`): a list of
        (start_step, scale) pairs; at each stage boundary the train step
        is re-jitted at scale x (width, height) and `data_factory(scale)`
        supplies a matching batch iterator (see
        `mtgs_tpu.data.loader.staged_iterator_factory`).

        `mesh`/`mesh_axis` shard every step's rasterization per tile-row
        band over the mesh axis (one camera's tiles across chips — the
        whole expand/sort/blend pipeline, not just the blend)."""
        self.cfg = cfg
        self.aux = aux
        self.data = data
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._base_cfg = cfg
        self._data_factory = data_factory
        self.resolution_stages = (
            sorted(resolution_stages) if resolution_stages else None
        )
        if self.resolution_stages is not None and data_factory is None:
            raise ValueError("resolution_stages requires data_factory")
        if data is None and self.resolution_stages is None:
            raise ValueError("need `data` unless resolution_stages is set")
        self._cur_scale = None
        self.optimizer = optim_lib.build_optimizer(
            params,
            optim_config
            or optim_lib.OptimConfig(groups=optim_lib.default_groups(cfg.max_steps)),
        )
        densify = _make_densify(params)
        self.state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            densify=densify,
            step=jnp.zeros((), jnp.int32),
            key=jax.random.key(seed),
        )
        self._make_step = lambda c: make_train_step(
            c, self.optimizer, self.mesh, self.mesh_axis)
        self._step_fn = self._make_step(cfg)
        self._refine_fns: Dict[Any, Any] = {}
        self.growth_events: list = []
        self.refine_overflow: int = 0
        self._spec_started: set = set()
        self._spec_ready: Dict[Any, Any] = {}
        self._step_is_compiled = False
        self._last_batch_sds = None

    # ------------------------------------------------- speculative compile

    def _spec_enabled(self) -> bool:
        if self.cfg.speculative_compile is not None:
            return self.cfg.speculative_compile
        return jax.default_backend() != "cpu"

    @staticmethod
    def _sds_of(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)

    @staticmethod
    def _avals_fp(cfg, *trees):
        """Hashable fingerprint of (static config, argument avals)."""
        leaves = jax.tree.leaves(trees)
        return (repr(cfg),
                tuple((tuple(l.shape), str(l.dtype)) for l in leaves))

    def _abstract_state(self, params_sds, aux_sds, caps):
        """ShapeDtypeStruct (state, aux) trees at hypothetical node
        capacities (no memory is allocated)."""
        from mtgs_tpu.train.checkpoint import pad_scene_to_caps

        def build(p, a):
            p2, a2 = pad_scene_to_caps(p, a, caps)
            st = TrainState(
                params=p2,
                opt_state=self.optimizer.init(p2),
                densify=_make_densify(p2),
                step=jnp.zeros((), jnp.int32),
                key=jax.random.key(0),
            )
            return st, a2

        return jax.eval_shape(build, params_sds, aux_sds)

    def _speculate_step(self, cfg: TrainerConfig, caps, batch_sds, tag: str):
        """Compile the train step for (cfg, caps) in a daemon thread.

        The persistent compilation cache is NOT honored by this stack's
        remote AOT compiler (measured: identical shapes recompiled from
        scratch across processes), so the thread keeps the jax
        `Compiled` executable itself; `_try_spec_swap` installs it when
        the trainer's real shapes arrive. A step compile measured 18-19
        min — this turns growth/ladder stalls into background work."""
        key = (tag, cfg.width, cfg.height, cfg.max_intersections,
               tuple(sorted((k, v) for k, v in (caps or {}).items()
                            if v is not None)))
        if not self._spec_enabled() or key in self._spec_started:
            return
        self._spec_started.add(key)
        # snapshot avals on the caller thread (donation may delete the
        # live buffers while the worker runs)
        params_sds = self._sds_of(self.state.params)
        aux_sds = self._sds_of(self.aux)
        import threading
        import time as _time

        def work():
            try:
                t0 = _time.perf_counter()
                st_s, aux_s = self._abstract_state(params_sds, aux_sds,
                                                   caps or {})
                compiled = self._make_step(cfg).lower(
                    st_s, aux_s, batch_sds).compile()
                fp = self._avals_fp(cfg, st_s, aux_s, batch_sds)
                self._spec_ready[fp] = compiled
                _LOG.info(
                    "speculative step compile [%s] %dx%d isect=%d caps=%s "
                    "ready in %.0fs", tag, cfg.width, cfg.height,
                    cfg.max_intersections, caps, _time.perf_counter() - t0)
            except Exception as e:  # speculation must never hurt training
                _LOG.info("speculative compile [%s] skipped: %r", tag, e)

        threading.Thread(target=work, daemon=True, name=f"spec-{tag}").start()

    def _try_spec_swap(self, batch_sds) -> bool:
        """Install a speculatively-compiled executable matching the
        CURRENT state/aux/batch avals, if one is ready."""
        if batch_sds is None or not self._spec_ready:
            return False
        fp = self._avals_fp(self.cfg, self._sds_of(self.state),
                            self._sds_of(self.aux), batch_sds)
        compiled = self._spec_ready.pop(fp, None)
        if compiled is None:
            return False
        self._step_fn = compiled
        self._step_is_compiled = True
        _LOG.info("installed speculatively-compiled step (no stall)")
        return True

    def _speculate_next_stage(self):
        """Precompile the NEXT resolution-ladder stage (at current caps)
        while the current stage trains — ladder switches measured ~19
        min of remote compile otherwise."""
        if self.resolution_stages is None or not self._spec_enabled():
            return
        cur = self._cur_scale
        scales = [s for _, s in self.resolution_stages]
        try:
            idx = scales.index(cur)
        except ValueError:
            return
        if idx + 1 >= len(scales):
            return
        nxt = scales[idx + 1]
        if ("ladder", nxt) in self._spec_started:
            return
        self._spec_started.add(("ladder", nxt))
        import threading

        base = self._base_cfg
        gran = self._isect_granule()

        def work():
            try:
                first = next(self._data_factory(nxt))  # warms the cache too
                h, w = first.image.shape[:2]
                isect = max(int(base.max_intersections * nxt * nxt), 1 << 14)
                isect = ((isect + gran - 1) // gran) * gran
                cfg2 = base.replace(width=w, height=h, max_intersections=isect)
                sds = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
                    first)
                self._speculate_step(cfg2, None, sds, f"ladder{nxt}")
            except Exception as e:
                _LOG.info("ladder speculation skipped: %r", e)

        threading.Thread(target=work, daemon=True, name="spec-ladder").start()

    # ------------------------------------------------------------- refine

    def _get_count_fn(self, flags):
        """Jitted candidate counting per node (ctrl.count_refine_candidates)."""
        key = ("count",) + flags
        if key not in self._refine_fns:
            cc = self.cfg.control
            sky_cc = self.cfg.node_control("skybox")
            inst_cc = self.cfg.node_control("instances")
            def_cc = self.cfg.node_control("deformables")
            do_densify, do_cull_big, use_screen = flags
            kw = dict(
                do_densify=do_densify, do_cull_big=do_cull_big,
                use_screen_size=use_screen,
            )

            @jax.jit
            def count(state: TrainState, aux: SceneAux):
                params = state.params
                out = {
                    "background": ctrl.count_refine_candidates(
                        params.background, aux.background,
                        state.densify["background"], cc, **kw,
                    )
                }
                if params.skybox is not None:
                    out["skybox"] = ctrl.count_refine_candidates(
                        params.skybox, aux.skybox, state.densify["skybox"],
                        sky_cc, **kw,
                    )
                if params.instances is not None:
                    iaux = NodeAux(
                        alive=aux.instances.alive, num_alive=aux.instances.num_alive
                    )
                    out["instances"] = jax.vmap(
                        functools.partial(ctrl.count_refine_candidates, cfg=inst_cc, **kw)
                    )(params.instances.node, iaux, state.densify["instances"])
                if params.deformables is not None:
                    daux = NodeAux(
                        alive=aux.deformables.alive,
                        num_alive=aux.deformables.num_alive,
                    )
                    out["deformables"] = jax.vmap(
                        functools.partial(ctrl.count_refine_candidates, cfg=def_cc, **kw)
                    )(params.deformables.node, daux, state.densify["deformables"])
                return out

            self._refine_fns[key] = count
        return self._refine_fns[key]

    def _plan_growth(self, flags):
        """Pick static output capacities for the next refine pass.

        Counts candidates on device, then on the host chooses
        out_cap = granule-rounded max(needed, cap * grow_factor) for any
        node that would overflow — the promised "grow node capacities
        outside jit when they fill up"."""
        from mtgs_tpu.models.gaussians import node_capacity

        params = self.state.params
        caps = dict(
            background=params.background.capacity,
            skybox=None if params.skybox is None else params.skybox.capacity,
            instances=None if params.instances is None
            else params.instances.node.means.shape[1],
            deformables=None if params.deformables is None
            else params.deformables.node.means.shape[1],
        )
        if not self.cfg.auto_grow:
            return (caps["background"], caps["skybox"], caps["instances"],
                    caps["deformables"])
        counts = jax.device_get(self._get_count_fn(flags)(self.state, self.aux))

        def plan(cap, needed):
            if cap is None or needed is None or needed <= cap:
                return cap
            target = max(int(needed), int(cap * self.cfg.grow_factor))
            return node_capacity(target, self.cfg.grow_granule)

        # speculative precompile of the predicted post-growth step: once
        # a node passes spec_frac of its capacity, compile the step at
        # the capacity the next growth will (almost always) pick.
        if self._spec_enabled() and self._last_batch_sds is not None:
            needed_by = dict(
                background=int(counts["background"]),
                skybox=int(counts["skybox"]) if "skybox" in counts else None,
                instances=(int(np.max(counts["instances"]))
                           if "instances" in counts else None),
                deformables=(int(np.max(counts["deformables"]))
                             if "deformables" in counts else None),
            )
            spec = {}
            hottest, hot_ratio = None, 0.0
            for name, cap in caps.items():
                needed = needed_by[name]
                if cap is None or needed is None:
                    continue
                if needed / cap > hot_ratio:
                    hottest, hot_ratio = name, needed / cap
                if needed > self.cfg.spec_frac * cap:
                    spec[name] = node_capacity(
                        int(cap * self.cfg.grow_factor), self.cfg.grow_granule)
            if spec:
                self._speculate_step(self.cfg, spec, self._last_batch_sds,
                                     "growth")
                if len(spec) > 1 and hottest in spec:
                    # nodes rarely overflow in the same refine step: the
                    # hottest-node-only growth is the likelier shape
                    self._speculate_step(
                        self.cfg, {hottest: spec[hottest]},
                        self._last_batch_sds, "growth1")

        out = (
            plan(caps["background"], int(counts["background"])),
            plan(caps["skybox"],
                 int(counts["skybox"]) if "skybox" in counts else None),
            plan(caps["instances"],
                 int(np.max(counts["instances"])) if "instances" in counts else None),
            plan(caps["deformables"],
                 int(np.max(counts["deformables"])) if "deformables" in counts else None),
        )
        for name, old, new in zip(
            ("background", "skybox", "instances", "deformables"),
            (caps["background"], caps["skybox"], caps["instances"],
             caps["deformables"]),
            out,
        ):
            if new is not None and old is not None and new > old:
                self.growth_events.append(
                    dict(step=int(self.state.step), node=name, old=old, new=new)
                )
        return out

    def _get_refine_fn(self, flags, out_caps=None):
        key = (flags, out_caps)
        if key not in self._refine_fns:
            cc = self.cfg.control
            sky_cc = self.cfg.node_control("skybox")
            inst_cc = self.cfg.node_control("instances")
            def_cc = self.cfg.node_control("deformables")
            bg_cap, sky_cap, inst_cap, def_cap = out_caps or (None,) * 4

            @functools.partial(jax.jit, donate_argnums=(0,))
            def refine(state: TrainState, aux: SceneAux):
                do_densify, do_cull_big, use_screen = flags
                key, k1, k2, k3, k4 = jax.random.split(state.key, 5)
                adam_state, sched_state = state.opt_state
                mu, nu = adam_state.mu, adam_state.nu
                params = state.params
                densify = dict(state.densify)
                new_aux = aux
                info = {}

                out = ctrl.refine_node(
                    k1, params.background, aux.background,
                    mu.background, nu.background, densify["background"],
                    cc, state.step,
                    do_densify=do_densify, do_cull_big=do_cull_big,
                    use_screen_size=use_screen, out_cap=bg_cap,
                )
                params = params.replace(background=out.params)
                mu = mu.replace(background=out.mu)
                nu = nu.replace(background=out.nu)
                new_aux = new_aux.replace(background=out.aux)
                densify["background"] = out.state
                info["overflow"] = out.overflow
                info["n_split"] = out.n_split
                info["n_dup"] = out.n_dup
                info["n_cull"] = out.n_cull

                if params.skybox is not None:
                    outs = ctrl.refine_node(
                        k2, params.skybox, aux.skybox, mu.skybox, nu.skybox,
                        densify["skybox"], sky_cc, state.step,
                        do_densify=do_densify, do_cull_big=do_cull_big,
                        use_screen_size=use_screen, out_cap=sky_cap,
                    )
                    params = params.replace(skybox=outs.params)
                    mu = mu.replace(skybox=outs.mu)
                    nu = nu.replace(skybox=outs.nu)
                    new_aux = new_aux.replace(skybox=outs.aux)
                    densify["skybox"] = outs.state
                    info["overflow"] = info["overflow"] + outs.overflow
                    info["n_split"] = info["n_split"] + outs.n_split
                    info["n_dup"] = info["n_dup"] + outs.n_dup
                    info["n_cull"] = info["n_cull"] + outs.n_cull

                if params.instances is not None:
                    I = params.instances.node.means.shape[0]
                    keys = jax.random.split(k3, I)
                    vref = jax.vmap(
                        functools.partial(
                            ctrl.refine_node,
                            cfg=inst_cc,
                            step=state.step,
                            do_densify=do_densify,
                            do_cull_big=do_cull_big,
                            use_screen_size=use_screen,
                            out_cap=inst_cap,
                        )
                    )
                    iaux_node = NodeAux(
                        alive=aux.instances.alive, num_alive=aux.instances.num_alive
                    )
                    outi = vref(
                        keys, params.instances.node, iaux_node,
                        mu.instances.node, nu.instances.node, densify["instances"],
                    )
                    params = params.replace(
                        instances=params.instances.replace(node=outi.params)
                    )
                    mu = mu.replace(instances=mu.instances.replace(node=outi.mu))
                    nu = nu.replace(instances=nu.instances.replace(node=outi.nu))
                    new_aux = new_aux.replace(
                        instances=aux.instances.replace(
                            alive=outi.aux.alive, num_alive=outi.aux.num_alive
                        )
                    )
                    densify["instances"] = outi.state
                    info["overflow"] = info["overflow"] + outi.overflow.sum()
                    info["n_split"] = info["n_split"] + outi.n_split.sum()
                    info["n_dup"] = info["n_dup"] + outi.n_dup.sum()
                    info["n_cull"] = info["n_cull"] + outi.n_cull.sum()

                if params.deformables is not None:
                    # deformable nodes refine like rigid ones (the
                    # reference registers refinement callbacks for every
                    # gaussian model, mtgs_scene_graph.py:1143-1145);
                    # canonical means sampled on split stay canonical
                    I = params.deformables.node.means.shape[0]
                    keys = jax.random.split(k4, I)
                    vref = jax.vmap(
                        functools.partial(
                            ctrl.refine_node,
                            cfg=def_cc,
                            step=state.step,
                            do_densify=do_densify,
                            do_cull_big=do_cull_big,
                            use_screen_size=use_screen,
                            out_cap=def_cap,
                        )
                    )
                    daux_node = NodeAux(
                        alive=aux.deformables.alive,
                        num_alive=aux.deformables.num_alive,
                    )
                    outd = vref(
                        keys, params.deformables.node, daux_node,
                        mu.deformables.node, nu.deformables.node,
                        densify["deformables"],
                    )
                    params = params.replace(
                        deformables=params.deformables.replace(node=outd.params)
                    )
                    mu = mu.replace(
                        deformables=mu.deformables.replace(node=outd.mu))
                    nu = nu.replace(
                        deformables=nu.deformables.replace(node=outd.nu))
                    new_aux = new_aux.replace(
                        deformables=aux.deformables.replace(
                            alive=outd.aux.alive, num_alive=outd.aux.num_alive
                        )
                    )
                    densify["deformables"] = outd.state
                    info["overflow"] = info["overflow"] + outd.overflow.sum()
                    info["n_split"] = info["n_split"] + outd.n_split.sum()
                    info["n_dup"] = info["n_dup"] + outd.n_dup.sum()
                    info["n_cull"] = info["n_cull"] + outd.n_cull.sum()

                opt_state = (adam_state._replace(mu=mu, nu=nu), sched_state)
                new_state = TrainState(
                    params=params, opt_state=opt_state, densify=densify,
                    step=state.step, key=key,
                )
                return new_state, new_aux, info

            self._refine_fns[key] = refine
        return self._refine_fns[key]

    @functools.cached_property
    def _reset_fn(self):
        cc = self.cfg.control

        @functools.partial(jax.jit, donate_argnums=(0,))
        def reset(state: TrainState):
            adam_state, sched_state = state.opt_state
            mu, nu = adam_state.mu, adam_state.nu
            params = state.params
            bg, mub, nub = ctrl.reset_opacities(
                params.background, mu.background, nu.background, cc
            )
            params = params.replace(background=bg)
            mu = mu.replace(background=mub)
            nu = nu.replace(background=nub)
            if params.skybox is not None:
                sk, mus, nus = ctrl.reset_opacities(
                    params.skybox, mu.skybox, nu.skybox, cc
                )
                params = params.replace(skybox=sk)
                mu = mu.replace(skybox=mus)
                nu = nu.replace(skybox=nus)
            if params.instances is not None:
                ni, mui, nui = ctrl.reset_opacities(
                    params.instances.node, mu.instances.node, nu.instances.node, cc
                )
                params = params.replace(instances=params.instances.replace(node=ni))
                mu = mu.replace(instances=mu.instances.replace(node=mui))
                nu = nu.replace(instances=nu.instances.replace(node=nui))
            if params.deformables is not None:
                nd, mud, nud = ctrl.reset_opacities(
                    params.deformables.node, mu.deformables.node,
                    nu.deformables.node, cc
                )
                params = params.replace(
                    deformables=params.deformables.replace(node=nd))
                mu = mu.replace(deformables=mu.deformables.replace(node=mud))
                nu = nu.replace(deformables=nu.deformables.replace(node=nud))
            return state.replace(
                params=params, opt_state=(adam_state._replace(mu=mu, nu=nu), sched_state)
            )

        return reset

    # --------------------------------------------------------------- loop

    def _isect_granule(self) -> int:
        """Rounding unit for max_intersections: the Pallas expand gate
        needs %512; the fully-sharded plan additionally needs
        %(n_dev*512) (`_fused_shard_plan`) — without this a Trainer
        (mesh=...) run would silently drop tile sharding after the first
        growth / ladder stage (ADVICE r3)."""
        g = 512
        if self.mesh is not None:
            # a mesh without the raster axis (e.g. DPTrainer's pure
            # 'data' mesh) doesn't shard the intersection pipeline
            n = dict(self.mesh.shape).get(self.mesh_axis)
            if n:
                g *= int(n)
        return g

    def _set_resolution_stage(self, scale: float):
        """Re-jit the step at the stage resolution + swap the data
        iterator (the reference's per-stage dataloader + memory release,
        `custom_datamanager.py:248-258`)."""
        base = self._base_cfg
        self.data = self._data_factory(scale)
        # derive the stage render size from the data itself so the jit
        # shape matches whatever rounding the resize used
        first = next(self.data)
        h, w = first.image.shape[:2]
        self._pending_batch = first
        gran = self._isect_granule()
        isect = max(int(base.max_intersections * scale * scale), 1 << 14)
        isect = ((isect + gran - 1) // gran) * gran  # Pallas/shard gates
        self.cfg = base.replace(width=w, height=h, max_intersections=isect)
        self._step_fn = self._make_step(self.cfg)
        self._step_is_compiled = False
        self._refine_fns = {}
        self._cur_scale = scale
        self._last_batch_sds = None
        self._try_spec_swap(self._sds_of(first))
        self._speculate_next_stage()

    def train(self, num_steps: int, log_every: int = 100, callback=None, writer=None):
        """Run `num_steps`. `writer` is an optional
        `mtgs_tpu.utils.observability.Writer` receiving every metric plus
        step_ms / rays_per_s (ref: nerfstudio writer events)."""
        from mtgs_tpu.utils.observability import StepTimer

        cc = self.cfg.control
        timer = StepTimer(pixels_per_step=self.cfg.width * self.cfg.height)
        history = []
        # Host-side step counter: syncing `int(self.state.step)` every
        # iteration would block on the previous dispatch, making step
        # time = compute + device-link RTT (measured: ~30 ms healthy,
        # seconds when the tunnel degrades — the campaign_r3 1.8-4.7
        # s/step mystery). The host runs ahead and only syncs at refine
        # boundaries / log steps, so dispatches pipeline on-device.
        step0 = int(self.state.step)
        import time as _time

        # loop accounting (campaign_r4 diagnosis): where does wall time
        # go between callback lines? dispatch = host time spent issuing
        # the async step (ms-scale when pipelining works; ~step time if
        # something forces a per-dispatch sync/retrace), refine = the
        # growth-plan/refine block (includes its device syncs), sync =
        # the callback's float() drains.
        self.loop_stats = {"dispatch_s": 0.0, "refine_s": 0.0, "sync_s": 0.0,
                           "steps": 0}
        for i in range(num_steps):
            step = step0 + i
            if (
                self.cfg.deform_enable_step is not None
                and not self.cfg.scene.deform_enabled
                and step >= self.cfg.deform_enable_step
                and self.state.params.deformables is not None
            ):
                # one-time re-jit with deformation active + canonical
                # freeze (same mechanism as the resolution ladder); also
                # fires immediately on resume past the threshold
                scene_on = self.cfg.scene.replace(deform_enabled=True)
                self.cfg = self.cfg.replace(scene=scene_on)
                self._base_cfg = self._base_cfg.replace(
                    scene=self._base_cfg.scene.replace(deform_enabled=True))
                self._step_fn = self._make_step(self.cfg)
                self._step_is_compiled = False
            if self.resolution_stages is not None:
                scale = self.resolution_stages[0][1]
                for start, s in self.resolution_stages:
                    if step >= start:
                        scale = s
                if scale != self._cur_scale:
                    self._set_resolution_stage(scale)
                    timer = StepTimer(
                        pixels_per_step=self.cfg.width * self.cfg.height)
            if getattr(self, "_pending_batch", None) is not None:
                batch = self._pending_batch
                self._pending_batch = None
            else:
                batch = next(self.data)
            _t0 = _time.perf_counter()
            self.state, metrics = self._step_fn(self.state, self.aux, batch)
            self.loop_stats["dispatch_s"] += _time.perf_counter() - _t0
            self.loop_stats["steps"] += 1
            if self._last_batch_sds is None:
                self._last_batch_sds = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(
                        jnp.shape(x), jnp.result_type(x)), batch)

            sref = step + 1
            _t0 = _time.perf_counter()
            if (
                sref > cc.densify_from_iter
                and sref % cc.refine_every == 0
            ):
                do_densify = sref < cc.stop_split_at
                do_cull_big = sref > cc.refine_every * cc.reset_alpha_every
                use_screen = sref < cc.stop_screen_size_at
                if do_densify or cc.continue_cull_post_densification:
                    flags = (do_densify, do_cull_big, use_screen)
                    caps_before = _node_caps_of(self.state.params)
                    out_caps = self._plan_growth(flags)
                    fn = self._get_refine_fn(flags, out_caps)
                    self.state, self.aux, rinfo = fn(self.state, self.aux)
                    if _node_caps_of(self.state.params) != caps_before:
                        # capacity grew: prefer a speculatively-compiled
                        # executable; else make sure a jit (which can
                        # trace the new shapes) is installed
                        if (not self._try_spec_swap(self._last_batch_sds)
                                and self._step_is_compiled):
                            self._step_fn = self._make_step(self.cfg)
                            self._step_is_compiled = False
                        # growth invalidated any pending next-stage
                        # speculation (stale capacity avals): redo it
                        self._spec_started = {
                            k for k in self._spec_started
                            if not (isinstance(k, tuple) and k
                                    and k[0] == "ladder")}
                        self._speculate_next_stage()
                    overflow = int(rinfo["overflow"])
                    if overflow > 0:
                        self.refine_overflow += overflow
                        _LOG.warning(
                            "refine at step %d dropped %d split/dup candidates "
                            "(capacity full; auto_grow=%s)",
                            sref, overflow, self.cfg.auto_grow,
                        )
                    # intersection-buffer growth: check the measured count
                    # at the refine cadence (forcing it every step would
                    # serialize the dispatch pipeline on a host sync)
                    n_isect = int(metrics["n_intersections"])
                    if (
                        self.cfg.auto_grow
                        and self.cfg.isect_grow_frac * self.cfg.max_intersections
                        >= n_isect
                        > self.cfg.spec_frac * self.cfg.max_intersections
                        and self._last_batch_sds is not None
                    ):
                        # approaching the buffer limit: precompile the
                        # grown-capacity step in the background
                        gran = self._isect_granule()
                        nxt = int(self.cfg.max_intersections
                                  * self.cfg.isect_grow_factor)
                        nxt = ((nxt + gran - 1) // gran) * gran
                        self._speculate_step(
                            self.cfg.replace(max_intersections=nxt), None,
                            self._last_batch_sds, "isect")
                    if (
                        self.cfg.auto_grow
                        and n_isect > self.cfg.isect_grow_frac * self.cfg.max_intersections
                    ):
                        gran = self._isect_granule()
                        new_isect = int(
                            self.cfg.max_intersections * self.cfg.isect_grow_factor
                        )
                        new_isect = ((new_isect + gran - 1) // gran) * gran
                        _LOG.info(
                            "growing max_intersections %d -> %d (measured %d)",
                            self.cfg.max_intersections, new_isect, n_isect,
                        )
                        self.growth_events.append(dict(
                            step=sref, node="max_intersections",
                            old=self.cfg.max_intersections, new=new_isect,
                        ))
                        self.cfg = self.cfg.replace(max_intersections=new_isect)
                        self._base_cfg = self._base_cfg.replace(
                            max_intersections=int(
                                self._base_cfg.max_intersections
                                * self.cfg.isect_grow_factor
                            )
                        )
                        if not self._try_spec_swap(self._last_batch_sds):
                            self._step_fn = self._make_step(self.cfg)
                            self._step_is_compiled = False
                reset_interval = cc.reset_alpha_every * cc.refine_every
                if sref < cc.stop_split_at and sref % reset_interval == cc.refine_every:
                    self.state = self._reset_fn(self.state)
            self.loop_stats["refine_s"] += _time.perf_counter() - _t0

            if writer is not None:
                timing = timer.tick()
                writer.put_dict(
                    {**{k: float(v) for k, v in metrics.items()}, **timing}, step
                )
            if callback is not None and (step % log_every == 0 or i == num_steps - 1):
                _t0 = _time.perf_counter()
                vals = {k: float(v) for k, v in metrics.items()}
                self.loop_stats["sync_s"] += _time.perf_counter() - _t0
                callback(step, vals)
            history.append(metrics)
        if writer is not None:
            writer.flush()
        return history
