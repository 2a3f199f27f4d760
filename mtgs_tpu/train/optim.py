"""Per-parameter-group optimizers with nerfstudio-style schedules.

Replaces the reference's nerfstudio `Optimizers` + suffix-matched lookup
(`mtgs/scene_model/custom_trainer.py:115-136` and the optimizer table at
`mtgs/config/MTGS.py:121-187` in OpenDriveLab/MTGS).

Design: ONE `optax.scale_by_adam(eps=1e-15)` over the whole SceneParams
tree, followed by a per-leaf learning-rate stage that multiplies each
leaf's update by its group's schedule. This is mathematically identical
to per-group Adam(lr) but keeps the Adam state (mu/nu) shaped exactly
like the parameter tree — which makes densification's optimizer-state
surgery (`vanilla_gaussian_splatting.py:392-446`) a plain tree_map
instead of bookkeeping over nested masked sub-states.

Group labels mirror the reference's names, assigned per leaf by tree
position: means / scales / quats / features_dc / features_rest /
opacities (+ `multicolor.` prefix on multicolor nodes),
ins_rotation / ins_translation, deform_network, appearance, camera_opt.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mtgs_tpu.models.scene_graph import SceneParams


@dataclasses.dataclass(frozen=True)
class GroupSpec:
    """One param group's lr schedule (nerfstudio ExponentialDecay semantics)."""

    lr: float
    lr_final: Optional[float] = None    # None => constant lr
    max_steps: int = 30001
    warmup_steps: int = 0
    lr_pre_warmup: float = 0.0

    def schedule(self) -> Callable[[jax.Array], jax.Array]:
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            if self.warmup_steps > 0:
                s = jnp.clip(step / self.warmup_steps, 0.0, 1.0)
                lr0 = self.lr_pre_warmup + (self.lr - self.lr_pre_warmup) * jnp.sin(
                    0.5 * jnp.pi * s
                )
            else:
                lr0 = jnp.asarray(self.lr, jnp.float32)
            if self.lr_final is None or self.lr <= 0:
                return lr0
            t = jnp.clip(
                (step - self.warmup_steps) / max(self.max_steps - self.warmup_steps, 1),
                0.0,
                1.0,
            )
            decay = jnp.exp(
                jnp.log(self.lr) * (1 - t) + jnp.log(self.lr_final) * t
            ) / self.lr
            return lr0 * decay

        return sched


def default_groups(max_steps: int = 30001) -> Dict[str, GroupSpec]:
    """The MTGS optimizer table (`mtgs/config/MTGS.py:121-187`)."""
    return {
        "means": GroupSpec(8e-4, 8e-6, max_steps),
        "features_dc": GroupSpec(0.0025),
        "features_rest": GroupSpec(0.0025 / 20),
        "opacities": GroupSpec(0.05),
        "scales": GroupSpec(0.005),
        "quats": GroupSpec(0.001),
        "multicolor.features_dc": GroupSpec(0.0025 / 20),
        "multicolor.features_adapters": GroupSpec(0.0),
        "multicolor.features_rest": GroupSpec(0.0025 / 20),
        "camera_opt": GroupSpec(1e-4, 5e-7, max_steps, warmup_steps=max(1, max_steps // 20), lr_pre_warmup=0.0),
        "appearance": GroupSpec(1e-3, 1e-4, max_steps, warmup_steps=max(1, max_steps // 6), lr_pre_warmup=1e-5),
        "ins_rotation": GroupSpec(1e-5, 5e-6, max_steps),
        "ins_translation": GroupSpec(5e-4, 1e-4, max_steps),
        "deform_network": GroupSpec(1.6e-4, 1.6e-6, max_steps),
        "embeddings": GroupSpec(1.6e-4),
    }


def _node_labels(node, multicolor: bool):
    prefix = "multicolor." if multicolor else ""
    return node.replace(
        means="means",
        scales="scales",
        quats="quats",
        features_dc=prefix + "features_dc",
        features_rest=prefix + "features_rest",
        opacities="opacities",
        features_adapters="multicolor.features_adapters",
        # Fourier dc coefficients ARE the node's features_dc in the
        # reference (same param group, rigid_node.py:75-86)
        fourier_dc=None if node.fourier_dc is None else "features_dc",
    )


def param_labels(params: SceneParams) -> SceneParams:
    """A SceneParams-shaped tree of group-name strings."""
    bg = _node_labels(params.background, params.background.multicolor)
    sky = (
        None
        if params.skybox is None
        else _node_labels(params.skybox, params.skybox.multicolor)
    )
    inst = None
    if params.instances is not None:
        inst = params.instances.replace(
            node=_node_labels(params.instances.node, params.instances.node.multicolor),
            quats="ins_rotation",
            trans="ins_translation",
        )
    def_ = None
    if params.deformables is not None:
        def_ = params.deformables.replace(
            node=_node_labels(params.deformables.node, False),
            quats="ins_rotation",
            trans="ins_translation",
            embeddings="embeddings",
            mlp=jax.tree.map(lambda _: "deform_network", params.deformables.mlp),
        )
    wild = None
    if params.wild is not None:
        wild = jax.tree.map(lambda _: "appearance", params.wild)
    return SceneParams(
        background=bg, skybox=sky, instances=inst, deformables=def_,
        appearance="appearance", camera_opt="camera_opt", wild=wild,
    )


class ScheduledScaleState(NamedTuple):
    count: jax.Array


class OptimConfig(NamedTuple):
    groups: Dict[str, GroupSpec]
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-15


def build_optimizer(
    params: SceneParams, config: Optional[OptimConfig] = None
) -> optax.GradientTransformation:
    """Adam + per-leaf scheduled lr over the whole SceneParams tree."""
    config = config or OptimConfig(groups=default_groups())
    labels = param_labels(params)
    schedules = {k: v.schedule() for k, v in config.groups.items()}

    adam = optax.scale_by_adam(b1=config.b1, b2=config.b2, eps=config.eps)

    def init_fn(p):
        return ScheduledScaleState(count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        lrs = {k: s(state.count) for k, s in schedules.items()}

        def scale(u, label):
            return -lrs[label] * u

        new = jax.tree.map(scale, updates, labels)
        return new, ScheduledScaleState(count=state.count + 1)

    return optax.chain(adam, optax.GradientTransformation(init_fn, update_fn))


def adam_state_map(
    opt_state, fn: Callable[[jax.Array, jax.Array], jax.Array], params_like
):
    """Apply `fn(param_template, moment_leaf)` to every Adam mu/nu leaf.

    The densify surgery hook: mu/nu share the params tree structure, so
    permuting/zeroing rows stays a tree_map.
    """
    adam_state, sched_state = opt_state
    new_mu = jax.tree.map(fn, params_like, adam_state.mu)
    new_nu = jax.tree.map(fn, params_like, adam_state.nu)
    return (adam_state._replace(mu=new_mu, nu=new_nu), sched_state)
