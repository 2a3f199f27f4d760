"""Camera-data-parallel training step over a device mesh.

The nuPlan rig renders 8 cameras per frame; the natural first sharding
axis is one camera per chip. Parameters are replicated, each device runs
the full forward/backward on its own view, and gradients + densify
statistics are `pmean`/`psum`-reduced over the 'data' axis — XLA lowers
these to ICI all-reduces overlapped with the backward where possible
(the TPU-native replacement for the reference's dormant DDP path,
`custom_pipeline.py:87-89`).

The optimizer update runs inside shard_map on the reduced (replicated)
gradients, so every device applies the identical update — no parameter
broadcast needed.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtgs_tpu.models.scene_graph import SceneAux, SceneParams
from mtgs_tpu.train import control as ctrl
from mtgs_tpu.train.trainer import (
    Batch,
    TrainerConfig,
    TrainState,
    _accumulate_all,
    loss_and_grads,
)


def make_dp_train_step(
    cfg: TrainerConfig, optimizer, mesh: Mesh, axis: str = "data"
):
    """Build a jitted data-parallel train step.

    The batch must carry a leading device axis of size mesh.shape[axis]
    (one camera view per device). Returns step_fn(state, aux, batch) —
    the same signature as the single-device step, so `DPTrainer` reuses
    the Trainer host loop (refinement, capacity growth, opacity resets,
    resolution ladder) unchanged; state and aux are replicated, the
    batch shards over `axis`.
    """

    def per_device_step(state: TrainState, aux: SceneAux, batch: Batch):
        # batch arrives with the sharded leading axis of size 1 — squeeze.
        batch = jax.tree.map(lambda x: x[0], batch)
        total, losses, out, sink_grad, grads = loss_and_grads(
            state.params, aux, cfg, batch, state.step
        )
        grads = jax.lax.pmean(grads, axis)
        losses = jax.lax.pmean(losses, axis)
        total = jax.lax.pmean(total, axis)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # densify stats: grad-norm/vis-count contributions SUM over
        # cameras; max screen size MAX-reduces (matches the reference's
        # sequential running max over per-camera steps).
        local = _accumulate_all(
            state.params,
            jax.tree.map(jnp.zeros_like, state.densify),
            sink_grad,
            out["radii"],
            out["gaussians"]["opacities"],
            (cfg.width, cfg.height),
        )
        densify = {
            k: ctrl.DensifyState(
                xys_grad_norm=state.densify[k].xys_grad_norm
                + jax.lax.psum(local[k].xys_grad_norm, axis),
                vis_counts=state.densify[k].vis_counts
                + jax.lax.psum(local[k].vis_counts, axis),
                max_2dsize=jnp.maximum(
                    state.densify[k].max_2dsize,
                    jax.lax.pmax(local[k].max_2dsize, axis),
                ),
            )
            for k in state.densify
        }

        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["n_intersections"] = jax.lax.pmax(out["n_intersections"], axis)
        from mtgs_tpu.train import losses as loss_lib

        mse = loss_lib.masked_mean(
            (batch.image - out["rgb_appearance"]) ** 2, batch.mask)
        metrics["psnr"] = jax.lax.pmean(
            -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)), axis)
        metrics["gaussian_count"] = sum(
            jnp.sum(a_.alive) for a_ in [aux.background, aux.skybox]
            if a_ is not None
        ) + (jnp.sum(aux.instances.alive) if aux.instances is not None else 0.0)

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            densify=densify,
            step=state.step + 1,
            key=state.key,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_batch(batch_stack: Batch, mesh: Mesh, axis: str = "data") -> Batch:
    """Place a leading-axis-stacked Batch onto the mesh's data axis."""
    spec = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, spec), batch_stack)


class DPTrainer:
    """Data-parallel Trainer: the full host control loop — refinement,
    HOST-SIDE CAPACITY GROWTH, opacity resets, intersection-buffer
    growth — with the jitted step sharded one-camera-per-device over a
    mesh. Inherits the loop by composition over `Trainer` internals: the
    state/refine/count machinery operates on replicated trees, so only
    the step function differs.

    `data` must yield Batch pytrees with a leading device axis of size
    mesh.shape[axis]; they are placed onto the mesh automatically.
    """

    def __new__(cls, cfg, params, aux, data, mesh: Mesh, axis: str = "data",
                **kw):
        from mtgs_tpu.train import trainer as trainer_lib

        placed = (shard_batch(b, mesh, axis) for b in data) if data is not None else None
        t = trainer_lib.Trainer(cfg, params, aux, placed, **kw)
        t._make_step = lambda c: make_dp_train_step(c, t.optimizer, mesh, axis)
        t._step_fn = t._make_step(cfg)
        t.mesh = mesh
        return t
