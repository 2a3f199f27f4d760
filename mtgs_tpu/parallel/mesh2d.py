"""Cameras x tiles 2D-mesh training step (VERDICT r3 item 7).

Round 3's attempt composed data parallelism and tile sharding by calling
`rasterize(mesh=...)` (its own shard_map) from inside the DP shard_map —
nested shard_maps segfault on this jax build. This module restructures
the composition as ONE shard_map over the full 2D mesh:

  * axis `data`: one camera per mesh row — the batch shards here;
  * axis `tile`: within a row, the gaussian-ownership distributed
    pipeline (`raster/dist_fused.py`) runs INLINE — `rasterize(...,
    inside_shard_map=True)` slices each device's ownership block, runs
    the per-device body (collectives over `tile`), and all_gathers the
    band renders so every device of a row holds its camera's full image.

The image-space losses then run row-redundantly (identical values on
the row's devices — cheap pixel math), which seeds each band's backward
cotangent n_tile times; a single `pmean` over BOTH axes simultaneously
normalizes that replication factor and averages over cameras, i.e. the
DP grad all-reduce and the tile-replication correction are ONE fused
collective over the whole mesh.

The reference has no counterpart (its DDP path is dormant,
`mtgs/scene_model/custom_pipeline.py:87-89` in OpenDriveLab/MTGS); the
layout targets a v5p pod slice: `tile` on the fast intra-host ICI ring
(pair exchange + band gathers), `data` across hosts (one all-reduce per
step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from mtgs_tpu.models.scene_graph import SceneAux
from mtgs_tpu.train import control as ctrl
from mtgs_tpu.train.trainer import (
    Batch,
    TrainerConfig,
    TrainState,
    _accumulate_all,
    loss_and_grads,
)


def make_2d_train_step(
    cfg: TrainerConfig, optimizer, mesh: Mesh,
    data_axis: str = "data", tile_axis: str = "tile",
):
    """Jitted train step over a 2D (data, tile) mesh. The batch must
    carry a leading axis of size mesh.shape[data_axis]; state/aux are
    replicated. Same signature as the single-device step."""
    both = (data_axis, tile_axis)

    def per_device_step(state: TrainState, aux: SceneAux, batch: Batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        total, losses, out, sink_grad, grads = loss_and_grads(
            state.params, aux, cfg, batch, state.step,
            mesh=mesh, mesh_axis=tile_axis, inside_shard_map=True,
        )
        # ONE pmean over the whole mesh: averages the per-camera grads
        # (DP) and divides out the n_tile replication of the band
        # cotangents (each row device seeded the full-image loss once).
        grads = jax.lax.pmean(grads, both)
        sink_grad = jax.lax.pmean(sink_grad, tile_axis)
        losses = jax.lax.pmean(losses, data_axis)
        total = jax.lax.pmean(total, data_axis)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

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
                + jax.lax.pmean(
                    jax.lax.psum(local[k].xys_grad_norm, data_axis), tile_axis),
                vis_counts=state.densify[k].vis_counts
                + jax.lax.pmean(
                    jax.lax.psum(local[k].vis_counts, data_axis), tile_axis),
                max_2dsize=jnp.maximum(
                    state.densify[k].max_2dsize,
                    jax.lax.pmax(local[k].max_2dsize, both),
                ),
            )
            for k in state.densify
        }

        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["n_intersections"] = jax.lax.pmax(out["n_intersections"], both)
        from mtgs_tpu.train import losses as loss_lib

        mse = loss_lib.masked_mean(
            (batch.image - out["rgb_appearance"]) ** 2, batch.mask)
        metrics["psnr"] = jax.lax.pmean(
            -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)), data_axis)
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
        in_specs=(P(), P(), P(data_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
