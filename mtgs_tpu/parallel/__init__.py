"""Multi-chip sharding of training and rendering.

The reference is a single-GPU trainer with dormant DDP scaffolding
(`mtgs/scene_model/custom_pipeline.py:16-17,87-89` in OpenDriveLab/MTGS);
here multi-chip is first-class, expressed as `shard_map` over a
`jax.sharding.Mesh`:

  * data_parallel.py — cameras sharded over the 'data' axis, parameters
    replicated, gradients/densify-stats psum'd over ICI (the TPU
    equivalent of DDP's NCCL all-reduce — SURVEY.md §2.4).
  * tile_parallel.py — the rasterizer's tile axis sharded across chips
    (the "sequence parallel" analog for splatting, SURVEY.md §5):
    projection/binning replicated, each chip blends its tile slab.
"""

from mtgs_tpu.parallel.mesh import make_mesh
from mtgs_tpu.parallel.data_parallel import make_dp_train_step
