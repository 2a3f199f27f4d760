"""mtgs_tpu — a TPU-native multi-traversal Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
OpenDriveLab/MTGS (arXiv 2503.12552): a differentiable 3D Gaussian
Splatting rasterizer as Pallas TPU kernels, a multi-traversal Gaussian
scene graph (static background with per-traversal SH appearance adapters,
skybox, rigid vehicle nodes, deformable pedestrian nodes), the full
training stack (photometric/LiDAR-depth/normal losses, adaptive
densify/prune, per-group optimizers, camera-pose + exposure optimization),
the nuPlan data pipeline and the evaluation harness — sharded over
multi-host TPU meshes with `jax.sharding`/`shard_map`.

Layer map (see SURVEY.md for the reference analysis this is built against):
    core/      pure math: quaternions, spherical harmonics, cameras
    raster/    the rasterizer: jnp reference oracle + Pallas kernels
    models/    Gaussian scene graph as pytrees
    train/     losses, optimizers, densify control, train loop
    data/      nuPlan video_scene_dict reader, datasets, samplers
    parallel/  device-mesh sharding of the train/render step
    eval/      metric suite + benchmark pipeline
    tools/     rendering / benchmark CLIs
"""

__version__ = "0.1.0"

import jax as _jax

# f32 matmuls/convs on TPU default to ONE bf16 MXU pass: measured 1e-2
# RELATIVE error (2026-08-21 on-chip: |err|max 1.07 on O(100) operands,
# 0.17 for a 256-wide pallas dot). That silently corrupted every
# non-kernel matmul on the render path — camera transforms, projection,
# the SSIM window convs (whose variance estimates then cross the C2
# stabilizer on flat regions: SSIM values of -40 and the campaign_r3
# divergence), deform/appearance MLPs, eval metrics. The Pallas kernels
# pin their own precision explicitly; everything else gets the correct
# f32 semantics here. MTGS_MATMUL_PRECISION overrides (measurement /
# emergency escape hatch only).
import os as _os

_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("MTGS_MATMUL_PRECISION", "highest"))
