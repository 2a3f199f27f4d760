"""The multi-traversal Gaussian scene graph, as pytrees.

Rebuilds the reference's node zoo (`mtgs/scene_model/gaussian_model/*` in
OpenDriveLab/MTGS) TPU-first: every node is a padded, fixed-capacity
struct of arrays; learnable parameters and non-learnable auxiliary state
live in parallel trees; composition is static-slice concatenation
(`models/scene_graph.py`) instead of the reference's dynamic per-frame
node dicts, so the whole render step jits with static shapes.
"""

from mtgs_tpu.models.gaussians import GaussianNodeParams, NodeAux, node_capacity
from mtgs_tpu.models.scene_graph import (
    SceneParams,
    SceneAux,
    ViewInputs,
    SceneConfig,
    collect_gaussians,
    init_scene,
    node_segments,
)
from mtgs_tpu.models.appearance import apply_exposure, init_exposure
