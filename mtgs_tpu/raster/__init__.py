"""The differentiable 3D Gaussian Splatting rasterizer.

TPU-native replacement for the reference's gsplat CUDA rasterizer
(`gsplat.rendering.rasterization`, called at
`mtgs/scene_model/mtgs_scene_graph.py:640-662` in OpenDriveLab/MTGS).

Pipeline (all static shapes, jit-compatible):
    projection.py   EWA perspective projection of 3D covariances (jnp, autodiff)
    binning.py      depth sort -> tile-intersection expansion -> stable sort by
                    tile -> 128-aligned per-tile ranges (XLA sort/scan/scatter)
    blend_pallas.py per-tile depth-ordered alpha blending as Pallas TPU kernels
                    (forward + transmittance-replay backward, custom_vjp)
    blend_reference.py  sequential jnp oracle with identical semantics (parity)
    rasterize.py    public API: `rasterize(...)` -> (render, alpha, info)
"""

from mtgs_tpu.raster.rasterize import rasterize, RasterizeConfig
