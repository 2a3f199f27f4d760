"""LPIPS perceptual metric (optional, torch-CPU host path).

The reference uses torchmetrics LPIPS/AlexNet (`mtgs_scene_graph.py:323-325`
in OpenDriveLab/MTGS). Pretrained AlexNet weights cannot be downloaded in
a zero-egress environment, so this wraps the metric behind a runtime
probe: if torchmetrics + weights are available (cached under
TORCH_HOME), `get_lpips()` returns a callable; otherwise it returns a
no-op that yields None and the eval pipeline simply omits `lpips`.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np


@functools.lru_cache(maxsize=1)
def _load():
    try:
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

        metric = LearnedPerceptualImagePatchSimilarity(
            net_type="alex", normalize=True
        )
        metric.eval()

        def run(pred_hwc: np.ndarray, gt_hwc: np.ndarray) -> Optional[float]:
            with torch.no_grad():
                p = torch.from_numpy(np.ascontiguousarray(pred_hwc)).float()
                g = torch.from_numpy(np.ascontiguousarray(gt_hwc)).float()
                p = p.permute(2, 0, 1)[None].clamp(0, 1)
                g = g.permute(2, 0, 1)[None].clamp(0, 1)
                return float(metric(p, g))

        # probe once so weight-download failures surface here
        run(np.zeros((64, 64, 3), np.float32), np.zeros((64, 64, 3), np.float32))
        return run
    except Exception:
        return None


def get_lpips() -> Optional[Callable[[np.ndarray, np.ndarray], Optional[float]]]:
    """A callable (pred_hwc, gt_hwc) -> lpips, or None if unavailable.

    Resolution order: (1) the pure-JAX AlexNet forward with local
    weights (`lpips_jax.py` — weights-drop-ready, no torch at eval
    time); (2) the torchmetrics host path if its cached weights exist."""
    from mtgs_tpu.eval.lpips_jax import get_lpips_jax

    jx = get_lpips_jax()
    if jx is not None:
        return jx
    return _load()
