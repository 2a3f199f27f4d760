"""DINOv2 patch-similarity metric (optional, torch-CPU host path).

The reference scores renders with mask-weighted per-patch cosine
similarity of DINOv2 ViT-B/14 patch embeddings (`mtgs/utils/dinov2.py`
in OpenDriveLab/MTGS): both images are resized so the short side is 518,
center-cropped to 518x518, normalized with mean=std=0.5, run through
dinov2_vitb14, and the 37x37=1369 patch-token cosine similarities are
averaged with weights equal to the visible-pixel fraction of each 14x14
patch under the (nearest-resized, identically cropped) mask.

Pretrained weights cannot be fetched in a zero-egress container, so this
mirrors the `lpips.py` runtime probe: `get_dinov2()` returns a callable
when `transformers` can load `facebook/dinov2-base` from the local cache
and None otherwise, in which case the eval pipeline omits `dinov2_sim`.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np

_SIDE = 518
_PATCH = 14
_GRID = _SIDE // _PATCH  # 37


def _resize_center_crop(img: np.ndarray, nearest: bool) -> np.ndarray:
    """Short-side resize to 518 then center crop 518x518 (HW or HWC)."""
    from PIL import Image

    h, w = img.shape[:2]
    scale = _SIDE / min(h, w)
    nh, nw = max(round(h * scale), _SIDE), max(round(w * scale), _SIDE)
    mode = Image.NEAREST if nearest else Image.BILINEAR
    if img.ndim == 2:
        pil = Image.fromarray((img * 255).astype(np.uint8), "L")
    else:
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    pil = pil.resize((nw, nh), mode)
    left, top = (nw - _SIDE) // 2, (nh - _SIDE) // 2
    pil = pil.crop((left, top, left + _SIDE, top + _SIDE))
    return np.asarray(pil).astype(np.float32) / 255.0


def patch_weights(mask_hw: np.ndarray) -> np.ndarray:
    """Per-patch visible-pixel fraction, flattened [1369]."""
    m = _resize_center_crop(mask_hw.astype(np.float32), nearest=True) > 0.5
    m = m.astype(np.float32)
    patches = m.reshape(_GRID, _PATCH, _GRID, _PATCH)
    return (patches.sum((1, 3)) / (_PATCH * _PATCH)).reshape(-1)


@functools.lru_cache(maxsize=1)
def _load():
    try:
        import os

        # local_files_only alone still probes the hub for adapter configs
        # (with retries) in some transformers versions; force offline.
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        import torch
        from transformers import AutoModel

        model = AutoModel.from_pretrained(
            "facebook/dinov2-base", local_files_only=True
        )
        model.eval()

        def features(img_hwc: np.ndarray) -> "torch.Tensor":
            x = _resize_center_crop(img_hwc, nearest=False)
            x = (x - 0.5) / 0.5
            t = torch.from_numpy(np.ascontiguousarray(x)).permute(2, 0, 1)[None]
            with torch.no_grad():
                out = model(pixel_values=t).last_hidden_state
            return out[0, 1:]  # drop CLS -> [1369, 768]

        def run(
            pred_hwc: np.ndarray,
            gt_hwc: np.ndarray,
            mask_hw: Optional[np.ndarray] = None,
        ) -> Optional[float]:
            f1, f2 = features(pred_hwc), features(gt_hwc)
            cos = torch.nn.functional.cosine_similarity(f1, f2, dim=1)
            if mask_hw is None:
                w = np.ones((_GRID * _GRID,), np.float32)
            else:
                w = patch_weights(mask_hw)
            tw = float(w.sum())
            if tw <= 1e-6:
                return None  # fully-masked view: omit, don't bias the mean
            return float((cos * torch.from_numpy(w)).sum() / tw)

        run(
            np.zeros((64, 96, 3), np.float32),
            np.zeros((64, 96, 3), np.float32),
            np.ones((64, 96), np.float32),
        )
        return run
    except Exception:
        return None


def get_dinov2() -> Optional[
    Callable[[np.ndarray, np.ndarray, Optional[np.ndarray]], Optional[float]]
]:
    """A callable (pred_hwc, gt_hwc, mask_hw) -> similarity, or None.

    Prefers the pure-JAX forward with a local weights file
    (`dinov2_jax.py` — weights-drop-ready, no torch at eval time), then
    falls back to the torch/transformers local-cache path."""
    from mtgs_tpu.eval.dinov2_jax import get_dinov2_jax

    jx = get_dinov2_jax()
    if jx is not None:
        return jx
    return _load()
