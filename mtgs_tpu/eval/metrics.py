"""Evaluation metric suite.

JAX rewrites of the reference's metrics (OpenDriveLab/MTGS):
  * masked PSNR — `mtgs/utils/pnsr.py:5-34`
  * iterative quadratic least-squares color correction for cc_psnr —
    `mtgs/utils/pnsr.py:36-107` (Bilateral Guided RF processing)
  * masked SSIM — shared with the training loss (`mtgs_tpu.train.losses`)
  * LiDAR depth RMSE / absRel / delta1 — `mtgs_scene_graph.py:1054-1064`

LPIPS and DINOv2 similarity require pretrained conv weights; they are
provided behind optional torch-CPU host callbacks in `mtgs_tpu.eval.lpips`
and report None when weights are unavailable (this container has no
network egress).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mtgs_tpu.train.losses import masked_mean, ssim


def masked_psnr(pred: jax.Array, gt: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """PSNR over mask-selected pixels (data range 1.0)."""
    if mask is None:
        mse = jnp.mean((pred - gt) ** 2)
    else:
        mse = masked_mean((pred - gt) ** 2, mask)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _is_unclipped(z: jax.Array, eps: float) -> jax.Array:
    return (z >= eps) & (z <= 1.0 - eps)


def color_correct(
    img: jax.Array, ref: jax.Array, num_iters: int = 5, eps: float = 0.5 / 255
) -> jax.Array:
    """Warp `img`'s colors onto `ref` by iterative masked least squares.

    Port of `mtgs/utils/pnsr.py:36-107` (quadratic per-channel expansion,
    saturation-masked normal-equations solve, 5 iterations). [H, W, C].
    """
    C = img.shape[-1]
    img_mat = img.reshape(-1, C)
    ref_mat = ref.reshape(-1, C)
    mask0 = _is_unclipped(img_mat, eps)

    def a_matrix(m):
        terms = [m[:, c : c + 1] * m[:, c:] for c in range(C)]
        terms.append(m)
        terms.append(jnp.ones_like(m[:, :1]))
        return jnp.concatenate(terms, axis=-1)

    def body(_, img_mat):
        a = a_matrix(img_mat)  # [P, D]
        cols = []
        for c in range(C):
            b = ref_mat[:, c]
            mask = (
                mask0[:, c]
                & _is_unclipped(img_mat[:, c], eps)
                & _is_unclipped(b, eps)
            ).astype(img_mat.dtype)
            ma = a * mask[:, None]
            mb = b * mask
            # normal equations with mild Tikhonov for jit-safe stability
            ata = ma.T @ ma + 1e-6 * jnp.eye(a.shape[-1], dtype=a.dtype)
            atb = ma.T @ mb
            w = jnp.linalg.solve(ata, atb)
            cols.append(w)
        warp = jnp.stack(cols, axis=-1)  # [D, C]
        return jnp.clip(a @ warp, 0.0, 1.0)

    out = jax.lax.fori_loop(0, num_iters, body, img_mat)
    return out.reshape(img.shape)


def depth_metrics(
    pred: jax.Array, gt: jax.Array, mask: jax.Array
) -> Dict[str, jax.Array]:
    """LiDAR depth metrics over valid range 0.1-80 m (ref :1054-1064)."""
    valid = ((gt > 0.1) & (gt < 80.0) & (mask > 0)).astype(pred.dtype)
    n = jnp.maximum(valid.sum(), 1.0)
    err = (gt - pred) * valid
    rmse = jnp.sqrt((err**2).sum() / n)
    abs_rel = (jnp.abs(err) / jnp.maximum(gt, 1e-6)).sum() / n
    ratio = jnp.maximum(
        pred / jnp.maximum(gt, 1e-6), gt / jnp.maximum(pred, 1e-6)
    )
    delta1 = ((ratio < 1.25).astype(pred.dtype) * valid).sum() / n
    return dict(depth_RMSE=rmse, depth_absRel=abs_rel, depth_delta1=delta1)


def image_metrics(
    pred: jax.Array,
    pred_appearance: jax.Array,
    gt: jax.Array,
    mask: jax.Array,
    *,
    pred_depth: Optional[jax.Array] = None,
    gt_depth: Optional[jax.Array] = None,
    color_corrected: bool = True,
) -> Dict[str, jax.Array]:
    """The reference eval metric set for one image
    (`get_metrics_dict`/`get_image_metrics_and_images`,
    `mtgs_scene_graph.py:747-805,1010-1123`): psnr, ssim, cc_psnr + depth."""
    out = dict(
        psnr=masked_psnr(pred_appearance, gt, mask),
        # the reference scores SSIM on the appearance-corrected render
        # too (`get_image_metrics_and_images`, :1030-1047)
        ssim=ssim(gt, pred_appearance, mask),
    )
    if color_corrected:
        m = mask.astype(pred.dtype)
        cc = color_correct(pred_appearance * m, gt * m)
        out["cc_psnr"] = masked_psnr(cc, gt, mask)
    if pred_depth is not None and gt_depth is not None:
        out.update(depth_metrics(pred_depth, gt_depth, mask))
    return out
