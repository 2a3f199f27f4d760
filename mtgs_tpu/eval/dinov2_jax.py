"""Pure-JAX DINOv2 ViT forward with a local-weights loader.

The reference's `dinov2_sim` metric embeds both images with DINOv2
ViT-B/14 and averages mask-weighted per-patch cosine similarities
(`mtgs/utils/dinov2.py` in OpenDriveLab/MTGS). Pretrained weights cannot
be downloaded in a zero-egress container, so — like `lpips_jax.py` —
this module makes the metric **weights-drop-ready**: the forward is
implemented in jnp, and the moment a weights file lands on disk
(`MTGS_DINOV2_WEIGHTS`, or the default cache path, either the canonical
`.npz` or a transformers checkpoint convertible with
`convert_transformers`), `eval_result.json` grows `dinov2_sim` with
zero code change. Until then the probe returns None and the eval
pipeline omits the metric.

Architecture (transformers `Dinov2Model`, facebook/dinov2-base):
patch-embed conv (14x14, stride 14) -> prepend CLS -> +position
embeddings -> N pre-norm blocks (MHSA with qkv biases, LayerScale,
residual; LN -> MLP(GELU) -> LayerScale, residual) -> final LN. The
metric consumes the patch tokens (CLS dropped).

Canonical `.npz` keys (converter: `convert_transformers`):
  patch_w [D, 3, P, P], patch_b [D], cls [D], pos [1 + G*G, D]
  L{i}_{n1_w,n1_b,q_w,q_b,k_w,k_b,v_w,v_b,o_w,o_b,ls1,
        n2_w,n2_b,fc1_w,fc1_b,fc2_w,fc2_b,ls2}
  norm_w [D], norm_b [D]; meta: heads [], patch [].
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WEIGHTS = os.path.expanduser("~/.cache/mtgs_tpu/dinov2_vitb14.npz")


def _ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def dinov2_forward(weights: Dict[str, jnp.ndarray], img_hwc: jnp.ndarray):
    """[H, W, 3] normalized image -> [G*G, D] patch tokens.

    H and W must be multiples of the patch size and produce the same
    G*G grid the position embeddings were trained for (518 -> 37x37 for
    the released ViT-B/14)."""
    pw = weights["patch_w"]
    D, _, P, _ = pw.shape
    H, W = img_hwc.shape[:2]
    gh, gw = H // P, W // P
    n_pos = weights["pos"].shape[0] - 1
    assert gh * gw == n_pos, (
        f"input grid {gh}x{gw} != position-embedding grid ({n_pos})")
    heads = int(weights["heads"])

    # patch embedding as one matmul over unfolded patches
    x = img_hwc.reshape(gh, P, gw, P, 3).transpose(0, 2, 4, 1, 3)
    x = x.reshape(gh * gw, 3 * P * P)
    k = pw.reshape(D, 3 * P * P)
    x = x @ k.T + weights["patch_b"]

    x = jnp.concatenate([weights["cls"][None, :], x], axis=0)
    x = x + weights["pos"]

    i = 0
    while f"L{i}_n1_w" in weights:
        w = {k2[len(f"L{i}_"):]: v for k2, v in weights.items()
             if k2.startswith(f"L{i}_")}
        h = _ln(x, w["n1_w"], w["n1_b"])
        T = h.shape[0]
        hd = D // heads
        q = (h @ w["q_w"].T + w["q_b"]).reshape(T, heads, hd)
        kk = (h @ w["k_w"].T + w["k_b"]).reshape(T, heads, hd)
        v = (h @ w["v_w"].T + w["v_b"]).reshape(T, heads, hd)
        att = jnp.einsum("qhd,khd->hqk", q, kk) / np.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(T, D)
        o = o @ w["o_w"].T + w["o_b"]
        x = x + o * w["ls1"]
        h = _ln(x, w["n2_w"], w["n2_b"])
        h = jax.nn.gelu(h @ w["fc1_w"].T + w["fc1_b"], approximate=False)
        h = h @ w["fc2_w"].T + w["fc2_b"]
        x = x + h * w["ls2"]
        i += 1
    x = _ln(x, weights["norm_w"], weights["norm_b"])
    return x[1:]  # drop CLS


def convert_transformers(model) -> Dict[str, np.ndarray]:
    """transformers `Dinov2Model` -> canonical npz dict."""
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    out = {
        "patch_w": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_b": sd["embeddings.patch_embeddings.projection.bias"],
        "cls": sd["embeddings.cls_token"][0, 0],
        "pos": sd["embeddings.position_embeddings"][0],
        "norm_w": sd["layernorm.weight"],
        "norm_b": sd["layernorm.bias"],
        "heads": np.asarray(model.config.num_attention_heads),
        "patch": np.asarray(model.config.patch_size),
    }
    i = 0
    while f"encoder.layer.{i}.norm1.weight" in sd:
        p = f"encoder.layer.{i}."
        out.update({
            f"L{i}_n1_w": sd[p + "norm1.weight"],
            f"L{i}_n1_b": sd[p + "norm1.bias"],
            f"L{i}_q_w": sd[p + "attention.attention.query.weight"],
            f"L{i}_q_b": sd[p + "attention.attention.query.bias"],
            f"L{i}_k_w": sd[p + "attention.attention.key.weight"],
            f"L{i}_k_b": sd[p + "attention.attention.key.bias"],
            f"L{i}_v_w": sd[p + "attention.attention.value.weight"],
            f"L{i}_v_b": sd[p + "attention.attention.value.bias"],
            f"L{i}_o_w": sd[p + "attention.output.dense.weight"],
            f"L{i}_o_b": sd[p + "attention.output.dense.bias"],
            f"L{i}_ls1": sd[p + "layer_scale1.lambda1"],
            f"L{i}_n2_w": sd[p + "norm2.weight"],
            f"L{i}_n2_b": sd[p + "norm2.bias"],
            f"L{i}_fc1_w": sd[p + "mlp.fc1.weight"],
            f"L{i}_fc1_b": sd[p + "mlp.fc1.bias"],
            f"L{i}_fc2_w": sd[p + "mlp.fc2.weight"],
            f"L{i}_fc2_b": sd[p + "mlp.fc2.bias"],
            f"L{i}_ls2": sd[p + "layer_scale2.lambda1"],
        })
        i += 1
    return out


def load_weights(path: Optional[str] = None) -> Optional[Dict[str, jnp.ndarray]]:
    path = path or os.environ.get("MTGS_DINOV2_WEIGHTS", DEFAULT_WEIGHTS)
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


@functools.lru_cache(maxsize=1)
def get_dinov2_jax():
    """Mask-weighted patch-cosine metric callable, or None when no
    weights file exists (same contract as `dinov2.get_dinov2`)."""
    weights = load_weights()
    if weights is None:
        return None
    from mtgs_tpu.eval.dinov2 import _GRID, _resize_center_crop, patch_weights

    fwd = jax.jit(functools.partial(dinov2_forward, weights))

    def run(pred_hwc, gt_hwc, mask_hw=None):
        fs = []
        for im in (pred_hwc, gt_hwc):
            x = _resize_center_crop(np.asarray(im, np.float32), nearest=False)
            fs.append(fwd(jnp.asarray((x - 0.5) / 0.5)))
        f1, f2 = fs
        cos = jnp.sum(f1 * f2, -1) / jnp.maximum(
            jnp.linalg.norm(f1, axis=-1) * jnp.linalg.norm(f2, axis=-1), 1e-8)
        if mask_hw is None:
            w = np.ones((_GRID * _GRID,), np.float32)
        else:
            w = patch_weights(np.asarray(mask_hw, np.float32))
        tw = float(w.sum())
        if tw <= 1e-6:
            return None
        return float((np.asarray(cos) * w).sum() / tw)

    return run
