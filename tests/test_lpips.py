"""LPIPS-JAX forward vs a torch oracle on synthetic weights.

Validates `eval/lpips_jax.py` against an independent torch
implementation of the LPIPS v0.1 spec (richzhang AlexNet variant, as
wrapped by torchmetrics at `mtgs_scene_graph.py:323-325` in the
reference) on random weights — so the real pretrained weights produce
reference-equal numbers the moment they land (VERDICT r3 item 6).
"""

import numpy as np
import pytest

from mtgs_tpu.eval.lpips_jax import (
    _ALEX, _SCALE, _SHIFT, get_lpips_jax, load_weights, lpips_forward,
)


def synth_weights(rng):
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _, _) in enumerate(_ALEX):
        params[f"conv{i}_w"] = rng.standard_normal(
            (out_ch, in_ch, k, k)).astype(np.float32) * 0.1
        params[f"conv{i}_b"] = rng.standard_normal(out_ch).astype(
            np.float32) * 0.1
        params[f"lin{i}_w"] = rng.random(out_ch).astype(np.float32)
        in_ch = out_ch
    return params


def torch_oracle(params, img1, img2):
    import torch
    import torch.nn.functional as F

    def prep(im):
        x = torch.from_numpy(im).clamp(0, 1) * 2.0 - 1.0
        x = (x - torch.from_numpy(_SHIFT)) / torch.from_numpy(_SCALE)
        return x.permute(2, 0, 1)[None]

    x1, x2 = prep(img1), prep(img2)
    total = 0.0
    with torch.no_grad():
        for i, (_, k, stride, pad, pool_before) in enumerate(_ALEX):
            if pool_before:
                x1 = F.max_pool2d(x1, 3, 2)
                x2 = F.max_pool2d(x2, 3, 2)
            w = torch.from_numpy(params[f"conv{i}_w"])
            b = torch.from_numpy(params[f"conv{i}_b"])
            x1 = F.relu(F.conv2d(x1, w, b, stride=stride, padding=pad))
            x2 = F.relu(F.conv2d(x2, w, b, stride=stride, padding=pad))
            n1 = x1 / (x1.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            n2 = x2 / (x2.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (n1 - n2) ** 2
            lin = torch.from_numpy(params[f"lin{i}_w"]).view(1, -1, 1, 1)
            total += float((d * lin).sum(1).mean())
    return total


def test_lpips_jax_matches_torch_oracle():
    rng = np.random.default_rng(0)
    params = synth_weights(rng)
    img1 = rng.random((96, 128, 3)).astype(np.float32)
    img2 = np.clip(img1 + 0.1 * rng.standard_normal((96, 128, 3)).astype(
        np.float32), 0, 1)
    got = float(lpips_forward(
        {k: np.asarray(v) for k, v in params.items()}, img1, img2))
    want = torch_oracle(params, img1, img2)
    assert got == pytest.approx(want, rel=1e-4, abs=1e-6), (got, want)
    # identical images score ~0
    same = float(lpips_forward(params, img1, img1))
    assert abs(same) < 1e-8


def test_lpips_weights_drop_ready(tmp_path, monkeypatch):
    """Writing an npz at MTGS_LPIPS_WEIGHTS makes get_lpips() return the
    JAX metric with zero code change (the eval pipeline then emits
    `lpips` in eval_result.json)."""
    rng = np.random.default_rng(1)
    params = synth_weights(rng)
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **params)
    monkeypatch.setenv("MTGS_LPIPS_WEIGHTS", str(path))

    loaded = load_weights(str(path))
    assert set(loaded) == set(params)

    from mtgs_tpu.eval import lpips_jax
    lpips_jax._jitted.cache_clear()
    from mtgs_tpu.eval.lpips import get_lpips
    fn = get_lpips()
    assert fn is not None
    img = rng.random((64, 64, 3)).astype(np.float32)
    v = fn(img, np.clip(img + 0.05, 0, 1))
    assert np.isfinite(v) and v > 0
    lpips_jax._jitted.cache_clear()
