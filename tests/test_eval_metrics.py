"""Eval metric suite: masked PSNR, color correction, SSIM masking,
depth metrics, and the eval-pipeline aggregation schema.

Contracts from the reference (OpenDriveLab/MTGS): `mtgs/utils/pnsr.py`
(masked PSNR + quadratic color correction), `mtgs/utils/ssim.py`
(mask-margin SSIM), `mtgs_scene_graph.py:1054-1064` (depth metrics),
`custom_pipeline.py:145-198` (per-traversal nan-filtered aggregation).
"""

import jax.numpy as jnp
import numpy as np

from mtgs_tpu.eval.metrics import color_correct, depth_metrics, masked_psnr
from mtgs_tpu.train.losses import (
    edge_aware_logl1,
    edge_aware_tv,
    mean_angular_error,
    ssim,
)


def test_mean_angular_error_known_angles():
    """`mean_angular_error` (geometric_loss.py:305-320): arccos of the
    channel dot product, clamped."""
    a = jnp.zeros((2, 2, 3)).at[..., 0].set(1.0)
    b = jnp.zeros((2, 2, 3)).at[..., 1].set(1.0)
    np.testing.assert_allclose(np.asarray(mean_angular_error(a, a)), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mean_angular_error(a, b)), np.pi / 2, atol=1e-6)
    # antiparallel: clamp keeps arccos finite at pi
    np.testing.assert_allclose(
        np.asarray(mean_angular_error(a, -a)), np.pi, atol=1e-6)


def test_edge_aware_depth_losses():
    """EdgeAwareLogL1/EdgeAwareTV (geometric_loss.py:195-233,259-285):
    image edges damp the depth penalty; flat images penalize fully."""
    rng = np.random.default_rng(0)
    H = W = 16
    pred = jnp.asarray(rng.uniform(1, 5, (H, W, 1)), jnp.float32)
    gt = pred + 1.0
    mask = jnp.ones((H, W, 1))
    flat_rgb = jnp.full((H, W, 3), 0.5)
    # an image that is pure vertical edges everywhere
    edgy_rgb = jnp.asarray(
        np.tile((np.arange(W) % 2).astype(np.float32)[None, :, None], (H, 1, 3)))
    l_flat = float(edge_aware_logl1(pred, gt, flat_rgb, mask))
    l_edgy = float(edge_aware_logl1(pred, gt, edgy_rgb, mask))
    assert l_edgy < l_flat  # edges reduce the weight
    np.testing.assert_allclose(l_flat, 2 * np.log(2.0), rtol=1e-5)

    step_depth = jnp.asarray(
        np.tile((np.arange(W) % 2).astype(np.float32)[None, :, None], (H, 1, 1)))
    tv_flat = float(edge_aware_tv(step_depth, flat_rgb))
    tv_edgy = float(edge_aware_tv(step_depth, edgy_rgb))
    assert tv_edgy < tv_flat
    assert float(edge_aware_tv(jnp.ones((H, W, 1)), flat_rgb)) == 0.0


def test_masked_psnr_ignores_masked_pixels():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)), jnp.float32)
    pred = gt.at[:8].set(0.0)  # corrupt the top half
    mask_bottom = jnp.zeros((16, 16, 1)).at[8:].set(1.0)
    # perfect where mask selects -> huge psnr
    assert float(masked_psnr(pred, gt, mask_bottom)) > 60.0
    assert float(masked_psnr(pred, gt)) < 20.0


def test_color_correct_fixes_affine_shift():
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.uniform(0.1, 0.9, (32, 32, 3)), jnp.float32)
    shifted = jnp.clip(ref * 0.8 + 0.05, 0, 1)
    p_before = float(masked_psnr(shifted, ref))
    cc = color_correct(shifted, ref)
    p_after = float(masked_psnr(cc, ref))
    assert p_after > p_before + 5.0, (p_before, p_after)


def test_ssim_identity_and_mask():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
    mask = jnp.ones((32, 32, 1))
    assert float(ssim(img, img, mask)) > 0.999
    noisy = jnp.clip(img + 0.3 * jnp.asarray(rng.normal(size=img.shape), jnp.float32), 0, 1)
    s_noisy = float(ssim(img, noisy, mask))
    assert s_noisy < 0.9
    # corrupt only OUTSIDE the mask: masked ssim stays near-perfect
    half = jnp.zeros((32, 32, 1)).at[:, :16].set(1.0)
    corrupted = img.at[:, 24:].set(0.0)
    assert float(ssim(img, corrupted, half)) > 0.99


def test_depth_metrics_known_values():
    gt = jnp.full((8, 8, 1), 10.0)
    pred = jnp.full((8, 8, 1), 12.0)
    mask = jnp.ones((8, 8, 1))
    m = depth_metrics(pred, gt, mask)
    np.testing.assert_allclose(float(m["depth_RMSE"]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(m["depth_absRel"]), 0.2, atol=1e-5)
    assert float(m["depth_delta1"]) == 1.0  # 12/10 = 1.2 < 1.25
    m2 = depth_metrics(jnp.full((8, 8, 1), 20.0), gt, mask)
    assert float(m2["depth_delta1"]) == 0.0
    # out-of-range gt excluded
    gt_far = jnp.full((8, 8, 1), 100.0)
    m3 = depth_metrics(pred, gt_far, mask)
    assert float(m3["depth_RMSE"]) == 0.0


def test_eval_pipeline_schema():
    """Aggregation: per-traversal trv{i}_* keys + nan filtering + fps."""
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.data.synthetic import batch_iterator
    from mtgs_tpu.eval.pipeline import EvalConfig, evaluate_scene
    from mtgs_tpu.train.trainer import TrainerConfig

    scene = make_synthetic_scene(
        seed=0, width=32, height=32, n_travels=2, n_frames=2, n_bg=200, n_instance=0
    )
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(
        width=32, height=32, max_intersections=1 << 12, backend="xla",
        predict_normals=False,
    )
    batches = []
    it = batch_iterator(scene)
    for _ in range(3):
        batches.append(next(it))
    result = evaluate_scene(
        params, aux, cfg, batches, eval_cfg=EvalConfig(color_corrected=True, lpips=False)
    )
    assert "psnr" in result and "ssim" in result and "cc_psnr" in result
    assert "fps" in result
    trv_keys = [k for k in result if k.startswith("trv")]
    assert trv_keys, result.keys()
    for v in result.values():
        assert np.isfinite(v) or np.isnan(v)


def test_dinov2_patch_weights_geometry():
    # 518-side resize + center crop + 14px patch pooling (ref mtgs/utils/dinov2.py)
    from mtgs_tpu.eval.dinov2 import patch_weights

    full = patch_weights(np.ones((100, 150), np.float32))
    assert full.shape == (37 * 37,)
    np.testing.assert_allclose(full, 1.0)
    none = patch_weights(np.zeros((64, 64), np.float32))
    np.testing.assert_allclose(none, 0.0)
    # left-half mask on a square image: ~half the patches weighted
    half = patch_weights(
        np.concatenate([np.ones((64, 32)), np.zeros((64, 32))], axis=1).astype(np.float32)
    )
    assert 0.4 < half.mean() < 0.6


def test_dinov2_probe_degrades_gracefully():
    from mtgs_tpu.eval.dinov2 import get_dinov2

    fn = get_dinov2()  # zero-egress container: None unless weights cached
    if fn is not None:
        a = np.random.default_rng(0).uniform(0, 1, (64, 96, 3)).astype(np.float32)
        s = fn(a, a, np.ones((64, 96), np.float32))
        assert s is not None and s > 0.99


def test_redistort_identity():
    from mtgs_tpu.core.camera import redistort_image

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (32, 40, 3)), jnp.float32)
    K = jnp.asarray([[30.0, 0, 20], [0, 30.0, 16], [0, 0, 1]], jnp.float32)
    out = redistort_image(img, K, jnp.zeros(4), K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_redistort_matches_manual_sample():
    from mtgs_tpu.core.camera import distort_opencv, redistort_image

    # smooth ramp image so bilinear sampling is exact for affine fields
    H, W = 24, 32
    u = np.arange(W, dtype=np.float32)[None, :].repeat(H, 0)
    v = np.arange(H, dtype=np.float32)[:, None].repeat(W, 1)
    img = jnp.asarray(np.stack([u / W, v / H, 0 * u], -1))
    K_raw = jnp.asarray([[25.0, 0, 16], [0, 25.0, 12], [0, 0, 1]], jnp.float32)
    K_und = jnp.asarray([[22.0, 0, 15], [0, 22.0, 11], [0, 0, 1]], jnp.float32)
    dist = jnp.asarray([0.05, -0.01, 0.001, 0.002], jnp.float32)
    out = np.asarray(redistort_image(img, K_raw, dist, K_und))

    # check one interior pixel against the closed-form source location
    pu, pv = 20, 10
    x = (pu - 16.0) / 25.0
    y = (pv - 12.0) / 25.0
    xd = np.asarray(distort_opencv(jnp.asarray([x, y]), dist))
    us = xd[0] * 22.0 + 15.0
    vs = xd[1] * 22.0 + 11.0
    np.testing.assert_allclose(out[pv, pu, 0], us / W, atol=1e-5)
    np.testing.assert_allclose(out[pv, pu, 1], vs / H, atol=1e-5)


def test_export_eval_images_modes(tmp_path):
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.data.synthetic import batch_iterator
    from mtgs_tpu.eval.pipeline import export_eval_images
    from mtgs_tpu.train.trainer import TrainerConfig

    scene = make_synthetic_scene(
        seed=0, width=32, height=32, n_travels=1, n_frames=2, n_bg=128,
        n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(width=32, height=32, max_intersections=1 << 12,
                        backend="xla", predict_normals=False)
    it = batch_iterator(scene)
    batches = [next(it) for _ in range(2)]

    seq = export_eval_images(
        params, aux, cfg, batches, tmp_path / "seq", mode="sequential_with_gt")
    assert any("_rendered.jpg" in p for p in seq)
    assert any("_gt_processed.jpg" in p for p in seq)
    assert all(("traversal_" in p) for p in seq)

    K = np.asarray([[25.0, 0, 16], [0, 25.0, 16], [0, 0, 1]], np.float32)
    metas = [
        dict(rel_path=f"log/CAM_F0/tok{i}.jpg", K_raw=K, K_und=K,
             dist=np.asarray([0.03, 0, 0, 0], np.float32), raw_hw=(32, 32))
        for i in range(2)
    ]
    nup = export_eval_images(
        params, aux, cfg, batches, tmp_path / "nup", mode="nuplan",
        view_metas=metas)
    assert (tmp_path / "nup" / "log" / "CAM_F0" / "tok0.jpg").exists()
    assert len(nup) == 2
