"""Regression pins for the two campaign_r3 NaN causes (VERDICT r3 item 5).

Both root causes were fixed in round 3 with code comments but no test:

1. InverseL1 depth loss at vanishing alpha: the RGB+ED normalization
   clamp (`accum / max(alpha, 1e-10)`) produces near-zero expected
   depths on empty pixels; `1/(pred+1e-5)` gradients through those
   pixels overflowed and NaN'd a full 960x540 campaign at step ~1.7k.
   Fixes under test: the `alpha > 1e-6` stop-gradient guard in
   `render_view` (trainer.py) and the near-plane clamp in
   `depth_loss` (losses.py). Reverting either makes these fail.

2. TPU's default ONE-pass bf16 matmul precision (measured 1e-2 relative
   error) silently corrupted the render/loss path; the framework pins
   `jax_default_matmul_precision=highest` at import (package __init__).
   A future "optimization" dropping the pin would re-diverge a campaign
   at the most expensive possible place — pin it here instead.

Reference contract: `mtgs/scene_model/mtgs_scene_graph.py:875-884`
(InverseL1 depth), whose CUDA/torch math is true f32 throughout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
from mtgs_tpu.train import losses as loss_lib
from mtgs_tpu.train.trainer import Batch, TrainerConfig, loss_and_grads


# ------------------------------------------------- 1a: depth_loss clamp

def test_inverse_depth_grad_bounded_at_tiny_pred():
    """d(InverseL1)/d(pred) must stay near-plane-bounded even for the
    ~1e-10 depths the ED clamp emits on vanishing-alpha pixels."""
    pred = jnp.asarray([[1e-10], [1e-6], [0.5], [10.0]], jnp.float32)[None]
    gt = jnp.full_like(pred, 5.0)
    mask = jnp.ones_like(pred)

    g = jax.grad(
        lambda p: loss_lib.depth_loss(p, gt, mask, "InverseL1"))(pred)
    assert np.isfinite(np.asarray(g)).all()
    # with the 0.01 near-plane clamp, |dL/dpred| <= 1/(0.01+1e-5)^2 / n;
    # without it, the 1e-10 pixel alone contributes ~1e19
    assert float(jnp.abs(g).max()) < 1e5, float(jnp.abs(g).max())


# ------------------------------------- 1b: render_view alpha guard, e2e

@pytest.mark.parametrize("backend", ["xla"])
def test_depth_loss_finite_grads_at_vanishing_alpha(backend):
    """Full loss_and_grads on a scene whose gaussians are all at
    ~1e-7 opacity: every pixel's alpha is below the 1e-6 guard, the ED
    depth is the normalization-clamp artifact, and the LiDAR mask is
    valid everywhere. Pre-fix code overflows to inf/NaN in the
    parameter gradients; the guard must keep every grad finite."""
    scene = make_synthetic_scene(
        seed=3, width=32, height=32, n_travels=1, n_frames=1,
        n_bg=200, n_instance=0,
    )
    params, aux = build_scene_model(scene, with_instances=False,
                                    with_skybox=False)
    # push every gaussian to vanishing opacity (sigmoid(-16) ~ 1.1e-7)
    params = params.replace(
        background=params.background.replace(
            opacities=jnp.full_like(params.background.opacities, -16.0)))
    cfg = TrainerConfig(
        width=scene.width, height=scene.height,
        max_intersections=1 << 12, backend=backend,
        loss=loss_lib.LossConfig(depth_lambda=0.5, ncc_lambda=0.1),
    )
    batch = Batch(
        image=jnp.asarray(scene.images[0, 0]),
        mask=jnp.ones((scene.height, scene.width, 1), jnp.float32),
        c2w=jnp.asarray(scene.c2ws[0, 0]),
        K=jnp.asarray(scene.K),
        cam_idx=jnp.asarray(0, jnp.int32),
        image_idx=jnp.asarray(0, jnp.int32),
        travel_index=jnp.asarray(0, jnp.int32),
        frame_idx=jnp.asarray(0, jnp.int32),
        timestamp=jnp.asarray(0.0, jnp.float32),
        # full-frame "valid" lidar depth: the adversarial part — the
        # real campaign NaN'd on exactly lidar-valid + empty-alpha
        lidar_depth=jnp.full((scene.height, scene.width, 1), 5.0),
        pseudo_depth=jnp.full((scene.height, scene.width, 1), 5.0),
    )
    total, losses, out, sink_grad, grads = loss_and_grads(
        params, aux, cfg, batch, jnp.asarray(10_000, jnp.int32))

    assert np.isfinite(float(total)), dict(
        (k, float(v)) for k, v in losses.items())
    leaves, _ = jax.tree_util.tree_flatten(grads)
    for leaf in leaves:
        a = np.asarray(leaf)
        assert np.isfinite(a).all(), "non-finite parameter gradient"
    assert np.isfinite(np.asarray(sink_grad)).all()


# ----------------------------------------------- 2: precision config pin

def test_matmul_precision_pinned_highest():
    """Importing mtgs_tpu must pin f32-exact matmul semantics (the
    package __init__); dropping the pin reintroduces 1e-2-relative
    bf16 error on TPU in every non-Pallas matmul of the render path."""
    import mtgs_tpu  # noqa: F401  (conftest imported it already)

    assert jax.config.jax_default_matmul_precision == "highest"


def test_matmul_precision_canary():
    """Numerical canary: a f32 matmul must agree with the f64 oracle to
    ~f32 accuracy. Under TPU default (one bf16 pass) the relative error
    is ~1e-2 — on CPU this documents intent; on TPU it fails if the
    highest-precision pin is ever dropped."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal((192, 192)).astype(np.float32)
    b = rng.standard_normal((192, 192)).astype(np.float32)
    got = np.asarray(jnp.asarray(a) @ jnp.asarray(b))
    want = a.astype(np.float64) @ b.astype(np.float64)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5, rel


def test_ssim_matches_f64_window():
    """The shifted-add SSIM must track a straight f64 implementation to
    f32 accuracy regardless of the matmul-precision setting (the conv
    lowering under one-pass bf16 was campaign-NaN cause #2: variance
    estimates crossing the C2 stabilizer on flat regions)."""
    rng = np.random.default_rng(1)
    H = W = 48
    x = rng.random((H, W, 3)).astype(np.float32)
    # near-flat second image: the adversarial regime for the variance
    # estimator (tiny sigma^2 against the C2 = 9e-4 stabilizer)
    y = np.full((H, W, 3), 0.5, np.float32) + 1e-3 * rng.standard_normal(
        (H, W, 3)).astype(np.float32)

    got = float(loss_lib.ssim(jnp.asarray(x), jnp.asarray(y)))

    # f64 oracle with the same separable window / VALID conv semantics
    win = np.asarray(loss_lib._gauss_win(11, 1.5), np.float64)

    def filt(im):
        out = np.zeros((H - 10, W, 3))
        for i in range(11):
            out += win[i] * im[i:i + H - 10]
        out2 = np.zeros((H - 10, W - 10, 3))
        for i in range(11):
            out2 += win[i] * out[:, i:i + W - 10]
        return out2

    xf, yf = x.astype(np.float64), y.astype(np.float64)
    mu1, mu2 = filt(xf), filt(yf)
    s11 = filt(xf * xf) - mu1 * mu1
    s22 = filt(yf * yf) - mu2 * mu2
    s12 = filt(xf * yf) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + C1) / (mu1 ** 2 + mu2 ** 2 + C1)) * (
        (2 * s12 + C2) / (s11 + s22 + C2))
    want = float(m.mean())
    assert abs(got - want) < 1e-4, (got, want)
