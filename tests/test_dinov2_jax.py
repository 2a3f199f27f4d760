"""Pure-JAX DINOv2 forward vs a locally-built transformers reference.

No pretrained weights exist in this container, but `transformers` can
CONSTRUCT a randomly-initialized `Dinov2Model` offline — the strongest
available cross-check: convert its state dict with
`convert_transformers` and require the jnp forward to match the torch
forward on the same input.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mtgs_tpu.eval.dinov2_jax import convert_transformers, dinov2_forward


@pytest.fixture(scope="module")
def small_model():
    torch = pytest.importorskip("torch")
    tr = pytest.importorskip("transformers")
    cfg = tr.Dinov2Config(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        image_size=28, patch_size=14,
    )
    torch.manual_seed(0)
    model = tr.Dinov2Model(cfg)
    model.eval()
    return torch, model


def test_forward_matches_transformers(small_model):
    torch, model = small_model
    rng = np.random.default_rng(1)
    img = rng.normal(size=(28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model(
            pixel_values=torch.from_numpy(img).permute(2, 0, 1)[None]
        ).last_hidden_state[0, 1:].numpy()

    weights = {k: jnp.asarray(v) for k, v in convert_transformers(model).items()}
    out = np.asarray(dinov2_forward(weights, jnp.asarray(img)))
    assert out.shape == ref.shape == (4, 32)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_weights_drop_readiness(tmp_path, small_model, monkeypatch):
    """Writing an npz makes `load_weights` return a usable tree (the
    runtime probe path), and identical images score cosine ~1."""
    from mtgs_tpu.eval import dinov2_jax

    torch, model = small_model
    np.savez(tmp_path / "w.npz", **convert_transformers(model))
    monkeypatch.setenv("MTGS_DINOV2_WEIGHTS", str(tmp_path / "w.npz"))
    weights = dinov2_jax.load_weights()
    assert weights is not None and "L2_ls2" in weights

    img = jnp.asarray(
        np.random.default_rng(2).normal(size=(28, 28, 3)).astype(np.float32))
    f = dinov2_forward(weights, img)
    cos = np.asarray(
        jnp.sum(f * f, -1) / jnp.maximum(jnp.linalg.norm(f, axis=-1) ** 2, 1e-8))
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_grid_mismatch_raises(small_model):
    torch, model = small_model
    weights = {k: jnp.asarray(v) for k, v in convert_transformers(model).items()}
    with pytest.raises(AssertionError):
        dinov2_forward(weights, jnp.zeros((56, 56, 3), jnp.float32))
