"""Checkpointing: orbax round-trip + reference torch-checkpoint import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_torch_checkpoint_import(tmp_path):
    torch = pytest.importorskip("torch")
    from mtgs_tpu.train.checkpoint import import_torch_checkpoint, node_from_torch_params

    n, T, K = 100, 2, 16
    rng = np.random.default_rng(0)
    state = {
        "_model.gaussian_models.background.gauss_params.means": torch.tensor(
            rng.normal(size=(n, 3)).astype(np.float32)),
        "_model.gaussian_models.background.gauss_params.scales": torch.tensor(
            rng.normal(size=(n, 3)).astype(np.float32)),
        "_model.gaussian_models.background.gauss_params.quats": torch.tensor(
            rng.normal(size=(n, 4)).astype(np.float32)),
        "_model.gaussian_models.background.gauss_params.features_dc": torch.tensor(
            rng.normal(size=(n, 3)).astype(np.float32)),
        "_model.gaussian_models.background.gauss_params.features_rest": torch.tensor(
            rng.normal(size=(n, T, K - 1, 3)).astype(np.float32)),
        "_model.gaussian_models.background.gauss_params.opacities": torch.tensor(
            rng.normal(size=(n, 1)).astype(np.float32)),
        "_model.gaussian_models.background.gauss_params.features_adapters": torch.tensor(
            rng.normal(size=(n, T, 3)).astype(np.float32)),
        "_model.gaussian_models.vehicle-abc.gauss_params.means": torch.tensor(
            rng.normal(size=(20, 3)).astype(np.float32)),
        "_model.gaussian_models.vehicle-abc.instance_quats": torch.tensor(
            rng.normal(size=(5, 4)).astype(np.float32)),
        "_model.gaussian_models.vehicle-abc.instance_trans": torch.tensor(
            rng.normal(size=(5, 3)).astype(np.float32)),
        "_model.camera_optimizer.pose_adjustment": torch.tensor(
            rng.normal(size=(8, 6)).astype(np.float32)),
    }
    path = tmp_path / "step-000010000.ckpt"
    torch.save({"pipeline": state, "step": 10000}, path)

    out = import_torch_checkpoint(path)
    assert out["step"] == 10000
    assert set(out["nodes"]) == {"background", "vehicle-abc"}
    bg = out["nodes"]["background"]
    assert bg["features_adapters"].shape == (n, T, 3)
    assert out["nodes"]["vehicle-abc"]["instance_quats"].shape == (5, 4)
    assert out["camera_opt"].shape == (8, 6)

    params, aux = node_from_torch_params(bg)
    assert params.capacity >= n
    assert int(aux.num_alive) == n
    assert params.multicolor and params.multi_feature_rest
    np.testing.assert_allclose(np.asarray(params.means[:n]), bg["means"])


def test_orbax_roundtrip(tmp_path):
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.train import control as ctrl
    from mtgs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from mtgs_tpu.train.trainer import TrainState

    scene = make_synthetic_scene(seed=0, width=32, height=32, n_travels=2,
                                 n_frames=2, n_bg=100, n_instance=30)
    params, aux = build_scene_model(scene)
    state = TrainState(
        params=params,
        opt_state=None,
        densify={"background": ctrl.DensifyState.zeros(params.background.capacity)},
        step=jnp.asarray(7, jnp.int32),
        key=jax.random.key(0),
    )
    save_checkpoint(tmp_path / "ck", state, aux, keep_optimizer=False)

    template = {
        "params": jax.tree.map(np.zeros_like, params),
        "densify": jax.tree.map(np.zeros_like, state.densify),
        "step": np.zeros((), np.int32),
        "aux": jax.tree.map(np.zeros_like, aux),
    }
    restored = load_checkpoint(tmp_path / "ck", template)
    assert int(restored["step"]) == 7
    np.testing.assert_allclose(
        np.asarray(restored["params"].background.means),
        np.asarray(params.background.means),
    )
    np.testing.assert_allclose(
        np.asarray(restored["aux"].background.alive),
        np.asarray(aux.background.alive),
    )


def test_partial_restore_params_only(tmp_path):
    """Render/viewer tools reload only params+aux from a full training
    checkpoint (load_checkpoint_partial)."""
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.train import control as ctrl
    from mtgs_tpu.train.checkpoint import (
        load_checkpoint_partial, save_checkpoint)
    from mtgs_tpu.train.trainer import TrainState

    scene = make_synthetic_scene(seed=1, width=32, height=32, n_travels=1,
                                 n_frames=2, n_bg=80, n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    state = TrainState(
        params=params,
        opt_state=None,
        densify={"background": ctrl.DensifyState.zeros(params.background.capacity)},
        step=jnp.asarray(3, jnp.int32),
        key=jax.random.key(0),
    )
    save_checkpoint(tmp_path / "ck", state, aux, keep_optimizer=False)

    template = {
        "params": jax.tree.map(np.zeros_like, params),
        "aux": jax.tree.map(np.zeros_like, aux),
    }
    restored = load_checkpoint_partial(tmp_path / "ck", template)
    np.testing.assert_allclose(
        np.asarray(restored["params"].background.means),
        np.asarray(params.background.means))
    np.testing.assert_allclose(
        np.asarray(restored["aux"].background.alive),
        np.asarray(aux.background.alive))


def test_rotating_checkpoint_retention(tmp_path):
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.train import control as ctrl
    from mtgs_tpu.train.checkpoint import save_checkpoint_rotating
    from mtgs_tpu.train.trainer import TrainState

    scene = make_synthetic_scene(seed=0, width=32, height=32, n_travels=1,
                                 n_frames=2, n_bg=50, n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    state = TrainState(
        params=params, opt_state=None,
        densify={"background": ctrl.DensifyState.zeros(params.background.capacity)},
        step=jnp.asarray(0, jnp.int32), key=jax.random.key(0))
    for s in (100, 200, 300):
        save_checkpoint_rotating(tmp_path, state, aux, s, keep=1,
                                 keep_optimizer=False)
    left = sorted(p.name for p in tmp_path.glob("step-*"))
    assert left == ["step-000000300"]


def test_scene_from_torch_checkpoint_end_to_end(tmp_path):
    """Full reference-schema checkpoint (background multicolor + skybox +
    two rigid instances, one with Fourier dc) -> SceneParams -> RENDER:
    the import half of the released-checkpoint parity gate."""
    torch = pytest.importorskip("torch")
    from mtgs_tpu.train.checkpoint import scene_from_torch_checkpoint
    from mtgs_tpu.train.trainer import Batch, TrainerConfig, render_view

    rng = np.random.default_rng(1)
    T, K = 2, 16

    def gp(prefix, n, *, multicolor=False, fourier=0):
        d = {
            f"{prefix}.means": rng.normal(0, 3, (n, 3)),
            f"{prefix}.scales": rng.normal(-2.0, 0.3, (n, 3)),
            f"{prefix}.quats": rng.normal(size=(n, 4)),
            f"{prefix}.features_dc": (
                rng.normal(0, 0.3, (n, fourier, 3)) if fourier
                else rng.normal(0, 0.3, (n, 3))),
            f"{prefix}.features_rest": rng.normal(0, 0.01, (n, K - 1, 3)),
            f"{prefix}.opacities": rng.normal(2.0, 0.5, (n, 1)),
        }
        if multicolor:
            d[f"{prefix}.features_adapters"] = rng.normal(0, 0.1, (n, T, 3))
        return d

    state = {}
    state.update(gp("_model.gaussian_models.background.gauss_params", 500,
                    multicolor=True))
    state.update(gp("_model.gaussian_models.skybox.gauss_params", 200,
                    multicolor=True))
    state.update(gp("_model.gaussian_models.vehicle-a.gauss_params", 60))
    state.update(gp("_model.gaussian_models.vehicle-b.gauss_params", 40,
                    fourier=4))
    F = 3
    for name in ("vehicle-a", "vehicle-b"):
        q = rng.normal(size=(F, 4))
        t = rng.normal(0, 2, (F, 3))
        if name == "vehicle-b":
            t[2, 2] = 1e5  # parked off-frame
        state[f"_model.gaussian_models.{name}.instance_quats"] = q
        state[f"_model.gaussian_models.{name}.instance_trans"] = t
    state["_model.appearance_model.exposure_params"] = np.tile(
        np.eye(3, 4, dtype=np.float32), (8, 1, 1))
    state["_model.camera_optimizer.pose_adjustment"] = np.zeros((6, 6))
    state = {k: torch.tensor(np.asarray(v, np.float32)) for k, v in state.items()}

    path = tmp_path / "step-000030000.ckpt"
    torch.save({"pipeline": state, "step": 30000}, path)

    params, aux, step = scene_from_torch_checkpoint(path)
    assert step == 30000
    assert params.background.multicolor
    assert params.skybox is not None
    assert params.instances.node.means.shape[0] == 2
    assert params.instances.node.fourier  # lifted to common F_dim
    np.testing.assert_allclose(np.asarray(aux.instances.present[1, 2]), 0.0)
    np.testing.assert_allclose(np.asarray(aux.instances.present[0]), 1.0)

    # render a frame through the standard path
    H = W = 64
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 10.0  # pull back so the cloud is in front (camera looks -z)
    batch = Batch(
        image=jnp.zeros((H, W, 3)), mask=jnp.ones((H, W, 1)),
        c2w=jnp.asarray(c2w),
        K=jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1.0]]),
        cam_idx=jnp.asarray(0), image_idx=jnp.asarray(0),
        travel_index=jnp.asarray(0), frame_idx=jnp.asarray(0),
        timestamp=jnp.asarray(0.2),
    )
    cfg = TrainerConfig(width=W, height=H, max_intersections=1 << 14,
                        backend="xla", predict_normals=False)
    out = render_view(params, aux, cfg, batch, jnp.asarray(30000),
                      training=False)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert float(out["accumulation"].max()) > 0.1
