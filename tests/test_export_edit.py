"""Gaussian export formats + scene-edit (translate/rotate instances).

Contracts from the reference (OpenDriveLab/MTGS): the viewer export
panel (`mtgs/custom_viewer/export_panel.py` — splat/ply/point-cloud) and
rigid-node scene editing (`rigid_node.py:398-421`).
"""

import numpy as np
import jax.numpy as jnp

from mtgs_tpu.core.quat import quat_rotate
from mtgs_tpu.models.gaussians import init_node_from_points
from mtgs_tpu.tools.export import (
    export_ply,
    export_point_cloud,
    export_splat,
    read_gaussian_ply,
)


def _node(n=32, T=0, seed=0):
    rng = np.random.default_rng(seed)
    return init_node_from_points(
        rng.normal(size=(n, 3)).astype(np.float32) * 5,
        rng.uniform(0, 255, (n, 3)).astype(np.float32),
        num_traversals=T,
        capacity=n + 16,  # padded: export must keep only active rows
    )


def test_ply_roundtrip(tmp_path):
    node, aux = _node()
    n = int(aux.num_alive)
    path = export_ply(node, aux, tmp_path / "g.ply")
    back = read_gaussian_ply(path)
    assert back["means"].shape == (n, 3)
    np.testing.assert_allclose(back["means"], np.asarray(node.means[:n]), rtol=1e-6)
    np.testing.assert_allclose(back["scales"], np.asarray(node.scales[:n]), rtol=1e-6)
    np.testing.assert_allclose(back["quats"], np.asarray(node.quats[:n]), rtol=1e-6)
    np.testing.assert_allclose(
        back["opacities"], np.asarray(node.opacities[:n]), rtol=1e-6)
    np.testing.assert_allclose(
        back["features_dc"], np.asarray(node.features_dc[:n]), rtol=1e-6)
    if "features_rest" in back:
        np.testing.assert_allclose(
            back["features_rest"], np.asarray(node.features_rest[:n]),
            rtol=1e-6)


def test_splat_record_layout(tmp_path):
    node, aux = _node()
    n = int(aux.num_alive)
    path = export_splat(node, aux, tmp_path / "g.splat")
    raw = path.read_bytes()
    assert len(raw) == 32 * n  # 3f pos + 3f scale + 4B rgba + 4B quat
    rec0 = np.frombuffer(raw[:24], "<f4")
    assert np.isfinite(rec0).all()
    alpha = raw[31 - 4]  # rgba alpha byte of record 0
    assert 0 <= alpha <= 255


def test_point_cloud_export(tmp_path):
    node, aux = _node()
    n = int(aux.num_alive)
    path = export_point_cloud(node, aux, tmp_path / "pc.ply")
    data = path.read_bytes()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    assert f"element vertex {n}".encode() in data[:header_end]
    assert len(data) - header_end == n * (12 + 3)


def test_translate_rotate_instance():
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.models.scene_graph import (
        rotate_instance, translate_instance)

    scene = make_synthetic_scene(
        seed=0, width=32, height=32, n_travels=1, n_frames=2, n_bg=64,
        n_instance=1)
    params, aux = build_scene_model(scene, with_instances=True)
    assert params.instances is not None

    moved = translate_instance(params, 0, [1.0, -2.0, 0.5])
    np.testing.assert_allclose(
        np.asarray(moved.instances.trans - params.instances.trans)[0],
        np.tile([1.0, -2.0, 0.5], (params.instances.trans.shape[1], 1)),
        atol=1e-6,
    )

    # 90 deg about z: local x axis maps to world y under the new pose
    qz = jnp.asarray([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], jnp.float32)
    rot = rotate_instance(params, 0, qz)
    x_local = jnp.asarray([1.0, 0, 0])
    before = quat_rotate(params.instances.quats[0, 0], x_local)
    after = quat_rotate(rot.instances.quats[0, 0], x_local)
    expect = quat_rotate(qz, before)
    np.testing.assert_allclose(np.asarray(after), np.asarray(expect), atol=1e-5)
    # translations untouched (rotation about the instance center)
    np.testing.assert_allclose(
        np.asarray(rot.instances.trans), np.asarray(params.instances.trans))
