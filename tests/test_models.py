"""Scene-graph node semantics: multicolor fallbacks, rigid poses,
Fourier features, deformation MLP, exposure appearance.

Behavior contracts from the reference (OpenDriveLab/MTGS):
  * `multi_color_gaussian_splatting.py:77-117` — per-traversal adapters
    + unseen-traversal eval fallbacks.
  * `rigid_node.py:94-166` — frame gating, static single-pose mode,
    slerp interpolation by timestamp.
  * `rigid_node.py:168-236` — finite-difference velocities, IDFT colors.
  * `deformable_node.py:173-201` — deform MLP offsets.
  * `module/appearance.py:73-87` — affine exposure.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mtgs_tpu.models import fourier
from mtgs_tpu.models.appearance import apply_exposure, init_exposure
from mtgs_tpu.models.deform import apply_deform, init_deform_mlp
from mtgs_tpu.models.gaussians import init_node_from_points, init_skybox_node
from mtgs_tpu.models.scene_graph import (
    InstanceAux,
    SceneConfig,
    ViewInputs,
    _instance_pose,
    _multicolor_features,
)


def _mc_node(n=8, T=3, seed=0):
    rng = np.random.default_rng(seed)
    p, aux = init_node_from_points(
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.uniform(0, 255, (n, 3)).astype(np.float32),
        num_traversals=T,
        capacity=n,
    )
    p = p.replace(
        features_adapters=jnp.asarray(rng.normal(size=(n, T, 3)), jnp.float32)
    )
    return p, aux


def test_multicolor_modes():
    p, _ = _mc_node()
    dc0, _ = _multicolor_features(p, jnp.asarray(0), "index")
    dc1, _ = _multicolor_features(p, jnp.asarray(1), "index")
    assert not np.allclose(dc0, dc1)
    np.testing.assert_allclose(
        np.asarray(dc0), np.asarray(p.features_dc + p.features_adapters[:, 0]), rtol=1e-6
    )
    dcm, _ = _multicolor_features(p, jnp.asarray(0), "mean")
    np.testing.assert_allclose(
        np.asarray(dcm),
        np.asarray(p.features_dc + p.features_adapters.mean(axis=1)),
        rtol=1e-6,
    )
    dcn, restn = _multicolor_features(p, jnp.asarray(0), "null")
    np.testing.assert_allclose(np.asarray(dcn), np.asarray(p.features_dc))


def _inst_aux(I=2, F=4):
    return InstanceAux(
        alive=jnp.ones((I, 4)),
        num_alive=jnp.full((I,), 4, jnp.int32),
        present=jnp.asarray([[1, 1, 0, 1], [1, 1, 1, 1]], jnp.float32),
        is_static=jnp.asarray([0.0, 0.0]),
        frame_timestamps=jnp.asarray([0.0, 0.25, 0.5, 0.75]),
        travel_of_frame=jnp.zeros((F,), jnp.int32),
        sizes=jnp.ones((I, 3)),
    )


def _poses(I=2, F=4):
    quats = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (I, F, 4))
    trans = jnp.arange(I * F * 3, dtype=jnp.float32).reshape(I, F, 3)
    return quats, trans


def _view(frame=0, t=0.0):
    return ViewInputs(
        travel_index=jnp.asarray(0),
        frame_idx=jnp.asarray(frame),
        timestamp=jnp.asarray(t, jnp.float32),
        cam_pos=jnp.zeros(3),
        sh_mask=jnp.ones(16),
    )


def test_instance_pose_gating_and_gather():
    quats, trans = _poses()
    aux = _inst_aux()
    q, t, gate = _instance_pose(quats, trans, aux, _view(frame=2), interp=False)
    # instance 0 absent from frame 2, instance 1 present
    np.testing.assert_allclose(np.asarray(gate), [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(t), np.asarray(trans[:, 2]))


def test_instance_pose_static_mode():
    """Static single-pose mode (ref rigid_node.py:100-104): pose pinned
    to the anchor (first present) row; visibility stays travel/frame
    gated by `present` (builders broadcast present=1 over the static
    instance's own traversal)."""
    quats, trans = _poses()
    # static instance 0: builders broadcast its mean pose + present=1
    # across its traversal rows
    aux = _inst_aux().replace(
        is_static=jnp.asarray([1.0, 0.0]),
        present=jnp.asarray([[1, 1, 1, 1], [1, 1, 1, 1]], jnp.float32),
    )
    q, t, gate = _instance_pose(quats, trans, aux, _view(frame=2), interp=False)
    # pinned to the anchor row's pose at every frame
    np.testing.assert_allclose(np.asarray(t[0]), np.asarray(trans[0, 0]))
    assert float(gate[0]) == 1.0
    np.testing.assert_allclose(np.asarray(t[1]), np.asarray(trans[1, 2]))
    # absent from the traversal (present=0 rows) -> gated off, pose from
    # its own anchor row, NOT forced visible at the origin
    aux2 = _inst_aux().replace(
        is_static=jnp.asarray([1.0, 0.0]),
        present=jnp.asarray([[0, 0, 0, 0], [1, 1, 1, 1]], jnp.float32),
    )
    _, _, gate2 = _instance_pose(quats, trans, aux2, _view(frame=2), interp=False)
    assert float(gate2[0]) == 0.0


def test_instance_pose_slerp_midpoint():
    quats, trans = _poses()
    aux = _inst_aux().replace(present=jnp.ones((2, 4)))
    # timestamp midway between frames 1 (0.25) and 2 (0.5)
    q, t, gate = _instance_pose(quats, trans, aux, _view(t=0.375), interp=True)
    expect = 0.5 * (trans[:, 1] + trans[:, 2])
    np.testing.assert_allclose(np.asarray(t), np.asarray(expect), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gate), [1.0, 1.0])


def test_fourier_dc_constant_and_varying():
    n, F_dim = 5, 4
    coeffs = np.zeros((n, F_dim, 3), np.float32)
    coeffs[:, 0, :] = 0.7  # the k=0 basis entry is cos(0)=1 — a dc term
    out0 = fourier.fourier_features_dc(jnp.asarray(coeffs), jnp.asarray(0.0))
    out1 = fourier.fourier_features_dc(jnp.asarray(coeffs), jnp.asarray(0.9))
    np.testing.assert_allclose(np.asarray(out0), 0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)
    coeffs[:, 1, :] = 0.3  # time-varying component
    o0 = fourier.fourier_features_dc(jnp.asarray(coeffs), jnp.asarray(0.0))
    o1 = fourier.fourier_features_dc(jnp.asarray(coeffs), jnp.asarray(0.25))
    assert not np.allclose(np.asarray(o0), np.asarray(o1))


def test_fourier_dc_wired_into_render_path():
    """Fourier coefficients on a rigid node change the COLLECTED colors
    over time (ref rigid_node.py:217-236 feeds get_fourier_features into
    the render); with only the k=0 coefficient they reproduce the static
    dc path exactly."""
    from mtgs_tpu.models.scene_graph import _collect_instances

    rng = np.random.default_rng(3)
    I, cap, F_dim = 1, 8, 4
    p, aux = init_node_from_points(
        rng.normal(size=(cap, 3)).astype(np.float32),
        rng.uniform(0, 255, (cap, 3)).astype(np.float32),
        capacity=cap, fourier_dim=F_dim,
    )
    # stack to [I, cap, ...]
    node = jax.tree.map(lambda a: a[None], p)
    alive = jnp.ones((I, cap))
    pose_q = jnp.asarray([[1.0, 0, 0, 0]])
    pose_t = jnp.zeros((I, 3))
    gate = jnp.ones((I,))

    def view(t):
        return ViewInputs(
            travel_index=jnp.asarray(0), frame_idx=jnp.asarray(0),
            timestamp=jnp.asarray(t), cam_pos=jnp.asarray([0.0, 0, 10.0]),
            sh_mask=jnp.ones((16,)),
        )

    # k=0-only coefficients: identical to the static dc path at any t
    *_, col_a = _collect_instances(node, alive, pose_q, pose_t, gate, view(0.1))
    static_node = node.replace(fourier_dc=jnp.zeros((I, cap, 0, 3)))
    *_, col_static = _collect_instances(
        static_node, alive, pose_q, pose_t, gate, view(0.1))
    np.testing.assert_allclose(np.asarray(col_a), np.asarray(col_static), atol=1e-6)

    # a trained harmonic changes rendered color over time
    coeffs = np.array(node.fourier_dc)
    coeffs[:, :, 1, :] = 0.4
    node = node.replace(fourier_dc=jnp.asarray(coeffs))
    *_, c0 = _collect_instances(node, alive, pose_q, pose_t, gate, view(0.0))
    *_, c1 = _collect_instances(node, alive, pose_q, pose_t, gate, view(0.25))
    assert not np.allclose(np.asarray(c0), np.asarray(c1))


def test_instance_velocities_linear_motion():
    I, F, cap = 1, 4, 3
    quats = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (I, F, 4))
    # constant velocity +2/s in x
    ts = jnp.asarray([0.0, 0.5, 1.0, 1.5])
    trans = jnp.stack(
        [jnp.stack([2.0 * ts, jnp.zeros_like(ts), jnp.zeros_like(ts)], -1)]
    )
    means_local = jnp.zeros((I, cap, 3))
    v = fourier.instance_velocities(quats, trans, ts, jnp.asarray(1), means_local)
    np.testing.assert_allclose(np.asarray(v[..., 0]), 2.0, atol=1e-5)
    # one-sided at the trajectory start
    v0 = fourier.instance_velocities(quats, trans, ts, jnp.asarray(0), means_local)
    np.testing.assert_allclose(np.asarray(v0[..., 0]), 2.0, atol=1e-5)


def test_deform_mlp_gating_shapes():
    key = jax.random.key(0)
    mlp = init_deform_mlp(key, embed_dim=16)
    I, cap = 2, 6
    means = jax.random.normal(jax.random.key(1), (I, cap, 3))
    emb = jax.random.normal(jax.random.key(2), (I, 16)) * 0.01
    dxyz, dquat, dscale = apply_deform(
        mlp, means, emb, jnp.asarray(0.3), xyz_bound=4.0
    )
    assert dxyz.shape == (I, cap, 3)
    assert dquat.shape == (I, cap, 4)
    assert dscale.shape == (I, cap, 3)
    for a in (dxyz, dquat, dscale):
        assert np.isfinite(np.asarray(a)).all()
    # time-conditioned: different timestamps move the offsets
    dxyz2, _, _ = apply_deform(mlp, means, emb, jnp.asarray(0.9), xyz_bound=4.0)
    assert not np.allclose(np.asarray(dxyz), np.asarray(dxyz2))


def test_exposure_identity_and_affine():
    app = init_exposure(2)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 5, 3)), jnp.float32)
    out = apply_exposure(app, img, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-7)
    # scale red x0.5 via camera-1 affine
    app = app.at[1, 0, 0].set(0.5)
    out1 = apply_exposure(app, img, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(out1[..., 0]), np.asarray(img[..., 0]) * 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1[..., 1:]), np.asarray(img[..., 1:]), atol=1e-7)


def test_skybox_init_shell():
    p, aux = init_skybox_node(num_points=512, radius=1000.0, num_traversals=2, seed=0)
    n = int(aux.num_alive)
    means = np.asarray(p.means[:n])
    r = np.linalg.norm(means, axis=-1)
    assert (r > 900).all() and (r < 1100).all()
    # phi in [pi/4, pi/2]: z = r cos(phi) in [0, r/sqrt(2)]
    assert (means[:, 2] >= -1e-3).all()
    assert (means[:, 2] <= r / np.sqrt(2) + 1e-3).all()
    # white init: dc SH of 1.0 rgb
    from mtgs_tpu.core.sh import rgb_to_sh

    np.testing.assert_allclose(
        np.asarray(p.features_dc[:n]), float(rgb_to_sh(jnp.asarray(1.0))), atol=1e-5
    )


def test_gaussian_marbles_isotropic():
    """scale_dim=1 marbles variant (ref vanilla_gaussian_splatting.py:
    74-79,185-196): one tied log-scale, broadcast at activation, and
    densify control ops stay shape-correct."""
    from mtgs_tpu.models.gaussians import get_scales
    from mtgs_tpu.train import control as ctrl

    rng = np.random.default_rng(0)
    p, aux = init_node_from_points(
        rng.normal(size=(32, 3)).astype(np.float32) * 3,
        rng.uniform(0, 255, (32, 3)).astype(np.float32),
        capacity=64, isotropic=True)
    assert p.scales.shape == (64, 1)
    s = get_scales(p)
    assert s.shape == (64, 3)
    np.testing.assert_allclose(np.asarray(s[:, 0]), np.asarray(s[:, 1]))

    # densify/cull ops accept the tied column
    key = jax.random.key(0)
    st = ctrl.DensifyState.zeros(64)
    st = st.replace(xys_grad_norm=jnp.full((64,), 1.0),
                    vis_counts=jnp.ones((64,)))
    out = ctrl.refine_node(
        key, p, aux, jax.tree.map(jnp.zeros_like, p),
        jax.tree.map(jnp.zeros_like, p), st,
        ctrl.ControlConfig(), jnp.asarray(600, jnp.int32),
        do_densify=True, do_cull_big=False, use_screen_size=False)
    assert out.params.scales.shape == (64, 1)
