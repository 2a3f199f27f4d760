"""End-to-end training on a synthetic multi-traversal scene.

Validates the full stack — scene graph, rasterizer VJP, losses,
per-group Adam, densify/cull refinement — by checking PSNR rises while
fitting a procedurally generated ground truth (no nuPlan data needed).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgs_tpu.data.synthetic import batch_iterator, build_scene_model, make_synthetic_scene
from mtgs_tpu.train import control as ctrl
from mtgs_tpu.train import losses as loss_lib
from mtgs_tpu.train.trainer import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(
        seed=0, width=64, height=64, n_travels=2, n_frames=3,
        n_bg=500, n_instance=80,
    )


def make_trainer(scene, **over):
    params, aux = build_scene_model(scene, with_instances=True)
    base = dict(
        width=scene.width,
        height=scene.height,
        max_intersections=1 << 14,
        max_steps=400,
        backend="xla",
        rasterize_mode="antialiased",
        predict_normals=True,
        control=ctrl.ControlConfig(
            densify_from_iter=40,
            refine_every=60,
            stop_split_at=300,
            reset_alpha_every=1000,  # no reset within the short test
            sh_degree_interval=20,
            densify_grad_thresh=0.004,  # 64x64 test image: be selective
        ),
        loss=loss_lib.LossConfig(
            ssim_lambda=0.2, depth_lambda=0.5, ncc_lambda=0.1,
            normal_lambda=0.1, use_normal_loss=True, use_normal_tv_loss=True,
        ),
    )
    base.update(over)
    cfg = TrainerConfig(**base)
    return Trainer(cfg, params, aux, batch_iterator(scene))


def test_training_improves_psnr(scene):
    # no refinement inside the window: a clean convergence signal
    trainer = make_trainer(
        scene,
        control=ctrl.ControlConfig(densify_from_iter=10_000, sh_degree_interval=20),
    )
    hist = trainer.train(60, log_every=20)
    psnr_start = float(np.mean([float(h["psnr"]) for h in hist[:5]]))
    psnr_end = float(np.mean([float(h["psnr"]) for h in hist[-5:]]))
    assert psnr_end > psnr_start + 2.0, f"{psnr_start=} {psnr_end=}"
    for h in hist:
        for k, v in h.items():
            assert np.isfinite(float(v)), f"{k} not finite"


def test_refine_keeps_training_sane(scene):
    # crosses the refine boundary: population changes, state stays finite,
    # alive rows stay front-compacted, training continues to descend
    trainer = make_trainer(scene)
    n0 = int(jnp.sum(trainer.aux.background.alive))
    hist = trainer.train(80, log_every=20)
    assert int(trainer.state.step) == 80
    for h in hist:
        for k, v in h.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    n1 = int(jnp.sum(trainer.aux.background.alive))
    assert n1 != n0
    alive = np.asarray(trainer.aux.background.alive)
    k = int(alive.sum())
    assert alive[:k].all() and not alive[k:].any()
    # loss after the refine keeps decreasing
    post = [float(h["total_loss"]) for h in hist[62:]]
    assert post[-1] < post[0]


def test_sh_degree_mask():
    cfg = ctrl.ControlConfig(sh_degree_interval=100, sh_degree=3)
    m0 = np.asarray(ctrl.sh_degree_mask(jnp.asarray(0), cfg))
    assert m0[0] == 1 and m0[1:].sum() == 0
    m1 = np.asarray(ctrl.sh_degree_mask(jnp.asarray(150), cfg))
    assert m1[:4].sum() == 4 and m1[4:].sum() == 0
    m3 = np.asarray(ctrl.sh_degree_mask(jnp.asarray(1000), cfg))
    assert m3.sum() == 16


def test_wild_gaussians_training(scene):
    """WildGaussians baseline: per-image appearance MLP path trains and
    its parameters receive gradients (ref `mtgs/config/WildGaussians.py`)."""
    from mtgs_tpu.data.synthetic import build_scene_model
    from mtgs_tpu.train.trainer import Trainer, TrainerConfig
    from mtgs_tpu.data.synthetic import batch_iterator

    params, aux = build_scene_model(scene, with_instances=False, wild_appearance=True)
    assert params.wild is not None
    emb0 = np.asarray(params.wild.embeddings).copy()
    cfg = TrainerConfig(
        width=scene.width, height=scene.height, max_intersections=1 << 14,
        backend="xla", predict_normals=False,
        control=ctrl.ControlConfig(densify_from_iter=10_000, sh_degree_interval=20),
    )
    trainer = Trainer(cfg, params, aux, batch_iterator(scene))
    hist = trainer.train(30, log_every=10)
    p0 = float(np.mean([float(h["psnr"]) for h in hist[:5]]))
    p1 = float(np.mean([float(h["psnr"]) for h in hist[-5:]]))
    assert p1 > p0 + 1.0, (p0, p1)
    emb1 = np.asarray(trainer.state.params.wild.embeddings)
    assert not np.allclose(emb0, emb1)  # wild params actually optimized


def test_resolution_ladder_stage_switch():
    """Multi-resolution training ladder (ref custom_datamanager.py:
    143-152): re-jit at each stage boundary, batches follow the scale."""
    def scene_at(s):
        return make_synthetic_scene(
            seed=0, width=int(64 * s), height=int(64 * s), n_travels=1,
            n_frames=2, n_bg=300, n_instance=0)

    base_scene = scene_at(1.0)
    params, aux = build_scene_model(base_scene, with_instances=False)
    cfg = TrainerConfig(
        width=64, height=64, max_intersections=1 << 14, max_steps=60,
        backend="xla", predict_normals=False,
        control=ctrl.ControlConfig(densify_from_iter=10**9),
    )
    seen_sizes = []

    def factory(scale):
        seen_sizes.append(scale)
        return batch_iterator(scene_at(scale))

    trainer = Trainer(
        cfg, params, aux, batch_iterator(base_scene),
        data_factory=factory,
        resolution_stages=[(0, 0.5), (8, 1.0)],
    )
    hist = trainer.train(12, log_every=1000)
    assert seen_sizes == [0.5, 1.0]
    assert trainer.cfg.width == 64 and trainer._cur_scale == 1.0
    losses = [float(h["total_loss"]) for h in hist]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_checkpoint_resume_continues_training(scene, tmp_path):
    """Full-state resume (params+optimizer+densify+step): the
    reference's `_load_checkpoint` behavior (custom_trainer.py:183-212)."""
    from mtgs_tpu.data.synthetic import batch_iterator
    from mtgs_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    t1 = make_trainer(scene)
    t1.train(3)
    save_checkpoint(tmp_path / "ck", t1.state, t1.aux)

    t2 = make_trainer(scene)
    template = {
        "params": jax.tree.map(np.zeros_like, t2.state.params),
        "densify": jax.tree.map(np.zeros_like, t2.state.densify),
        "step": np.zeros((), np.int32),
        "aux": jax.tree.map(np.zeros_like, t2.aux),
        "opt_state": jax.tree.map(np.zeros_like, t2.state.opt_state),
    }
    restored = load_checkpoint(tmp_path / "ck", template)
    t2.state = t2.state.replace(
        params=restored["params"], densify=restored["densify"],
        step=jnp.asarray(restored["step"], jnp.int32),
        opt_state=restored["opt_state"])
    t2.aux = restored["aux"]
    assert int(t2.state.step) == 3
    hist = t2.train(2)
    assert int(t2.state.step) == 5
    assert np.isfinite([float(h["total_loss"]) for h in hist]).all()


def test_screen_size_split_requires_high_grad():
    """Ref vanilla_gaussian_splatting.py:500-516: `splits &= high_grads`
    applies to the screen-size criterion too — converged oversize splats
    must not re-split."""
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene

    scene = make_synthetic_scene(seed=0, width=32, height=32, n_travels=1,
                                 n_frames=1, n_bg=50, n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    cap = params.background.capacity
    n = int(aux.background.num_alive)

    st = ctrl.DensifyState.zeros(cap)
    st = st.replace(
        vis_counts=jnp.ones((cap,)),
        xys_grad_norm=jnp.zeros((cap,)),          # zero gradients
        max_2dsize=jnp.full((cap,), 500.0),       # huge on screen
    )
    out = ctrl.refine_node(
        jax.random.key(0), params.background, aux.background,
        jax.tree.map(jnp.zeros_like, params.background),
        jax.tree.map(jnp.zeros_like, params.background),
        st, ctrl.ControlConfig(), jnp.asarray(600, jnp.int32),
        do_densify=True, do_cull_big=False, use_screen_size=True)
    # no splits: population unchanged (nothing added, nothing culled)
    assert int(out.aux.num_alive) == n


def test_densify_children_respect_alpha_cull():
    """Children of sub-cull-alpha parents are not emitted (the
    reference culls the concatenated set in the same pass)."""
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene

    scene = make_synthetic_scene(seed=0, width=32, height=32, n_travels=1,
                                 n_frames=1, n_bg=50, n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    node = params.background
    cap = node.capacity
    # all parents below the alpha cull threshold but with huge gradients
    node = node.replace(opacities=jnp.full((cap, 1), -8.0))
    st = ctrl.DensifyState.zeros(cap)
    st = st.replace(vis_counts=jnp.ones((cap,)),
                    xys_grad_norm=jnp.full((cap,), 10.0))
    out = ctrl.refine_node(
        jax.random.key(0), node, aux.background,
        jax.tree.map(jnp.zeros_like, node), jax.tree.map(jnp.zeros_like, node),
        st, ctrl.ControlConfig(), jnp.asarray(600, jnp.int32),
        do_densify=True, do_cull_big=False, use_screen_size=False)
    assert int(out.aux.num_alive) == 0  # all culled, no children emitted


def test_refine_node_grows_capacity():
    """refine_node with out_cap > cap emits every candidate into the
    larger arrays: no overflow, kept rows carry their Adam moments
    (the reference's reallocation + `dup_in_optim` surgery,
    vanilla_gaussian_splatting.py:392-446,635-699)."""
    from mtgs_tpu.models.gaussians import init_node_from_points

    n, cap = 100, 128
    rng = np.random.default_rng(0)
    params, aux = init_node_from_points(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        rng.uniform(0, 255, (n, 3)).astype(np.float32),
        capacity=cap,
    )
    # rows 0..49 keep (low grad); rows 50..99 split (big scale, high grad)
    scales = np.array(params.scales)
    scales[50:n] = np.log(0.5)
    scales[:50] = np.log(0.01)
    params = params.replace(scales=jnp.asarray(scales))
    g = np.zeros(cap, np.float32)
    g[50:n] = 10.0
    st = ctrl.DensifyState.zeros(cap).replace(
        vis_counts=jnp.ones(cap), xys_grad_norm=jnp.asarray(g))
    # distinguishable Adam moments: row index in every means entry
    mu = jax.tree.map(jnp.zeros_like, params)
    mu = mu.replace(means=jnp.arange(cap, dtype=jnp.float32)[:, None]
                    * jnp.ones((1, 3)))
    cc = ctrl.ControlConfig()

    needed = int(ctrl.count_refine_candidates(
        params, aux, st, cc,
        do_densify=True, do_cull_big=False, use_screen_size=False))
    assert needed == 50 + 50 * cc.n_split_samples  # 150 > cap=128

    out = ctrl.refine_node(
        jax.random.key(0), params, aux, mu, jax.tree.map(jnp.zeros_like, params),
        st, cc, jnp.asarray(600, jnp.int32),
        do_densify=True, do_cull_big=False, use_screen_size=False,
        out_cap=256)
    assert out.params.capacity == 256
    assert int(out.overflow) == 0
    assert int(out.aux.num_alive) == needed
    # kept rows come first (stable partition) and carry their moments
    kept_mu = np.asarray(out.mu.means[:50, 0])
    np.testing.assert_allclose(kept_mu, np.arange(50, dtype=np.float32))
    # child rows get zeroed moments
    assert np.all(np.asarray(out.mu.means[50:]) == 0.0)
    # grown state buffers match the new capacity
    assert out.state.xys_grad_norm.shape == (256,)
    assert out.aux.alive.shape == (256,)


def test_trainer_auto_grows_capacity():
    """The Trainer grows node capacity past the seed allocation when
    densification fills it — the scene can grow unboundedly (VERDICT
    round-1 missing #1; ref vanilla_gaussian_splatting.py:635-699)."""
    scn = make_synthetic_scene(seed=0, width=48, height=48, n_travels=1,
                               n_frames=2, n_bg=300, n_instance=0)
    params, aux = build_scene_model(scn, with_instances=False)
    cap0 = params.background.capacity
    cfg = TrainerConfig(
        width=48, height=48, max_intersections=1 << 13, max_steps=100,
        backend="xla", predict_normals=False,
        grow_granule=1024,
        control=ctrl.ControlConfig(
            densify_from_iter=2, refine_every=3, stop_split_at=100,
            reset_alpha_every=1000, sh_degree_interval=10,
            densify_grad_thresh=1e-9,  # duplicate everything visible
            densify_size_thresh=1e9,   # force dup (not split) path
        ),
    )
    trainer = Trainer(cfg, params, aux, batch_iterator(scn))
    hist = trainer.train(24)
    assert trainer.state.params.background.capacity > cap0, (
        trainer.state.params.background.capacity, cap0)
    assert int(trainer.aux.background.num_alive) > cap0
    assert trainer.refine_overflow == 0
    assert any(e["node"] == "background" for e in trainer.growth_events)
    # optimizer + densify state followed the growth (consistent shapes)
    adam_state, _ = trainer.state.opt_state
    assert (adam_state.mu.background.means.shape
            == trainer.state.params.background.means.shape)
    assert (trainer.state.densify["background"].xys_grad_norm.shape[0]
            == trainer.state.params.background.capacity)
    # training remains sane across the growth re-jits
    for h in hist:
        assert np.isfinite(float(h["total_loss"]))


def test_deformable_training_and_refine():
    """Deformable nodes train, refine (densify stats consumed), and
    opacity-reset like every other gaussian model (ref
    mtgs_scene_graph.py:1143-1145 registers callbacks for all models)."""
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.models.deform import init_deform_mlp
    from mtgs_tpu.models.scene_graph import DeformableParams, InstanceAux

    scene = make_synthetic_scene(seed=0, width=48, height=48, n_travels=1,
                                 n_frames=2, n_bg=200, n_instance=40)
    params, aux = build_scene_model(scene, with_instances=True)
    # convert the rigid instance block into a deformable one
    inst, iaux = params.instances, aux.instances
    deform = DeformableParams(
        node=inst.node, quats=inst.quats, trans=inst.trans,
        embeddings=jnp.zeros((inst.node.means.shape[0], 16)),
        mlp=init_deform_mlp(jax.random.key(0)),
    )
    params = params.replace(instances=None, deformables=deform)
    aux = aux.replace(instances=None, deformables=iaux)

    cfg = TrainerConfig(
        width=48, height=48, max_intersections=1 << 13, max_steps=100,
        backend="xla", predict_normals=False,
        control=ctrl.ControlConfig(
            densify_from_iter=2, refine_every=4, stop_split_at=100,
            reset_alpha_every=2, sh_degree_interval=10,
            densify_grad_thresh=1e-6),  # aggressive: force densify
    )
    cfg = cfg.replace(scene=cfg.scene.replace(deform_enabled=True))
    trainer = Trainer(cfg, params, aux, batch_iterator(scene))
    n0 = int(trainer.aux.deformables.num_alive.sum())
    hist = trainer.train(10)
    losses = [float(h["total_loss"]) for h in hist]
    assert np.isfinite(losses).all()
    n1 = int(trainer.aux.deformables.num_alive.sum())
    assert n1 != n0  # refine actually touched the deformable population


def test_deformable_enable_schedule_and_canonical_freeze():
    """VERDICT r2 item 4 / ref `deformable_node.py:95-104,221-227`: the
    Trainer flips `scene.deform_enabled` at `deform_enable_step`
    (deformation inert before, active after) and the canonical xyz stop
    moving the moment deformation starts — render-path stop_gradient
    plus Adam-update zeroing, asserted as EXACT equality."""
    from mtgs_tpu.data.synthetic import build_scene_model, make_synthetic_scene
    from mtgs_tpu.models.deform import init_deform_mlp
    from mtgs_tpu.models.scene_graph import DeformableParams

    scene = make_synthetic_scene(seed=0, width=48, height=48, n_travels=1,
                                 n_frames=2, n_bg=200, n_instance=40)
    params, aux = build_scene_model(scene, with_instances=True)
    inst, iaux = params.instances, aux.instances
    deform = DeformableParams(
        node=inst.node, quats=inst.quats, trans=inst.trans,
        embeddings=jnp.zeros((inst.node.means.shape[0], 16)),
        mlp=init_deform_mlp(jax.random.key(0)),
    )
    params = params.replace(instances=None, deformables=deform)
    aux = aux.replace(instances=None, deformables=iaux)

    cfg = TrainerConfig(
        width=48, height=48, max_intersections=1 << 13, max_steps=100,
        backend="xla", predict_normals=False, deform_enable_step=4,
        control=ctrl.ControlConfig(densify_from_iter=10**9),
    )
    assert not cfg.scene.deform_enabled
    trainer = Trainer(cfg, params, aux, batch_iterator(scene))
    m_init = np.asarray(params.deformables.node.means)
    mlp_init = np.asarray(params.deformables.mlp.w[0])

    trainer.train(3)   # steps 0..2: deformation inert
    assert not trainer.cfg.scene.deform_enabled
    m_pre = np.asarray(trainer.state.params.deformables.node.means)
    alive = np.asarray(trainer.aux.deformables.alive[0]) > 0
    assert np.abs(m_pre[0][alive] - m_init[0][alive]).max() > 0, (
        "canonical means should still receive gradients before the flip")
    assert np.array_equal(
        np.asarray(trainer.state.params.deformables.mlp.w[0]),
        mlp_init), "deform MLP must be inert before the flip"

    trainer.train(2)   # step 3 pre-flip, step 4 flips then steps
    assert trainer.cfg.scene.deform_enabled
    m_flip = np.asarray(trainer.state.params.deformables.node.means)
    trainer.train(3)
    m_post = np.asarray(trainer.state.params.deformables.node.means)
    assert np.array_equal(m_flip, m_post), "canonical xyz moved post-flip"
    assert not np.array_equal(
        np.asarray(trainer.state.params.deformables.mlp.w[0]),
        mlp_init), "deform MLP should train once deformation is active"


def test_per_node_control_cascade():
    """Per-node control override cascade (ref `_update_gaussian_cfg`,
    mtgs_scene_graph.py:194-205): None inherits the global control; the
    skybox default drops the far-cull exemption."""
    cfg = TrainerConfig(width=32, height=32)
    assert cfg.node_control("background") is cfg.control
    sky = cfg.node_control("skybox")
    assert sky.far_dist == 1e8 and sky.far_scale_factor == 1.0
    assert sky.densify_grad_thresh == cfg.control.densify_grad_thresh

    override = ctrl.ControlConfig(densify_grad_thresh=123.0)
    cfg2 = cfg.replace(skybox_control=override, instances_control=override)
    assert cfg2.node_control("skybox") is override
    assert cfg2.node_control("instances") is override
    assert cfg2.node_control("deformables") is cfg2.control


def test_speculative_precompile_threads():
    """Speculative background compiles (ladder + growth + isect) must
    not perturb training: run a laddered trainer with speculation forced
    ON (CPU) and check the speculation keys got scheduled, steps stay
    finite, and results match a speculation-OFF run bit-for-bit."""
    import numpy as np

    from mtgs_tpu.data.synthetic import (
        batch_iterator, build_scene_model, make_synthetic_scene,
    )
    from mtgs_tpu.train import control as ctrl
    from mtgs_tpu.train.trainer import Trainer, TrainerConfig

    scene = make_synthetic_scene(seed=0, width=64, height=64, n_travels=1,
                                 n_frames=2, n_bg=260, n_instance=0,
                                 backend="xla")

    def factory(scale):
        # same data at every scale: enough to exercise the machinery
        return batch_iterator(scene, seed=3)

    def run(spec):
        params, aux = build_scene_model(scene, with_instances=False)
        cfg = TrainerConfig(
            width=64, height=64, max_intersections=1 << 11, max_steps=50,
            backend="xla", predict_normals=False, grow_granule=512,
            speculative_compile=spec, spec_frac=0.0,   # speculate eagerly
            control=ctrl.ControlConfig(
                densify_from_iter=1, refine_every=4, stop_split_at=100,
                reset_alpha_every=1000, densify_grad_thresh=1e-9,
                densify_size_thresh=1e9),
        )
        tr = Trainer(cfg, params, aux, None, data_factory=factory,
                     resolution_stages=[(0, 0.5), (6, 1.0)])
        hist = tr.train(12)
        return tr, hist

    tr_on, hist_on = run(True)
    tr_off, hist_off = run(False)
    assert any(k[0] == "ladder" or k == ("ladder", 1.0)
               for k in tr_on._spec_started) or len(tr_on._spec_started) > 0
    import time
    time.sleep(1.0)   # let daemon threads finish logging
    for a, b in zip(hist_on, hist_off):
        np.testing.assert_array_equal(
            np.asarray(a["total_loss"]), np.asarray(b["total_loss"]))
    for u, v in zip(jax.tree.leaves(tr_on.state.params),
                    jax.tree.leaves(tr_off.state.params)):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
