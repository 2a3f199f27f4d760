"""Multi-chip sharding on the 8-device virtual CPU mesh.

The reference's only distributed mechanism is dormant DDP
(`custom_pipeline.py:87-89` in OpenDriveLab/MTGS); the TPU build replaces
it with camera-data-parallel shard_map training (grad pmean over ICI) and
tile-sharded rendering. These tests check numerical equivalence of the
sharded paths against their single-device counterparts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgs_tpu.data.synthetic import batch_iterator, build_scene_model, make_synthetic_scene
from mtgs_tpu.parallel.data_parallel import make_dp_train_step, shard_batch
from mtgs_tpu.parallel.mesh import make_mesh
from mtgs_tpu.train import control as ctrl
from mtgs_tpu.train import optim as optim_lib
from mtgs_tpu.train.trainer import Trainer, TrainerConfig, TrainState


@pytest.fixture()
def setup():
    # function-scoped: dp_step donates its state (params included), so a
    # shared params tree would be invalidated for later tests
    scene = make_synthetic_scene(seed=0, width=32, height=32, n_travels=1,
                                 n_frames=2, n_bg=200, n_instance=0)
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(
        width=32, height=32, max_intersections=1 << 12, max_steps=100,
        backend="xla", predict_normals=False,
        control=ctrl.ControlConfig(densify_from_iter=10**9),
    )
    return scene, params, aux, cfg


def test_dp_step_matches_mean_of_grads(setup):
    """DP over 8 devices with IDENTICAL per-device batches must equal
    the single-device step (pmean of equal grads is a no-op)."""
    scene, params, aux, cfg = setup
    mesh = make_mesh([8], ("data",))
    optimizer = optim_lib.build_optimizer(
        params, optim_lib.OptimConfig(groups=optim_lib.default_groups(100)))

    batch = next(batch_iterator(scene))
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (8,) + x.shape), batch)
    sharded = shard_batch(stacked, mesh)

    # donate a COPY of params into the dp step; `params` stays live for
    # the single-device comparison below
    dp_params = jax.tree.map(jnp.array, params)
    densify = {"background": ctrl.DensifyState.zeros(params.background.capacity)}
    state = TrainState(params=dp_params, opt_state=optimizer.init(dp_params),
                       densify=densify, step=jnp.zeros((), jnp.int32),
                       key=jax.random.key(0))

    dp_step = make_dp_train_step(cfg, optimizer, mesh)
    new_state, metrics = dp_step(state, aux, sharded)

    # single-device trainer step on the same batch
    trainer = Trainer(cfg, params, aux, iter([batch]),
                      optim_config=optim_lib.OptimConfig(
                          groups=optim_lib.default_groups(100)))
    hist = trainer.train(1)
    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(hist[0]["total_loss"]),
        rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(new_state.params.background.means),
        np.asarray(trainer.state.params.background.means),
        atol=1e-5)
    # densify stats: identical views -> psum = 8x the single-view stats
    np.testing.assert_allclose(
        np.asarray(new_state.densify["background"].vis_counts),
        np.asarray(trainer.state.densify["background"].vis_counts) * 8,
        rtol=1e-5)


def test_dp_step_distinct_views_finite(setup):
    """DP with 8 DIFFERENT views: runs, reduces, and stays finite."""
    scene, params, aux, cfg = setup
    mesh = make_mesh([8], ("data",))
    optimizer = optim_lib.build_optimizer(
        params, optim_lib.OptimConfig(groups=optim_lib.default_groups(100)))
    it = batch_iterator(scene)
    batches = [next(it) for _ in range(8)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    sharded = shard_batch(stacked, mesh)
    densify = {"background": ctrl.DensifyState.zeros(params.background.capacity)}
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       densify=densify, step=jnp.zeros((), jnp.int32),
                       key=jax.random.key(0))
    dp_step = make_dp_train_step(cfg, optimizer, mesh)
    new_state, metrics = dp_step(state, aux, sharded)
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(np.asarray(new_state.params.background.means)).all()


def test_tile_sharded_render_matches_single_device(setup):
    """Tile-sharded forward == unsharded rasterize, pixel-exact."""
    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.parallel.tile_parallel import rasterize_tile_sharded
    from mtgs_tpu.raster import RasterizeConfig, rasterize

    rng = np.random.default_rng(0)
    n = 300
    means = jnp.asarray(
        np.concatenate([rng.uniform(-3, 3, (n, 2)),
                        rng.uniform(-9, -4, (n, 1))], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    viewmat = camera_to_gsplat_viewmat(jnp.eye(4))
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32)
    cfg = RasterizeConfig(width=64, height=64, tile_size=32,
                          max_intersections=1 << 13, backend="xla")

    mesh = make_mesh([4], ("data",), devices=jax.devices()[:4])
    r_sh, a_sh, _ = rasterize_tile_sharded(
        means, quats, scales, opac, colors, viewmat, K, cfg, mesh)
    r, a, _ = rasterize(means, quats, scales, opac, colors, viewmat, K, cfg)
    np.testing.assert_allclose(np.asarray(r_sh), np.asarray(r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a), atol=1e-5)


def _tiny_scene(n=300, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        np.concatenate([rng.uniform(-3, 3, (n, 2)),
                        rng.uniform(-9, -4, (n, 1))], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    return means, quats, scales, opac, colors


def test_tile_sharded_gradients_match_single_device():
    """The north-star path (SURVEY §2.4): FULL gradients through the
    tile-sharded blend — parameter grads, the means2d tap, and the
    absgrad densify signal — match the unsharded rasterizer. The
    shard_map transpose psums the replicated slab's cotangents."""
    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.raster import RasterizeConfig, rasterize

    means, quats, scales, opac, colors = _tiny_scene()
    n = means.shape[0]
    viewmat = camera_to_gsplat_viewmat(jnp.eye(4))
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32)
    cfg = RasterizeConfig(width=64, height=64, tile_size=32,
                          max_intersections=1 << 13, backend="xla",
                          render_mode="RGB+ED", rasterize_mode="antialiased")
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (64, 64, 4)), jnp.float32)
    mesh = make_mesh([4], ("data",), devices=jax.devices()[:4])

    def loss_fn(params, sink, use_mesh):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmat, K, cfg, absgrad_sink=sink,
            mesh=mesh if use_mesh else None)
        return jnp.abs(render - target).mean() + 0.1 * alpha.mean()

    params = (means, quats, scales, opac, colors)
    sink = jnp.zeros((n, 2), jnp.float32)
    g1, a1 = jax.grad(loss_fn, argnums=(0, 1))(params, sink, False)
    g2, a2 = jax.grad(loss_fn, argnums=(0, 1))(params, sink, True)
    for u, v, name in zip(g1, g2, ("means", "quats", "scales", "opac", "colors")):
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), atol=2e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-5)
    assert float(jnp.abs(a2).max()) > 0  # absgrad signal actually flows


def test_tile_sharded_pallas_interpret_base_ref():
    """The Pallas blend under shard_map (interpret mode): the base_ref
    global-tile-origin path produces the same image and gradients as the
    unsharded Pallas kernel (VERDICT r1 weak #5)."""
    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.raster import RasterizeConfig, rasterize

    means, quats, scales, opac, colors = _tiny_scene(n=150, seed=2)
    viewmat = camera_to_gsplat_viewmat(jnp.eye(4))
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32)
    cfg = RasterizeConfig(width=64, height=64, tile_size=32,
                          max_intersections=1 << 12, backend="pallas",
                          interpret=True)
    mesh = make_mesh([2], ("data",), devices=jax.devices()[:2])

    def loss_fn(params, use_mesh):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmat, K, cfg,
            mesh=mesh if use_mesh else None)
        return (render ** 2).mean() + alpha.mean()

    params = (means, quats, scales, opac, colors)
    r1, _, _ = rasterize(*params, viewmat, K, cfg)
    r2, _, _ = rasterize(*params, viewmat, K, cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    g1 = jax.grad(loss_fn)(params, False)
    g2 = jax.grad(loss_fn)(params, True)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=2e-5)


def test_dp_trainer_grows_capacity():
    """DPTrainer: the full host loop — including capacity growth — runs
    with the camera-sharded step (growth under DP was impossible in r1)."""
    from mtgs_tpu.parallel.data_parallel import DPTrainer

    scn = make_synthetic_scene(seed=0, width=32, height=32, n_travels=1,
                               n_frames=2, n_bg=260, n_instance=0)
    params, aux = build_scene_model(scn, with_instances=False)
    cap0 = params.background.capacity
    mesh = make_mesh([4], ("data",), devices=jax.devices()[:4])
    cfg = TrainerConfig(
        width=32, height=32, max_intersections=1 << 12, max_steps=100,
        backend="xla", predict_normals=False, grow_granule=1024,
        control=ctrl.ControlConfig(
            densify_from_iter=1, refine_every=2, stop_split_at=100,
            reset_alpha_every=1000, sh_degree_interval=10,
            densify_grad_thresh=1e-9, densify_size_thresh=1e9),
    )

    def stacked_batches():
        it = batch_iterator(scn)
        while True:
            yield jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[next(it) for _ in range(4)])

    trainer = DPTrainer(cfg, params, aux, stacked_batches(), mesh)
    hist = trainer.train(12)
    assert trainer.state.params.background.capacity > cap0
    assert int(trainer.aux.background.num_alive) > cap0
    assert trainer.refine_overflow == 0
    adam_state, _ = trainer.state.opt_state
    assert (adam_state.mu.background.means.shape
            == trainer.state.params.background.means.shape)
    for h in hist:
        assert np.isfinite(float(h["total_loss"]))
        assert np.isfinite(float(h["psnr"]))


@pytest.mark.parametrize("dist", ["1", "0"])
def test_fused_fully_sharded_pipeline_matches_single_device(dist, monkeypatch):
    """The WHOLE fused pipeline sharded across 8 devices must match the
    unsharded fused path — forward render/alpha, full parameter
    gradients, the means2d tap, and the absgrad densify signal; 8 shards
    over 4 tile rows also exercises empty pad bands. Covers BOTH
    sharded designs: dist="1" takes the gaussian-ownership all_to_all
    pipeline (dist_fused.py, VERDICT r3 item 3), dist="0" forces the
    band-replicated fallback (VERDICT r2 item 1)."""
    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.raster import RasterizeConfig, rasterize

    monkeypatch.setenv("MTGS_DIST", dist)
    # untruncated exchange blocks for exact parity (see the 2D test)
    monkeypatch.setenv("MTGS_BLK_SLACK", "2.0")

    means, quats, scales, opac, colors = _tiny_scene(n=600)
    n = means.shape[0]
    viewmat = camera_to_gsplat_viewmat(jnp.eye(4))
    K = jnp.asarray([[120.0, 0, 80], [0, 120.0, 64], [0, 0, 1]], jnp.float32)
    cfg = RasterizeConfig(width=160, height=128, tile_size=32,
                          max_intersections=512 * 8 * 2,
                          backend="pallas", interpret=True, fused=True,
                          render_mode="RGB+ED", rasterize_mode="antialiased")
    mesh = make_mesh([8], ("data",))
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (128, 160, 4)), jnp.float32)

    def loss_fn(params, tap, sink, use_mesh):
        m, q, s, o, c = params
        render, alpha, info = rasterize(
            m, q, s, o, c, viewmat, K, cfg, tap2d=tap, absgrad_sink=sink,
            mesh=mesh if use_mesh else None)
        loss = jnp.abs(render - target).mean() + 0.1 * alpha.mean()
        return loss, (render, alpha, info)

    params = (means, quats, scales, opac, colors)
    tap = jnp.zeros((n, 2), jnp.float32)
    sink = jnp.zeros((n, 2), jnp.float32)
    (l1, (r1, al1, i1)), (g1, t1, a1) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True)(params, tap, sink, False)
    (l2, (r2, al2, i2)), (g2, t2, a2) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True)(params, tap, sink, True)

    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(al1), np.asarray(al2), atol=2e-5)
    for u, v, name in zip(g1, g2, ("means", "quats", "scales", "opac",
                                   "colors")):
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), atol=3e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=3e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=3e-5)
    assert float(jnp.abs(a2).max()) > 0      # absgrad flows when sharded
    # truncation signal: max-shard-scaled count >= the true total
    assert int(i2["n_intersections"]) >= int(i1["n_intersections"])


def test_trainer_tile_mesh_matches_unsharded():
    """VERDICT r2 item 5: the FULL loss stack trains one camera with its
    tiles sharded across devices. loss_and_grads under a tile mesh must
    match the unsharded gradients (Adam would amplify f32 noise on
    near-zero grads, so parity is asserted on grads, not on params
    after several steps), and Trainer(mesh=...) must run real steps."""
    from mtgs_tpu.train.trainer import loss_and_grads

    scene = make_synthetic_scene(seed=0, width=64, height=64, n_travels=1,
                                 n_frames=2, n_bg=220, n_instance=0,
                                 backend="xla")
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(
        width=64, height=64, tile_size=32, max_intersections=2048,
        max_steps=100, backend="pallas", fused=True, interpret=True,
        predict_normals=True,
        control=ctrl.ControlConfig(densify_from_iter=10**9),
    )
    mesh = make_mesh([2], ("tile",), devices=jax.devices()[:2])
    batch = next(batch_iterator(scene, seed=5))
    step = jnp.asarray(1, jnp.int32)

    t1, l1, _, s1, g1 = loss_and_grads(params, aux, cfg, batch, step)
    t2, l2, _, s2, g2 = loss_and_grads(params, aux, cfg, batch, step,
                                       mesh=mesh)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-5)
    for (a, b) in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=3e-5)
    assert float(jnp.abs(s2).max()) > 0

    # the Trainer plumbing end-to-end: 2 sharded steps, finite metrics
    tr = Trainer(cfg, jax.tree.map(jnp.array, params), aux,
                 batch_iterator(scene, seed=5), mesh=mesh)
    hist = tr.train(2)
    for h in hist:
        assert np.isfinite(float(h["total_loss"]))


def test_dist_block_overflow_signals_growth(monkeypatch):
    """Gaussian-ownership path with a deliberately tiny exchange-block
    slack: the render must stay finite (truncated pairs drop cleanly,
    forward AND backward) and the n_intersections pressure signal must
    exceed the nominal capacity so the trainer's growth loop reacts."""
    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.raster import RasterizeConfig, rasterize
    from mtgs_tpu.raster.dist_fused import dist_shard_plan

    monkeypatch.setenv("MTGS_DIST", "1")
    monkeypatch.setenv("MTGS_BLK_SLACK", "0.5")   # starve the blocks
    means, quats, scales, opac, colors = _tiny_scene(n=560, seed=3)
    viewmat = camera_to_gsplat_viewmat(jnp.eye(4))
    K = jnp.asarray([[120.0, 0, 80], [0, 120.0, 64], [0, 0, 1]], jnp.float32)
    cfg = RasterizeConfig(width=160, height=128, tile_size=32,
                          max_intersections=512 * 8,
                          backend="pallas", interpret=True, fused=True,
                          render_mode="RGB+ED")
    mesh = make_mesh([8], ("data",))
    plan = dist_shard_plan(cfg, 8, 560)
    assert plan is not None and plan.I_blk < plan.I_s

    def loss_fn(m):
        r, a, info = rasterize(m, quats, scales, opac, colors, viewmat, K,
                               cfg, mesh=mesh)
        return (r ** 2).mean() + a.mean(), info

    (loss, info), g = jax.value_and_grad(loss_fn, has_aux=True)(means)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
    # starved blocks truncated: the pressure signal scales the fullest
    # block back to global capacity and lands above what fit
    assert int(info["n_intersections"]) > 8 * plan.I_blk


def test_2d_mesh_cameras_x_tiles_matches_dp(monkeypatch):
    """VERDICT r3 item 7: cameras x tiles on ONE shard_map over a (2, 4)
    mesh — the data axis shards cameras, the tile axis runs the
    gaussian-ownership pipeline inline (no nested shard_map). Must match
    the plain DP step on the same two cameras: loss, params after one
    update, and densify statistics."""
    from mtgs_tpu.parallel.mesh2d import make_2d_train_step
    from mtgs_tpu.raster.dist_fused import dist_shard_plan
    from mtgs_tpu.train.trainer import _total_capacity

    monkeypatch.setenv("MTGS_DIST", "1")   # force dist below the n>=8 auto gate
    # exact parity needs untruncated exchange blocks: the default slack
    # (1.0, band-equivalent truncate-then-grow semantics) can clip a
    # concentrated src->band run on this tiny scene
    monkeypatch.setenv("MTGS_BLK_SLACK", "2.0")

    scene = make_synthetic_scene(seed=0, width=64, height=64, n_travels=1,
                                 n_frames=2, n_bg=220, n_instance=0,
                                 backend="xla")
    params, aux = build_scene_model(scene, with_instances=False)
    cfg = TrainerConfig(
        width=64, height=64, tile_size=32, max_intersections=2048,
        max_steps=100, backend="pallas", fused=True, interpret=True,
        predict_normals=True,
        control=ctrl.ControlConfig(densify_from_iter=10**9),
    )
    # the tile rows of the 2D mesh must have an active dist plan —
    # otherwise this test would silently compare two unsharded paths
    assert dist_shard_plan(cfg.raster_config(), 4,
                           _total_capacity(params)) is not None

    it = batch_iterator(scene, seed=9)
    batches = [next(it) for _ in range(2)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    optimizer = optim_lib.build_optimizer(
        params, optim_lib.OptimConfig(groups=optim_lib.default_groups(100)))

    def fresh_state(p):
        densify = {"background": ctrl.DensifyState.zeros(p.background.capacity)}
        return TrainState(params=p, opt_state=optimizer.init(p),
                          densify=densify, step=jnp.zeros((), jnp.int32),
                          key=jax.random.key(0))

    devs = jax.devices()
    mesh2d = make_mesh([2, 4], ("data", "tile"), devices=devs[:8])
    meshdp = make_mesh([2], ("data",), devices=devs[:2])

    from mtgs_tpu.parallel.data_parallel import make_dp_train_step
    p1 = jax.tree.map(jnp.array, params)
    p2 = jax.tree.map(jnp.array, params)
    s1, m1 = make_dp_train_step(cfg, optimizer, meshdp)(
        fresh_state(p1), aux, shard_batch(stacked, meshdp))
    s2, m2 = make_2d_train_step(cfg, optimizer, mesh2d)(
        fresh_state(p2), aux, shard_batch(stacked, mesh2d))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["psnr"]), float(m2["psnr"]), rtol=1e-5)
    # post-Adam params: the first Adam update is ~±lr wherever a grad is
    # nonzero, so f32-tolerance grad noise on NEAR-ZERO grads flips to a
    # full lr quantum (same caveat as test_trainer_tile_mesh); assert to
    # the lr quantum here and exact grad parity below.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)

    # grad-level parity: 2D-mesh grads (pmean over both axes) vs the
    # mean of per-camera single-device grads
    from jax.sharding import PartitionSpec as SP
    from mtgs_tpu.train.trainer import loss_and_grads

    def g2d_fn(p, aux_, batch_):
        batch_ = jax.tree.map(lambda x: x[0], batch_)
        total, _, _, sink_grad, grads = loss_and_grads(
            p, aux_, cfg, batch_, jnp.asarray(0, jnp.int32),
            mesh=mesh2d, mesh_axis="tile", inside_shard_map=True)
        return (jax.lax.pmean(grads, ("data", "tile")),
                jax.lax.pmean(sink_grad, ("data", "tile")))

    g2d, s2d = jax.shard_map(
        g2d_fn, mesh=mesh2d, in_specs=(SP(), SP(), SP("data")),
        out_specs=(SP(), SP()), check_vma=False,
    )(params, aux, shard_batch(stacked, mesh2d))
    gs = [loss_and_grads(params, aux, cfg, b, jnp.asarray(0, jnp.int32))
          for b in batches]
    gref = jax.tree.map(lambda a, b: (a + b) / 2, gs[0][4], gs[1][4])
    sref = (gs[0][3] + gs[1][3]) / 2
    for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(g2d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sref), np.asarray(s2d), atol=3e-5)

    d1, d2 = s1.densify["background"], s2.densify["background"]
    np.testing.assert_allclose(np.asarray(d1.xys_grad_norm),
                               np.asarray(d2.xys_grad_norm),
                               atol=1e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d1.vis_counts),
                               np.asarray(d2.vis_counts), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1.max_2dsize),
                               np.asarray(d2.max_2dsize), atol=1e-5)
