"""Fused attr-payload-sort path (interpret mode) vs the XLA classic path.

The fused path (rasterize.py `_gather_fused` + expand_fused.py) must
produce the same tile-sorted slab as the classic stable (tile, depth)
sort + random gather: the forward is an exact data-movement
reformulation, so renders agree to f32 round-off and gradients agree to
the same tolerance as the other backend-pair tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgs_tpu.raster import RasterizeConfig, rasterize
from tests.test_rasterize import H, W, _loss_fn, make_scene


def cfg(**kw):
    base = dict(
        width=W, height=H, tile_size=32, max_intersections=1 << 13,
        backend="xla",
    )
    base.update(kw)
    return RasterizeConfig(**base)


def fused_cfg(**kw):
    return cfg(backend="pallas", interpret=True, fused=True, **kw)


@pytest.mark.parametrize("mode", ["classic", "antialiased"])
def test_fused_forward_parity(mode):
    scene = make_scene(n=300, seed=3)
    r1, a1, i1 = rasterize(*scene, cfg(rasterize_mode=mode))
    r2, a2, i2 = rasterize(*scene, fused_cfg(rasterize_mode=mode))
    assert int(i1["n_intersections"]) == int(i2["n_intersections"])
    np.testing.assert_allclose(r1, r2, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(a1, a2, atol=1e-5, rtol=1e-5)
    assert float(a1.max()) > 0.5


def test_fused_double_buffer_parity(monkeypatch):
    """MTGS_DB_DMA=1 double-buffered expand_fused (+ db blend) vs the
    single-buffer fused path: the db kernels only reorder DMA issue,
    not math, so forward AND gradients must be bit-identical."""
    scene = make_scene(n=250, seed=12)
    gw = jax.random.normal(jax.random.key(13), (H, W))
    c = fused_cfg(rasterize_mode="antialiased")

    monkeypatch.delenv("MTGS_DB_DMA", raising=False)
    r1, a1, _ = rasterize(*scene, c)
    g1 = jax.grad(lambda s: _loss_fn(s, c, gw))(scene)

    monkeypatch.setenv("MTGS_DB_DMA", "1")
    r2, a2, _ = rasterize(*scene, c)
    g2 = jax.grad(lambda s: _loss_fn(s, c, gw))(scene)

    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    for ga, gb in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_fused_forward_depth_mode():
    scene = make_scene(n=200, seed=4)
    r1, a1, _ = rasterize(*scene, cfg(render_mode="RGB+ED"))
    r2, a2, _ = rasterize(*scene, fused_cfg(render_mode="RGB+ED"))
    np.testing.assert_allclose(r1, r2, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(a1, a2, atol=1e-5, rtol=1e-5)


def test_fused_gradient_parity():
    scene = make_scene(n=200, seed=5)
    gw = jax.random.normal(jax.random.key(11), (H, W))
    g1 = jax.grad(lambda s: _loss_fn(s, cfg(), gw))(scene)
    g2 = jax.grad(lambda s: _loss_fn(s, fused_cfg(), gw))(scene)
    names = ["means", "quats", "scales", "opac", "colors", "viewmat", "K"]
    for name, ga, gb in zip(names, g1, g2):
        scale = np.maximum(np.abs(np.asarray(ga)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gb) / scale, np.asarray(ga) / scale, atol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_tap_and_absgrad_parity():
    scene = make_scene(n=150, seed=6)
    n = scene[0].shape[0]
    gw = jnp.ones((H, W))
    tap0 = jnp.zeros((n, 2))
    sink0 = jnp.zeros((n, 2))

    def taps(config):
        g_tap, g_sink = jax.grad(
            lambda t, s: _loss_fn(scene, config, gw, tap=t, sink=s),
            argnums=(0, 1),
        )(tap0, sink0)
        return np.asarray(g_tap), np.asarray(g_sink)

    t1, s1 = taps(cfg())
    t2, s2 = taps(fused_cfg())
    scale = max(np.abs(t1).max(), 1e-3)
    np.testing.assert_allclose(t2 / scale, t1 / scale, atol=1e-4)
    np.testing.assert_allclose(s2 / scale, s1 / scale, atol=1e-4)
    # absgrad dominates the plain screen gradient elementwise
    assert (s2 + 1e-7 >= np.abs(t2) - 1e-5).all()


def test_fused_wide_channels():
    """7-channel colors + depth (the predict_normals training layout,
    nw = 13): exercises the non-multiple-of-8 attr row count."""
    means, quats, scales, opac, colors, viewmat, K = make_scene(n=200, seed=9)
    wide = jnp.concatenate(
        [colors, jax.random.uniform(jax.random.key(1), (200, 4))], axis=-1
    )
    scene = (means, quats, scales, opac, wide, viewmat, K)
    r1, a1, _ = rasterize(*scene, cfg(render_mode="RGB+ED"))
    r2, a2, _ = rasterize(*scene, fused_cfg(render_mode="RGB+ED"))
    np.testing.assert_allclose(r1, r2, atol=1e-5, rtol=1e-5)
    g1 = jax.grad(
        lambda s: jnp.sum(rasterize(*s, cfg(render_mode="RGB+ED"))[0] ** 2)
    )(scene)
    g2 = jax.grad(
        lambda s: jnp.sum(rasterize(*s, fused_cfg(render_mode="RGB+ED"))[0] ** 2)
    )(scene)
    for ga, gb in zip(g1, g2):
        scale = np.maximum(np.abs(np.asarray(ga)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gb) / scale, np.asarray(ga) / scale, atol=1e-4
        )


def test_fused_empty_scene():
    """All-culled scene: sentinel keys only, zero render, zero grads."""
    means, quats, scales, opac, colors, viewmat, K = make_scene(n=64, seed=8)
    opac = jnp.zeros_like(opac)
    scene = (means, quats, scales, opac, colors, viewmat, K)
    r, a, info = rasterize(*scene, fused_cfg())
    assert int(info["n_intersections"]) == 0
    assert float(jnp.abs(r).max()) == 0.0 and float(a.max()) == 0.0
    g = jax.grad(
        lambda s: _loss_fn(s, fused_cfg(), jnp.ones((H, W)))
    )(scene)
    assert float(jnp.abs(g[0]).max()) == 0.0  # d/d means all zero


def test_fused_gate_fallback():
    """Configs that don't satisfy the packing gate must still render
    (silent fallback to the classic path)."""
    scene = make_scene(n=100, seed=7)
    # max_intersections not a multiple of 512 -> gate rejects
    c = cfg(backend="pallas", interpret=True, fused=True,
            max_intersections=1000)
    r, a, _ = rasterize(*scene, c)
    r0, a0, _ = rasterize(*scene, cfg(max_intersections=1000))
    np.testing.assert_allclose(r, r0, atol=1e-5, rtol=1e-5)
