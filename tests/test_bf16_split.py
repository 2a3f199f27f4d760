"""The 3-pass bf16 operand split (SORT_WALL §5's f32-tax recovery).

`dot_exact_rhs` claims: for any f32 value matrix V and EXACTLY
bf16-representable RHS (one-hot / 0-1 triangular), the 3-pass hi/mid/lo
bf16 decomposition reproduces the f32 dot — bit-for-bit for one-hot
selections (each output is one input value), and to f32-rounding
accuracy for cumulative sums. These tests pin both properties on CPU
(where bf16 dots are emulated but exact) and the end-to-end fused
pipeline parity split-on vs split-off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtgs_tpu.raster.chunk_math import dot_exact_rhs


def _wild_f32(shape, seed=0):
    """f32 values spanning a wide dynamic range incl. denormal-adjacent,
    negative, and full-mantissa patterns."""
    rng = np.random.default_rng(seed)
    mant = rng.integers(0, 1 << 23, size=shape, dtype=np.uint32)
    expo = rng.integers(64, 192, size=shape, dtype=np.uint32)  # ~2^-63..2^63
    sign = rng.integers(0, 2, size=shape, dtype=np.uint32) << 31
    bits = sign | (expo << 23) | mant
    return bits.view(np.float32)


def test_onehot_selection_bit_exact(monkeypatch):
    """V @ onehot under the split == exact column selection, bitwise."""
    monkeypatch.setenv("MTGS_BF16_SPLIT", "1")
    V = jnp.asarray(_wild_f32((8, 256)))
    sel = np.random.default_rng(1).integers(0, 256, size=128)
    oht = jnp.asarray(np.eye(256, dtype=np.float32)[sel].T)  # [256, 128]
    out = dot_exact_rhs(V, oht, (((1,), (0,)), ((), ())))
    expect = np.asarray(V)[:, sel]
    assert np.array_equal(np.asarray(out), expect), (
        np.abs(np.asarray(out) - expect).max())


def test_split_reconstruction_exact():
    """hi+mid+lo == x bit-for-bit for every tested f32 (the invariant
    dot_exact_rhs's exactness rests on)."""
    x = _wild_f32((1 << 16,), seed=2)
    hi = x.astype(jax.numpy.bfloat16)
    r1 = x - np.asarray(hi, np.float32)
    mid = jnp.asarray(r1).astype(jax.numpy.bfloat16)
    r2 = r1 - np.asarray(mid, np.float32)
    lo = jnp.asarray(r2).astype(jax.numpy.bfloat16)
    recon = (np.asarray(hi, np.float32) + np.asarray(mid, np.float32)
             + np.asarray(lo, np.float32))
    assert np.array_equal(recon, x)


def test_triangular_cumsum_close_to_highest(monkeypatch):
    """L @ LT (the blend's inclusive log-T cumsum) under the split stays
    within a few ulps of the HIGHEST-precision f32 result."""
    from mtgs_tpu.raster.chunk_math import CHUNK, tri_inclusive

    rng = np.random.default_rng(3)
    L = jnp.asarray(-rng.exponential(0.05, size=(1024, CHUNK)).astype(np.float32))
    LT = tri_inclusive(CHUNK)
    dn = (((1,), (0,)), ((), ()))
    monkeypatch.setenv("MTGS_BF16_SPLIT", "1")
    a = np.asarray(dot_exact_rhs(L, LT, dn))
    monkeypatch.setenv("MTGS_BF16_SPLIT", "0")
    b = np.asarray(dot_exact_rhs(L, LT, dn))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("split", ["1", "0"])
def test_fused_pipeline_parity_under_split(split, monkeypatch):
    """Fused Pallas pipeline (interpret) forward + gradients with the
    split enabled match the split-off baseline within golden-class
    tolerances — the guard that flipping MTGS_BF16_SPLIT on-chip cannot
    silently change training numerics."""
    from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
    from mtgs_tpu.raster import RasterizeConfig, rasterize

    rng = np.random.default_rng(7)
    n = 400
    means = jnp.asarray(
        np.concatenate([rng.uniform(-3, 3, (n, 2)),
                        rng.uniform(-9, -4, (n, 1))], 1), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    viewmat = camera_to_gsplat_viewmat(jnp.eye(4))
    K = jnp.asarray([[90.0, 0, 48], [0, 90.0, 48], [0, 0, 1]], jnp.float32)
    cfg = RasterizeConfig(width=96, height=96, tile_size=32,
                          max_intersections=1 << 12, backend="pallas",
                          interpret=True, fused=True,
                          render_mode="RGB+ED", rasterize_mode="antialiased")
    target = jnp.asarray(rng.uniform(0, 1, (96, 96, 4)), jnp.float32)

    def run():
        def loss_fn(p):
            m, q, s, o, c = p
            r, a, _ = rasterize(m, q, s, o, c, viewmat, K, cfg)
            return jnp.abs(r - target).mean() + 0.1 * a.mean()

        params = (means, quats, scales, opac, colors)
        l, g = jax.value_and_grad(loss_fn)(params)
        return l, g

    monkeypatch.setenv("MTGS_BF16_SPLIT", "0")
    l0, g0 = run()
    monkeypatch.setenv("MTGS_BF16_SPLIT", split)
    l1, g1 = run()
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for u, v in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   atol=2e-6, rtol=1e-4)
