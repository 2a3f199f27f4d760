"""expand_pairs (Pallas, interpret mode) vs the XLA scatter+scan expansion.

The kernel replaces the scatter/prefix-scan pair expansion inside
`binning.bin_gaussians` (the static-shape equivalent of gsplat's
`isect_tiles`, reference `mtgs/scene_model/mtgs_scene_graph.py:640-662`).
Both paths must produce identical (tile, src) arrays for every slot below
the true pair count, sentinel tiles above it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgs_tpu.raster.expand_pallas import expand_pairs


def xla_expand(offsets, packed, total, I, tiles_x, num_tiles):
    slot = jnp.arange(I, dtype=jnp.int32)
    safe_off = jnp.minimum(offsets, I)
    pk_delta = packed - jnp.concatenate([packed[:1] * 0, packed[:-1]])
    zeros_i = jnp.zeros((I,), jnp.int32)
    ind = zeros_i.at[safe_off].add(1, mode="drop")
    sc_pk = zeros_i.at[safe_off].add(pk_delta, mode="drop")
    src = jnp.cumsum(ind) - 1
    pk = jnp.cumsum(sc_pk)
    off_s = jax.lax.cummax(jnp.where(ind > 0, slot, 0))
    local = slot - off_s
    sx = jnp.maximum(pk >> 22, 1)
    lx = local % sx
    ly = local // sx
    tile = (((pk >> 11) & 0x7FF) + ly) * tiles_x + ((pk & 0x7FF) + lx)
    return jnp.where(slot < total, tile, num_tiles), src


def make_case(N, I, tiles_x, tiles_y, live_frac=0.9, max_span=6, seed=0):
    r = np.random.default_rng(seed)
    live = r.random(N) < live_frac
    span_x = np.where(live, r.integers(1, max_span + 1, N), 0).astype(np.int32)
    span_y = np.where(live, r.integers(1, max_span + 1, N), 0).astype(np.int32)
    tmin_x = r.integers(0, tiles_x, N).astype(np.int32)
    tmin_y = r.integers(0, tiles_y, N).astype(np.int32)
    counts = (span_x * span_y).astype(np.int32)
    # emulate binning: zero-count gaussians depth-sort to the tail
    order = np.argsort(counts == 0, kind="stable")
    counts, tmin_x, tmin_y, span_x = (
        counts[order], tmin_x[order], tmin_y[order], span_x[order])
    offsets = np.cumsum(counts) - counts
    total = int(offsets[-1] + counts[-1])
    packed = tmin_x | (tmin_y << 11) | (span_x << 22)
    return (jnp.asarray(offsets, jnp.int32), jnp.asarray(packed),
            jnp.asarray(total, jnp.int32), total)


@pytest.mark.parametrize(
    "seed,N,I,tx,ty",
    [
        (0, 2000, 1 << 13, 30, 17),
        (1, 5000, 1 << 15, 60, 34),
        (2, 512, 1 << 13, 8, 8),
        (3, 100, 1024, 4, 4),  # capacity overflow (total > I)
    ],
)
def test_expand_matches_xla(seed, N, I, tx, ty):
    offsets, packed, total, tot_py = make_case(N, I, tx, ty, seed=seed)
    nt = tx * ty
    t_ref, s_ref = jax.jit(
        lambda o, p, t: xla_expand(o, p, t, I, tx, nt))(offsets, packed, total)
    t_new, s_new = expand_pairs(
        offsets, packed, total, I, tiles_x=tx, num_tiles=nt, interpret=True)
    t_ref, s_ref, t_new, s_new = map(np.asarray, (t_ref, s_ref, t_new, s_new))
    live_n = min(tot_py, I)
    np.testing.assert_array_equal(t_new[:live_n], t_ref[:live_n])
    np.testing.assert_array_equal(s_new[:live_n], s_ref[:live_n])
    assert (t_new[live_n:] == nt).all()
    assert (s_new >= 0).all() and (s_new < N).all()


def test_expand_zero_live():
    offsets = jnp.zeros((256,), jnp.int32)
    packed = jnp.zeros((256,), jnp.int32)
    t_new, _ = expand_pairs(offsets, packed, jnp.zeros((), jnp.int32), 1024,
                            tiles_x=4, num_tiles=16, interpret=True)
    assert (np.asarray(t_new) == 16).all()
