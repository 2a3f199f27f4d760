"""TPU numerics check: expand_pairs vs XLA expansion at bench scale + timing."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import bench
from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
from mtgs_tpu.raster.projection import project_gaussians
from mtgs_tpu.raster.expand_pallas import expand_pairs

print("backend:", jax.default_backend())
W, H = bench.WIDTH, bench.HEIGHT
means, quats, scales, opac, colors = bench.make_scene()
c2w = np.eye(4, dtype=np.float32)
c2w[:3, 0] = [0, -1, 0]; c2w[:3, 1] = [0, 0, 1]; c2w[:3, 2] = [-1, 0, 0]
c2w[:3, 3] = [-55.0, 0.0, 1.6]
viewmat = camera_to_gsplat_viewmat(jnp.asarray(c2w))
K = jnp.asarray([[800.0, 0, W / 2], [0, 800.0, H / 2], [0, 0, 1.0]], jnp.float32)
I = bench.MAX_ISECT
tile_size = 32
tiles_x, tiles_y = -(-W // tile_size), -(-H // tile_size)
num_tiles = tiles_x * tiles_y

pr = jax.jit(lambda m, q, s: project_gaussians(
    m, q, s, viewmat, K, W, H, near_plane=0.01, far_plane=1e10, antialiased=True
))(means, quats, scales)
live = pr.valid & (opac * pr.compensations > 0)


def spans_and_sort(m2d, radii, depths, valid):
    rf = radii.astype(jnp.float32)
    tmin_x = jnp.clip(jnp.floor((m2d[:, 0] - rf) / tile_size), 0, tiles_x).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.ceil((m2d[:, 0] + rf) / tile_size), 0, tiles_x).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((m2d[:, 1] - rf) / tile_size), 0, tiles_y).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.ceil((m2d[:, 1] + rf) / tile_size), 0, tiles_y).astype(jnp.int32)
    span_x = jnp.clip(tmax_x - tmin_x, 0, 255)
    span_y = jnp.maximum(tmax_y - tmin_y, 0)
    live_in = valid & (radii > 0)
    counts_in = jnp.where(live_in, span_x * span_y, 0).astype(jnp.int32)
    packed_in = tmin_x | (tmin_y << 11) | (span_x << 22)
    depth_key = jnp.where(counts_in > 0, depths, jnp.inf)
    N = m2d.shape[0]
    _, perm, packed, counts = jax.lax.sort(
        (depth_key, jnp.arange(N, dtype=jnp.int32), packed_in, counts_in),
        num_keys=1, is_stable=True)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    return offsets.astype(jnp.int32), packed, total


offsets, packed, total = jax.jit(spans_and_sort)(pr.means2d, pr.radii, pr.depths, live)
jax.block_until_ready(offsets)
print("total pairs:", int(total), "capacity:", I)


def xla_expand(offsets, packed, total):
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
    tile = jnp.where(slot < total, tile, num_tiles)
    return tile, src


f_ref = jax.jit(xla_expand)
f_new = jax.jit(lambda o, p, t: expand_pairs(
    o, p, t, I, tiles_x=tiles_x, num_tiles=num_tiles))

t_ref, s_ref = map(np.asarray, f_ref(offsets, packed, total))
t_new, s_new = map(np.asarray, f_new(offsets, packed, total))
tot = int(total)
bad_t = np.nonzero(t_new[:tot] != t_ref[:tot])[0]
bad_s = np.nonzero(s_new[:tot] != s_ref[:tot])[0]
print("tile mismatches:", bad_t.size, "src mismatches:", bad_s.size)
if bad_t.size:
    i = bad_t[0]
    print("first bad tile @", i, t_new[i], "vs", t_ref[i])
if bad_s.size:
    i = bad_s[0]
    print("first bad src @", i, s_new[i], "vs", s_ref[i])
assert not bad_t.size and not bad_s.size
assert (t_new[tot:] == num_tiles).all()
print("EXACT MATCH")


def timeit(name, f, *args, iters=30):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:30s} {dt:8.2f} ms")


timeit("xla expand", f_ref, offsets, packed, total)
timeit("pallas expand", f_new, offsets, packed, total)
