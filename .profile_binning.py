"""Sub-stage timing of binning + backward reduce on TPU."""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import bench
from mtgs_tpu.core.camera import camera_to_gsplat_viewmat
from mtgs_tpu.raster import RasterizeConfig
from mtgs_tpu.raster import binning
from mtgs_tpu.raster.binning import padded_capacity
from mtgs_tpu.raster.chunk_math import CHUNK
from mtgs_tpu.raster.projection import project_gaussians

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
m2d, radii, depths = map(jax.block_until_ready, (pr.means2d, pr.radii, pr.depths))
N = m2d.shape[0]


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


# --- stage pieces -------------------------------------------------------
def spans(m2d, radii, depths, valid):
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
    return counts_in, packed_in

counts_in, packed_in = jax.jit(spans)(m2d, radii, depths, live)

def depth_sort(depths, counts_in, packed_in):
    depth_key = jnp.where(counts_in > 0, depths, jnp.inf)
    return jax.lax.sort(
        (depth_key, jnp.arange(N, dtype=jnp.int32), packed_in, counts_in),
        num_keys=1, is_stable=True)

_, perm, packed, counts = map(jax.block_until_ready,
                              jax.jit(depth_sort)(depths, counts_in, packed_in))

def expand(packed, counts):
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
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
    pair_ok = slot < total
    tile = jnp.where(pair_ok, tile, num_tiles)
    return tile, src

tile, src = map(jax.block_until_ready, jax.jit(expand)(packed, counts))

def tile_sort(tile, src):
    return jax.lax.sort((tile, src), num_keys=1, is_stable=True)

tile_sorted, src_sorted = map(jax.block_until_ready, jax.jit(tile_sort)(tile, src))

def ranges(tile_sorted):
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)
    return starts, ends

def invp(perm):
    _, inv_perm = jax.lax.sort((perm, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    return inv_perm

timeit("spans (input order)", spans, m2d, radii, depths, live)
timeit("depth sort N=1M x4ops", depth_sort, depths, counts_in, packed_in)
timeit("expand (scatter+3 prefix)", expand, packed, counts)
timeit("tile sort I=2M x2ops", tile_sort, tile, src)
timeit("searchsorted ranges", ranges, tile_sorted)
timeit("inv_perm sort", invp, perm)
timeit("bin_gaussians total", functools.partial(
    binning.bin_gaussians, width=W, height=H, tile_size=tile_size,
    max_intersections=I), m2d, radii, depths, live)

# --- backward reduce pieces --------------------------------------------
cap = padded_capacity(I, num_tiles)
rng = np.random.default_rng(0)
nw = 10
g_rows = [jnp.asarray(rng.normal(size=(cap,)), jnp.float32) for _ in range(nw)]
gidx = jnp.concatenate([src_sorted, jnp.full((cap - I,), N, jnp.int32)])

def grad_sort(gidx, *rows):
    return jax.lax.sort((gidx, *rows), num_keys=1, is_stable=False)

srt = jax.jit(grad_sort)(gidx, *g_rows)
jax.block_until_ready(srt)

from mtgs_tpu.raster.segment_sum import dense_segment_sum
from mtgs_tpu.raster.blend_pallas import attr_major_to_rows

def segsum(sids, *rows):
    w_pad = 16
    rows16 = jnp.concatenate([
        jnp.stack([*rows, jnp.abs(rows[0]), jnp.abs(rows[1])], axis=0),
        jnp.zeros((w_pad - nw - 2, cap), jnp.float32)])
    sums_t = dense_segment_sum(rows16, sids, N)
    return attr_major_to_rows(sums_t)

timeit("bwd: grad sort cap x11ops", grad_sort, gidx, *g_rows)
timeit("bwd: segsum+transpose", segsum, srt[0], *srt[1:])
