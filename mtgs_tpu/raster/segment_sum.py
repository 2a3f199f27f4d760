"""Dense-window segment sum: per-gaussian reduction of sorted gradient rows.

The rasterizer backward must reduce ~2 per-intersection gradient rows per
gaussian into one row per gaussian (the step gsplat's CUDA backward does
with atomicAdd, `mtgs/scene_model/mtgs_scene_graph.py:640-662`'s backward).
TPU has no atomics; the XLA fallback (rasterize.py `_gather_bwd`) sorts
rows by gaussian id and then segment-reduces with a cumsum + a boundary
gather — but a [N, 12]-row random gather from the [cap, 12] cumsum table
runs at the TPU's ~7 ns/row gather rate (~21 ms at 1M gaussians).

This kernel replaces the cumsum + boundary gather with MXU one-hot
matmuls over aligned windows, exploiting two structural facts:

  * rows are SORTED by gaussian id (the `lax.sort` stays — multi-operand
    sorts run ~4x faster per element than gathers on TPU);
  * sorted ids are PAIR-DENSE: binning sorts zero-pair gaussians to the
    tail (binning.py depth_key), so R consecutive rows span < R distinct
    consecutive ids. A block of R=512 rows therefore lands entirely in a
    1024-wide id window anchored at the block's first id.

Each grid step computes contrib[a, c] = sum_r rows[a, r] * (id[r] == c)
as one [16, 512] x [512, 1024] dot and accumulates it into two
512-aligned output column blocks (a window straddles at most two). The
TPU grid is sequential and block indices are non-decreasing, so
first-visit initialization + in-VMEM accumulation is race-free. Blocks
never visited (id jumps at the live->tail boundary) keep their aliased
zero initialization; rows whose id falls outside the window are
structurally zero (dead slots) and drop out of the one-hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512          # rows per grid step
CBLK = 512       # output column block width (window = 2 blocks)


def _kernel(glo_ref, rows_ref, gidx_ref, za_ref, zb_ref, outa_ref, outb_ref):
    i = pl.program_id(0)
    glo = glo_ref[i]
    b = glo // CBLK
    prev_b = jnp.where(i > 0, glo_ref[jnp.maximum(i - 1, 0)] // CBLK, -1)
    first = b != prev_b

    local = gidx_ref[0] - b * CBLK                       # [1, R]
    ci = jax.lax.broadcasted_iota(jnp.int32, (2 * CBLK, R), 0)
    oht = (ci == local).astype(jnp.float32)              # [2*CBLK, R]
    # default TPU precision rounds the summed VALUES to bf16 before the
    # one-hot multiply (measured 1e-2 rel err on-chip); `dot_exact_rhs`
    # keeps full f32 values via the exact 3-pass hi/mid/lo bf16 split
    # (one-hot side is 0/1-exact) at half the MXU area of HIGHEST.
    from mtgs_tpu.raster.chunk_math import dot_exact_rhs

    contrib = dot_exact_rhs(
        rows_ref[:], oht, (((1,), (1,)), ((), ()))
    )                                                    # [W, 2*CBLK]

    @pl.when(first)
    def _():
        outa_ref[:] = contrib[:, :CBLK]
        outb_ref[:] = contrib[:, CBLK:]

    @pl.when(jnp.logical_not(first))
    def _():
        outa_ref[:] += contrib[:, :CBLK]
        outb_ref[:] += contrib[:, CBLK:]


def dense_segment_sum(
    rows_t: jax.Array,   # [W (8-aligned), cap] f32, sorted by gidx along cap
    gidx: jax.Array,     # [cap] s32 non-decreasing; pair-dense in the live
                         # prefix; values in [0, n] (n = sentinel)
    n: int,              # number of gaussians
    *,
    interpret: bool = False,
) -> jax.Array:
    """Returns [W, n_out] per-gaussian sums (attr-major); n_out >= n + 1,
    512-aligned; columns past a gaussian's id hold zeros or tail slack."""
    w, cap = rows_t.shape
    assert cap % R == 0 and w % 8 == 0, (w, cap)
    nsteps = cap // R
    n_out = ((n + 1 + CBLK - 1) // CBLK) * CBLK + CBLK
    # Window anchor per step, clamped so block b+1 stays in range.
    glo = jnp.minimum(gidx[::R], n_out - 2 * CBLK)
    gidx3d = gidx.reshape(nsteps, 1, R)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((w, R), lambda i, glo: (0, i)),
            pl.BlockSpec((1, 1, R), lambda i, glo: (i, 0, 0)),
            # zero-init donors: never read in-kernel, no block DMA
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((w, CBLK), lambda i, glo: (0, glo[i] // CBLK)),
            pl.BlockSpec((w, CBLK), lambda i, glo: (0, glo[i] // CBLK + 1)),
        ],
    )
    outa, outb = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((w, n_out), jnp.float32),
            jax.ShapeDtypeStruct((w, n_out), jnp.float32),
        ],
        # zero inputs donate their buffers (indices count the scalar
        # prefetch operand): blocks skipped by id jumps stay exact zeros.
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(glo, rows_t, gidx3d,
      jnp.zeros((w, n_out), jnp.float32), jnp.zeros((w, n_out), jnp.float32))
    return outa + outb
