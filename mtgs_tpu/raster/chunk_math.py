"""Per-tile alpha-blending math on fixed-size chunks — the rasterizer core.

One chunk = CHUNK depth-ordered tile intersections blended into a tile of
PIX = tile_size^2 pixels. These functions are pure jnp on fixed-shape
arrays; they are called both from inside the Pallas TPU kernels
(`blend_pallas.py`, on VMEM-resident chunks) and from the XLA fallback
driver (`blend_xla.py`, CPU tests / parity). Keeping the math in one
place guarantees the two backends agree.

TPU-native formulation (instead of the CUDA per-pixel thread loop of
gsplat's `rasterize_to_pixels`, the op behind
`mtgs/scene_model/mtgs_scene_graph.py:640-662` in OpenDriveLab/MTGS):

* The Mahalanobis term for all (pixel, gaussian) pairs of a chunk is ONE
  MXU matmul: sigma = F @ Q, where F is a constant [PIX, 8] matrix of
  tile-local pixel monomials [x^2, y^2, xy, x, y, 1, 0, 0] and Q packs the
  per-gaussian conic expanded in the tile-local frame. Tile-local
  coordinates keep |x| <= tile_size so the expansion is exact in f32.
* Transmittance is computed in log space: cumulative sums of
  log1p(-alpha) along the gaussian axis via a triangular-ones matmul
  (MXU) plus a per-pixel scalar carry across chunks.
* The sequential early-termination rule of the CUDA kernel ("stop before
  compositing the gaussian that would push T below 1e-4") is reproduced
  exactly by masking: with L_i = log1p(-alpha_i) accumulated over ALL
  alpha-passing gaussians, the running sum is monotone decreasing, so
  `mask_i = (cumsum(L)_i > log(1e-4))` selects precisely the gaussians the
  sequential loop would composite.
* The backward is a front-to-back replay: the suffix color dot-product
  that drives d(loss)/d(alpha) is total_dot - inclusive-cumsum(w * gdot),
  with total_dot recovered from the forward's accumulated color output.
  Per-gaussian reductions over pixels are again MXU matmuls (moments
  M = F^T @ g_sigma).

Blend semantics match gsplat v1.4 / classic 3DGS:
  alpha = min(0.999, opacity * exp(-sigma)); skip if sigma < 0 or
  alpha < 1/255; stop (excluding the terminator) when T*(1-alpha) <= 1e-4.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

CHUNK = 128          # gaussian intersections per chunk (= one lane tile)
NUM_GEOM = 6         # packed geometry rows: mx, my, cA, cB, cC, opac
MAX_CH = 8           # colors per gaussian: up to 7 channels + depth
# One intersection slab row layout: [geom (6) | colors (c_total)] — the
# gathers, DMAs and gradient buffers are all sized 6 + c_total instead of
# a fixed 16, and geometry+color travel in ONE slab (one DMA per chunk).
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
LOG_T_EPS = -9.210340371976182  # log(1e-4)


def bf16_split_enabled() -> bool:
    """Use 3-pass bf16 operand splitting for the exact-RHS MXU dots.

    TPU f32 `Precision.HIGHEST` lowers to SIX bf16 MXU passes (3-way
    split of BOTH operands). When one operand is EXACTLY
    bf16-representable (one-hot selectors, the 0/1 triangular-cumsum
    matrix), splitting only the value side gives full f32-exact values
    in THREE passes — the recovery lever documented in
    docs/SORT_WALL.md §5 for the f32 precision tax (VERDICT r3 weak #1).
    Exactness: for f32 x, hi=bf16(x), mid=bf16(x-hi), lo=x-hi-mid has
    <= 8 significant bits left, so lo is bf16-exact and hi+mid+lo == x
    bit-for-bit; one-hot selections reproduce x exactly ((hi+mid) is a
    16-bit-mantissa value, exactly representable, then +lo restores x).
    Cumulative sums accumulate each pass in f32 — same error class as
    HIGHEST, different rounding order.

    Default: ON for compiled TPU kernels, OFF elsewhere (CPU bf16 dots
    are emulated and slow; the XLA-twin/golden tests stay f32).
    Override with MTGS_BF16_SPLIT=1/0.
    """
    env = os.environ.get("MTGS_BF16_SPLIT")
    if env is not None:
        return env != "0"
    return jax.default_backend() in ("tpu", "axon")


def dot_exact_rhs(values: jax.Array, rhs: jax.Array, dnums):
    """`dot_general(values, rhs)` with f32-exact results where `rhs` is
    exactly bf16-representable (0/1 matrices): 3 bf16 passes when
    splitting is enabled, else one HIGHEST (6-pass) f32 dot."""
    if not bf16_split_enabled():
        return jax.lax.dot_general(
            values, rhs, dnums, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    # Operands stay f32 (Mosaic rejects explicit bf16 matmul operands:
    # "Bad lhs type", measured on v5e) but hold bf16-EXACT values;
    # precision DEFAULT lowers each dot to ONE bf16 MXU pass whose
    # operand rounding is then the identity. f32 accumulate.
    hi = values.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = values - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r1 - mid
    acc = None
    for part in (hi, mid, lo):
        d = jax.lax.dot_general(
            part, rhs, dnums, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = d if acc is None else acc + d
    return acc


class BlendCarry(NamedTuple):
    """Per-pixel state carried across a tile's chunks."""

    log_t_all: jax.Array   # cumulative log-T over ALL alpha-passing gaussians
    log_t_out: jax.Array   # cumulative log-T over composited gaussians only
    rgb: jax.Array         # [c_total, PIX] accumulated premultiplied color


class BwdCarry(NamedTuple):
    log_t_all: jax.Array   # [PIX, 1]
    wg_cum: jax.Array      # [PIX, 1] inclusive cumsum of w * gdot


@functools.lru_cache(maxsize=None)
def _pixel_features_np(tile_size: int):
    import numpy as np

    P = tile_size * tile_size
    p = np.arange(P)
    x = (p % tile_size).astype(np.float32) + 0.5  # pixel centers, tile-local
    y = (p // tile_size).astype(np.float32) + 0.5
    F = np.stack([x * x, y * y, x * y, x, y, np.ones_like(x)], axis=-1)
    return F  # [P, 6]


def pixel_features(tile_size: int) -> jax.Array:
    """Constant [PIX, 6] tile-local pixel monomials [x², y², xy, x, y, 1]."""
    return jnp.asarray(_pixel_features_np(tile_size))


@functools.lru_cache(maxsize=None)
def _tri_incl_np(n: int):
    import numpy as np

    # LT[j, i] = 1 if j <= i: (x @ LT)[p, i] = inclusive cumsum over gaussians.
    return np.tril(np.ones((n, n), dtype=np.float32)).T


def tri_inclusive(n: int = CHUNK) -> jax.Array:
    return jnp.asarray(_tri_incl_np(n))


def init_carry(tile_size: int, c_total: int, dtype=jnp.float32) -> BlendCarry:
    P = tile_size * tile_size
    return BlendCarry(
        log_t_all=jnp.zeros((P, 1), dtype),
        log_t_out=jnp.zeros((P, 1), dtype),
        rgb=jnp.zeros((c_total, P), dtype),
    )


def _chunk_common(geom, origin_x, origin_y, F, LT, log_t_all, bounds=None):
    """Shared fwd/bwd per-chunk quantities.

    Args:
        geom: [6, CHUNK] packed rows (mx, my, cA, cB, cC, opac).
        origin_x, origin_y: scalar pixel coords of the tile's corner.
        F: [PIX, 6] pixel features; LT: [CHUNK, CHUNK] inclusive-triangular.
        log_t_all: [PIX, 1] carry.
        bounds: optional (lo, hi) scalars — live lanes of this chunk are
            lane in [lo, hi); the rest belong to ADJACENT tiles' ranges
            (the tile's run is unaligned inside its 128-aligned chunk
            windows) and are masked to no-ops.

    Returns dict of per-chunk tensors.
    """
    mxl = geom[0:1, :] - origin_x   # [1, CHUNK] tile-local mean
    myl = geom[1:2, :] - origin_y
    cA = geom[2:3, :]
    cB = geom[3:4, :]
    cC = geom[4:5, :]
    opac = geom[5:6, :]

    Q = jnp.concatenate(
        [
            0.5 * cA,
            0.5 * cC,
            cB,
            -(cA * mxl + cB * myl),
            -(cC * myl + cB * mxl),
            0.5 * (cA * mxl * mxl + cC * myl * myl) + cB * mxl * myl,
        ],
        axis=0,
    )  # [6, CHUNK]

    S = jax.lax.dot_general(
        F, Q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [PIX, CHUNK] Mahalanobis/2
    E = jnp.exp(-S)
    raw = opac * E
    contrib = jnp.logical_and(S >= 0.0, raw >= ALPHA_MIN)
    if bounds is not None:
        lo, hi = bounds
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S.shape[1]), 1)
        contrib = jnp.logical_and(
            contrib, jnp.logical_and(lane >= lo, lane < hi)
        )
    contrib = contrib.astype(S.dtype)
    alpha = jnp.minimum(raw, ALPHA_MAX) * contrib
    L = jnp.log1p(-alpha)
    # inclusive cumsum over the gaussian axis (triangular matmul, MXU;
    # the 0/1 triangular side is bf16-exact, so the 3-pass value split
    # applies — see dot_exact_rhs)
    incl = dot_exact_rhs(L, LT, (((1,), (0,)), ((), ()))) + log_t_all
    mask = (incl > LOG_T_EPS).astype(S.dtype)
    T = jnp.exp(incl - L)  # transmittance BEFORE each gaussian
    w = alpha * T * mask   # composited weight
    return dict(
        mxl=mxl, myl=myl, cA=cA, cB=cB, cC=cC, opac=opac,
        S=S, E=E, raw=raw, contrib=contrib, alpha=alpha, L=L,
        incl=incl, mask=mask, T=T, w=w,
    )


def forward_chunk(
    carry: BlendCarry,
    slab: jax.Array,   # [6 + c_total, CHUNK] = [geom | colors]
    origin_x,
    origin_y,
    F: jax.Array,
    LT: jax.Array,
    bounds=None,
) -> BlendCarry:
    """Blend one chunk of CHUNK gaussians into the tile accumulators."""
    geom, col = slab[:NUM_GEOM], slab[NUM_GEOM:]
    c = _chunk_common(geom, origin_x, origin_y, F, LT, carry.log_t_all, bounds)
    # rgb[ch, p] += sum_i col[ch, i] * w[p, i]
    rgb = carry.rgb + jax.lax.dot_general(
        col, c["w"], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    log_t_all = carry.log_t_all + jnp.sum(c["L"], axis=1, keepdims=True)
    log_t_out = carry.log_t_out + jnp.sum(c["L"] * c["mask"], axis=1, keepdims=True)
    return BlendCarry(log_t_all=log_t_all, log_t_out=log_t_out, rgb=rgb)


def backward_chunk(
    carry: BwdCarry,
    slab: jax.Array,       # [6 + c_total, CHUNK] = [geom | colors]
    origin_x,
    origin_y,
    g_rgb: jax.Array,      # [c_total, PIX] cotangent of accumulated color
    g_t: jax.Array,        # [PIX, 1] cotangent of the T_final output
    t_final: jax.Array,    # [PIX, 1] forward T_final
    total_dot: jax.Array,  # [PIX, 1] sum_ch g_rgb * rgb_total
    F: jax.Array,
    LT: jax.Array,
    bounds=None,
):
    """Replay one chunk front-to-back; return per-chunk gradients + carry.

    Returns:
        (g_slab [6 + c_total, CHUNK], new_carry) — g_slab rows are
        (g_mx, g_my, g_cA, g_cB, g_cC, g_opac, g_colors...).
        Masked (bounds) lanes produce exact-zero gradients.
    """
    geom, col = slab[:NUM_GEOM], slab[NUM_GEOM:]
    c = _chunk_common(geom, origin_x, origin_y, F, LT, carry.log_t_all, bounds)
    alpha, mask, T, w = c["alpha"], c["mask"], c["T"], c["w"]

    # gdot[p, i] = sum_ch g_rgb[ch, p] * col[ch, i]
    gdot = jax.lax.dot_general(
        g_rgb, col, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    wg = w * gdot
    incl_wg = dot_exact_rhs(wg, LT, (((1,), (0,)), ((), ()))) + carry.wg_cum
    suffix = total_dot - incl_wg  # sum over later composited gaussians of w*gdot
    one_m = 1.0 - alpha           # >= 1 - ALPHA_MAX for composited entries

    # dL/dalpha_i: own-term + suffix renormalization + T_final output path.
    ga = (T * gdot - suffix / one_m - g_t * t_final / one_m) * mask * c["contrib"]
    notclamp = (c["raw"] <= ALPHA_MAX).astype(alpha.dtype)
    g_sigma = -alpha * ga * notclamp                      # [PIX, CHUNK]
    g_opac_col = jnp.sum(c["E"] * ga * notclamp, axis=0)  # [CHUNK]

    # Moments M[k, i] = sum_p F[p, k] * g_sigma[p, i]  (MXU)
    M = jax.lax.dot_general(
        F, g_sigma, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [6, CHUNK]
    m_xx, m_yy, m_xy = M[0:1], M[1:2], M[2:3]
    m_x, m_y, m_0 = M[3:4], M[4:5], M[5:6]
    mxl, myl = c["mxl"], c["myl"]
    cA, cB, cC = c["cA"], c["cB"], c["cC"]

    dx_sum = m_x - mxl * m_0   # sum_p g_sigma * (x - mx)
    dy_sum = m_y - myl * m_0
    g_cA = 0.5 * (m_xx - 2.0 * mxl * m_x + mxl * mxl * m_0)
    g_cB = m_xy - mxl * m_y - myl * m_x + mxl * myl * m_0
    g_cC = 0.5 * (m_yy - 2.0 * myl * m_y + myl * myl * m_0)
    g_mx = -(cA * dx_sum + cB * dy_sum)
    g_my = -(cC * dy_sum + cB * dx_sum)

    # g_col[ch, i] = sum_p g_rgb[ch, p] * w[p, i]
    g_col = jax.lax.dot_general(
        g_rgb, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    g_slab = jnp.concatenate(
        [g_mx, g_my, g_cA, g_cB, g_cC, g_opac_col[None, :], g_col], axis=0
    )  # [6 + c_total, CHUNK]

    new_carry = BwdCarry(
        log_t_all=carry.log_t_all + jnp.sum(c["L"], axis=1, keepdims=True),
        wg_cum=carry.wg_cum + jnp.sum(wg, axis=1, keepdims=True),
    )
    return g_slab, new_carry
