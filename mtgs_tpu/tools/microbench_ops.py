"""Micro-benchmarks for the rasterizer's index-movement primitives (TPU).

Decides data-movement strategy questions the module docstrings answer
with rough rates (gathers ~7 ns/row, "sorts ~4x cheaper per element"):
measures, on the live chip at bench.py sizes, the actual cost of

  * k-operand `lax.sort` at intersection capacity (k = 1..18) and at
    gaussian count,
  * random row gathers (the `table_pad[gidx]` pattern) at both sizes,
  * `jnp.stack` of sorted rows and the blocked Pallas transposes.

Used to choose between "move attributes through the pair sort as
payload operands" vs "sort indices only + random-gather the attributes"
(rasterize.py `_gather_fwd`). Run: `python -m mtgs_tpu.tools.microbench_ops`.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    """Chained timing: every iteration's FIRST operand is perturbed by a
    value derived from the previous output, so successive executions have
    distinct inputs and a real data dependency. (The original version
    queued `iters` calls with IDENTICAL args — those measured ~10x too
    fast vs in-context stage timings: identical queued executions appear
    to be de-duplicated somewhere in the device-tunnel stack. Sorts here
    are comparator networks, so feeding perturbed/sorted data back does
    not change their cost.)"""

    def step(first, rest):
        out = fn(first, *rest)
        outs = out if isinstance(out, (tuple, list)) else (out,)
        # consume EVERY output: XLA deletes unused variadic-sort payload
        # results entirely (a k-operand sort with unused payloads times
        # like a 1-operand sort), so fold a data-dependent zero from each
        # output into the next first operand
        delta = sum((o.ravel()[0] * 0).astype(first.dtype) for o in outs) + 1
        return out, first + delta

    f = jax.jit(step)
    out, first = f(args[0], args[1:])
    jax.block_until_ready((out, first))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, first = f(first, args[1:])
    jax.block_until_ready((out, first))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    cap = 2 << 20          # intersection capacity (bench.py MAX_ISECT)
    n = 1_000_000          # gaussian count
    w = 16                 # slab width
    rng = np.random.default_rng(0)

    key_cap = jnp.asarray(rng.integers(0, 1 << 30, cap, dtype=np.int32))
    key_n = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    rows_cap = [jnp.asarray(rng.normal(size=cap).astype(np.float32))
                for _ in range(18)]
    rows_n = [jnp.asarray(rng.normal(size=n).astype(np.float32))
              for _ in range(13)]
    gidx = jnp.asarray(rng.integers(0, n, cap, dtype=np.int32))
    inv_perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    table = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    table_t = table.T.copy()

    for k in (1, 2, 3, 5, 11, 17):
        timeit(f"lax.sort {k}-operand @cap={cap}",
               lambda key, *rs: jax.lax.sort((key, *rs), num_keys=1,
                                             is_stable=False),
               key_cap, *rows_cap[: k - 1])
    timeit("lax.sort 2-operand STABLE @cap",
           lambda key, r: jax.lax.sort((key, r), num_keys=1, is_stable=True),
           key_cap, rows_cap[0])
    for k in (2, 5, 11, 13):
        timeit(f"lax.sort {k}-operand @n={n}",
               lambda key, *rs: jax.lax.sort((key, *rs), num_keys=1,
                                             is_stable=False),
               key_n, *rows_n[: k - 1])

    # ---- operand-count vs byte-count scaling diagnostics ----
    # bf16 payloads: if sort cost is BYTE-scaled, 11 bf16 payloads cost
    # ~half of 11 f32; if operand-count-scaled they cost the same.
    rows16 = [r.astype(jnp.bfloat16) for r in rows_cap[:11]]
    timeit("lax.sort 12-op bf16 payloads @cap",
           lambda key, *rs: jax.lax.sort((key, *rs), num_keys=1,
                                         is_stable=False),
           key_cap, *rows16)

    # complex64 packing: EXACT 2-f32-per-operand payload packing (re/im)
    # — if operand-count-scaled, the fused pipeline's 11-payload sorts
    # drop to 6 operands + cheap pack/unpack.
    def packed_sort(key, *rs):
        cs = [jax.lax.complex(rs[2 * i], rs[2 * i + 1]) for i in range(5)]
        out = jax.lax.sort((key, *cs, rs[10]), num_keys=1, is_stable=False)
        fs = []
        for i in range(5):
            fs += [jnp.real(out[1 + i]), jnp.imag(out[1 + i])]
        return (out[0], *fs, out[6])

    timeit("lax.sort c64-packed 11 f32 payloads @cap",
           packed_sort, key_cap, *rows_cap[:11])

    def pack_only(key, *rs):
        cs = [jax.lax.complex(rs[2 * i], rs[2 * i + 1]) for i in range(5)]
        fs = []
        for c in cs:
            fs += [jnp.real(c), jnp.imag(c)]
        return (key, *fs)

    timeit("c64 pack+unpack only (no sort) @cap",
           pack_only, key_cap, *rows_cap[:11])

    # capacity sensitivity: the bench workload measures 1.62M live pairs
    # in a 2M buffer — how much does a tighter capacity buy per sort?
    cap_t = (1_835_008)  # 1.75M, %512 == 0
    timeit(f"lax.sort 12-operand @cap={cap_t}",
           lambda key, *rs: jax.lax.sort((key, *rs), num_keys=1,
                                         is_stable=False),
           key_cap[:cap_t], *[r[:cap_t] for r in rows_cap[:11]])

    # the sort(key,iota) + row-gather alternative to payload sorts,
    # measured with the chained methodology (the r1 numbers for this were
    # the untrustworthy identical-queued kind)
    table_cap = jnp.asarray(rng.normal(size=(cap, 12)).astype(np.float32))
    iota_cap = jnp.arange(cap, dtype=jnp.int32)

    def sort_gather(key, g, t):
        _, p = jax.lax.sort((key, g), num_keys=1, is_stable=False)
        return t[p]

    timeit("sort(key,iota) + row-gather [cap]x12",
           sort_gather, key_cap, iota_cap, table_cap)

    timeit(f"row gather [cap]x{w} (table_pad[gidx])",
           lambda t, g: t[g], table, gidx)
    timeit("row gather [cap]x1 (int compose)",
           lambda t, g: t[g], table[:, 0], gidx)
    timeit(f"row gather [n]x{w} (table[perm])",
           lambda t, g: t[g], table, inv_perm)
    timeit("col gather attr-major [16, n] -> [16, cap]",
           lambda t, g: t[:, g], table_t, gidx)

    timeit("stack 16 rows -> [16, cap]",
           lambda *rs: jnp.stack(rs), *rows_cap[:16])

    if jax.default_backend() == "tpu":
        from mtgs_tpu.raster.blend_pallas import (attr_major_to_rows,
                                                  rows_to_attr_major)

        big = jnp.zeros((cap, w), jnp.float32)
        timeit("pallas transpose rows->attr [cap, 16]",
               rows_to_attr_major, big)
        timeit("pallas transpose attr->rows [16, cap]",
               attr_major_to_rows, jnp.zeros((w, cap), jnp.float32))


if __name__ == "__main__":
    main()
