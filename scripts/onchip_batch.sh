#!/usr/bin/env bash
# One-shot on-chip measurement batch for the fused raster path.
#
# The TPU is reached over a tunnel that is intermittently down; this
# script front-loads every pending on-chip step (see
# docs/CROSSWALK.md + memory "fused-path-plan") so a single window of
# tunnel uptime collects everything unattended:
#   1. microbench_ops        — primitive sort/gather costs
#   2. validate_fused        — fused vs classic forward/grad parity ON CHIP
#   3. profile_raster        — stage timings, classic vs fused
#   4. bench.py              — end-to-end step time, {classic, fused} x
#                              {plain, MTGS_DB_DMA=1}
#
# Results land in results/onchip/<timestamp>/ as separate logs; the
# script keeps going past individual failures (each step's exit code is
# recorded in status.tsv).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"

STAMP=$(date +%Y%m%d_%H%M%S)
OUT="results/onchip/$STAMP"
mkdir -p "$OUT"
STATUS="$OUT/status.tsv"
: > "$STATUS"

run_step() { # name timeout_s env... -- cmd...
    local name=$1 tmo=$2; shift 2
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    echo "=== $name (timeout ${tmo}s): env ${envs[*]:-<none>} $*" | tee -a "$OUT/batch.log"
    env "${envs[@]}" timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
    local rc=$?
    printf '%s\t%s\n' "$name" "$rc" >> "$STATUS"
    echo "=== $name -> exit $rc" | tee -a "$OUT/batch.log"
    return 0
}

# fail fast if the tunnel is down: 600s probe
timeout 630 python - <<'EOF'
import threading, time, sys
ok = threading.Event()
def probe():
    import jax; jax.devices(); ok.set()
threading.Thread(target=probe, daemon=True).start()
t0 = time.time()
while time.time() - t0 < 600:
    if ok.wait(15):
        print("tunnel up"); sys.exit(0)
print("tunnel down"); sys.exit(1)
EOF
if [ $? -ne 0 ]; then
    echo "TPU tunnel down — aborting batch" | tee -a "$OUT/batch.log"
    printf 'probe\t1\n' >> "$STATUS"
    exit 1
fi
printf 'probe\t0\n' >> "$STATUS"

run_step microbench      1800 -- python -m mtgs_tpu.tools.microbench_ops
run_step validate_fused  1800 -- python -m mtgs_tpu.tools.validate_fused
run_step profile_classic 1800 -- python -m mtgs_tpu.tools.profile_raster --iters 10
run_step profile_fused   1800 -- python -m mtgs_tpu.tools.profile_raster --iters 10 --fused --trace /tmp/mtgs_trace
run_step bench_fused         1800 -- python bench.py
run_step bench_classic       1800 MTGS_FUSED=0 -- python bench.py

run_step bench_classic_nodb  1800 MTGS_FUSED=0 MTGS_DB_DMA=0 -- python bench.py
run_step bench_fused_nodb    1800 MTGS_DB_DMA=0 -- python bench.py
run_step train_fused         2400 -- python -m mtgs_tpu.tools.bench_train --fused
run_step train_classic       2400 -- python -m mtgs_tpu.tools.bench_train
run_step grow_demo           3600 -- python -m mtgs_tpu.tools.grow_demo
# eval + interpolated render + viewer on the chip (VERDICT r2 weak #6)
run_step eval_render_viewer  2400 -- python -m mtgs_tpu.tools.onchip_smoke

echo "=== batch complete ==="
cat "$STATUS"
echo "logs in $OUT"
