#!/usr/bin/env bash
# Keep retrying the on-chip measurement batch until EVERY step passes.
# The tunnel can die mid-batch (steps then fail on device timeouts), so
# completion is judged from the newest run's status.tsv, not the batch
# exit code. May loop for hours if the tunnel stays down.
set -u
cd "$(dirname "$0")/.."

while true; do
    bash scripts/onchip_batch.sh
    latest=$(ls -t results/onchip | grep -E '^[0-9]{8}_' | head -1)
    if [ -n "$latest" ] && [ -s "results/onchip/$latest/status.tsv" ]; then
        bad=$(awk -F'\t' '$2 != 0 { n++ } END { print n+0 }' \
              "results/onchip/$latest/status.tsv")
        steps=$(wc -l < "results/onchip/$latest/status.tsv")
        if [ "$bad" -eq 0 ] && [ "$steps" -ge 11 ]; then
            echo "onchip_watch: batch green ($steps steps)"
            break
        fi
        echo "onchip_watch: $bad/$steps steps failed (tunnel down?); retry in 600s"
    else
        echo "onchip_watch: no status written; retry in 600s"
    fi
    sleep 600
done
