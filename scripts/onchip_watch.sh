#!/usr/bin/env bash
# Keep retrying the on-chip measurement batch until the TPU tunnel is up
# and the batch completes. Intended to run inside tmux: it may loop for
# hours if the tunnel stays down.
set -u
cd "$(dirname "$0")/.."

while true; do
    bash scripts/onchip_batch.sh
    rc=$?
    if [ $rc -eq 0 ]; then
        echo "onchip_watch: batch completed"
        break
    fi
    echo "onchip_watch: batch failed (rc=$rc, likely tunnel down); retrying in 600s"
    sleep 600
done
