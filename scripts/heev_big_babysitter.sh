#!/bin/bash
# Patient launcher for the contract-scale HEEV section on the shared tunnel
# server: the server reclaims exited clients' HBM after long, variable lags
# (round-5 observations: 15-60 min), and every failed allocation extends the
# wedge. Earlier design ran an external 4 GiB probe client first — that
# probe's own unreclaimed HBM then starved the real run launched seconds
# later (observed twice: internal probe "0/3 1 GiB blocks fit" right after
# an external probe success). So: NO external probe. Launch the section
# directly — its in-process probe allocates in the same client that runs,
# so probe success implies the run has the memory — and on failure sleep
# long enough for the failed-alloc debris to clear before retrying.
set -u
OUT=${1:-/tmp/heev_big_r5.json}
LOG=${2:-/tmp/heev_big_r5.log}
DEADLINE=$(( $(date +%s) + ${DLAF_BABYSIT_S:-9000} ))
FIRST_DELAY=${DLAF_BABYSIT_FIRST_DELAY_S:-600}
echo "$(date -u +%H:%M:%S) initial quiet period ${FIRST_DELAY}s"
sleep "$FIRST_DELAY"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if ! grep -q '"seconds"' "$OUT" 2>/dev/null; then
        echo "$(date -u +%H:%M:%S) launching heev_big"
        DLAF_BENCH_BUDGET_S=1400 timeout 1500 python \
            /root/repo/scripts/bench_sections.py heev_big "$OUT" \
            > "$LOG" 2>&1
        if grep -q '"seconds"' "$OUT" 2>/dev/null; then
            echo "$(date -u +%H:%M:%S) heev_big done"
        else
            echo "$(date -u +%H:%M:%S) no seconds in $OUT; sleeping 900"
            sleep 900
            continue
        fi
    fi
    # chained: complex64 contract-scale artifact (~9 GB peak, fits windows
    # the 12.9 GB f32 plan does not)
    if ! grep -q '"seconds"' /root/repo/HEEV_c64_16384.json 2>/dev/null; then
        echo "$(date -u +%H:%M:%S) launching heev_c64"
        timeout 1500 python /root/repo/scripts/bench_heev_c64.py \
            > /tmp/heev_c64.log 2>&1
        if grep -q '"seconds"' /root/repo/HEEV_c64_16384.json 2>/dev/null; then
            echo "$(date -u +%H:%M:%S) heev_c64 done"
            exit 0
        fi
        echo "$(date -u +%H:%M:%S) heev_c64 incomplete; sleeping 900"
        sleep 900
        continue
    fi
    exit 0
done
echo "babysitter deadline reached"
exit 1
