#!/bin/bash
# Full TPU validation + measurement sequence, for when the axon tunnel is
# (back) up. Run unattended: hardware test lane, then the headline bench
# (self-tunes trailing kernel x nb, band, dist A/B with its leftover
# budget), then the dist profiler if the dist/local ratio is still > 1.15.
#
# Usage: scripts/tpu_session.sh [bench_budget_seconds=2400]
set -u
cd "$(dirname "$0")/.."
ulimit -s unlimited 2>/dev/null || true
budget=${1:-2400}

echo "=== [1/3] hardware test lane ==="
scripts/run_tpu_lane.sh
lane_rc=$?
echo "tpu lane rc=$lane_rc"

echo "=== [2/3] bench.py (budget ${budget}s) ==="
DLAF_BENCH_BUDGET_S=$budget timeout $((budget + 600)) python bench.py
bench_rc=$?
echo "bench rc=$bench_rc"

echo "=== [3/3] dist profile (only if gap > 1.15) ==="
ratio=$(python - <<'EOF'
import json
try:
    print(json.load(open("BENCH_DIST.json")).get("potrf_dist_over_local", 99))
except Exception:
    print(99)
EOF
)
if python -c "import sys; sys.exit(0 if float('$ratio') > 1.15 else 1)"; then
    timeout 3000 python scripts/profile_dist.py | tail -50
else
    echo "dist/local = $ratio <= 1.15, skipping profile"
fi
exit $((lane_rc + bench_rc))
