#!/bin/bash
# Hardware (TPU) test lane: runs the tpu-marked pytest tests on the real
# chip — Pallas kernels (potrf tile, trsm tile, bulge chaser) and the local
# drivers at small sizes. This is the analog of the reference's GPU-enabled
# CI jobs (ci/cuda/*.yml): the CPU lane validates logic, this lane validates
# the Mosaic lowerings and the axon-backend behaviors (f64 emulation range,
# DMA alignment) that only reproduce on hardware.
#
# Run it before benching after any kernel change:
#   scripts/run_tpu_lane.sh
set -u
cd "$(dirname "$0")/.."
# see run_fast_lane.sh: pre-exec unlimited stack for the cache serializer
ulimit -s unlimited 2>/dev/null || true
DLAF_TPU_TESTS=1 python -m pytest tests -m tpu -q "$@"
rc=$?
if [ $rc -eq 0 ]; then
    echo "tpu lane: green"
fi
exit $rc
