#!/usr/bin/env bash
# Real-data acceptance: place the dataset archives under data/ and run
#   tools/verify_realdata.sh [c10|c100|svhn]
# Verifies archive md5s, runs the 200-epoch README recipe on the TPU, and
# asserts the published accuracy + reports time-to-accuracy vs BASELINE.md.
# See tools/verify_realdata.py for details; --dry-run for the CI path.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python tools/verify_realdata.py --dataset "${1:-c10}" "${@:2}"
