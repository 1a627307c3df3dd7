#!/bin/bash
# Block until the axon relay grants a TPU device.
#
# Failure modes this handles (CLAUDE.md "relay outages"): a wedged/downed
# relay makes jax.devices() hang ~25 min in the stuck client before raising
# UNAVAILABLE, and that client's session never recovers — so poll with FRESH
# short-lived probe processes.  A probe stuck at init holds no grant, so
# SIGTERMing it cannot wedge the chip.
#
# Usage: tools/tpu_probe.sh [probe_timeout_s] [retry_sleep_s]
PROBE_T=${1:-180}
SLEEP_T=${2:-300}
while true; do
  nohup python -c "import jax; print('PROBE_OK', jax.devices())" > /tmp/tpu_probe.log 2>&1 &
  pid=$!
  waited=0
  while kill -0 $pid 2>/dev/null && [ $waited -lt $PROBE_T ]; do
    sleep 5; waited=$((waited + 5))
  done
  kill -TERM $pid 2>/dev/null; wait $pid 2>/dev/null
  if grep -q PROBE_OK /tmp/tpu_probe.log; then
    echo "tpu_probe: relay healthy"
    exit 0
  fi
  echo "tpu_probe: relay unavailable, retrying in ${SLEEP_T}s ($(date +%H:%M))"
  sleep $SLEEP_T
done
