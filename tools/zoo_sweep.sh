#!/bin/bash
# Train every model-zoo entry for 2 epochs on the real TPU (synthetic data)
# and record pass/fail + final metrics in /tmp/zoo_sweep.log.  Used for
# whole-zoo revalidation after train-step/optimizer changes.
#
# Runs are launched with nohup and polled with a graceful deadline instead of
# `timeout` — SIGKILLing a process that holds the TPU wedges the chip for
# minutes (CLAUDE.md), which would cascade failures through the rest of the
# sweep.  On deadline we SIGTERM (lets JAX release the chip), wait, and pause
# before the next model.
cd /root/repo
COMMON="--synthetic-data --max-epochs 2 --warmup-epoch 1 --num-layers 3"
DEADLINE=${DEADLINE:-2400}
run() {
  name=$1; shift
  # gate every entry on relay health: after a deadline SIGTERM the chip can
  # wedge for many minutes (or the relay can be down outright), and starting
  # the next model anyway burns its deadline hanging in jax.devices()
  bash tools/tpu_probe.sh >> /tmp/zoo_sweep.log
  echo "=== $name: $@" >> /tmp/zoo_sweep.log
  nohup python main.py "$@" $COMMON > /tmp/zoo_$name.log 2>&1 &
  pid=$!
  waited=0
  while kill -0 $pid 2>/dev/null && [ $waited -lt $DEADLINE ]; do
    sleep 10; waited=$((waited + 10))
  done
  if kill -0 $pid 2>/dev/null; then
    kill -TERM $pid 2>/dev/null   # graceful: never SIGKILL a TPU holder
    # bounded grace: a client wedged in jax.devices() can ignore SIGTERM for
    # ~25 min (CLAUDE.md); such a client holds no grant, so after the grace
    # period abandon it (disown — do NOT SIGKILL in case it does hold the
    # chip) rather than stalling the rest of the sweep forever.
    grace=0
    while kill -0 $pid 2>/dev/null && [ $grace -lt 300 ]; do
      sleep 10; grace=$((grace + 10))
    done
    if kill -0 $pid 2>/dev/null; then
      echo "$name: still alive ${grace}s after SIGTERM, abandoning" >> /tmp/zoo_sweep.log
      disown $pid 2>/dev/null
    else
      wait $pid 2>/dev/null
    fi
    rc=124
    sleep 120   # let the chip release before the next model
  else
    wait $pid
    rc=$?
  fi
  tail=$(grep -E "Finished" /tmp/zoo_$name.log | tail -1)
  echo "$name rc=$rc $tail" >> /tmp/zoo_sweep.log
}
run vit        --model-name vit --label-smoothing
run aftfull    --model-name aftfull
run aftsimple  --model-name aftsimple
run hamburger  --model-name hamburger
run hamattn    --model-name hamburger_attention
run gnnmf_ham  --model-name gnnmf_ham --train-md-bases --optimizer madam
run gnnmf_sbs  --model-name gnnmf_sbs --train-md-bases --optimizer madam
run gnnmf_sbsed --model-name gnnmf_sbsed --train-md-bases --optimizer madam
run gmlp       --model-name gmlp
run wgmlp      --model-name wgmlp
run linear     --model-name linear
run ae_simple  --model-name ae --ae-type simple --unsupervised-steps 1
run ae_heads   --model-name ae --ae-type heads
run ae_2d      --model-name ae --ae-type 2d
run ae_baseline --model-name ae_baseline
run lgcnn      --model-name lgcnn
run wlgcnn     --model-name wlgcnn
run cnn_baseline --model-name cnn_baseline
echo "SWEEP DONE" >> /tmp/zoo_sweep.log
