#!/bin/bash
# VERDICT r3 item 6: replace the 2-epoch "learning but slow" evidence for the
# two slow-learner zoo entries with 10-epoch real-TPU curves (synthetic data,
# same config as tools/zoo_sweep.sh).  Sequential — the two runs share the
# one chip.  Logs: /tmp/slow_gnnmf_sbsed.log, /tmp/slow_ae_simple.log.
cd /root/repo
COMMON="--synthetic-data --max-epochs 10 --warmup-epoch 1 --num-layers 3"
bash tools/tpu_probe.sh
echo "=== gnnmf_sbsed 10ep $(date +%H:%M) ==="
python main.py --model-name gnnmf_sbsed --train-md-bases --optimizer madam $COMMON \
  > /tmp/slow_gnnmf_sbsed.log 2>&1
echo "rc=$? gnnmf_sbsed done $(date +%H:%M)"
sleep 30
bash tools/tpu_probe.sh
echo "=== ae_simple 10ep $(date +%H:%M) ==="
python main.py --model-name ae --ae-type simple --unsupervised-steps 1 $COMMON \
  > /tmp/slow_ae_simple.log 2>&1
echo "rc=$? ae_simple done $(date +%H:%M)"
echo "SLOW LEARNER RUNS DONE"
