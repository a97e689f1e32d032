#!/bin/sh
# Round-5 on-chip measurement chain (run ONLY with the chip idle; one
# client at a time — see NOTES.md second-client hang gotcha).
#   1. ctc_sub5k TRAIN-split control decode (is dev WER 0.96 memorization
#      or a decode bug? train WER ~0 confirms the pipeline and pins the
#      generalization story).
#   2. tests_tpu on-chip suite (round-5 gates).
#   3. bench_floor.py -- large-V decode roofline rows (VERDICT r4 item 4).
#   4. bench_train_floor.py -- train-step roofline (VERDICT r4 weak #2).
#   5. byte_identity_check.sh on las_subword_long (NOTES ledger item 3).
#   6. flagship bench.py re-run (gates).
#   7. bench_floor.py --cold -- the V=1024/w32 978 s first-compile
#      re-measure (last; may take ~15 min; bounded).
# Logs to /tmp/r5m_*.log.
set -x
cd /root/repo
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

echo "=== 1. ctc5k train-split control decode ($(date +%H:%M:%S)) ==="
python - <<'EOF'
import yaml
cfg = yaml.safe_load(open("config/synthetic/ctc_sub5k.yaml"))
cfg["data"]["corpus"]["test_split"] = ["train-clean"]
yaml.safe_dump(cfg, open("/tmp/ctc_sub5k_trainsplit.yaml", "w"))
EOF
$ENV timeout 1800 python main.py --config /tmp/ctc_sub5k_trainsplit.yaml \
    --test --load ckpt/ctc_sub5k_sd0/best_ctc.pth --name ctc5k_trainsplit \
    > /tmp/r5m_trainsplit.log 2>&1
grep -E "WER" /tmp/r5m_trainsplit.log | tail -2

echo "=== 2. tests_tpu on-chip ($(date +%H:%M:%S)) ==="
$ENV timeout 3600 python -m pytest tests_tpu/ -q \
    > /tmp/r5m_tests_tpu.log 2>&1
tail -2 /tmp/r5m_tests_tpu.log

echo "=== 3. bench_floor ($(date +%H:%M:%S)) ==="
$ENV timeout 5400 python util/bench_floor.py > /tmp/r5m_floor.log 2>&1
tail -5 /tmp/r5m_floor.log

echo "=== 4. bench_train_floor ($(date +%H:%M:%S)) ==="
$ENV timeout 3600 python util/bench_train_floor.py \
    > /tmp/r5m_train_floor.log 2>&1
tail -3 /tmp/r5m_train_floor.log

echo "=== 5. byte identity (las_subword_long) ($(date +%H:%M:%S)) ==="
timeout 3600 sh util/byte_identity_check.sh \
    config/synthetic/las_subword_long.yaml \
    ckpt/las_subword_long_sd0/best_att.pth \
    > /tmp/r5m_byteid.log 2>&1
tail -3 /tmp/r5m_byteid.log

echo "=== 6. flagship bench ($(date +%H:%M:%S)) ==="
$ENV timeout 1800 python bench.py > /tmp/r5m_bench.log 2>&1
tail -1 /tmp/r5m_bench.log

echo "=== 7. cold-compile w32 re-measure ($(date +%H:%M:%S)) ==="
$ENV timeout 2400 python util/bench_floor.py --cold \
    > /tmp/r5m_cold.log 2>&1
tail -1 /tmp/r5m_cold.log

echo "=== R5 MEASURE CHAIN DONE ($(date +%H:%M:%S)) ==="
