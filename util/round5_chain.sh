#!/bin/sh
# Round-5 chip chain (VERDICT r4 items 2a + 3 + gates):
#   1. CTC-only subword train (BASELINE config #2 at V=1024) + greedy decode
#   2. early-exit A/B on the trained long-subword checkpoint (the number
#      BASELINE.md:300 promised)
#   3. flagship bench + bench_details (end-of-round gates)
#   4. tests_tpu compiled kernel suite
# Run from the repo root on the TPU host; logs /tmp/r5_*.log.
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

train_retry() {
  cfg=$1; ckdir=$2; log=$3; shift 3
  for attempt in 1 2 3; do
    RESUME=""
    # -e, not -f: with ckpt_format: orbax latest.pth is a DIRECTORY
    [ -e "$ckdir/latest.pth" ] && RESUME="--load $ckdir/latest.pth"
    echo "--- train attempt $attempt ($cfg) $RESUME ($(date +%H:%M:%S))"
    if $ENV python main.py --config "$cfg" $RESUME "$@" >> "$log" 2>&1; then
      return 0
    fi
    echo "--- attempt $attempt FAILED (tail of $log):"; tail -3 "$log"
    sleep 30
  done
  echo "--- giving up on $cfg"; return 1
}

cd /root/repo

echo "=== ctc_subword train ($(date +%H:%M:%S)) ==="
train_retry config/synthetic/ctc_subword.yaml ckpt/ctc_subword_sd0 \
  /tmp/r5_ctcsub_train.log --amp || exit 1
grep -E "WER|saved" /tmp/r5_ctcsub_train.log | tail -6

for ckpt in best_ctc latest; do
  echo "=== ctc_subword greedy decode $ckpt ($(date +%H:%M:%S)) ==="
  $ENV python main.py --config config/synthetic/ctc_subword.yaml --test \
      --load ckpt/ctc_subword_sd0/$ckpt.pth --name ctcsub_$ckpt \
      > /tmp/r5_ctcsub_decode_$ckpt.log 2>&1
  grep -E "WER" /tmp/r5_ctcsub_decode_$ckpt.log | tail -2
done

echo "=== early-exit A/B on las_subword_long best_att ($(date +%H:%M:%S)) ==="
$ENV python bench_earlystop.py config/synthetic/las_subword_long.yaml \
    ckpt/las_subword_long_sd0/best_att.pth 2>&1 | tee /tmp/r5_earlystop.log

echo "=== flagship bench ($(date +%H:%M:%S)) ==="
$ENV python bench.py 2>&1 | tee /tmp/r5_bench.log
echo "=== bench_details ($(date +%H:%M:%S)) ==="
$ENV python bench_details.py 2>&1 | tee /tmp/r5_bench_details.log
echo "=== tests_tpu ($(date +%H:%M:%S)) ==="
$ENV python -m pytest tests_tpu/ -q 2>&1 | tail -5
echo "=== ROUND-5 CHAIN DONE ($(date +%H:%M:%S)) ==="
