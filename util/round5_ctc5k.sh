#!/bin/sh
# Round-5 diagnosis chain: CTC-only at V=4591 (isolates the joint
# model's CTC-head plateau), then greedy decode of best_ctc + latest.
# Run from the repo root on the TPU host; logs /tmp/r5_ctc5k_*.log.
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

train_retry() {
  cfg=$1; ckdir=$2; log=$3; shift 3
  for attempt in 1 2 3; do
    RESUME=""
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

echo "=== ctc_sub5k train ($(date +%H:%M:%S)) ==="
train_retry config/synthetic/ctc_sub5k.yaml ckpt/ctc_sub5k_sd0 \
  /tmp/r5_ctc5k_train.log --amp || exit 1
grep -E "DEV" /tmp/r5_ctc5k_train.log | tail -8

for ckpt in best_ctc latest; do
  echo "=== ctc_sub5k greedy decode $ckpt ($(date +%H:%M:%S)) ==="
  $ENV python main.py --config config/synthetic/ctc_sub5k.yaml --test \
      --load ckpt/ctc_sub5k_sd0/$ckpt.pth --name ctc5k_$ckpt \
      > /tmp/r5_ctc5k_decode_$ckpt.log 2>&1
  grep -E "WER" /tmp/r5_ctc5k_decode_$ckpt.log | tail -2
done
echo "=== CTC5K CHAIN DONE ($(date +%H:%M:%S)) ==="
