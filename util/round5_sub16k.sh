#!/bin/sh
# Round-5 V=16384 trained-model chain (BASELINE.md large-V floor
# companion): corpus+spm (CPU) -> LM train -> ASR train -> beam+LM
# decode exact AND +approx_topk on the trained checkpoint. Produces the
# measured inventory-guidance evidence: WER + trained-model throughput
# at a real V~16k, against the sub5k row (804-871 utts/sec, WER 0.005).
# Run from the repo root on the TPU host, chip idle (one client at a
# time — NOTES.md second-client hang gotcha). Logs /tmp/r5_16k_*.log.
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

if [ ! -f data/synth_sub16k/bpe16384.model ]; then
  echo "=== corpus + spm 16384 ($(date +%H:%M:%S)) ==="
  sh util/make_subword16k_corpus.sh > /tmp/r5_16k_corpus.log 2>&1 || exit 1
  tail -1 /tmp/r5_16k_corpus.log
fi
python - <<'EOF'
from end_to_end_asr_pytorch_tpu.utils.sentencepiece_model import parse_model_proto
pieces = parse_model_proto(open("data/synth_sub16k/bpe16384.model", "rb").read())
print(f"effective spm vocab: {len(pieces)}")
EOF

echo "=== lm_sub16k train ($(date +%H:%M:%S)) ==="
train_retry config/synthetic/lm_sub16k.yaml ckpt/lm_sub16k_sd0 \
  /tmp/r5_16k_lm.log --lm || exit 1
grep -E "DEV|ppx" /tmp/r5_16k_lm.log | tail -3

echo "=== las_sub16k train ($(date +%H:%M:%S)) ==="
train_retry config/synthetic/las_sub16k.yaml ckpt/las_sub16k_sd0 \
  /tmp/r5_16k_train.log --amp || exit 1
grep -E "DEV" /tmp/r5_16k_train.log | tail -8

echo "=== las_sub16k beam+LM decode: exact ($(date +%H:%M:%S)) ==="
$ENV timeout 5400 python main.py --config config/synthetic/las_sub16k.yaml \
    --test --load ckpt/las_sub16k_sd0/best_att.pth --name sub16k_default \
    > /tmp/r5_16k_decode.log 2>&1
grep -E "WER" /tmp/r5_16k_decode.log | tail -2

echo "=== las_sub16k beam+LM decode: approx_topk 0.95 ($(date +%H:%M:%S)) ==="
python - <<'EOF'
import yaml
cfg = yaml.safe_load(open("config/synthetic/las_sub16k.yaml"))
cfg["decode"]["approx_topk"] = 0.95
yaml.safe_dump(cfg, open("/tmp/las_sub16k_atk.yaml", "w"))
EOF
$ENV timeout 5400 python main.py --config /tmp/las_sub16k_atk.yaml \
    --test --load ckpt/las_sub16k_sd0/best_att.pth --name sub16k_atk95 \
    > /tmp/r5_16k_decode_atk.log 2>&1
grep -E "WER" /tmp/r5_16k_decode_atk.log | tail -2

echo "=== SUB16K CHAIN DONE ($(date +%H:%M:%S)) ==="
