#!/bin/sh
# On-chip CLI byte-identity re-confirm (VERDICT round-3 item 3): decode a
# trained checkpoint through the CLI twice — once from the native file and
# once from a torch-format export of the SAME weights — and diff the output
# CSVs byte-for-byte. Usage:
#   sh util/byte_identity_check.sh <config.yaml> <ckpt.pth> [--cpu]
# Run only when the chip is idle (never while another client holds it).
set -e
CFG=${1:-config/synthetic/las_subword_long.yaml}
CKPT=${2:-ckpt/las_subword_long_sd0/best_att.pth}
EXTRA=${3:-}
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

$ENV python - "$CFG" "$CKPT" <<'EOF'
# Export the native checkpoint's weights as a reference-style torch file.
import sys
sys.path.insert(0, "tests")
import jax
jax.config.update("jax_platforms", "cpu")   # export is host-side only
import torch, yaml
from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.ops.audio import create_transform
from end_to_end_asr_pytorch_tpu.utils.checkpoint import load_checkpoint
from end_to_end_asr_pytorch_tpu.utils.text import load_text_encoder
from test_torch_ckpt import export_asr_state_dict

cfg = yaml.safe_load(open(sys.argv[1]))
tok = load_text_encoder(cfg["data"]["text"]["mode"],
                        cfg["data"]["text"]["vocab_file"])
_, feat_dim = create_transform(cfg["data"]["audio"])
model = ASR(feat_dim, tok.vocab_size, cfg["model"])
params = model.init(jax.random.PRNGKey(0))
ck = load_checkpoint(sys.argv[2], params)
sd = export_asr_state_dict(ck["model"])
torch.save({"model": sd, "global_step": ck["global_step"]},
           "/tmp/byteid_torch.pth")
print("exported /tmp/byteid_torch.pth @ step", ck["global_step"])
EOF

for src in native torch; do
  LOAD=$CKPT
  [ $src = torch ] && LOAD=/tmp/byteid_torch.pth
  echo "=== decode from $src ckpt ($(date +%H:%M:%S)) ==="
  $ENV python main.py --config "$CFG" --test --load "$LOAD" \
      --name byteid_$src --outdir /tmp/byteid_out $EXTRA \
      > /tmp/byteid_$src.log 2>&1
  grep -E "WER" /tmp/byteid_$src.log | tail -2
done

if cmp /tmp/byteid_out/byteid_native_sd0/test_output.csv \
      /tmp/byteid_out/byteid_torch_sd0/test_output.csv; then
  echo "BYTE-IDENTICAL: test_output.csv native vs torch-import"
else
  echo "MISMATCH"; exit 1
fi
