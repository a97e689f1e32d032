#!/bin/sh
# V=5120 subword corpus (BASELINE.md V-scaling accuracy companion):
# 3000-word inventory, 12288 train utts (~14 instances/word), spm 5120.
set -e
OUT=${1:-data/synth_sub5k}
python -m end_to_end_asr_pytorch_tpu.data.make_synthetic \
    --out "$OUT" --n_train 12288 --n_dev 64 --n_test 64 \
    --min_words 2 --max_words 5 --word_inventory 3000
find "$OUT/train-clean" -name '*.trans.txt' -exec cat {} + \
    | cut -d' ' -f2- | tr 'A-Z' 'a-z' > "$OUT/train_text.txt"
python util/generate_vocab_file.py --input_file "$OUT/train_text.txt" \
    --mode subword --vocab_size 5120 --format spm \
    --output_file "$OUT/bpe5120.model"
echo "subword5k corpus ready at $OUT"
