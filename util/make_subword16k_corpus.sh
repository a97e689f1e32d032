#!/bin/sh
# V=16384 subword corpus (BASELINE.md large-V floor companion): the
# inventory-guidance claim needs a TRAINED V=16k model, not an inference.
# 12000-word inventory (the 3000-word sub5k corpus saturates spm at 4591
# pieces; 12000 words saturate well above 16384 by the measured ~1.53
# pieces/word ratio), 49152 train utts (~14 instances/word, the sub5k
# density), spm 16384.
set -e
OUT=${1:-data/synth_sub16k}
python -m end_to_end_asr_pytorch_tpu.data.make_synthetic \
    --out "$OUT" --n_train 49152 --n_dev 64 --n_test 64 \
    --min_words 2 --max_words 5 --word_inventory 12000
find "$OUT/train-clean" -name '*.trans.txt' -exec cat {} + \
    | cut -d' ' -f2- | tr 'A-Z' 'a-z' > "$OUT/train_text.txt"
python util/generate_vocab_file.py --input_file "$OUT/train_text.txt" \
    --mode subword --vocab_size 16384 --format spm \
    --output_file "$OUT/bpe16384.model"
echo "subword16k corpus ready at $OUT"
