"""TPU-native end-to-end speech recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Alexander-H-Liu/End-to-end-ASR-Pytorch (see SURVEY.md at the repo root for the
structural blueprint). The compute path is jax/flax/optax with Pallas kernels
for hot ops; the runtime around it (edit distance, audio decode) uses native
C++ via ctypes where the reference delegated to native dependencies
(editdistance, sox/torchaudio, sentencepiece).

Public surface mirrors the reference (SURVEY.md section 1):
  - ``main.py --config x.yaml [--test|--lm]`` CLI
  - YAML config schema: data/{corpus,audio,text}, model, hparas, decode
  - tokenizer index contract: 0=<pad>(=CTC blank, CE ignore), 1=<sos>/<eos>, 2=<unk>
"""

__version__ = "0.1.0"
