#!/usr/bin/env python
"""CLI entry point.

Mirror of the reference's ``main.py`` (SURVEY.md 2.1): same flags, same
dispatch to three solvers (train ASR / train LM / test), YAML-config-driven.

  python main.py --config config/libri/asr_example.yaml            # train ASR
  python main.py --config config/libri/lm_example.yaml --lm        # train LM
  python main.py --config config/libri/asr_example.yaml --test     # decode

TPU notes: ``--cpu`` forces the CPU backend (useful with
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh);
``--amp`` enables bfloat16 compute in the model; ``--cudnn-ctc`` is accepted
for reference-CLI compatibility and ignored (CTC runs as an XLA/Pallas
kernel here).
"""
import argparse
import os
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU-native end-to-end ASR")
    ap.add_argument("--config", required=True, help="experiment yaml")
    ap.add_argument("--name", default=None, help="override experiment name")
    ap.add_argument("--logdir", default="log/", help="TensorBoard log dir")
    ap.add_argument("--ckpdir", default="ckpt/", help="checkpoint dir")
    ap.add_argument("--outdir", default="result/", help="decode output dir")
    ap.add_argument("--load", default=None, help="ckpt to load/resume")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cudnn-ctc", action="store_true",
                    help="(compat flag; CTC always runs on-device here)")
    ap.add_argument("--njobs", type=int, default=1,
                    help="host-side data loading workers")
    ap.add_argument("--cpu", action="store_true", help="run on CPU backend")
    ap.add_argument("--no-pin", action="store_true",
                    help="(compat flag; no pinned-memory concept on TPU)")
    ap.add_argument("--test", action="store_true", help="beam-decode mode")
    ap.add_argument("--no-msg", action="store_true", help="quiet console")
    ap.add_argument("--lm", action="store_true", help="train RNN-LM")
    ap.add_argument("--amp", action="store_true", help="bfloat16 compute")
    return ap


def setup_backend(cpu: bool) -> None:
    """Select the JAX backend BEFORE any computation initializes it.

    The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so ``--cpu``
    must go through ``jax.config.update`` (which is honored as long as the
    backend has not been created yet). The env var is still set for any
    worker subprocesses.
    """
    if cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    paras = build_parser().parse_args(argv)
    # persistent XLA compilation cache: resumes and repeated runs skip the
    # (tens of seconds per bucket shape) compile cost. Must be set BEFORE
    # the first `import jax` anywhere — jax reads the env var at import
    # time, and setup_backend(--cpu) imports jax.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / "jax_asr"))
    setup_backend(paras.cpu)

    import numpy as np
    random.seed(paras.seed)
    np.random.seed(paras.seed)

    from end_to_end_asr_pytorch_tpu.config import load_config
    config = load_config(paras.config)

    if not paras.no_msg:
        import jax
        print(f"[backend] {jax.default_backend()} x{jax.device_count()}")

    if paras.lm:
        from end_to_end_asr_pytorch_tpu.solvers.train_lm import Solver
        mode = "train"
    elif paras.test:
        from end_to_end_asr_pytorch_tpu.solvers.test_asr import Solver
        mode = "test"
    else:
        from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
        mode = "train"

    solver = Solver(config, paras, mode)
    solver.load_data()
    solver.set_model()
    return solver.exec()


if __name__ == "__main__":
    main()
