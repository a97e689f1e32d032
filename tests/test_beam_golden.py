"""Golden-decode regression pin: a fixed-seed model + inputs must produce
these exact beam outputs on the CPU backend. Guards future beam/attention
optimizations against silent semantic drift (the enumeration tests in
test_beam.py prove correctness at tiny sizes; this pins a larger case).

If an INTENTIONAL semantic change lands (e.g. different length
normalization), regenerate the constants by running the test's own setup
and printing the new outputs — from the repo root:

    python -c "
    import tests.test_beam_golden as g
    out = g._decode()
    print([int(x) for x in out.tokens[0, 0, :out.lengths[0, 0]]])
    print([int(x) for x in out.tokens[1, 0, :out.lengths[1, 0]]])
    print([float(s) for s in out.scores[:, 0]])"

(run under the CPU backend, e.g. via pytest's conftest or
jax.config.update('jax_platforms', 'cpu'))."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.models.lm import RNNLM
from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder

GOLDEN_TOKENS_0 = [8, 7, 8, 7, 8, 6, 8, 6, 8, 3]
GOLDEN_TOKENS_1 = [4, 11, 4, 11, 4, 11, 4]
GOLDEN_SCORES = [-3.13307, -3.1004]


def _decode():
    V = 12
    cfg = {"ctc_weight": 0.5,
           "encoder": {"prenet": "", "module": "LSTM", "bidirection": True,
                       "dim": [24], "sample_rate": [1],
                       "sample_style": "drop"},
           "attention": {"mode": "loc", "dim": 16, "num_head": 1,
                         "loc_kernel_size": 7, "loc_kernel_num": 4},
           "decoder": {"module": "LSTM", "dim": 24, "layer": 1}}
    model = ASR(10, V, cfg)
    params = model.init(jax.random.PRNGKey(42))
    lm = RNNLM(V, {"module": "LSTM", "dim": 16, "emb_dim": 16, "layer": 1})
    lm_params = lm.init(jax.random.PRNGKey(43))
    dec = BeamDecoder(model, {"beam_size": 4, "min_len_ratio": 0.1,
                              "max_len_ratio": 0.5, "ctc_weight": 0.4,
                              "lm_weight": 0.2}, lm=lm)
    rng = np.random.RandomState(7)
    feat = jnp.asarray(rng.randn(2, 20, 10), jnp.float32)
    return dec.forward(params, feat, jnp.array([20, 14]),
                       lm_params=lm_params)


def test_beam_golden_decode():
    out = _decode()
    assert out.tokens[0, 0, :out.lengths[0, 0]].tolist() == GOLDEN_TOKENS_0
    assert out.tokens[1, 0, :out.lengths[1, 0]].tolist() == GOLDEN_TOKENS_1
    np.testing.assert_allclose(np.asarray(out.scores[:, 0]), GOLDEN_SCORES,
                               rtol=1e-3)
