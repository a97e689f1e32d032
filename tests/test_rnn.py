"""LSTM/GRU scan parity vs torch.nn.LSTM/GRU (CPU golden oracle)."""
import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.ops.rnn import (
    LSTMWeights, GRUWeights, lstm_scan, gru_scan, bidirectional,
)

T, B, D, H = 11, 3, 5, 7
LENS = [11, 8, 4]


def _mask():
    return (np.arange(T)[:, None] < np.asarray(LENS)[None, :])


def _torch_lstm():
    torch.manual_seed(0)
    return torch.nn.LSTM(D, H, num_layers=1, batch_first=False)


def _from_torch_lstm(m):
    return LSTMWeights(
        w_ih=m.weight_ih_l0.detach().numpy().T.copy(),
        w_hh=m.weight_hh_l0.detach().numpy().T.copy(),
        b=(m.bias_ih_l0 + m.bias_hh_l0).detach().numpy(),
    )


def test_lstm_forward_matches_torch_with_lengths():
    rng = np.random.RandomState(1)
    x = rng.randn(T, B, D).astype(np.float32)
    m = _torch_lstm()
    w = _from_torch_lstm(m)
    ys = np.asarray(lstm_scan(w, x, _mask()))
    for b, L in enumerate(LENS):
        ref, _ = m(torch.from_numpy(x[:L, b:b + 1]))
        np.testing.assert_allclose(ys[:L, b], ref.detach().numpy()[:, 0],
                                   rtol=1e-5, atol=1e-5)
        # padded outputs are zeros
        assert np.all(ys[L:, b] == 0.0)


def test_lstm_backward_matches_torch_reverse():
    rng = np.random.RandomState(2)
    x = rng.randn(T, B, D).astype(np.float32)
    m = _torch_lstm()
    w = _from_torch_lstm(m)
    ys = np.asarray(lstm_scan(w, x, _mask(), reverse=True))
    for b, L in enumerate(LENS):
        # torch on the time-reversed valid segment, then un-reverse
        xr = x[:L, b:b + 1][::-1].copy()
        ref, _ = m(torch.from_numpy(xr))
        ref = ref.detach().numpy()[::-1, 0]
        np.testing.assert_allclose(ys[:L, b], ref, rtol=1e-5, atol=1e-5)


def test_bidirectional_shapes():
    rng = np.random.RandomState(3)
    x = rng.randn(T, B, D).astype(np.float32)
    m = _torch_lstm()
    w = _from_torch_lstm(m)
    ys = np.asarray(bidirectional(lstm_scan, w, w, x, _mask()))
    assert ys.shape == (T, B, 2 * H)


def test_gru_matches_torch():
    torch.manual_seed(4)
    m = torch.nn.GRU(D, H, num_layers=1)
    w = GRUWeights(
        w_ih=m.weight_ih_l0.detach().numpy().T.copy(),
        w_hh=m.weight_hh_l0.detach().numpy().T.copy(),
        b_ih=m.bias_ih_l0.detach().numpy(),
        b_hh=m.bias_hh_l0.detach().numpy(),
    )
    rng = np.random.RandomState(5)
    x = rng.randn(T, B, D).astype(np.float32)
    ys = np.asarray(gru_scan(w, x, _mask()))
    for b, L in enumerate(LENS):
        ref, _ = m(torch.from_numpy(x[:L, b:b + 1]))
        np.testing.assert_allclose(ys[:L, b], ref.detach().numpy()[:, 0],
                                   rtol=1e-5, atol=1e-5)
