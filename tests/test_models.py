"""Model zoo shape/correctness tests: encoder subsampling & lengths,
attention masking, ASR forward, LM forward/step consistency."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.models.encoder import Encoder, VGGExtractor
from end_to_end_asr_pytorch_tpu.models.attention import Attention
from end_to_end_asr_pytorch_tpu.models.lm import RNNLM

V = 31  # vocab


def _asr_cfg(prenet="", att_mode="loc", ctc_weight=0.5):
    return {
        "ctc_weight": ctc_weight,
        "encoder": {
            "prenet": prenet,
            "module": "LSTM",
            "bidirection": True,
            "dim": [32, 32],
            "dropout": [0.0, 0.0],
            "layer_norm": [False, False],
            "proj": [False, False],
            "sample_rate": [2, 2] if prenet == "" else [1, 1],
            "sample_style": "drop",
        },
        "attention": {"mode": att_mode, "dim": 16, "num_head": 1,
                      "temperature": 0.5, "v_proj": True,
                      "loc_kernel_size": 11, "loc_kernel_num": 5},
        "decoder": {"module": "LSTM", "dim": 32, "layer": 1, "dropout": 0.0},
    }


def test_encoder_pyramidal_lengths():
    cfg = _asr_cfg()["encoder"]
    enc = Encoder(40, cfg)
    assert enc.downsample == 4
    p = enc.init(jax.random.PRNGKey(0))
    feat = jnp.asarray(np.random.RandomState(0).randn(2, 24, 40), jnp.float32)
    out, out_len = enc(p, feat, jnp.array([24, 13]))
    assert out.shape == (2, 6, 64)
    assert out_len.tolist() == [6, 4]  # ceil(13/2)=7 -> ceil(7/2)=4
    # padded frames are zeroed
    assert float(jnp.abs(out[1, 4:]).max()) == 0.0


def test_encoder_concat_style():
    cfg = _asr_cfg()["encoder"]
    cfg["sample_style"] = "concat"
    enc = Encoder(40, cfg)
    p = enc.init(jax.random.PRNGKey(0))
    feat = jnp.zeros((2, 24, 40))
    out, out_len = enc(p, feat, jnp.array([24, 12]))
    assert out.shape == (2, 6, 64 * 2 * 2 // 2)  # dim doubles per concat layer...
    # layer1: (B,12,64*2) wait: concat doubles feature dim per subsample
    assert out.shape[-1] == enc.out_dim


def test_vgg_extractor_dims():
    vgg = VGGExtractor(40)
    assert vgg.in_ch == 1 and vgg.freq == 40
    assert vgg.out_dim == 128 * 10
    vgg39 = VGGExtractor(39)
    assert vgg39.in_ch == 3 and vgg39.freq == 13
    p = vgg.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 16, 40))
    out, out_len = vgg(p, x, jnp.array([16, 8]))
    assert out.shape == (2, 4, 1280)
    assert out_len.tolist() == [4, 2]


def test_attention_respects_mask():
    att = Attention({"mode": "loc", "dim": 8, "num_head": 2,
                     "loc_kernel_size": 5, "loc_kernel_num": 3}, 16, 12)
    p = att.init(jax.random.PRNGKey(1))
    enc = jnp.asarray(np.random.RandomState(1).randn(2, 10, 12), jnp.float32)
    cache = att.precompute(p, enc, jnp.array([10, 6]))
    align0 = att.init_align(cache)
    q = jnp.asarray(np.random.RandomState(2).randn(2, 16), jnp.float32)
    ctx, align = att.step(p, cache, q, align0)
    align = np.asarray(align)
    assert ctx.shape == (2, 8)
    np.testing.assert_allclose(align.sum(-1), 1.0, rtol=1e-5)
    assert np.all(align[1, :, 6:] < 1e-8)  # masked beyond length


@pytest.mark.parametrize("prenet,att_mode", [("", "loc"), ("vgg", "dot")])
def test_asr_forward_shapes(prenet, att_mode):
    model = ASR(40, V, _asr_cfg(prenet, att_mode))
    p = model.init(jax.random.PRNGKey(0))
    B, T, U = 2, 24, 7
    feat = jnp.asarray(np.random.RandomState(0).randn(B, T, 40), jnp.float32)
    feat_len = jnp.array([24, 16])
    teacher = jnp.asarray(
        np.random.RandomState(1).randint(2, V, (B, U)), jnp.int32)
    ctc_out, enc_len, att_out, att_align, dec_state = model.forward(
        p, feat, feat_len, U, tf_rate=1.0, teacher=teacher,
        train=True, rng=jax.random.PRNGKey(2))
    Tp = T // model.encoder.downsample
    assert ctc_out.shape == (B, Tp, V)
    assert att_out.shape == (B, U, V)
    assert att_align.shape[0:2] == (B, U)
    assert dec_state.shape == (B, 32)
    # ctc head is log-softmax
    np.testing.assert_allclose(np.exp(np.asarray(ctc_out)).sum(-1), 1.0,
                               rtol=1e-4)


def test_scheduled_tf_matches_explicit_loop():
    """Scheduled teacher forcing at 0 < tf_rate < 1: the scan's coin/token
    selection must equal a hand-rolled decode_step loop drawing the SAME
    coins (reference semantics: one Bernoulli per step for the whole batch;
    step 0 always feeds <sos>; coin -> teacher[t-1], else previous argmax)."""
    from end_to_end_asr_pytorch_tpu.utils.text import EOS_IDX
    model = ASR(40, V, _asr_cfg("", "loc"))
    p = model.init(jax.random.PRNGKey(4))
    B, T, U = 2, 24, 7
    tf_rate = 0.5
    feat = jnp.asarray(np.random.RandomState(5).randn(B, T, 40), jnp.float32)
    feat_len = jnp.array([24, 24])
    teacher = jnp.asarray(
        np.random.RandomState(6).randint(2, V, (B, U)), jnp.int32)

    _, _, att_out, _, _ = model.forward(
        p, feat, feat_len, U, tf_rate=tf_rate, teacher=teacher)

    # hand-rolled mirror drawing coins exactly as forward does (forward
    # defaults to PRNGKey(0) when no rng is passed, then splits 3 ways)
    _, r_coin, _ = jax.random.split(jax.random.PRNGKey(0), 3)
    coins = np.asarray(jax.random.uniform(r_coin, (U,)) <= tf_rate)
    enc, enc_len = model.encode(p, feat, feat_len)
    cache, state, align = model.init_decode(p, enc, enc_len)
    prev = jnp.full((B,), EOS_IDX, jnp.int32)
    outs = []
    for t_step in range(U):
        if t_step == 0:
            tok = jnp.full((B,), EOS_IDX, jnp.int32)
        elif coins[t_step]:
            tok = teacher[:, t_step - 1]
        else:
            tok = prev
        logits, state, align, _ = model.decode_step(p, cache, state, align,
                                                    tok)
        prev = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(logits)
    ref = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(att_out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    assert not coins.all() and coins.any(), "want a mixed coin draw"


def test_asr_ctc_only():
    model = ASR(40, V, _asr_cfg(ctc_weight=1.0))
    assert model.enable_ctc and not model.enable_att
    p = model.init(jax.random.PRNGKey(0))
    assert p.embed is None and p.decoder is None
    feat = jnp.zeros((2, 16, 40))
    ctc_out, enc_len, att_out, _, _ = model.forward(p, feat, jnp.array([16, 16]), 0)
    assert ctc_out is not None and att_out is None


def test_asr_grads_flow():
    model = ASR(40, V, _asr_cfg())
    p = model.init(jax.random.PRNGKey(0))
    feat = jnp.asarray(np.random.RandomState(0).randn(2, 16, 40), jnp.float32)
    teacher = jnp.ones((2, 5), jnp.int32) * 3

    def loss_fn(params):
        ctc_out, enc_len, att_out, _, _ = model.forward(
            params, feat, jnp.array([16, 16]), 5, teacher=teacher,
            train=True, rng=jax.random.PRNGKey(1))
        return jnp.mean(att_out ** 2) + jnp.mean(ctc_out ** 2)

    g = jax.grad(loss_fn)(p)
    leaves = [l for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter gets gradient signal somewhere
    nz = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nz >= len(leaves) - 2


def test_lm_forward_and_step_agree():
    lm = RNNLM(V, {"module": "LSTM", "dim": 24, "emb_dim": 24, "layer": 2,
                   "emb_tying": True})
    p = lm.init(jax.random.PRNGKey(0))
    toks = jnp.asarray(np.random.RandomState(0).randint(1, V, (2, 6)), jnp.int32)
    lens = jnp.array([6, 6])
    full = lm.forward(p, toks, lens)
    state = lm.init_state(2)
    outs = []
    for t in range(6):
        logit, state = lm.step(p, state, toks[:, t])
        outs.append(logit)
    step_wise = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step_wise),
                               rtol=1e-4, atol=1e-4)


def test_label_scan_remat_knob_is_semantics_preserving():
    """label_scan_remat=False (exposed for the fused-attention A/B) must
    change scheduling only: identical loss and gradients."""
    feat = jnp.asarray(np.random.RandomState(4).randn(2, 16, 40), jnp.float32)
    teacher = jnp.ones((2, 5), jnp.int32) * 3

    outs = []
    for remat in (True, False):
        cfg = _asr_cfg()
        cfg["label_scan_remat"] = remat
        model = ASR(40, V, cfg)
        p = model.init(jax.random.PRNGKey(0))

        def loss_fn(params):
            ctc_out, _, att_out, _, _ = model.forward(
                params, feat, jnp.array([16, 16]), 5, teacher=teacher,
                train=True, rng=jax.random.PRNGKey(1))
            return jnp.mean(att_out ** 2) + jnp.mean(ctc_out ** 2)

        loss, g = jax.value_and_grad(loss_fn)(p)
        outs.append((float(loss), g))
    (l0, g0), (l1, g1) = outs
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
