"""Embedding-regularizer plugin: loss, fused decoding, train integration
(SURVEY.md 2.18/2.19)."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.models.plugin import EmbeddingRegularizer
from end_to_end_asr_pytorch_tpu.utils.bert_embedding import generate_embedding
from end_to_end_asr_pytorch_tpu.data import synthetic
from tests.test_e2e_train import _paras, _asr_config

V, DEC = 30, 32


@pytest.fixture(scope="module")
def emb_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("emb")
    vocab = tmp / "vocab.txt"
    vocab.write_text("\n".join(list("abcdefghijklmnopqrstuvwxyz") +
                               ["<space>"]) + "\n")
    out = tmp / "emb.npy"
    generate_embedding(str(vocab), "character", str(out), method="hash",
                       dim=16)
    table = np.load(out)
    assert table.shape == (V, 16)
    return out


def test_plugin_loss_and_fusion(emb_file):
    plug = EmbeddingRegularizer(
        {"src": str(emb_file), "weight": 0.5, "fuse": 0.3, "temp": 2.0},
        V, DEC)
    p = plug.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    dec_states = jnp.asarray(rng.randn(2, 5, DEC), jnp.float32)
    targets = jnp.asarray(rng.randint(1, V, (2, 5)), jnp.int32)
    targets = targets.at[1, 3:].set(0)  # padding
    loss = plug.loss(p, dec_states, targets)
    assert 0.0 <= float(loss) <= 2.0 * 0.5  # weight * (1-cos) in [0, 2w]

    # aligned projection -> near-zero distance
    tgt_emb = plug.table[targets]
    # construct params that map identity-ish is hard; check gradient reduces
    g = jax.grad(lambda pp: plug.loss(pp, dec_states, targets))(p)
    assert float(jnp.abs(g.w_proj).sum()) > 0

    logits = jnp.asarray(rng.randn(2, V), jnp.float32)
    fused = plug.fused_log_prob(p, dec_states[:, 0], logits)
    assert fused.shape == (2, V)
    np.testing.assert_allclose(np.exp(np.asarray(fused)).sum(-1), 1.0,
                               rtol=1e-3)


def test_fused_greedy_differs_from_unfused(emb_file):
    """Fusion must actually alter validation/greedy decode when fuse > 0
    (VERDICT round-1 item 10)."""
    from end_to_end_asr_pytorch_tpu.decode.greedy import att_greedy
    from end_to_end_asr_pytorch_tpu.models.asr import ASR
    cfg = {
        "ctc_weight": 0.0,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": True,
                    "dim": [16], "sample_rate": [2], "sample_style": "drop"},
        "attention": {"mode": "dot", "dim": 8, "num_head": 1},
        "decoder": {"module": "LSTM", "dim": DEC, "layer": 1},
    }
    model = ASR(8, V, cfg)
    params = model.init(jax.random.PRNGKey(2))
    plug = EmbeddingRegularizer(
        {"src": str(emb_file), "weight": 0.5, "fuse": 0.9, "temp": 0.1},
        V, DEC)
    pp = plug.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(3, 20, 8), jnp.float32)
    feat_len = jnp.full((3,), 20, jnp.int32)
    enc, enc_len = model.encode(params, feat, feat_len)
    plain = att_greedy(model, params, enc, enc_len, 8)
    fused = att_greedy(model, params, enc, enc_len, 8, plugin=plug,
                       plugin_params=pp)
    assert plain.shape == fused.shape == (3, 8)
    # an untrained model + aggressive fusion (lambda .9, temp .1) must
    # change at least one decoded id; identical output means fusion is dead
    assert not np.array_equal(np.asarray(plain), np.asarray(fused))


def test_train_with_plugin(tmp_path, emb_file):
    from end_to_end_asr_pytorch_tpu.solvers.train_asr import Solver
    root = tmp_path / "synth"
    synthetic.generate_corpus(str(root), n_train=8, n_dev=4, n_test=2,
                              max_words=1)
    cfg = _asr_config(root, ctc_weight=0.5, max_step=4)
    cfg["model"]["plugin"] = {"enabled": True, "src": str(emb_file),
                              "weight": 0.3, "fuse": 0.2, "temp": 1.0}
    solver = Solver(cfg, _paras(tmp_path, "plug"), "train")
    solver.load_data()
    solver.set_model()
    assert solver.plugin is not None
    solver.exec()
    assert (tmp_path / "ckpt" / "plug_sd0" / "latest.pth").exists()

    # decode with fused probabilities through the same checkpoint
    from end_to_end_asr_pytorch_tpu.solvers.test_asr import Solver as TestS
    cfg["data"]["corpus"]["test_split"] = ["test-clean"]
    cfg["decode"] = {"beam_size": 2, "max_len_ratio": 0.3,
                     "ctc_weight": 0.0, "lm_weight": 0.0}
    paras = _paras(tmp_path, "plug",
                   load=str(tmp_path / "ckpt" / "plug_sd0" / "latest.pth"))
    paras.test = True
    ts = TestS(cfg, paras, "test")
    ts.load_data()
    ts.set_model()
    assert ts.decoder.plugin is not None
    ts.exec()
    assert (tmp_path / "out" / "plug_sd0" / "test_output.csv").exists()


def test_bert_embedding_real_transformer_path(tmp_path):
    """Exercise the REAL transformers extraction path (SURVEY.md 2.19)
    offline: a tiny random-weight BERT saved with save_pretrained stands in
    for a hub model — generate_embedding(model=<local dir>) must run the
    tokenizer+model loop, not the hash fallback."""
    transformers = pytest.importorskip("transformers")
    mdir = tmp_path / "tiny_bert"
    cfg = transformers.BertConfig(
        vocab_size=40, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32)
    transformers.BertModel(cfg).save_pretrained(mdir)
    bert_vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + list(
        "abcdefghijklmnopqrstuvwxyz")
    (mdir / "vocab.txt").write_text("\n".join(bert_vocab) + "\n")
    transformers.BertTokenizer(str(mdir / "vocab.txt")).save_pretrained(mdir)

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(list("abcdefghijklmnopqrstuvwxyz") +
                               ["<space>"]) + "\n")
    out = tmp_path / "emb.npy"
    # method='bert' raises on ANY fallback: proves the transformer ran
    table = generate_embedding(str(vocab), "character", str(out),
                               model=str(mdir), method="bert")
    assert table.shape == (V, 16)
    assert np.load(out).shape == (V, 16)
    # rows are contextual-mean embeddings, not the hash table
    from end_to_end_asr_pytorch_tpu.utils.bert_embedding import _hash_embedding
    assert not np.allclose(table[3], _hash_embedding(["a"], 16)[0])


def test_vec_table_loader(tmp_path):
    """fasttext text-format .vec -> plugin table (SURVEY.md 2.18's
    fasttext path): header line skipped, rows aligned to vocab ids,
    sentencepiece word-marker and case fallbacks, missing pieces zero."""
    from end_to_end_asr_pytorch_tpu.utils.text import load_text_encoder
    vocab = tmp_path / "words.txt"
    vocab.write_text("hello\nworld\nmissing\n")
    tok = load_text_encoder("word", str(vocab))  # ids: 3=hello 4=world 5=missing
    vec = tmp_path / "toy.vec"
    vec.write_text("3 4\n"                      # fasttext count/dim header
                   "hello 1 2 3 4\n"
                   "WORLD 9 9 9 9\n"            # matched via .lower()? no —
                   "world 5 6 7 8 \n"           # exact match wins (note
                   "unused 0 0 0 1\n")          # fasttext trailing space)
    from end_to_end_asr_pytorch_tpu.utils.bert_embedding import load_vec_table
    table = load_vec_table(str(vec), tok)
    assert table.shape == (tok.vocab_size, 4)
    np.testing.assert_array_equal(table[3], [1, 2, 3, 4])
    np.testing.assert_array_equal(table[4], [5, 6, 7, 8])
    np.testing.assert_array_equal(table[5], 0)          # absent -> zeros
    np.testing.assert_array_equal(table[:3], 0)         # reserved ids


def test_vec_table_marker_strip_retries_lowercase(tmp_path):
    """r5 self-review: a cased spm piece like '▁The' must still hit a
    standard lowercase fasttext file's 'the' after the word marker is
    stripped (previously only the case-exact stripped form was tried)."""
    from end_to_end_asr_pytorch_tpu.utils.bert_embedding import load_vec_table

    class Tok:                                 # minimal tokenizer surface
        vocab_size = 5
        _pieces = {3: "▁The", 4: "▁zz"}

        def _id_to_piece(self, i):
            return self._pieces[i]

    vec = tmp_path / "lower.vec"
    vec.write_text("2 3\nthe 1 2 3\nother 9 9 9\n")
    table = load_vec_table(str(vec), Tok())
    np.testing.assert_array_equal(table[3], [1, 2, 3])   # ▁The -> the
    np.testing.assert_array_equal(table[4], 0)           # still a zero row


def test_plugin_accepts_vec_src(tmp_path):
    """`src: foo.vec` in the plugin config works end-to-end (loss + fusion
    run on a .vec-built table), and needs the tokenizer."""
    from end_to_end_asr_pytorch_tpu.utils.text import load_text_encoder
    vocab = tmp_path / "words.txt"
    vocab.write_text("hello\nworld\n")
    tok = load_text_encoder("word", str(vocab))
    vec = tmp_path / "toy.vec"
    rng = np.random.RandomState(0)
    rows = [f"w{i} " + " ".join(f"{x:.3f}" for x in rng.randn(8))
            for i in range(3)]
    vec.write_text("hello " + " ".join("1" for _ in range(8)) + "\n"
                   + "\n".join(rows) + "\n")
    plug = EmbeddingRegularizer({"src": str(vec), "weight": 0.5},
                                tok.vocab_size, DEC, tokenizer=tok)
    assert plug.table.shape == (tok.vocab_size, 8)
    dec_states = jnp.asarray(rng.randn(2, 3, DEC), jnp.float32)
    targets = jnp.asarray([[3, 4, 0], [4, 1, 0]], jnp.int32)
    loss = plug.loss(plug.init(jax.random.PRNGKey(0)), dec_states, targets)
    assert np.isfinite(float(loss))
    with pytest.raises(ValueError, match="tokenizer"):
        EmbeddingRegularizer({"src": str(vec)}, tok.vocab_size, DEC)
