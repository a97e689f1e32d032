"""Data-parallel correctness: the sharded 8-device train step must produce
the same loss and updated params as the single-device step (XLA's inserted
psum == explicit sum), plus optimizer/scheduler unit checks."""
import sys
import time

import pytest
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from end_to_end_asr_pytorch_tpu.models.asr import ASR
from end_to_end_asr_pytorch_tpu.ops.ctc import ctc_loss
from end_to_end_asr_pytorch_tpu.optim import Optimizer, _warmup_schedule
from end_to_end_asr_pytorch_tpu.parallel import mesh as pmesh
from end_to_end_asr_pytorch_tpu.solvers.train_asr import masked_ce

V = 15


def _setup():
    cfg = {
        "ctc_weight": 0.5,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": True,
                    "dim": [16], "sample_rate": [2], "sample_style": "drop"},
        "attention": {"mode": "dot", "dim": 8, "num_head": 1},
        "decoder": {"module": "LSTM", "dim": 16, "layer": 1},
    }
    model = ASR(8, V, cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = Optimizer({"optimizer": "Adam", "lr": 1e-3})
    return model, params, opt


def _step_fn(model, opt):
    def step(params, opt_state, feat, feat_len, text, text_len):
        def loss_fn(p):
            ctc_out, enc_len, att_out, _, _ = model.forward(
                p, feat, feat_len, text.shape[1], 1.0, teacher=text)
            nll = ctc_loss(ctc_out, enc_len, text, text_len)
            return (0.5 * jnp.mean(nll / jnp.maximum(text_len, 1))
                    + 0.5 * masked_ce(att_out, text))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss
    return step


def test_sharded_step_matches_single_device():
    model, params, opt = _setup()
    opt_state = opt.init(params)
    B, T, U = 8, 16, 8
    rng = np.random.RandomState(0)
    feat = rng.randn(B, T, 8).astype(np.float32)
    feat_len = np.full((B,), T, np.int32)
    text = rng.randint(2, V, (B, U)).astype(np.int32)
    text_len = np.full((B,), U, np.int32)
    step = _step_fn(model, opt)

    # single device
    p1, o1, l1 = jax.jit(step)(params, opt_state, feat, feat_len, text,
                               text_len)

    # 8-device mesh, batch sharded, params replicated
    mesh = pmesh.make_mesh(8)
    params_r = pmesh.replicate_tree(mesh, params)
    opt_r = pmesh.replicate_tree(mesh, opt_state)
    batch = pmesh.shard_batch(mesh, {"feat": feat, "feat_len": feat_len,
                                     "text": text, "text_len": text_len})
    p8, o8, l8 = jax.jit(step)(params_r, opt_r, batch["feat"],
                               batch["feat_len"], batch["text"],
                               batch["text_len"])

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_beam_decode_matches_single_device():
    """The CLI decode path shards batches over the mesh; sharding must not
    change the decoded sequences (VERDICT round-1 item 3)."""
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    model, params, _ = _setup()
    dec = BeamDecoder(model, {"beam_size": 3, "min_len_ratio": 0.05,
                              "max_len_ratio": 0.6, "ctc_weight": 0.3})
    B, T = 8, 16
    rng = np.random.RandomState(1)
    feat = rng.randn(B, T, 8).astype(np.float32)
    feat_len = np.full((B,), T, np.int32)
    fn = jax.jit(lambda p, f, fl: dec.forward(p, f, fl))

    out1 = fn(params, feat, feat_len)

    mesh = pmesh.make_mesh(8)
    params_r = pmesh.replicate_tree(mesh, params)
    sb = pmesh.shard_batch(mesh, {"feat": feat, "feat_len": feat_len})
    out8 = fn(params_r, sb["feat"], sb["feat_len"])

    np.testing.assert_array_equal(np.asarray(out1.tokens),
                                  np.asarray(out8.tokens))
    np.testing.assert_array_equal(np.asarray(out1.lengths),
                                  np.asarray(out8.lengths))
    np.testing.assert_allclose(np.asarray(out1.scores),
                               np.asarray(out8.scores), rtol=1e-5, atol=1e-6)


def _setup_tp():
    """Tiny model sized so the 'model' axis divides the gate/attention dims
    AND the vocab (V=16) — plus one dim (loc conv) that always replicates."""
    cfg = {
        "ctc_weight": 0.5,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": True,
                    "dim": [16], "sample_rate": [2], "sample_style": "drop"},
        "attention": {"mode": "dot", "dim": 8, "num_head": 1},
        "decoder": {"module": "LSTM", "dim": 16, "layer": 1},
    }
    model = ASR(8, 16, cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = Optimizer({"optimizer": "Adam", "lr": 1e-3})
    return model, params, opt


def test_model_parallel_spec_rules():
    """Name-based tp rules: projections column-shard, embeddings row-shard,
    indivisible dims replicate, unknown names replicate."""
    from jax.sharding import PartitionSpec as P
    _, params, opt = _setup_tp()
    m = 4
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {jax.tree_util.keystr(p): pmesh.model_parallel_spec(p, l, m)
             for p, l in flat}
    assert specs[".encoder.layers[0].fwd.w_ih"] == P(None, "model")
    assert specs[".encoder.layers[0].fwd.b"] == P("model")
    assert specs[".char_w"] == P(None, "model")          # (16, 16) vocab cols
    assert specs[".embed"] == P("model", None)           # (16, 16) vocab rows
    assert specs[".attention.w_q"] == P(None, "model")
    # indivisible dim -> replicate (V=15 model)
    model15 = ASR(8, 15, {
        "ctc_weight": 0.5,
        "encoder": {"prenet": "", "module": "LSTM", "bidirection": True,
                    "dim": [16], "sample_rate": [2], "sample_style": "drop"},
        "attention": {"mode": "dot", "dim": 8, "num_head": 1},
        "decoder": {"module": "LSTM", "dim": 16, "layer": 1}})
    p15 = model15.init(jax.random.PRNGKey(0))
    flat15 = jax.tree_util.tree_flatten_with_path(p15)[0]
    s15 = {jax.tree_util.keystr(p): pmesh.model_parallel_spec(p, l, m)
           for p, l in flat15}
    assert s15[".char_w"] == P()                         # 15 % 4 != 0
    assert s15[".embed"] == P()
    # optax state leaves mirror the param names -> same rules fire
    st = opt.init(jax.tree_util.tree_flatten_with_path(params)[1]
                  .unflatten([l for _, l in flat]))
    stf = jax.tree_util.tree_flatten_with_path(st)[0]
    sharded = [p for p, l in stf
               if pmesh.model_parallel_spec(p, l, m) != P()]
    assert sharded, "optimizer moments should pick up the param rules"


def test_tp_rule_coverage_large_vocab_exact_set():
    """VERDICT r4 item 6: at the vocab scale tp exists FOR (V=16384 — the
    embedding (V,E) and the two (d,V) logit heads dominate params), the
    name rules must fire on EVERY intended matrix and nothing else.
    The expected set is hard-coded so a param rename or rule edit that
    silently stops sharding a matrix fails here, not in production."""
    from jax.sharding import PartitionSpec as P
    cfg = {
        "ctc_weight": 0.5,
        "encoder": {"prenet": "vgg", "module": "LSTM", "bidirection": True,
                    "dim": [32, 32], "sample_rate": [1, 1],
                    "sample_style": "drop", "dropout": [0.0, 0.0],
                    "layer_norm": [False, False], "proj": [False, False]},
        "attention": {"mode": "loc", "dim": 16, "num_head": 1},
        "decoder": {"module": "LSTM", "dim": 32, "layer": 1},
    }
    model = ASR(40, 16384, cfg)
    params = model.init(jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {jax.tree_util.keystr(p): pmesh.model_parallel_spec(p, l, 4)
             for p, l in flat}

    col = P(None, "model")   # columns of a (in, out) projection
    vec = P("model")         # the bias that pairs with a column shard
    row = P("model", None)   # vocab rows of the embedding table
    expected = {}
    for layer in (0, 1):
        for d in ("fwd", "bwd"):
            expected[f".encoder.layers[{layer}].{d}.w_ih"] = col
            expected[f".encoder.layers[{layer}].{d}.w_hh"] = col
            expected[f".encoder.layers[{layer}].{d}.b"] = vec
    expected.update({
        ".ctc_w": col, ".ctc_b": vec,          # (64,16384) CTC head
        ".char_w": col, ".char_b": vec,        # (32,16384) att head
        ".embed": row,                         # (16384,32) lookup table
        ".attention.w_q": col, ".attention.w_k": col,
        ".attention.w_v": col, ".attention.w_f": col,
        ".attention.v_energy": col, ".attention.bias": vec,
        ".decoder.cells[0].w_ih": col, ".decoder.cells[0].w_hh": col,
        ".decoder.cells[0].b": vec,
    })
    sharded = {k: v for k, v in specs.items() if v != P()}
    assert sharded == expected
    # and the non-sharded remainder is exactly the conv kernels/biases
    # (VGG prenet + location conv) — structurally un-shardable here
    replicated = set(specs) - set(expected)
    assert replicated == {
        ".encoder.prenet.k1", ".encoder.prenet.b1",
        ".encoder.prenet.k2", ".encoder.prenet.b2",
        ".encoder.prenet.k3", ".encoder.prenet.b3",
        ".encoder.prenet.k4", ".encoder.prenet.b4",
        ".attention.loc_conv",
    }


def test_make_mesh_model_parallel_validation():
    with pytest.raises(ValueError, match="model_parallel"):
        pmesh.make_mesh(8, model_parallel=3)
    mesh = pmesh.make_mesh(8, model_parallel=4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4


def test_tp_step_matches_single_device():
    """2x4 (data x model) mesh: tensor-parallel params + sharded batch must
    reproduce the single-device loss and updated params — GSPMD collectives
    are an implementation detail, not a semantics change."""
    model, params, opt = _setup_tp()
    opt_state = opt.init(params)
    B, T, U = 8, 16, 8
    rng = np.random.RandomState(0)
    feat = rng.randn(B, T, 8).astype(np.float32)
    feat_len = np.full((B,), T, np.int32)
    text = rng.randint(2, 16, (B, U)).astype(np.int32)
    text_len = np.full((B,), U, np.int32)
    step = _step_fn(model, opt)

    p1, o1, l1 = jax.jit(step)(params, opt_state, feat, feat_len, text,
                               text_len)

    mesh = pmesh.make_mesh(8, model_parallel=4)
    params_s = pmesh.shard_params(mesh, params)
    opt_s = pmesh.shard_params(mesh, opt_state)
    # at least one leaf must actually be tp-sharded (not a vacuous pass)
    assert any(len(l.sharding.spec) and "model" in str(l.sharding.spec)
               for l in jax.tree_util.tree_leaves(params_s))
    batch = pmesh.shard_batch(mesh, {"feat": feat, "feat_len": feat_len,
                                     "text": text, "text_len": text_len})
    p8, o8, l8 = jax.jit(step)(params_s, opt_s, batch["feat"],
                               batch["feat_len"], batch["text"],
                               batch["text_len"])

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_beam_decode_matches_single_device():
    """Decode with tensor-parallel params: identical tokens/lengths, scores
    to fp tolerance."""
    from end_to_end_asr_pytorch_tpu.decode.beam import BeamDecoder
    model, params, _ = _setup_tp()
    dec = BeamDecoder(model, {"beam_size": 3, "min_len_ratio": 0.05,
                              "max_len_ratio": 0.6, "ctc_weight": 0.3})
    B, T = 8, 16
    rng = np.random.RandomState(1)
    feat = rng.randn(B, T, 8).astype(np.float32)
    feat_len = np.full((B,), T, np.int32)
    fn = jax.jit(lambda p, f, fl: dec.forward(p, f, fl))

    out1 = fn(params, feat, feat_len)

    mesh = pmesh.make_mesh(8, model_parallel=2)
    params_s = pmesh.shard_params(mesh, params)
    sb = pmesh.shard_batch(mesh, {"feat": feat, "feat_len": feat_len})
    out8 = fn(params_s, sb["feat"], sb["feat_len"])

    np.testing.assert_array_equal(np.asarray(out1.tokens),
                                  np.asarray(out8.tokens))
    np.testing.assert_array_equal(np.asarray(out1.lengths),
                                  np.asarray(out8.lengths))
    np.testing.assert_allclose(np.asarray(out1.scores),
                               np.asarray(out8.scores), rtol=1e-5, atol=1e-6)


def test_pad_batch_to():
    batch = {"wave": np.ones((5, 4), np.float32),
             "text_len": np.array([3, 3, 3, 3, 3], np.int32),
             "name": ["a"] * 5}
    out = pmesh.pad_batch_to(batch, 8)
    assert out["wave"].shape[0] == 8
    assert (out["text_len"][5:] == 0).all()
    assert out["name"] == batch["name"]


def test_warmup_schedule():
    sched = _warmup_schedule(1.0, warmup_step=100)
    peak = float(sched(100))
    np.testing.assert_allclose(peak, 1.0, rtol=1e-5)
    assert float(sched(10)) < peak
    assert float(sched(400)) == float(np.sqrt(100 / 400))


def test_nan_grad_skips_step():
    opt = Optimizer({"optimizer": "Adam", "lr": 1e-2})
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    bad = {"w": jnp.full((3,), jnp.nan)}
    new_params, state = opt.step(bad, state, params)
    np.testing.assert_array_equal(np.asarray(new_params["w"]),
                                  np.ones(3))  # step skipped
    good = {"w": jnp.ones((3,))}
    new_params, state = opt.step(good, state, new_params)
    assert not np.allclose(np.asarray(new_params["w"]), np.ones(3))


def test_prefetch_to_device_matches_inline_path():
    """prefetch_to_device must yield exactly what pad_batch_to+shard_batch
    produce inline, in order, with host mirrors intact."""
    from end_to_end_asr_pytorch_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(8)
    rng = np.random.RandomState(0)
    batches = [{"wave": rng.randn(5 + i, 16).astype(np.float32),
                "text_len": np.arange(5 + i, dtype=np.int32),
                "name": [f"u{i}-{j}" for j in range(5 + i)]}
               for i in range(4)]
    got = list(pmesh.prefetch_to_device(iter(batches), mesh, 8))
    assert len(got) == 4
    for (sb, hb), src in zip(got, batches):
        ref = pmesh.pad_batch_to(src, 8)
        assert sb["wave"].shape[0] % 8 == 0
        np.testing.assert_array_equal(np.asarray(sb["wave"]), ref["wave"])
        np.testing.assert_array_equal(hb["text_len"], ref["text_len"])
        assert sb["name"] == src["name"]          # non-arrays pass through
        assert hb["wave"] is not None and isinstance(hb["wave"], np.ndarray)
        # sharded over the ('data',) mesh
        assert len(sb["wave"].sharding.device_set) == 8


def test_prefetch_to_device_propagates_worker_errors():
    """A failure inside the producer (bad audio, OOM) must surface to the
    consumer, not silently truncate the epoch."""
    from end_to_end_asr_pytorch_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(8)

    def bad_batches():
        yield {"wave": np.zeros((8, 4), np.float32)}
        raise RuntimeError("corrupt utterance")

    it = pmesh.prefetch_to_device(bad_batches(), mesh, 8)
    next(it)
    with pytest.raises(RuntimeError, match="corrupt utterance"):
        next(it)


def test_prefetch_to_device_early_abandon_stops_worker():
    """Breaking out of the consumer (max_step mid-epoch) must cancel the
    worker thread instead of leaving it blocked on a full queue."""
    import threading
    from end_to_end_asr_pytorch_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(8)
    produced = []

    def many_batches():
        for i in range(100):
            produced.append(i)
            yield {"wave": np.zeros((8, 4), np.float32)}

    before = threading.active_count()
    it = pmesh.prefetch_to_device(many_batches(), mesh, 8, depth=2)
    next(it)
    it.close()  # what an abandoned for-loop break does via GC/finally
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before, "worker thread leaked"
    assert len(produced) < 100  # it stopped producing early
