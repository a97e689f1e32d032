"""The ASR model: encoder + optional CTC head + optional attention decoder.

Capability parity with the reference's ``src/asr.py:ASR`` (SURVEY.md 2.7):
owns an ``Encoder``, and — depending on ``ctc_weight`` — a CTC linear head
(+log_softmax) when ``ctc_weight > 0`` and an ``Attention``+``Decoder`` pair
when ``ctc_weight < 1``. ``forward`` returns
``(ctc_output, encode_len, att_output, att_align, dec_state)`` with per-step
scheduled teacher forcing, like the reference.

TPU-first: the reference's per-output-token Python loop (its training hot
loop, SURVEY.md 3.4) is a ``lax.scan`` over label positions — teacher-forced
training has a static step count, the per-step Bernoulli coins are drawn
vectorized before the scan, and self-fed steps feed back the argmax of the
previous logits through the carry. The same pure ``decode_step`` drives
greedy and beam decoding.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .attention import Attention, AttentionParams, AttCache
from .decoder import Decoder, DecoderParams, DecoderState
from .encoder import Encoder, EncoderParams
from ..utils.text import EOS_IDX


def _uniform(key, shape, fan_in, dtype=jnp.float32):
    s = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -s, s)


class ASRParams(NamedTuple):
    encoder: EncoderParams
    ctc_w: Optional[jnp.ndarray]      # (enc_dim, V)
    ctc_b: Optional[jnp.ndarray]      # (V,)
    embed: Optional[jnp.ndarray]      # (V, emb_dim)
    attention: Optional[AttentionParams]
    decoder: Optional[DecoderParams]
    char_w: Optional[jnp.ndarray]     # (dec_dim, V)
    char_b: Optional[jnp.ndarray]     # (V,)


class ASR:
    """Static model object; params are a pure pytree (ASRParams)."""

    def __init__(self, input_size: int, vocab_size: int, cfg: Dict[str, Any]):
        self.vocab_size = vocab_size
        self.ctc_weight = float(cfg.get("ctc_weight", 0.0))
        assert 0.0 <= self.ctc_weight <= 1.0
        self.enable_ctc = self.ctc_weight > 0.0
        self.enable_att = self.ctc_weight < 1.0
        self.encoder = Encoder(input_size, cfg["encoder"])
        self.emb_drop = float(cfg.get("emb_drop", 0.0))
        # save-nothing remat on the label scan: measured 90 -> 71 ms/step
        # for the plain XLA step (see forward); exposed as a knob because
        # the fused-attention hand-VJP path changes the residual economics
        self.label_scan_remat = bool(cfg.get("label_scan_remat", True))
        if self.enable_att:
            dec_cfg = cfg["decoder"]
            self.dec_dim = int(dec_cfg["dim"])
            self.attention = Attention(cfg["attention"], self.dec_dim,
                                       self.encoder.out_dim)
            dec_in = self.dec_dim + self.attention.context_dim
            self.decoder = Decoder(dec_in, dec_cfg)
        else:
            self.attention = None
            self.decoder = None

    def init(self, key) -> ASRParams:
        ks = jax.random.split(key, 6)
        enc = self.encoder.init(ks[0])
        ctc_w = ctc_b = None
        if self.enable_ctc:
            ctc_w = _uniform(ks[1], (self.encoder.out_dim, self.vocab_size),
                             self.encoder.out_dim)
            ctc_b = jnp.zeros((self.vocab_size,))
        embed = att = dec = char_w = char_b = None
        if self.enable_att:
            embed = _uniform(ks[2], (self.vocab_size, self.dec_dim),
                             self.dec_dim)
            att = self.attention.init(ks[3])
            dec = self.decoder.init(ks[4])
            char_w = _uniform(ks[5], (self.decoder.out_dim, self.vocab_size),
                              self.decoder.out_dim)
            char_b = jnp.zeros((self.vocab_size,))
        return ASRParams(enc, ctc_w, ctc_b, embed, att, dec, char_w, char_b)

    # ------------------------------------------------------------- encoder
    def encode(self, p: ASRParams, feat, feat_len, *, train=False, rng=None):
        return self.encoder(p.encoder, feat, feat_len, train=train, rng=rng)

    def ctc_logits(self, p: ASRParams, enc: jnp.ndarray) -> jnp.ndarray:
        """Raw (f32) CTC head logits; the beam decoder normalizes these
        itself so the whole (B,T,V) prep fuses into fewer passes."""
        return jnp.dot(enc, p.ctc_w,
                       preferred_element_type=jnp.float32) + p.ctc_b

    def ctc_output(self, p: ASRParams, enc: jnp.ndarray) -> jnp.ndarray:
        # CTC lattice numerics stay float32 even under bf16 (--amp) compute
        return jax.nn.log_softmax(
            self.ctc_logits(p, enc).astype(jnp.float32), axis=-1)

    # ---------------------------------------------------------- att decode
    def init_decode(self, p: ASRParams, enc, enc_len
                    ) -> Tuple[AttCache, DecoderState, jnp.ndarray]:
        B = enc.shape[0]
        # amp training (bf16 enc) keeps the attention cache in bf16 so the
        # per-label-step tanh chain and its VJP run at half the HBM traffic
        cache = self.attention.precompute(
            p.attention, enc, enc_len, amp=(enc.dtype == jnp.bfloat16))
        state = self.decoder.init_state(B, enc.dtype)
        align = self.attention.init_align(cache)
        return cache, state, align

    def decode_step(self, p: ASRParams, cache: AttCache, state: DecoderState,
                    prev_align: jnp.ndarray, prev_token: jnp.ndarray, *,
                    train: bool = False, rng=None, tables=None):
        """One label-synchronous step.

        prev_token (B,) int32 -> (logits (B, V), state, align, context).
        Ordering matches the reference: attention queried with the decoder
        hidden from the previous step, then the decoder consumes
        [emb(prev_token) ; context].

        ``tables`` (from precompute_decode_tables) enables the first-layer
        lookup fast path shared with the beam decoder: a one-hot (B, V) MXU
        matmul replaces the embedding row-gather (which serializes on TPU)
        + concat + first-layer input projection. Requires emb_drop == 0
        (the table folds the embedding into the projection).
        """
        query = self.decoder.query(state)
        context, align = self.attention.step(p.attention, cache, query,
                                             prev_align)
        if tables is not None:
            oh = jax.nn.one_hot(prev_token, self.vocab_size,
                                dtype=tables["emb_proj"].dtype)
            x0 = (jnp.dot(oh, tables["emb_proj"],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(context, tables["w_ctx"],
                            preferred_element_type=jnp.float32))
            dec_out, state = self.decoder.step(p.decoder, state, x0_proj=x0,
                                               train=train, rng=rng)
        else:
            emb = p.embed[prev_token]
            if train and self.emb_drop > 0 and rng is not None:
                rng, r = jax.random.split(rng)
                keep = 1.0 - self.emb_drop
                emb = emb * jax.random.bernoulli(r, keep, emb.shape) / keep
            dec_out, state = self.decoder.step(
                p.decoder, state, jnp.concatenate([emb, context], axis=-1),
                train=train, rng=rng)
        logits = jnp.dot(dec_out, p.char_w,
                         preferred_element_type=jnp.float32) + p.char_b
        return logits, state, align, context

    def precompute_decode_tables(self, p: ASRParams):
        """Beam fast path: the decoder's first-layer input is
        ``[emb(prev_token) ; context]``, and the embedding half of its input
        projection has only V distinct rows — precompute the (V, gates)
        table ``embed @ W_ih[:emb_dim] + b`` once per utterance batch and
        the per-step (B*K, emb) @ (emb, gates) matmul becomes a lookup."""
        c0 = p.decoder.cells[0]
        E = self.dec_dim
        b = c0.b if self.decoder.module == "lstm" else c0.b_ih
        t = jnp.dot(p.embed, c0.w_ih[:E],
                    preferred_element_type=jnp.float32) + b
        return {"emb_proj": t.astype(p.embed.dtype), "w_ctx": c0.w_ih[E:]}

    def decode_step_beam(self, p: ASRParams, cache: AttCache,
                         state: DecoderState, prev_align: jnp.ndarray,
                         prev_token: jnp.ndarray, beam: int, tables=None):
        """Beam-folded decode step against an UNEXPANDED attention cache.

        state holds (L, B*K, H); prev_align (B, K, H, T); prev_token (B*K,).
        Used by decode/beam.py so encoder keys/values are read once per step
        rather than K times (see Attention.step_beam). ``tables`` (from
        precompute_decode_tables) enables the first-layer lookup fast path.
        """
        BK = prev_token.shape[0]
        B = BK // beam
        query = self.decoder.query(state).reshape(B, beam, -1)
        context, align = self.attention.step_beam(p.attention, cache, query,
                                                  prev_align)
        if tables is not None:
            # one-hot matmul, not a gather: row-gathers serialize on TPU
            # while a (B*K, V) @ (V, gates) one-hot product is one MXU op
            # (and is EXACT: one nonzero term per row, f32 accumulation)
            oh = jax.nn.one_hot(prev_token, self.vocab_size,
                                dtype=tables["emb_proj"].dtype)
            x0 = (jnp.dot(oh, tables["emb_proj"],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(context.reshape(BK, -1), tables["w_ctx"],
                            preferred_element_type=jnp.float32))
            dec_out, state = self.decoder.step(p.decoder, state,
                                               x0_proj=x0)
        else:
            emb = p.embed[prev_token]
            dec_in = jnp.concatenate(
                [emb, context.reshape(BK, -1)], axis=-1)
            dec_out, state = self.decoder.step(p.decoder, state, dec_in)
        logits = jnp.dot(dec_out, p.char_w,
                         preferred_element_type=jnp.float32) + p.char_b
        return logits, state, align, context

    # ------------------------------------------------------------- forward
    def forward(self, p: ASRParams, feat, feat_len, decode_step: int,
                tf_rate: float = 1.0, teacher: Optional[jnp.ndarray] = None,
                *, train: bool = False, rng=None, get_dec_state: bool = False):
        """Mirror of reference ASR.forward (SURVEY.md 3.4).

        Returns (ctc_output (B,T',V) | None, encode_len (B,),
                 att_output (B,U,V) | None, att_align (B,U,H,T') | None,
                 dec_state | None). ``dec_state`` is the per-step decoder
        outputs (B,U,dec_dim) when ``get_dec_state`` (for the embedding
        plugin, SURVEY.md 2.18), else the final top-layer hidden (B,dec_dim).
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_enc, r_coin, r_step = jax.random.split(rng, 3)
        enc, enc_len = self.encode(p, feat, feat_len, train=train,
                                   rng=r_enc if train else None)
        ctc_out = self.ctc_output(p, enc) if self.enable_ctc else None

        att_out = att_align = dec_state = None
        if self.enable_att and decode_step > 0:
            B = enc.shape[0]
            cache, state, align = self.init_decode(p, enc, enc_len)
            sos = jnp.full((B, 1), EOS_IDX, jnp.int32)
            # per-step teacher-forcing coins, drawn vectorized (reference
            # draws one Bernoulli per step for the whole batch). Step 0
            # always feeds <sos>: fold it in as a forced-True coin with
            # <sos> as the step-0 "teacher" token — removes the per-step
            # t==0 selects from the scan body.
            if teacher is not None:
                coins = jax.random.uniform(r_coin, (decode_step,)) <= tf_rate
                coins = coins.at[0].set(True)
                tf_toks = jnp.concatenate(
                    [sos, teacher[:, :decode_step - 1]], axis=1)   # (B, U)
            else:
                coins = jnp.arange(decode_step) == 0
                tf_toks = jnp.broadcast_to(sos, (B, decode_step))
            tf_toks = tf_toks.T                                    # (U, B)
            step_rngs = jax.random.split(r_step, decode_step)
            # first-layer lookup fast path (shared with beam decode): only
            # valid when embedding dropout is inactive this pass
            tables = (self.precompute_decode_tables(p)
                      if (self.emb_drop == 0.0 or not train) else None)

            def scan_step(carry, inp):
                state, align, prev_pred = carry
                tf_tok, coin, srng = inp
                prev_tok = jnp.where(coin, tf_tok, prev_pred)
                logits, state, align, _ = self.decode_step(
                    p, cache, state, align, prev_tok,
                    train=train, rng=srng if train else None, tables=tables)
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                dec_out = self.decoder.query(state) if get_dec_state else None
                return (state, align, pred), (logits, align, dec_out)

            # unroll=4: the label scan's per-step carry get/update boilerplate
            # profiled at ~48 ms/step (half the train step) at B=128/U=96 —
            # the same fix as the beam loop's unroll (BASELINE.md round 2).
            # jax.checkpoint (save-nothing): the default scan VJP streams
            # every per-step intermediate (the (B,H,T,d) tanh chain etc.) to
            # HBM forward and back; the step is latency-bound so recomputing
            # it in the backward scan is cheaper than the residual traffic —
            # measured 90 -> 71 ms/step bf16 B=128/U=96 (policy
            # dots_with_no_batch_dims_saveable was worse: 83 ms).
            step_fn = (jax.checkpoint(scan_step) if self.label_scan_remat
                       else scan_step)
            (state, align, _), (att_out, att_align, dec_outs) = jax.lax.scan(
                step_fn, (state, align, sos[:, 0]),
                (tf_toks, coins, step_rngs), unroll=4)
            att_out = jnp.swapaxes(att_out, 0, 1)        # (B, U, V)
            att_align = jnp.swapaxes(att_align, 0, 1)    # (B, U, H, T')
            dec_state = (jnp.swapaxes(dec_outs, 0, 1) if get_dec_state
                         else self.decoder.query(state))
        return ctc_out, enc_len, att_out, att_align, dec_state
