"""Batched on-device joint CTC/attention beam search with RNN-LM fusion.

Capability parity with the reference's ``src/decode.py:BeamDecoder``
(SURVEY.md 2.15): combined score
``(1-ctc_w) * logP_att + ctc_w * CTCPrefixScore + lm_w * logP_lm``,
``min_len_ratio``/``max_len_ratio`` bounds from the encoded length, eos
finalization with length-normalized final ranking.

TPU-first (this IS the >=10x headline, SURVEY.md 3.2): the reference decodes
one utterance per CPU process with a per-hypothesis Python loop; here the
whole batch advances K hypotheses each in ONE jitted ``lax.scan`` —
hypothesis state is (B, K, ...) tensors, the decoder/LM states are folded to
(B*K, ...) while attention reads UNEXPANDED (B,...) keys (step_beam), CTC
selection scores come from ops/ctc_prefix's probability-domain matmul with
the winners' states recomputed afterwards (two-phase), and top-k pruning is
``lax.top_k`` over the (K * candidates) axis. ``ctc_candidates`` optionally
restricts CTC-scored continuations to the best extensions by attention+LM
score (the reference's 'cheap_compute' idea, vectorized) — a search-space
knob, off by default: on TPU full-vocab scoring measures faster at every
vocab size (BASELINE.md V-scaling table). Measured ~12,700x the
reference-style CPU decoder on one v5e chip (BASELINE.md).
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.asr import ASR, ASRParams
from ..models.lm import RNNLM, RNNLMParams
from ..ops import ctc_prefix
from ..utils.text import EOS_IDX, PAD_IDX

NEG_INF = -1e30


class BeamOutput(NamedTuple):
    tokens: jnp.ndarray   # (B, K, L) emitted tokens (no sos/eos), 0-padded
    lengths: jnp.ndarray  # (B, K)
    scores: jnp.ndarray   # (B, K) length-normalized, sorted desc


def _gather_k(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the beam axis: x (B, K, ...) + idx (B, K) -> (B, K, ...)."""
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def _backtrace(vs: jnp.ndarray, ks: jnp.ndarray, fin_step: jnp.ndarray,
               fin_slot: jnp.ndarray, L: int) -> jnp.ndarray:
    """Reconstruct token sequences from per-step lineage records.

    vs/ks (S, B, K): token written into / parent entry-slot of each new slot
    at step s. A finished hypothesis (step=t, slot=k) occupied entry-slot k
    at step t and its tokens were emitted at steps 0..t-1: walking s
    downwards, tokens[s] = vs[s, b, slot_{s+1}] and
    slot_s = ks[s, b, slot_{s+1}], starting from slot_t = k.

    Returns (B, K, L) int32, zero-padded past each hypothesis's length.
    This trades the in-loop (B, K, L) token-buffer carries (gather +
    dynamic-update-slice every step) for one cheap (B, K)-sized reverse
    scan after the loop.
    """
    S = vs.shape[0]

    def bt(slot, inp):
        v_s, k_s, s = inp
        active = s < fin_step                       # (B, K)
        tok = jnp.take_along_axis(v_s, slot, axis=1)
        par = jnp.take_along_axis(k_s, slot, axis=1)
        slot = jnp.where(active, par, slot)
        return slot, jnp.where(active, tok, 0)

    _, toks = jax.lax.scan(bt, fin_slot, (vs, ks, jnp.arange(S)),
                           reverse=True, unroll=4)
    return jnp.moveaxis(toks, 0, 2)[:, :, :L]       # (B, K, L)


class BeamDecoder:
    """Static beam-search program over an ASR model (attention required;
    CTC and LM heads optional by weights)."""

    def __init__(self, model: ASR, decode_cfg: Dict[str, Any],
                 lm: Optional[RNNLM] = None, plugin=None):
        assert model.enable_att, "beam decoder needs the attention decoder"
        self.model = model
        # emb_decoder fused decoding (SURVEY.md 2.18)
        self.plugin = plugin if (plugin is not None
                                 and plugin.apply_fuse) else None
        self.beam = int(decode_cfg.get("beam_size", 4))
        self.min_len_ratio = float(decode_cfg.get("min_len_ratio", 0.0))
        self.max_len_ratio = float(decode_cfg.get("max_len_ratio", 1.0))
        self.lm_weight = float(decode_cfg.get("lm_weight", 0.0))
        cw = decode_cfg.get("ctc_weight", 0.0)
        self.ctc_weight = float(cw) if model.enable_ctc else 0.0
        self.lm = lm if self.lm_weight > 0 else None
        # ctc_candidates > 0 restricts CTC-scored continuations to the top-C
        # by att+LM score (the reference's cheap_compute). Default OFF: psi
        # comes from one full-vocab MXU matmul either way, so on TPU the
        # restriction only ADDS a per-step top_k whose cost grows with C
        # (measured: V=1024 full 2022 utts/s vs C=32 639 / C=128 312,
        # bench_vocab round 3) — it is a search-space knob, not a speedup.
        self.ctc_candidates = int(decode_cfg.get("ctc_candidates", 0))
        self.use_ctc = self.ctc_weight > 0
        # decode-time amp: bf16 attention keys/values + energy chain (halves
        # the per-step HBM traffic; top-1 sequences measured identical to
        # f32). 'auto' = on for accelerator backends, off on CPU so the
        # enumeration/golden parity tests stay exact.
        amp = decode_cfg.get("amp", "auto")
        if amp == "auto":
            amp = jax.default_backend() not in ("cpu",)
        self.amp = bool(amp)
        # Pallas phase-1 psi kernel (ops/pallas/psi_kernel): MEASURED
        # NEGATIVE in-loop (V=5120 full decode 787 -> 567 utts/s despite
        # fusing the log/last/blank epilogues: inside the scan XLA overlaps
        # the psi einsum with neighboring ops while the pallas_call
        # serializes — same economics as beam_step_kernel.py). Default OFF;
        # True / 'interpret' opt in (interpret = CPU emulation, tests).
        pk = decode_cfg.get("psi_kernel", False)
        if pk == "auto":
            pk = False
        self.psi_pallas = pk
        # int8-quantized phase-1 psi matmul (opt-in, amp only): the psi
        # einsum re-reads the loop-invariant (B,T,V) probs tensor every
        # step and is bandwidth-bound at subword vocabs; storing probs as
        # int8 (scale 127, probs are in [0,1]) halves that traffic vs bf16
        # and runs the MXU's double-rate s8 path. Selection-only accuracy
        # knob: the carried base is recovered as top_tot - cw*psi with the
        # SAME quantized psi, so quantization error never accumulates into
        # scores — it can only reorder near-tied candidate selections
        # (error <= ~(0.5/127)/avg_emission_prob along the prefix paths;
        # phase-2 r states, eos scores and finished ranking stay exact).
        pq = decode_cfg.get("psi_quant", False)
        if pq not in (False, None, "int8"):
            raise ValueError(f"psi_quant must be False or 'int8', got {pq!r}")
        self.psi_quant = pq or False
        if self.psi_quant:       # mutually exclusive phase-1 psi overrides
            self.psi_pallas = False
        # windowed phase-1 psi (opt-in, large-V lever): > 0 restricts the
        # psi reduction to this many encoder frames around the per-sample
        # alignment frontier (ops/ctc_prefix.py `window` — cuts the
        # dominant (B,T,V) re-read by T/W on trained monotonic models;
        # 0 = off/exact). Composes with psi_quant (windows the int8
        # operand); ignored when psi_kernel is forced on (the Pallas path
        # streams full T by construction).
        cwin = int(decode_cfg.get("ctc_window", 0) or 0)
        if cwin < 0:
            raise ValueError(f"ctc_window must be >= 0, got {cwin}")
        if cwin and self.psi_pallas:
            # the Pallas path streams full T by construction (ctc_prefix
            # returns on that branch BEFORE the window slice), so the
            # window would be a silent no-op — neutralize it here so
            # early_stop 'auto' below still resolves to the exact early
            # exit instead of giving it up for zero bandwidth benefit
            print("[beam] ctc_window ignored: psi_kernel streams full T")
            cwin = 0
        self.ctc_window = cwin
        # approximate continuation top-k (opt-in, large-V lever): False, or
        # a recall target in (0, 1] passed to lax.approx_max_k
        at = decode_cfg.get("approx_topk", False)
        if at not in (False, None) and not (0.0 < float(at) <= 1.0):
            raise ValueError(
                f"approx_topk must be False or a recall in (0, 1], got {at!r}")
        self.approx_topk = float(at) if at else False
        # log-softmax normalizer folding: 'auto' = amp and V >= 1024 (see
        # the fold_lse comment in forward); True / False force it
        self.fold_logp = decode_cfg.get("fold_logp", "auto")
        # EXACT early exit (default on): stop the label loop once no live
        # hypothesis can still beat the K-th best finished score. Per-step
        # score increments are <= 0 (log_softmax outputs and the CTC
        # prefix probability are monotone non-increasing under extension),
        # so a live hypothesis with total ``tot`` can at best finalize at
        # normalized score tot/(max_len+1) (tot < 0; the largest reachable
        # divisor, from finalizing at step max_len) or tot/(n+1) (tot >= 0).
        # ``early_stop_slack`` (normalized-score units) absorbs the tiny
        # positive increments floating-point rounding can produce (bf16
        # psi probs under amp bound the accumulated violation well below
        # 0.01); exit is only taken with margin > slack, so outputs are
        # bit-identical to the full-length loop. Weight-independent
        # benches with random weights never trigger it (margins stay ~0);
        # trained-model decode exits as soon as transcripts end.
        es = decode_cfg.get("early_stop", "auto")
        if es == "auto":
            # psi_quant / ctc_window break the bound's premise: the carried
            # approximate psi can UNDERESTIMATE a weak hypothesis's exact
            # finalization score by more than the slack (its eos score uses
            # the exact phase-2 ctc_eos), so the 'exact early exit' would no
            # longer be exact. Compose conservatively; forcing
            # early_stop=True alongside them is allowed but
            # documented-approximate.
            self.early_stop = not (self.psi_quant or self.ctc_window)
        else:
            self.early_stop = bool(es)
        self.early_stop_slack = float(decode_cfg.get("early_stop_slack",
                                                     0.05))
        self._last_steps = None  # eager-mode debug/test hook

    # ------------------------------------------------------------------ run
    def forward(self, p: ASRParams, feat: jnp.ndarray, feat_len: jnp.ndarray,
                lm_params: Optional[RNNLMParams] = None,
                plugin_params=None) -> BeamOutput:
        model, K = self.model, self.beam
        V = model.vocab_size
        if self.amp:
            # decode-time amp runs the WHOLE forward in bfloat16 (params +
            # activations): encoder conv/LSTM activation traffic halves
            # (encode was ~40% of decode wall at batch 128) and the beam
            # loop's cell weights/embedding reads halve. Score-critical
            # numerics stay f32 by construction: ctc_output log-softmaxes in
            # f32, every cell/logit matmul accumulates f32
            # (preferred_element_type), and all beam scores/psi/softmax are
            # f32 carries.
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, t)
            p = cast(p)
            feat = (feat.astype(jnp.bfloat16)
                    if feat.dtype == jnp.float32 else feat)
            if lm_params is not None:
                lm_params = cast(lm_params)
        enc, enc_len = model.encode(p, feat, feat_len)
        B, T, _ = enc.shape
        L = max(1, int(math.ceil(self.max_len_ratio * T)))

        # attention cache stays UNEXPANDED at (B, ...); the K beam axis is
        # broadcast inside decode_step_beam so keys are read once per step
        cache = model.attention.precompute(p.attention, enc, enc_len,
                                           pad_lanes=True, amp=self.amp)
        dec_state = model.decoder.init_state(B * K, enc.dtype)
        align0 = model.attention.init_align(cache)
        align = jnp.broadcast_to(align0[:, None], (B, K) + align0.shape[1:])

        min_len = jnp.ceil(self.min_len_ratio * enc_len).astype(jnp.int32)
        max_len = jnp.maximum(
            jnp.ceil(self.max_len_ratio * enc_len).astype(jnp.int32), 1)

        # candidate-set size for CTC scoring (C < V = 'cheap_compute' mode;
        # ctc_candidates == 0 disables the restriction)
        C = V if (not self.use_ctc or self.ctc_candidates <= 0
                  or V <= self.ctc_candidates) else self.ctc_candidates

        if self.use_ctc:
            # loop-invariant companions of ctc_lp, computed ONCE here (XLA
            # does not hoist them out of the while body):
            #   - ctc_probs = exp(ctc_lp), the phase-1 psi matmul operand.
            #     Under amp it is bf16: the einsum re-reads this (B,T,V)
            #     tensor every step and is bandwidth-bound (M=K=8 rows per
            #     sample); psi still accumulates in f32 (top-1 sequences
            #     verified identical on the synthetic test set, WER 0.000).
            #   - blank_lp, so the scan never touches the (B,T,V) f32
            #     ctc_lp except through tiny exact lane gathers (phase-2
            #     winner xs, psi_same's p_last).
            if self.amp:
                # restructured prep (amp only; exact paths keep the original
                # op sequence): normalize with ONE precomputed logsumexp
                # subtraction and exponentiate in bf16. At V=5120 the
                # log_softmax -> pad -> f32 exp -> bf16 cast chain hits a
                # pathological XLA fusion (21.4 ms vs 5.4 ms for this form,
                # util/bench_ctc_prep.py); probs are only consumed by the
                # f32-accumulating psi einsum, so bf16 exp is the same
                # rounding class as the bf16 cast it replaces.
                logits = model.ctc_logits(p, enc)             # (B,T,V) f32
                lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
                ctc_lp = ctc_prefix.pad_ctc_log_probs(logits - lse, enc_len)
                ctc_probs = jnp.exp(ctc_lp.astype(jnp.bfloat16))
            else:
                ctc_lp = ctc_prefix.pad_ctc_log_probs(
                    model.ctc_output(p, enc), enc_len)
                ctc_probs = jnp.exp(ctc_lp)
            r_state, psi_prev = ctc_prefix.init_state(ctc_lp, K)
            blank_lp = jnp.maximum(ctc_lp[:, :, 0], ctc_prefix.CLIP)
            # int8 psi operand, quantized from the F32 log-probs (one more
            # loop-invariant companion; the bf16 ctc_probs stays live for
            # the exact psi_same/p_last lane gathers)
            ctc_probs_q8 = (
                ctc_prefix.quantize_probs_q8(jnp.exp(ctc_lp))
                if (self.amp and self.psi_quant == "int8") else None)
            # Pallas psi only where it applies: amp probs, blockable vocab
            from ..ops.pallas.psi_kernel import pick_block
            psi_pallas = (self.psi_pallas if pick_block(
                V, T, ctc_probs.dtype.itemsize) is not None else False)
            # per-frame best non-blank log-prob: the ctc_window frontier
            # signal (loop-invariant companion; padded frames are all
            # NEG_INF non-blank so they can never win the argmax)
            max_nb_lp = (jnp.max(ctc_lp[:, :, 1:], axis=-1)
                         if (self.ctc_window and not psi_pallas) else None)
        else:
            ctc_lp = r_state = None
            ctc_probs = blank_lp = ctc_probs_q8 = max_nb_lp = None
            psi_pallas = False
            psi_prev = jnp.zeros((B, K))

        use_lm = self.lm is not None
        lm_state = self.lm.init_state(B * K, enc.dtype) if use_lm else None

        # first-layer input-projection lookup tables (amp fast path only, so
        # the exact-f32 CPU parity paths keep their original op sequence)
        tables = model.precompute_decode_tables(p) if self.amp else None
        lm_embp = (self.lm.emb_proj_table(lm_params)
                   if (use_lm and self.amp) else None)

        # NOTE the carry holds NO (B, K, L) token buffers: sequences are
        # reconstructed AFTER the scan by backtracing the per-step
        # (token, parent-slot) outputs. Carrying/gathering the token
        # buffers inside the loop profiled at ~45 us/step at B=128.
        # Finished hypotheses are recorded as (score, length, step, slot).
        carry = {
            "last": jnp.full((B, K), EOS_IDX, jnp.int32),  # sos
            # only slot 0 is live at step 0 (all K slots start identical)
            "valid": jnp.broadcast_to(jnp.arange(K)[None] == 0, (B, K)),
            # base = aw*cum_att + lw*cum_lm: the separate att/LM cumulative
            # scores are never consumed individually, so only their weighted
            # sum is carried — after selection it is recovered as
            # top_tot - cw*psi with ZERO gathers (the per-component update
            # needed 6 gathers/step)
            "base": jnp.zeros((B, K)),
            "psi": psi_prev,
            "r": r_state,
            "dec_state": dec_state,
            "align": align,
            "lm_state": lm_state,
            # finished hypotheses: normalized score + ONE packed int32 of
            # (finalization step << 8 | entry slot). The length needs no
            # slot of its own: a hypothesis finalized at step t emitted
            # exactly t tokens (len == step), and K <= 256 fits 8 bits.
            "fin_meta": jnp.zeros((B, K), jnp.int32),
            "fin_norm": jnp.full((B, K), NEG_INF),
        }
        assert K <= 256, "packed finished-set metadata assumes beam <= 256"

        aw, cw, lw = 1.0 - self.ctc_weight, self.ctc_weight, self.lm_weight
        vocab_ids = jnp.arange(V)
        cont_keep = (vocab_ids != EOS_IDX) & (vocab_ids != PAD_IDX)  # (V,)

        # amp fast path: never materialize logp_att/logp_lm. The (B,K,V)
        # log_softmax outputs cost two full write+read round trips per step;
        # folding each normalizer into a per-hypothesis scalar shift
        # (tot = base - [aw*lse_att + lw*lse_lm] + aw*logits_att
        #  + lw*logits_lm + cw*psi) is the same score up to f32 association,
        # so non-amp keeps the original exact op sequence. Only a win when
        # the (B,K,V) round trips dominate: measured V=16384 255 -> 273,
        # V=5120 787 -> 803 utts/s, but V=31 2603 -> 2530 (the extra
        # scalar lse pass isn't free at tiny V) — hence the vocab gate.
        fold_lse = (self.amp and self.plugin is None
                    and (V >= 1024 if self.fold_logp == "auto"
                         else bool(self.fold_logp)))

        def step(carry, t):
            logits, new_dec, new_align, _ = model.decode_step_beam(
                p, cache, carry["dec_state"], carry["align"],
                carry["last"].reshape(B * K), K, tables=tables)
            shift = None
            if self.plugin is not None:
                logp_att = self.plugin.fused_log_prob(
                    plugin_params, new_dec.h[-1], logits).reshape(B, K, V)
            elif fold_lse:
                logp_att = logits.reshape(B, K, V)     # UNNORMALIZED
                shift = aw * jax.nn.logsumexp(logp_att, axis=-1)   # (B, K)
            else:
                logp_att = jax.nn.log_softmax(logits, -1).reshape(B, K, V)

            if use_lm:
                lm_logits, new_lm = self.lm.step(
                    lm_params, carry["lm_state"], carry["last"].reshape(B * K),
                    emb_proj=lm_embp)
                logp_lm = lm_logits.reshape(B, K, V)
                if fold_lse:
                    shift = shift + lw * jax.nn.logsumexp(logp_lm, axis=-1)
                else:
                    logp_lm = jax.nn.log_softmax(logp_lm, -1)
            else:
                new_lm = None
                logp_lm = jnp.zeros((B, K, V))

            base = carry["base"]                                   # (B, K)

            # ---------------- eos / finalization scores
            if self.use_ctc:
                ctc_eos = ctc_prefix.final_score(carry["r"], None)
            else:
                ctc_eos = jnp.zeros((B, K))
            tot_eos = (base + aw * logp_att[:, :, EOS_IDX]
                       + cw * ctc_eos + lw * logp_lm[:, :, EOS_IDX])
            if shift is not None:
                tot_eos = tot_eos - shift
            n_tok = t  # tokens emitted so far
            eos_ok = jnp.logical_and(
                carry["valid"],
                jnp.logical_or(n_tok + 1 >= min_len[:, None],
                               n_tok + 1 >= max_len[:, None]))
            # mask AFTER normalizing: NEG_INF/(t+1) would rank ABOVE the
            # finished-set NEG_INF placeholders and admit masked slots as
            # garbage n-best rows whenever fewer than K real finalizations
            # occur (tests/test_beam.py::test_unfilled_finished_slots...)
            norm_eos = jnp.where(
                eos_ok,
                tot_eos / jnp.maximum(n_tok + 1, 1).astype(jnp.float32),
                NEG_INF)

            # merge into finished set (keep top-K by normalized score);
            # a finished hypothesis is (score, step<<8|slot) — its length is
            # its step, its tokens come from the post-scan backtrace
            all_norm = jnp.concatenate([carry["fin_norm"], norm_eos], axis=1)
            meta_new = jnp.broadcast_to(
                (t << 8) + jnp.arange(K, dtype=jnp.int32)[None], (B, K))
            all_meta = jnp.concatenate([carry["fin_meta"], meta_new], axis=1)
            fin_norm, fin_idx = jax.lax.top_k(all_norm, K)
            fin_meta = jnp.take_along_axis(all_meta, fin_idx, axis=1)

            # ---------------- continuation scores
            step_score = aw * logp_att + lw * logp_lm          # (B, K, V)
            if shift is not None:
                step_score = step_score - shift[..., None]
            # fused select beats two dynamic-update-slices (1.3 ms/batch)
            masked = jnp.where(cont_keep[None, None, :], step_score, NEG_INF)

            if self.use_ctc:
                # phase 1: psi only, for the candidate set (selection).
                # When C == V the candidate set is the identity — avoid the
                # take_along_axis gathers entirely (profiled as the hottest
                # while-body ops: 29us each for 4KB of data).
                # psi is ALWAYS computed over the full vocab by the MXU
                # matmul (one bf16 read of the (B,T,V) probs under amp);
                # candidate mode then restricts the continuation set by
                # small output-side lane gathers. Gathering candidate
                # emission ROWS instead (reads scaling with C, not V)
                # measured 2-9x SLOWER end-to-end: TPU axis-1 row gathers
                # serialize (bench_vocab, round 3).
                psi_full, _ = ctc_prefix.score_candidates(
                    ctc_lp, carry["r"], carry["last"],
                    jnp.full((B, K), t, jnp.int32), with_state=False,
                    probs=ctc_probs, psi_pallas=psi_pallas,
                    probs_q8=ctc_probs_q8, window=self.ctc_window,
                    max_nb_lp=max_nb_lp)
                if C < V:
                    _, cand = jax.lax.top_k(masked, C)          # (B, K, C)
                    psi = jnp.take_along_axis(psi_full, cand, axis=2)
                    sc = jnp.take_along_axis(masked, cand, axis=2)
                else:
                    cand = None
                    psi = psi_full
                    sc = masked
                tot = base[:, :, None] + sc + cw * psi          # (B, K, C)
            else:
                cand = None
                tot = base[:, :, None] + masked
                psi = None

            nC = tot.shape[-1]
            # stop expanding past per-utterance max_len; dead slots stay dead
            alive = jnp.logical_and(carry["valid"],
                                    n_tok < max_len[:, None])   # (B, K)
            tot = jnp.where(alive[..., None], tot, NEG_INF)

            # NOTE a two-stage exact top-k (per-row top-K over (B,K,V) then
            # top-K over the K*K survivors) measured 4x SLOWER end-to-end
            # at V=5120 (163 -> 644 ms/batch, round 3): lax.top_k over the
            # rank-3 row layout lowers far worse than one flat (K*V) scan.
            flat = tot.reshape(B, K * nC)
            if self.approx_topk:
                # opt-in approximate beam pruning (large-V lever): TPU's
                # PartialReduce unit scans the flat row once at the given
                # recall target instead of exact-sorting K*V entries. The
                # SELECTED hypotheses keep their exact scores (only
                # membership is approximate: a true top-K entry is missed
                # with prob <= 1-recall per step); exact top_k elsewhere
                # (finished set, candidate restriction). CPU lowering is
                # exact, so parity tests pin the wiring deterministically.
                top_tot, top_idx = jax.lax.approx_max_k(
                    flat, K, recall_target=self.approx_topk)
            else:
                top_tot, top_idx = jax.lax.top_k(flat, K)       # (B, K)
            new_valid = top_tot > NEG_INF / 2
            k_idx = top_idx // nC
            c_idx = top_idx % nC
            if cand is None:  # identity candidate set: c IS the vocab id
                v_idx = c_idx
            else:  # flat (K*C) gather: one op instead of gather-then-take
                v_idx = jnp.take_along_axis(cand.reshape(B, K * nC),
                                            top_idx, axis=1)

            if self.use_ctc:
                psi_g = jnp.take_along_axis(psi.reshape(B, K * nC),
                                            top_idx, axis=1)
                new_base = top_tot - cw * psi_g
            else:
                psi_g = carry["psi"]
                new_base = top_tot

            if self.amp:
                # beam-axis reorder as a one-hot (B,K,K) matmul: row-gathers
                # serialize on TPU (profiled ~9 us each for ~1 MB) while the
                # batched (8,8)@(8,512) products are one MXU op per state —
                # and EXACT for the bf16 states (one nonzero term per row)
                oh = jax.nn.one_hot(k_idx, K, dtype=jnp.bfloat16)

                def resel(x):
                    # beam-axis reorder for any state leaf shaped
                    # (..., B*K, trailing...) with the fold on axis 1;
                    # arbitrary trailing dims are flattened into one.
                    # Leaves without a B*K axis-1 fold (incl. rank-0/1
                    # scalars) are beam-invariant and pass through, exactly
                    # like the non-amp gather path below.
                    if x is None or x.ndim < 2 or x.shape[1] != B * K:
                        return x
                    Lx = x.shape[0]
                    xr = x.reshape(Lx, B, K, -1)
                    out = jnp.einsum("bkj,lbjh->lbkh", oh.astype(x.dtype), xr)
                    return out.reshape(x.shape)

                def resel_f32(x):
                    # EXACT for f32 too under HIGHEST precision: the one-hot
                    # row selects a single term, and the 6-pass bf16 split
                    # of each f32 value re-sums exactly (disjoint mantissa
                    # chunks) — verified against take_along in the tests
                    sh = x.shape
                    xr = x.reshape(B, K, -1)
                    out = jnp.einsum("bkj,bjx->bkx", oh.astype(jnp.float32),
                                     xr,
                                     precision=jax.lax.Precision.HIGHEST)
                    return out.reshape(sh)

                new_dec_g = jax.tree_util.tree_map(resel, new_dec)
                new_lm_g = (jax.tree_util.tree_map(resel, new_lm)
                            if use_lm else None)
            else:
                flat_sel = (jnp.arange(B)[:, None] * K + k_idx).reshape(B * K)
                new_dec_g = jax.tree_util.tree_map(
                    lambda x: x[:, flat_sel]
                    if x.ndim >= 2 and x.shape[1] == B * K else x, new_dec)
                new_lm_g = (jax.tree_util.tree_map(
                    lambda x: x[:, flat_sel] if x is not None else None,
                    new_lm) if use_lm else None)
            new_align_g = (resel_f32(new_align) if self.amp
                           else _gather_k(new_align, k_idx))  # (B, K, H, T)

            out = {
                "last": v_idx,
                "valid": new_valid,
                "base": new_base,
                "dec_state": new_dec_g,
                "align": new_align_g,
                "lm_state": new_lm_g,
                "fin_meta": fin_meta,
                "fin_norm": fin_norm,
            }
            if self.use_ctc:
                # phase 2: recompute the r state for the K winners only
                # (C/K x less cumulative-logsumexp work than materializing
                # r for every candidate)
                r_sel = (resel_f32(carry["r"]) if self.amp
                         else _gather_k(carry["r"], k_idx))
                if self.amp:
                    # exact: token ids < 2^24 round-trip f32 losslessly
                    last_sel = resel_f32(
                        carry["last"].astype(jnp.float32)[..., None]
                    )[..., 0].astype(jnp.int32)
                else:
                    last_sel = _gather_k(carry["last"], k_idx)
                _, r_g = ctc_prefix.score_candidates(
                    ctc_lp, r_sel, last_sel,
                    jnp.full((B, K), t, jnp.int32),
                    cand_ids=v_idx[..., None], blank_lp=blank_lp)
                out["psi"] = psi_g
                out["r"] = r_g[:, :, 0]
            else:
                out["psi"] = carry["psi"]
                out["r"] = carry["r"]
            # per-step lineage record: token emitted into each new slot and
            # the parent (entry) slot it extends — the backtrace inputs
            return out, (v_idx, k_idx.astype(jnp.int32))

        # L+1 steps: step t first offers finalization to length-t hypotheses,
        # then expands to length t+1; the final step only finalizes (the
        # expansion mask kills all continuations past max_len).
        # unroll=4: the scan carries ~13 arrays whose per-iteration
        # get/update boilerplate profiled as ~120 micro-ops/step; unrolling
        # amortizes that overhead (1725 -> 1988 utts/sec at B=128 together
        # with the slimmer carry; beam tests stay green).
        S = L + 1
        if not self.early_stop:
            carry, (vs, ks) = jax.lax.scan(step, carry, jnp.arange(S),
                                           unroll=4)
        else:
            # EXACT early exit: lax.scan lowers to a while loop anyway, so
            # this hand-rolled while with a 4-step-unrolled body matches
            # scan(unroll=4) per-step cost; the cond adds two (B, K)
            # reductions per 4 steps. Steps past the exit (or past S inside
            # the last unroll block) are semantically no-ops: every slot is
            # dead or provably unable to enter the finished top-K, so the
            # finished set — the only loop output besides the lineage
            # records the backtrace masks by fin_step — is unchanged.
            UN = 4
            S4 = ((S + UN - 1) // UN) * UN
            vs_buf = jnp.zeros((S4, B, K), jnp.int32)
            ks_buf = jnp.zeros((S4, B, K), jnp.int32)
            slack = self.early_stop_slack
            # a hypothesis finalizing at step max_len (its last chance) has
            # max_len tokens + eos => normalized divisor max_len + 1
            m_hi = jnp.maximum(max_len + 1, 1).astype(jnp.float32)  # (B,)

            def cond(state):
                t, c, _, _ = state
                tot = c["base"] + cw * c["psi"]                    # (B, K)
                # slots can still FINALIZE at t == max_len (the last,
                # finalize-only step), so the liveness gate is <=, not <
                alive = jnp.logical_and(c["valid"], t <= max_len[:, None])
                m_lo = jnp.maximum(t + 1, jnp.maximum(min_len, 1)
                                   ).astype(jnp.float32)            # (B,)
                bound = jnp.where(tot < 0.0, tot / m_hi[:, None],
                                  tot / m_lo[:, None])
                bound = jnp.where(alive, bound, NEG_INF)
                best_live = jnp.max(bound, axis=1)                  # (B,)
                worst_fin = jnp.min(c["fin_norm"], axis=1)          # (B,)
                can_improve = jnp.logical_and(
                    jnp.any(alive, axis=1),
                    best_live >= worst_fin - slack)
                return jnp.logical_and(t < S4, jnp.any(can_improve))

            def body(state):
                t, c, vsb, ksb = state
                for j in range(UN):
                    c, (v, kk) = step(c, t + j)
                    vsb = jax.lax.dynamic_update_slice(
                        vsb, v[None], (t + j, 0, 0))
                    ksb = jax.lax.dynamic_update_slice(
                        ksb, kk[None], (t + j, 0, 0))
                return (t + UN, c, vsb, ksb)

            t_fin, carry, vs, ks = jax.lax.while_loop(
                cond, body, (jnp.int32(0), carry, vs_buf, ks_buf))
            if not isinstance(t_fin, jax.core.Tracer):
                self._last_steps = int(t_fin)  # eager-mode test hook
        fin_step = carry["fin_meta"] >> 8
        fin_slot = carry["fin_meta"] & 0xFF
        fin_tokens = _backtrace(vs, ks, fin_step, fin_slot, L)
        return BeamOutput(fin_tokens, fin_step, carry["fin_norm"])
