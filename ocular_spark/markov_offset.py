"""Markov vertical-offset decode variant (the reference's "slower,
but more accurate" mode, README.md:392-394; conf/base.conf).

Re-expresses:
  * model/transition/CharacterNgramTransitionModelMarkovOffset.java —
    the vertical offset joins the DP state; between adjacent TMPL
    chars it moves at most MAX_OFFSET_DIFF=2 with a gaussian
    (var=0.05) transition penalty (column-normalized like the
    reference's a.normalizecoli, :301-312); line starts get a flat
    (unnormalized log(1)=0) offset distribution; margin states reset
    the offset to 0,
  * model/emission/CachingEmissionModelExplicitOffset.java — the
    emission cache keeps the explicit offset axis (max over exposures
    only), so scores are looked up at the state's own offset.

Monolingual only, exactly like the reference (DecoderEM.java:139-144
guards it off for multilingual / glyph substitution)."""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from ocular_spark.decoder import (
    LMRGN,
    LMRGN_HPHN,
    LOG_MRGN,
    LOG_NOT_MRGN,
    LINE_END_HYPHEN_PROB,
    N_TYPES,
    NEG_INF,
    RMRGN,
    RMRGN_HPHN,
    RMRGN_HPHN_INIT,
    TMPL,
    CompiledTransitionModel,
)
from ocular_spark.font import MAX_OFFSET

MAX_OFFSET_DIFF = 2  # :286
MAX_OFFSET_TRANS_PROB_VAR = 0.05  # :287
N_OFF = 2 * MAX_OFFSET + 1


def log_offset_start_probs() -> np.ndarray:
    """:292-298 — all-ones, logged WITHOUT normalization (zeros)."""
    return np.zeros(N_OFF)


def log_offset_trans_probs() -> np.ndarray:
    """:301-312 — gaussian in |prev-next| (banded at ±2), columns
    normalized (a.normalizecoli), then logged.  Indexed [prev, next]."""
    m = np.zeros((N_OFF, N_OFF))
    for o0 in range(-MAX_OFFSET, MAX_OFFSET + 1):
        for o1 in range(-MAX_OFFSET, MAX_OFFSET + 1):
            if abs(o0 - o1) <= MAX_OFFSET_DIFF:
                m[o0 + MAX_OFFSET, o1 + MAX_OFFSET] = math.exp(
                    -((o0 - o1) ** 2) / (2.0 * MAX_OFFSET_TRANS_PROB_VAR)
                )
    m = m / m.sum(axis=0, keepdims=True)  # normalize columns
    with np.errstate(divide="ignore"):
        return np.log(m)


class MarkovOffsetTransitionModel:
    """Duck-types CompiledTransitionModel for the Decoder; state id =
    mono_state * N_OFF + (offset + MAX_OFFSET).  Uses the compiled
    monolingual tables for contexts/probs."""

    explicit_offset = True

    def __init__(self, lm) -> None:
        self.mono = CompiledTransitionModel(lm)
        self.char_indexer = self.mono.char_indexer
        self.n_chars = self.mono.n_chars
        self.space = self.mono.space
        self.hyphen = self.mono.hyphen
        self._fwd_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._nls_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self.LOG_OFF_START = log_offset_start_probs()
        self.LOG_OFF_TRANS = log_offset_trans_probs()

    # ---- packing ----

    def state(self, ctx_id: int, stype: int, offset: int) -> int:
        return (ctx_id * N_TYPES + stype) * N_OFF + (offset + MAX_OFFSET)

    def _mono_of(self, states: np.ndarray) -> np.ndarray:
        return states // N_OFF

    def offset_of_states(self, states: np.ndarray) -> np.ndarray:
        return (states % N_OFF).astype(np.int8) - MAX_OFFSET

    def type_of_states(self, states: np.ndarray) -> np.ndarray:
        return self.mono.type_of_states(self._mono_of(states))

    def glyph_char_of_states(self, states: np.ndarray) -> np.ndarray:
        return self.mono.glyph_char_of_states(self._mono_of(states))

    def lm_char_of_states(self, states: np.ndarray) -> np.ndarray:
        return self.mono.lm_char_of_states(self._mono_of(states))

    def glyph_type_of_states(self, states: np.ndarray) -> np.ndarray:
        return self.mono.glyph_type_of_states(states)

    def lang_of_states(self, states: np.ndarray) -> np.ndarray:
        return self.mono.lang_of_states(states)

    def end_log_probs(self, states: np.ndarray) -> np.ndarray:
        return np.zeros(len(states))

    # ---- transition builders ----

    def _tmpl_all_offsets(self, ctx_ids: np.ndarray, base_logps: np.ndarray):
        """TMPL targets expanded over all offsets with flat start probs."""
        n = len(ctx_ids)
        mono_states = ctx_ids.astype(np.int64) * N_TYPES + TMPL
        states = (
            mono_states[:, None] * N_OFF + np.arange(N_OFF)[None, :]
        ).ravel()
        logps = (base_logps[:, None] + self.LOG_OFF_START[None, :]).ravel()
        return states, logps

    def start_states(self) -> Tuple[np.ndarray, np.ndarray]:
        m = self.mono
        states_list = [np.array([self.state(m.empty_ctx, LMRGN, 0)], dtype=np.int64)]
        logps_list = [np.array([LOG_MRGN])]
        lp = m.log_probs[m.empty_ctx]
        keep = lp > NEG_INF
        s, l = self._tmpl_all_offsets(m.single_ctx[keep], LOG_NOT_MRGN + lp[keep])
        states_list.append(s)
        logps_list.append(l)
        return np.concatenate(states_list), np.concatenate(logps_list)

    def forward_transitions(self, s: int) -> Tuple[np.ndarray, np.ndarray]:
        cached = self._fwd_cache.get(s)
        if cached is not None:
            return cached
        m = self.mono
        mono_s = s // N_OFF
        off = s % N_OFF - MAX_OFFSET
        ctx_id = mono_s // N_TYPES
        stype = mono_s % N_TYPES
        lp = m.log_probs[ctx_id]
        nc = m.next_ctx[ctx_id].astype(np.int64)
        out_s: List[np.ndarray] = []
        out_l: List[np.ndarray] = []
        if stype in (LMRGN, LMRGN_HPHN):
            out_s.append(np.array([self.state(ctx_id, stype, 0)], dtype=np.int64))
            out_l.append(np.array([LOG_MRGN]))
            if stype == LMRGN:
                keep = lp > NEG_INF
            else:
                keep = (~m.is_punc) & (np.arange(m.n_chars) != m.space) & (lp > NEG_INF)
            ss, ll = self._tmpl_all_offsets(nc[keep], LOG_NOT_MRGN + lp[keep])
            out_s.append(ss)
            out_l.append(ll)
        elif stype in (RMRGN, RMRGN_HPHN, RMRGN_HPHN_INIT):
            tgt = RMRGN if stype == RMRGN else RMRGN_HPHN
            out_s.append(np.array([self.state(ctx_id, tgt, 0)], dtype=np.int64))
            out_l.append(np.array([LOG_MRGN]))
        else:  # TMPL
            sp = lp[m.space]
            if sp > NEG_INF:
                out_s.append(
                    np.array([self.state(int(nc[m.space]), RMRGN, 0)], dtype=np.int64)
                )
                out_l.append(
                    np.array([LOG_MRGN + math.log(1.0 - LINE_END_HYPHEN_PROB) + sp])
                )
            trans_row = self.LOG_OFF_TRANS[off + MAX_OFFSET]  # [next]
            lo = max(off - MAX_OFFSET_DIFF, -MAX_OFFSET)
            hi = min(off + MAX_OFFSET_DIFF, MAX_OFFSET)
            offs = np.arange(lo, hi + 1)
            off_lp = trans_row[offs + MAX_OFFSET]
            # RMRGN_HPHN_INIT keeps an (updated) offset (:229-236)
            base = LOG_MRGN + math.log(LINE_END_HYPHEN_PROB)
            init_mono = ctx_id * N_TYPES + RMRGN_HPHN_INIT
            out_s.append(init_mono * N_OFF + (offs + MAX_OFFSET))
            out_l.append(base + off_lp)
            # TMPL -> TMPL with banded offset moves
            keep = lp > NEG_INF
            tm_mono = nc[keep] * N_TYPES + TMPL
            ss = (tm_mono[:, None] * N_OFF + (offs + MAX_OFFSET)[None, :]).ravel()
            ll = ((LOG_NOT_MRGN + lp[keep])[:, None] + off_lp[None, :]).ravel()
            out_s.append(ss)
            out_l.append(ll)
        states = np.concatenate(out_s)
        logps = np.concatenate(out_l)
        live = logps > NEG_INF
        result = (states[live], logps[live])
        self._fwd_cache[s] = result
        return result

    def next_line_start_states(self, s: int) -> Tuple[np.ndarray, np.ndarray]:
        cached = self._nls_cache.get(s)
        if cached is not None:
            return cached
        m = self.mono
        mono_s = s // N_OFF
        ctx_id = mono_s // N_TYPES
        stype = mono_s % N_TYPES
        out_s: List[np.ndarray] = []
        out_l: List[np.ndarray] = []
        if stype == TMPL:
            sws = m.log_probs[ctx_id, m.space]
            if sws > NEG_INF:
                j = int(m.next_ctx[ctx_id, m.space])
                out_s.append(np.array([self.state(j, LMRGN, 0)], dtype=np.int64))
                out_l.append(np.array([LOG_MRGN + sws]))
                lpj = m.log_probs[j]
                keep = lpj > NEG_INF
                ss, ll = self._tmpl_all_offsets(
                    m.next_ctx[j].astype(np.int64)[keep],
                    LOG_NOT_MRGN + sws + lpj[keep],
                )
                out_s.append(ss)
                out_l.append(ll)
        elif stype == RMRGN:
            lp = m.log_probs[ctx_id]
            out_s.append(np.array([self.state(ctx_id, LMRGN, 0)], dtype=np.int64))
            out_l.append(np.array([LOG_MRGN]))
            keep = lp > NEG_INF
            ss, ll = self._tmpl_all_offsets(
                m.next_ctx[ctx_id].astype(np.int64)[keep], LOG_NOT_MRGN + lp[keep]
            )
            out_s.append(ss)
            out_l.append(ll)
        elif stype in (RMRGN_HPHN, RMRGN_HPHN_INIT):
            lp = m.log_probs[ctx_id]
            out_s.append(np.array([self.state(ctx_id, LMRGN_HPHN, 0)], dtype=np.int64))
            out_l.append(np.array([LOG_MRGN]))
            keep = (~m.is_punc) & (np.arange(m.n_chars) != m.space) & (lp > NEG_INF)
            ss, ll = self._tmpl_all_offsets(
                m.next_ctx[ctx_id].astype(np.int64)[keep], LOG_NOT_MRGN + lp[keep]
            )
            out_s.append(ss)
            out_l.append(ll)
        else:  # LMRGN / LMRGN_HPHN
            lp = m.log_probs[ctx_id]
            out_s.append(np.array([self.state(m.empty_ctx, LMRGN, 0)], dtype=np.int64))
            out_l.append(np.array([LOG_MRGN]))
            keep = lp > NEG_INF
            ss, ll = self._tmpl_all_offsets(
                m.single_ctx[keep], LOG_NOT_MRGN + lp[keep]
            )
            out_s.append(ss)
            out_l.append(ll)
        states = np.concatenate(out_s)
        logps = np.concatenate(out_l)
        live = logps > NEG_INF
        result = (states[live], logps[live])
        self._nls_cache[s] = result
        return result
