"""Beam semi-Markov Viterbi decoder — the engine's flagship kernel.

Re-expresses, in vectorized NumPy, the reference decode stack
(tberg12/ocular):
  * emission cache    — model/emission/CachingEmissionModel.java:169-334
                        + model/em/DefaultInnerLoop.java:35-58 (the
                        sliding-window dot products become one sgemm per
                        template width over an im2col of the line),
  * coarse backward   — model/em/BeamingSemiMarkovDP.java:305-331 +
                        DenseBigramTransitionModel.java (max-product
                        bigram backward used as the beam heuristic),
  * beam forward      — BeamingSemiMarkovDP.java:69-218 (semi-Markov,
                        line-to-line continuity via nextLineStartStates),
  * transition model  — transition/CharacterNgramTransitionModel.java
                        (monolingual; LINE_MRGN_PROB=0.5,
                        LINE_END_HYPHEN_PROB=1e-8), compiled to dense
                        per-context tables,
  * decode recovery   — CachingEmissionModel.getExposure/getOffset/
                        getPadWidth:102-163, recovered from cache-build
                        argmaxes instead of recomputation (same argmax).

Beam semantics deviation (documented): the reference's addToBeam
(BeamingSemiMarkovDP.java:220-238) admits a candidate only when it
beats the current worst queue entry, making beam contents depend on
candidate insertion order.  We keep a true top-`beam_size` by
(score + coarse-backward heuristic), with deterministic ties broken by
state id — order-independent, never worse, and identical to exact
Viterbi whenever beam_size >= reachable-state count (which is how the
micro-lattice tests pin correctness).

This module is pure NumPy and is used identically by the in-process
oracle (tests) and inside Spark's ``applyInPandas`` kernels
(pipeline.py) — shared code path is what makes span parity checkable.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from ocular_spark import charset as cs
from ocular_spark.font import (
    EXP_GAINS,
    LINE_HEIGHT,
    MAX_OFFSET,
    N_EXPOSURES,
    BLACK,
    WHITE,
    Font,
)

# TransitionStateType (model/TransitionStateType.java)
TMPL, LMRGN, LMRGN_HPHN, RMRGN, RMRGN_HPHN_INIT, RMRGN_HPHN = range(6)
N_TYPES = 6

LINE_MRGN_PROB = 0.5  # CharacterNgramTransitionModel.java:364
LINE_END_HYPHEN_PROB = 1e-8  # :365
LOG_MRGN = math.log(LINE_MRGN_PROB)
LOG_NOT_MRGN = math.log(1.0 - LINE_MRGN_PROB)

NEG_INF = float("-inf")


class CompiledTransitionModel:
    """Dense tables for the monolingual char-n-gram transition model.

    Contexts are interned to ids once per model broadcast (the
    reference shrinks contexts per transition via dict lookups —
    NgramLanguageModel.shrinkContext:94-103; we precompute
    ``next_ctx[ctx, c]`` for every reachable context).
    """

    def __init__(self, lm) -> None:
        self.lm = lm
        indexer = lm.get_character_indexer()
        self.char_indexer = indexer
        C = indexer.size()
        self.n_chars = C
        self.space = indexer.get_index(cs.SPACE)
        self.hyphen = indexer.get_index(cs.HYPHEN)
        self.is_punc = np.zeros(C, dtype=bool)
        for c_str in indexer.get_objects():
            if cs.is_punctuation_char(c_str):
                self.is_punc[indexer.get_index(c_str)] = True

        # ---- context registry ----
        self._ctx_ids: Dict[Tuple[int, ...], int] = {}
        self._ctxs: List[Tuple[int, ...]] = []
        self.empty_ctx = self._intern(())
        # all single-char contexts (startStates uses unshrunk (c,), :384-391)
        self.single_ctx = np.array([self._intern((c,)) for c in range(C)], dtype=np.int32)
        for ctx in sorted(lm.all_contexts):
            self._intern(tuple(ctx))
        n_ctx = len(self._ctxs)

        # ---- per-context char probs (already ^lmPower) and next ids ----
        log_probs = np.full((n_ctx, C), NEG_INF, dtype=np.float64)
        next_ctx = np.zeros((n_ctx, C), dtype=np.int32)
        ctx_last = np.full(n_ctx, self.space, dtype=np.int32)
        for i, ctx in enumerate(list(self._ctxs)):
            if len(ctx) > 0:
                ctx_last[i] = ctx[-1]
            for c in range(C):
                p = lm.get_char_ngram_prob(ctx, c)
                log_probs[i, c] = math.log(p) if p > 0 else NEG_INF
                nxt = lm.shrink_context(ctx + (c,))
                next_ctx[i, c] = self._intern(nxt)
        if len(self._ctxs) != n_ctx:
            raise AssertionError("shrink_context escaped the registry")
        self.log_probs = log_probs
        self.next_ctx = next_ctx
        self.ctx_last = ctx_last
        self.n_ctx = n_ctx

        self._fwd_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._nls_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def _intern(self, ctx: Tuple[int, ...]) -> int:
        idx = self._ctx_ids.get(ctx)
        if idx is None:
            idx = len(self._ctxs)
            self._ctx_ids[ctx] = idx
            self._ctxs.append(ctx)
        return idx

    # state id packing
    def state(self, ctx_id: int, stype: int) -> int:
        return ctx_id * N_TYPES + stype

    def state_type(self, s: int) -> int:
        return s % N_TYPES

    def state_ctx(self, s: int) -> int:
        return s // N_TYPES

    def glyph_char_of_states(self, states: np.ndarray) -> np.ndarray:
        """Rendered (template) char per state: TMPL -> last context char
        (or space for empty context); margins -> space;
        RMRGN_HPHN_INIT -> hyphen (CharacterNgramTransitionState:159-170,
        338-341).  Served from a dense per-state LUT: this is called
        twice per beam column on the full candidate set, and one take()
        beats the masked 7-op recompute (~6% of decode CPU).  Built
        lazily so unpickled pre-LUT instances (fixture model caches)
        keep working."""
        lut = getattr(self, "_glyph_lut", None)
        if lut is None:
            lut = np.full(self.n_ctx * N_TYPES, self.space, dtype=np.int32)
            base = np.arange(self.n_ctx, dtype=np.int64) * N_TYPES
            lut[base + TMPL] = self.ctx_last
            lut[base + RMRGN_HPHN_INIT] = self.hyphen
            self._glyph_lut = lut
        return lut[states]

    def lm_char_of_states(self, states: np.ndarray) -> np.ndarray:
        # identical to glyph char in the monolingual model
        return self.glyph_char_of_states(states)

    def type_of_states(self, states: np.ndarray) -> np.ndarray:
        return (states % N_TYPES).astype(np.int8)

    def glyph_type_of_states(self, states: np.ndarray) -> np.ndarray:
        # monolingual model always renders the LM char (NORMAL_CHAR=5,
        # GlyphChar.java ordinals; CharacterNgramTransitionState:338-341)
        return np.full(len(states), 5, dtype=np.int8)

    def lang_of_states(self, states: np.ndarray) -> np.ndarray:
        return np.full(len(states), -1, dtype=np.int8)  # getLanguageIndex: -1

    def end_log_probs(self, states: np.ndarray) -> np.ndarray:
        return np.zeros(len(states))  # endLogProb == 0 (:258-260)

    def start_states(self) -> Tuple[np.ndarray, np.ndarray]:
        """startStates (CharacterNgramTransitionModel.java:384-391)."""
        C = self.n_chars
        states = np.empty(C + 1, dtype=np.int64)
        logps = np.empty(C + 1, dtype=np.float64)
        states[0] = self.state(self.empty_ctx, LMRGN)
        logps[0] = LOG_MRGN
        states[1:] = self.single_ctx.astype(np.int64) * N_TYPES + TMPL
        logps[1:] = LOG_NOT_MRGN + self.log_probs[self.empty_ctx]
        keep = logps > NEG_INF
        return states[keep], logps[keep]

    def forward_transitions(self, s: int) -> Tuple[np.ndarray, np.ndarray]:
        """forwardTransitions (:262-332), cached per state."""
        cached = self._fwd_cache.get(s)
        if cached is not None:
            return cached
        i = s // N_TYPES
        stype = s % N_TYPES
        lp = self.log_probs[i]
        nc = self.next_ctx[i].astype(np.int64)
        if stype == TMPL:
            sp = lp[self.space]
            head_states = [self.state(int(nc[self.space]), RMRGN)] if sp > NEG_INF else []
            head_logps = (
                [LOG_MRGN + math.log(1.0 - LINE_END_HYPHEN_PROB) + sp] if sp > NEG_INF else []
            )
            head_states.append(self.state(i, RMRGN_HPHN_INIT))
            head_logps.append(LOG_MRGN + math.log(LINE_END_HYPHEN_PROB))
            keep = lp > NEG_INF
            states = np.concatenate(
                [np.array(head_states, dtype=np.int64), nc[keep] * N_TYPES + TMPL]
            )
            logps = np.concatenate(
                [np.array(head_logps, dtype=np.float64), LOG_NOT_MRGN + lp[keep]]
            )
        elif stype == LMRGN:
            keep = lp > NEG_INF
            states = np.concatenate(
                [[self.state(i, LMRGN)], nc[keep] * N_TYPES + TMPL]
            ).astype(np.int64)
            logps = np.concatenate([[LOG_MRGN], LOG_NOT_MRGN + lp[keep]])
        elif stype == LMRGN_HPHN:
            keep = (~self.is_punc) & (np.arange(self.n_chars) != self.space)
            states = np.concatenate(
                [[self.state(i, LMRGN_HPHN)], nc[keep] * N_TYPES + TMPL]
            ).astype(np.int64)
            logps = np.concatenate([[LOG_MRGN], LOG_NOT_MRGN + lp[keep]])
        elif stype == RMRGN:
            states = np.array([self.state(i, RMRGN)], dtype=np.int64)
            logps = np.array([LOG_MRGN])
        elif stype == RMRGN_HPHN_INIT:
            states = np.array([self.state(i, RMRGN_HPHN)], dtype=np.int64)
            logps = np.array([LOG_MRGN])
        else:  # RMRGN_HPHN
            states = np.array([self.state(i, RMRGN_HPHN)], dtype=np.int64)
            logps = np.array([LOG_MRGN])
        keep2 = logps > NEG_INF
        result = (states[keep2], logps[keep2])
        self._fwd_cache[s] = result
        return result

    def next_line_start_states(self, s: int) -> Tuple[np.ndarray, np.ndarray]:
        """nextLineStartStates (:191-256), cached per state."""
        cached = self._nls_cache.get(s)
        if cached is not None:
            return cached
        i = s // N_TYPES
        stype = s % N_TYPES
        C = self.n_chars
        states_list: List[np.ndarray] = []
        logps_list: List[np.ndarray] = []
        if stype == TMPL:
            sws = self.log_probs[i, self.space]
            if sws > NEG_INF:
                j = int(self.next_ctx[i, self.space])
                lpj = self.log_probs[j]
                ncj = self.next_ctx[j].astype(np.int64)
                states_list.append(np.array([self.state(j, LMRGN)], dtype=np.int64))
                logps_list.append(np.array([LOG_MRGN + sws]))
                keep = lpj > NEG_INF
                states_list.append(ncj[keep] * N_TYPES + TMPL)
                logps_list.append(LOG_NOT_MRGN + sws + lpj[keep])
        elif stype == RMRGN:
            lp = self.log_probs[i]
            nc = self.next_ctx[i].astype(np.int64)
            states_list.append(np.array([self.state(i, LMRGN)], dtype=np.int64))
            logps_list.append(np.array([LOG_MRGN]))
            keep = lp > NEG_INF
            states_list.append(nc[keep] * N_TYPES + TMPL)
            logps_list.append(LOG_NOT_MRGN + lp[keep])
        elif stype in (RMRGN_HPHN, RMRGN_HPHN_INIT):
            lp = self.log_probs[i]
            nc = self.next_ctx[i].astype(np.int64)
            states_list.append(np.array([self.state(i, LMRGN_HPHN)], dtype=np.int64))
            logps_list.append(np.array([LOG_MRGN]))
            keep = (~self.is_punc) & (np.arange(C) != self.space) & (lp > NEG_INF)
            states_list.append(nc[keep] * N_TYPES + TMPL)
            logps_list.append(LOG_NOT_MRGN + lp[keep])
        elif stype in (LMRGN, LMRGN_HPHN):
            lp = self.log_probs[i]
            states_list.append(np.array([self.state(self.empty_ctx, LMRGN)], dtype=np.int64))
            logps_list.append(np.array([LOG_MRGN]))
            keep = lp > NEG_INF
            states_list.append(self.single_ctx[keep].astype(np.int64) * N_TYPES + TMPL)
            logps_list.append(LOG_NOT_MRGN + lp[keep])
        if states_list:
            result = (np.concatenate(states_list), np.concatenate(logps_list))
        else:
            result = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        self._nls_cache[s] = result
        return result


class DenseBigramModel:
    """model/em/DenseBigramTransitionModel.java — including its
    log-domain space-smoothing quirk (:365-366 scales *log* probs)."""

    def __init__(self, lm, n_chars: int, space_idx: int) -> None:
        SPC_TO_SPC_SMOOTH = 1e-2
        C = n_chars
        starts = np.empty(C)
        fwd = np.empty((C, C))
        for c in range(C):
            p = lm.get_char_ngram_prob((), c)
            starts[c] = math.log(p) if p > 0 else NEG_INF
        for prev in range(C):
            for c in range(C):
                p = lm.get_char_ngram_prob((prev,), c)
                fwd[prev, c] = math.log(p) if p > 0 else NEG_INF
        fwd[space_idx, :] *= 1.0 - SPC_TO_SPC_SMOOTH
        fwd[space_idx, space_idx] += SPC_TO_SPC_SMOOTH
        self.starts = starts
        self.forward_trans = fwd  # [prev, c]


class TemplateStack:
    """Font-dependent, observation-independent arrays for the emission
    cache: per template width tw, stacked (flattened) log-prob tensors
    over (char, exposure, offset) — CachingEmissionModel.java:239-275.
    Built once per broadcast font."""

    def __init__(self, font: Font, char_strs: Sequence[str], pad_min: int, pad_max: int):
        self.pad_min = pad_min
        self.pad_max = pad_max
        C = len(char_strs)
        self.n_chars = C
        templates = [font.get(s) for s in char_strs]
        self.templates = templates
        self.space_idx = char_strs.index(cs.SPACE)

        self.tmpl_allowed_widths = [t.allowed_widths() for t in templates]
        self.tmpl_min_w = np.array([t.min_width for t in templates], dtype=np.int32)
        self.tmpl_max_w = np.array([t.max_width for t in templates], dtype=np.int32)
        self.width_log_probs = [
            {w: t.width_log_prob(w) for w in self.tmpl_allowed_widths[c]}
            for c, t in enumerate(templates)
        ]

        # combined (template + pad) allowed widths per char
        self.max_w = int((self.tmpl_max_w + pad_max).max())
        allowed = np.zeros((C, self.max_w + 1), dtype=bool)
        for c in range(C):
            for tw in self.tmpl_allowed_widths[c]:
                allowed[c, tw + pad_min : tw + pad_max + 1] = True
        self.allowed_w_mask = allowed
        self.allowed_w_list = [np.flatnonzero(allowed[c]).astype(np.int32) for c in range(C)]

        self.n_offsets = 2 * MAX_OFFSET + 1
        self.pad_log_prob = math.log(1.0 / (pad_max - pad_min + 1))

        # per distinct NON-SPACE template width: white/black stacks +
        # ordered char list.  The space template's columns are constant
        # (EXP_SPC_BLACK_PROBS, CharacterTemplate.java:175-181) so its
        # scores are prefix-sum differences — handled analytically in
        # build_emission_cache, no GEMM rows needed.
        self.widths = sorted(
            {
                tw
                for c in range(C)
                if c != self.space_idx
                for tw in self.tmpl_allowed_widths[c]
            }
        )
        self.stacks: Dict[int, Tuple[np.ndarray, np.ndarray, List[int], np.ndarray]] = {}
        for tw in self.widths:
            whites: List[np.ndarray] = []
            blacks: List[np.ndarray] = []
            chars_tw: List[int] = []
            for c in range(C):
                if c == self.space_idx or tw not in self.width_log_probs[c]:
                    continue
                chars_tw.append(c)
                t = templates[c]
                for e in range(N_EXPOSURES):
                    for off in range(-MAX_OFFSET, MAX_OFFSET + 1):
                        whites.append(t.log_white_probs(e, off, tw).ravel())
                        blacks.append(t.log_black_probs(e, off, tw).ravel())
            wlp = np.array(
                [self.width_log_probs[c][tw] for c in chars_tw], dtype=np.float32
            )
            self.stacks[tw] = (
                np.ascontiguousarray(np.stack(whites).T, dtype=np.float32),  # (tw*H, N)
                np.ascontiguousarray(np.stack(blacks).T, dtype=np.float32),
                chars_tw,
                wlp,
            )

        # space char: combined width w = tw + pw decomposes arbitrarily;
        # every split has the same whitespace-column sum, so the max over
        # (tw, pw) is width_log_prob(tw*) + pad_log_prob with tw* = the
        # populate loop's first winner (smallest allowed tw for that w)
        sp_t = templates[self.space_idx]
        self.space_allowed_tw = set(sp_t.allowed_widths())

        # whitespace column log-probs per exposure: space template col 0
        sp = templates[self.space_idx]
        self.ws_white = np.stack(
            [sp.log_white_probs(e, 0, 1)[0] for e in range(N_EXPOSURES)]
        )  # (E, H)
        self.ws_black = np.stack(
            [sp.log_black_probs(e, 0, 1)[0] for e in range(N_EXPOSURES)]
        )


class EmissionCache(NamedTuple):
    """Max emission scores only.  The (exposure, offset, pad) argmaxes
    are NOT materialized: the old (T, C, max_w+1) int8 argmax tables
    cost an argmax + take_along_axis + masked scatter per (tw, pw)
    pair for every line, yet the decoder only ever reads them for the
    ~|path| entries of the final Viterbi trace.  They are recovered on
    demand by recover_emission_args (same scores, same tie-breaks)
    from the retained observation arrays."""

    log_probs: np.ndarray  # (T, C, max_w+1) float32, -inf where not allowed
    white_obs: np.ndarray  # (T, H) float32 — for trace-time arg recovery
    black_obs: np.ndarray  # (T, H) float32
    ws_cum: np.ndarray  # (T+1, E) float32 whitespace prefix sums
    T: int


class ExplicitOffsetEmissionCache(NamedTuple):
    """model/emission/CachingEmissionModelExplicitOffset.java: the
    offset axis stays explicit (max over exposures only); the decoder
    looks scores up at each state's own offset.  log_probs (the
    offset-max) is retained for the coarse backward heuristic.
    (exposure, pad) argmaxes recovered on demand like EmissionCache."""

    log_probs4: np.ndarray  # (T, C, max_w+1, n_off) float32
    log_probs: np.ndarray  # (T, C, max_w+1) = max over offsets (betas)
    white_obs: np.ndarray  # (T, H) float32
    black_obs: np.ndarray  # (T, H) float32
    ws_cum: np.ndarray  # (T+1, E) float32
    T: int


def build_emission_cache(obs: np.ndarray, stack: TemplateStack) -> EmissionCache:
    """CachingEmissionModel.rebuildCache + populate (:169-334) for one line.

    obs: (T, LINE_HEIGHT) uint8 in {WHITE, BLACK, OBSCURED}.
    The sliding-window dot products run as one float32 GEMM per
    template width (exactly DefaultInnerLoop's math, batched)."""
    T = obs.shape[0]
    C = stack.n_chars
    H = LINE_HEIGHT
    white_obs = (obs == WHITE).astype(np.float32)  # (T, H)
    black_obs = (obs == BLACK).astype(np.float32)

    max_w = stack.max_w
    cache = np.full((T, C, max_w + 1), NEG_INF, dtype=np.float32)

    # whitespace column log-probs per (t, e), then prefix sums
    ws_col = white_obs @ stack.ws_white.T + black_obs @ stack.ws_black.T  # (T, E)
    ws_cum = np.vstack([np.zeros((1, N_EXPOSURES), np.float32), np.cumsum(ws_col, axis=0)])

    n_off = stack.n_offsets
    pad_min, pad_max = stack.pad_min, stack.pad_max

    # ---- space char: analytic (no GEMM; columns are constant) ----
    sp = stack.space_idx
    sp_wlp = stack.width_log_probs[sp]
    for w in range(1 + pad_min, stack.max_w + 1):
        # first (tw, pw) winner in populate order: smallest allowed tw
        best_tw = None
        for tw in range(max(1, w - pad_max), w - pad_min + 1):
            if tw in stack.space_allowed_tw:
                best_tw = tw
                break
        if best_tw is None:
            continue
        lim = min(T - w + 1, T - best_tw - pad_min + 1)
        if lim <= 0:
            continue
        t_idx = np.arange(lim)
        # whole-span whitespace sum is split-independent
        total = (ws_cum[t_idx + w] - ws_cum[t_idx]) + np.float32(
            sp_wlp[best_tw] + stack.pad_log_prob
        )  # (lim, E)
        cache[:lim, sp, w] = total.max(axis=1)

    # ---- all other chars: GEMM per template width, vectorized populate ----
    for tw in stack.widths:
        if tw + pad_min > T:
            continue
        whiteT, blackT, chars_tw, wlp = stack.stacks[tw]  # (tw*H, N)
        nT = T - tw + 1
        # NOTE: the reshape of the sliding window is a *view* with
        # overlapping rows — BLAS needs contiguous input or it falls
        # back to a ~100x slower non-GEMM path
        w_win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(white_obs, (tw, H))[:, 0].reshape(
                nT, tw * H
            )
        )
        b_win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(black_obs, (tw, H))[:, 0].reshape(
                nT, tw * H
            )
        )
        scores = w_win @ whiteT + b_win @ blackT  # (nT, N)
        nc = len(chars_tw)
        sc = scores.reshape(nT, nc, N_EXPOSURES, n_off)
        tmpl_lp = sc.max(axis=3) + wlp[None, :, None]  # (nT, nc, E)
        chars_arr = np.asarray(chars_tw)
        # all pad widths in ONE broadcast block: val_all[t, c, pw'] =
        # max_e(tmpl_lp[t,c,e] + padws[t,pw',e]); per-pw writes remain
        # (each pw targets a different combined width w)
        pws = np.arange(pad_min, pad_max + 1)
        lim0 = min(T - tw - pad_min + 1, nT)
        if lim0 <= 0:
            continue
        t_idx0 = np.arange(lim0)
        # padws[t, k, e] = ws span after the template for pad pws[k]
        ends = np.minimum(t_idx0[:, None] + tw + pws[None, :], T)
        padws = ws_cum[ends] - ws_cum[t_idx0 + tw][:, None, :] + np.float32(
            stack.pad_log_prob
        )  # (lim0, n_pads, E)
        val_all = (tmpl_lp[:lim0, :, None, :] + padws[:, None, :, :]).max(axis=3)
        for k, pw in enumerate(pws):
            w = tw + int(pw)
            lim = min(T - w + 1, lim0)
            if lim <= 0:
                continue
            tgt = cache[:lim, chars_arr, w]
            np.maximum(tgt, val_all[:lim, :, k], out=tgt)
            cache[:lim, chars_arr, w] = tgt
    return EmissionCache(cache, white_obs, black_obs, ws_cum, T)


def build_emission_cache_explicit(obs: np.ndarray, stack: TemplateStack):
    """CachingEmissionModelExplicitOffset.rebuildCache equivalent:
    like build_emission_cache but the offset axis stays explicit
    (max over exposures and pad splits only)."""
    T = obs.shape[0]
    C = stack.n_chars
    H = LINE_HEIGHT
    white_obs = (obs == WHITE).astype(np.float32)
    black_obs = (obs == BLACK).astype(np.float32)

    max_w = stack.max_w
    n_off = stack.n_offsets
    cache4 = np.full((T, C, max_w + 1, n_off), NEG_INF, dtype=np.float32)

    ws_col = white_obs @ stack.ws_white.T + black_obs @ stack.ws_black.T
    ws_cum = np.vstack([np.zeros((1, N_EXPOSURES), np.float32), np.cumsum(ws_col, axis=0)])
    pad_min, pad_max = stack.pad_min, stack.pad_max

    # space: offset-independent (constant columns) — same value at all offsets
    sp = stack.space_idx
    sp_wlp = stack.width_log_probs[sp]
    for w in range(1 + pad_min, max_w + 1):
        best_tw = None
        for tw in range(max(1, w - pad_max), w - pad_min + 1):
            if tw in stack.space_allowed_tw:
                best_tw = tw
                break
        if best_tw is None:
            continue
        lim = min(T - w + 1, T - best_tw - pad_min + 1)
        if lim <= 0:
            continue
        t_idx = np.arange(lim)
        total = (ws_cum[t_idx + w] - ws_cum[t_idx]) + np.float32(
            sp_wlp[best_tw] + stack.pad_log_prob
        )
        cache4[:lim, sp, w, :] = total.max(axis=1)[:, None]

    for tw in stack.widths:
        if tw + pad_min > T:
            continue
        whiteT, blackT, chars_tw, wlp = stack.stacks[tw]
        nT = T - tw + 1
        w_win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(white_obs, (tw, H))[:, 0].reshape(
                nT, tw * H
            )
        )
        b_win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(black_obs, (tw, H))[:, 0].reshape(
                nT, tw * H
            )
        )
        scores = w_win @ whiteT + b_win @ blackT
        nc = len(chars_tw)
        sc = scores.reshape(nT, nc, N_EXPOSURES, n_off)
        tmpl_lp = sc + wlp[None, :, None, None]  # (nT, nc, E, n_off)
        chars_arr = np.asarray(chars_tw)
        # all pad widths in ONE broadcast block (same shape as the
        # non-offset builder); per-pw writes target disjoint widths
        pws = np.arange(pad_min, pad_max + 1)
        lim0 = min(T - tw - pad_min + 1, nT)
        if lim0 <= 0:
            continue
        t_idx0 = np.arange(lim0)
        ends = np.minimum(t_idx0[:, None] + tw + pws[None, :], T)
        padws = ws_cum[ends] - ws_cum[t_idx0 + tw][:, None, :] + np.float32(
            stack.pad_log_prob
        )  # (lim0, n_pads, E)
        # val_all[t, c, k, off] = max_e(tmpl + padws)
        val_all = (
            tmpl_lp[:lim0, :, None, :, :] + padws[:, None, :, :, None]
        ).max(axis=3)  # (lim0, nc, n_pads, n_off)
        for k, pw in enumerate(pws):
            w = tw + int(pw)
            lim = min(T - w + 1, lim0)
            if lim <= 0:
                continue
            tgt = cache4[:lim, chars_arr, w, :]
            np.maximum(tgt, val_all[:lim, :, k, :], out=tgt)
            cache4[:lim, chars_arr, w, :] = tgt
    return ExplicitOffsetEmissionCache(
        cache4, cache4.max(axis=3), white_obs, black_obs, ws_cum, T
    )


def _space_args(stack: TemplateStack, w: int, total_e: np.ndarray):
    """Space-char argmax recovery: first allowed template width
    ascending; offset tie goes to the first (-MAX_OFFSET)."""
    best_tw = None
    for tw in range(max(1, w - stack.pad_max), w - stack.pad_min + 1):
        if tw in stack.space_allowed_tw:
            best_tw = tw
            break
    return int(total_e.argmax()), -MAX_OFFSET, w - best_tw


def recover_emission_args(
    cache,
    stack: TemplateStack,
    start_cols: np.ndarray,
    glyphs: np.ndarray,
    widths: np.ndarray,
    off_idx: Optional[np.ndarray] = None,
):
    """Trace-time recomputation of the (exposure, offset, pad)
    argmaxes for decoded path entries — the retired per-(t,c,w) int8
    argmax tables, restricted to the ~|path| entries actually read.
    Replicates the populate loop's exact semantics and float32
    association order so ties break identically: template widths tried
    ascending with strictly-greater replacement (first tw wins ties);
    per-exposure offset argmax on the RAW GEMM scores; exposure argmax
    after the pad whitespace term.  When ``off_idx`` is given
    (explicit-offset variant), the offset is fixed per entry and only
    (exposure, pad) are recovered.

    BITWISE parity requires recomputing the raw scores with the SAME
    sgemm shape the cache build used — a full-width (rows, tw*H) @
    (tw*H, N_all) product.  A per-entry skinny GEMV over one char's
    column slice differs in the last ulp for ~2% of entries (flat
    windows score identically at several offsets in exact arithmetic,
    and kernel-dependent rounding breaks those ties differently) —
    caught by tests/test_emission_recovery.py against an independent
    naive reference."""
    E = N_EXPOSURES
    n_off = stack.n_offsets
    n = len(glyphs)
    exposures = np.zeros(n, dtype=np.int8)
    offsets = np.zeros(n, dtype=np.int8)
    pads = np.zeros(n, dtype=np.int8)
    sp = stack.space_idx
    white_obs, black_obs, ws_cum = cache.white_obs, cache.black_obs, cache.ws_cum
    pad_lp32 = np.float32(stack.pad_log_prob)

    # one full-N GEMM per template width over all entries needing it
    # (grouped): sc_by_tw[tw][row] = (nc, E, n_off) raw scores at that
    # entry's start column, bit-identical to the cache build's rows
    need: Dict[int, List[int]] = {}
    for i in range(n):
        c = int(glyphs[i])
        if c == sp:
            continue
        w = int(widths[i])
        for tw in stack.widths:
            pw = w - tw
            if stack.pad_min <= pw <= stack.pad_max and tw in stack.stacks:
                need.setdefault(tw, []).append(i)
    H = LINE_HEIGHT
    sc_by_tw: Dict[int, Tuple[np.ndarray, Dict[int, int]]] = {}
    for tw, idxs in need.items():
        whiteT, blackT, chars_tw, wlp = stack.stacks[tw]
        t0s = sorted({int(start_cols[i]) for i in idxs})
        w_rows = np.stack([white_obs[t0 : t0 + tw].reshape(-1) for t0 in t0s])
        b_rows = np.stack([black_obs[t0 : t0 + tw].reshape(-1) for t0 in t0s])
        scores = w_rows @ whiteT + b_rows @ blackT  # (rows, N_all)
        sc_by_tw[tw] = (
            scores.reshape(len(t0s), len(chars_tw), E, n_off),
            {t0: r for r, t0 in enumerate(t0s)},
        )

    for i in range(n):
        c = int(glyphs[i])
        w = int(widths[i])
        t0 = int(start_cols[i])
        if c == sp:
            total_e = ws_cum[t0 + w] - ws_cum[t0]  # + const: argmax unaffected
            e, off, pad = _space_args(stack, w, total_e)
            exposures[i], pads[i] = e, pad
            offsets[i] = off if off_idx is None else int(off_idx[i]) - MAX_OFFSET
            continue
        best_val = None
        for tw in stack.widths:  # ascending, as the populate loop ran
            pw = w - tw
            if pw < stack.pad_min or pw > stack.pad_max:
                continue
            stk = stack.stacks.get(tw)
            if stk is None:
                continue
            whiteT, blackT, chars_tw, wlp = stk
            try:
                pos = chars_tw.index(c)
            except ValueError:
                continue
            sc_all, row_of = sc_by_tw[tw]
            sc = sc_all[row_of[t0], pos]  # (E, n_off)
            pad_term = (ws_cum[t0 + w] - ws_cum[t0 + tw]) + pad_lp32  # (E,)
            if off_idx is None:
                o_arg = sc.argmax(axis=1)  # per-e offset argmax on raw scores
                tmpl = sc[np.arange(E), o_arg] + wlp[pos]
                total_e = tmpl + pad_term
            else:
                o_col = int(off_idx[i])
                tmpl = sc[:, o_col] + wlp[pos]
                total_e = tmpl + pad_term
            e = int(total_e.argmax())
            val = total_e[e]
            if best_val is None or val > best_val:  # strict: first tw wins
                best_val = val
                exposures[i] = e
                offsets[i] = (
                    int(o_arg[e]) - MAX_OFFSET
                    if off_idx is None
                    else o_col - MAX_OFFSET
                )
                pads[i] = pw
    return exposures, offsets, pads


def coarse_backward(cache: EmissionCache, stack: TemplateStack, bigram: DenseBigramModel):
    """doDenseCoarseBackwardPassLogSpace (BeamingSemiMarkovDP.java:305-331)."""
    T = cache.T
    C = stack.n_chars
    betas = np.full((T + 1, C), NEG_INF, dtype=np.float64)
    betas[T] = 0.0  # endLogProb == 0
    fwd = bigram.forward_trans  # [prev, c]
    lp = cache.log_probs
    for t in range(T - 1, -1, -1):
        # beta_without_trans[c] = max over allowed w of emit(t,c,w) + betas[t+w, c]
        wmax = min(stack.max_w, T - t)
        if wmax < 1:
            continue
        emit = lp[t, :, 1 : wmax + 1].astype(np.float64)  # (C, wmax)
        future = betas[t + 1 : t + wmax + 1, :].T  # (C, wmax)
        bwt = (emit + future).max(axis=1)  # (C,)
        # betas[t][c] = max over nextC of fwd[c, nextC] + bwt[nextC]
        betas[t] = (fwd + bwt[None, :]).max(axis=1)
    return betas


# finalize prefilter width: exact top-M-by-priority cut applied before
# the per-column dedup sort (see decode_document); must be >> beam_size
_PREFILTER_M = 64


def _dedup_by_state(states, scores, prev_ts, prev_states):
    """Per-column candidate dedup: one entry per state, keeping the
    max score (stable: lowest state id first, first-seen on score
    ties).  Output is sorted ascending by state id — the beam prune
    below relies on that ordering for its exact tie semantics."""
    order = np.lexsort((-scores, states))
    states_o = states[order]
    first = np.ones(len(states_o), dtype=bool)
    first[1:] = states_o[1:] != states_o[:-1]
    sel = order[first]
    return states[sel], scores[sel], prev_ts[sel], prev_states[sel]


class LineDecode(NamedTuple):
    states: np.ndarray  # int64 state ids, in order
    widths: np.ndarray  # int32 total (char+pad) widths
    start_cols: np.ndarray  # int32
    glyph_chars: np.ndarray  # int32
    lm_chars: np.ndarray  # int32
    types: np.ndarray  # int8
    exposures: np.ndarray  # int8
    offsets: np.ndarray  # int8
    pad_widths: np.ndarray  # int8
    glyph_types: np.ndarray  # int8 (GlyphChar.GlyphType ordinal)
    langs: np.ndarray  # int8 (language index, -1 = none)


def _expand_by_widths(
    glyphs: np.ndarray, allowed_w_list: List[np.ndarray]
) -> Tuple[np.ndarray, np.ndarray]:
    """For candidate glyph chars, produce (candidate_index, width) pairs."""
    counts = np.array([len(allowed_w_list[g]) for g in glyphs])
    idx = np.repeat(np.arange(len(glyphs)), counts)
    w = (
        np.concatenate([allowed_w_list[g] for g in glyphs])
        if len(glyphs)
        else np.empty(0, dtype=np.int32)
    )
    return idx, w


class Decoder:
    """Glue: per-document decode with line continuity.

    The unit of work is a document (sequential loop over its lines —
    numDecodeThreads=1 semantics, FonttrainTranscribeShared.java:122-123);
    Spark parallelism is across documents."""

    def __init__(
        self,
        font: Font,
        lm,
        pad_min: int = 1,
        pad_max: int = 5,
        beam_size: int = 10,
        transition_model=None,
    ) -> None:
        """``transition_model`` defaults to the monolingual
        CompiledTransitionModel; pass a CodeSwitchTransitionModel
        (cstransition.py) for multilingual / glyph-substitution decoding
        (DecoderEM.constructTransitionModel :134-162 chooses likewise)."""
        self.tm = transition_model if transition_model is not None else CompiledTransitionModel(lm)
        char_strs = self.tm.char_indexer.get_objects()
        self.stack = TemplateStack(font, char_strs, pad_min, pad_max)
        self.bigram = DenseBigramModel(lm, self.tm.n_chars, self.tm.space)
        self.beam_size = beam_size
        # Markov-offset variant: states carry explicit vertical offsets
        # and emissions are looked up at the state's own offset
        self.explicit_offset = bool(getattr(self.tm, "explicit_offset", False))
        # per-state caches: transition lists fully crossed with the
        # target glyph's allowed widths (built lazily, reused across
        # every column/line/document this decoder ever sees).  Stored
        # as ONE set of flat CSR buffers (state -> slice) so a whole
        # beam's expansions gather in O(1) numpy calls instead of a
        # per-state Python loop + concatenate (the column loop is
        # Python-overhead-bound; see _gather_expansions)
        self._full_exp: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = {}
        self._self_exp: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._exp_slot: Dict[int, int] = {}  # state -> slot
        cap = 1024
        self._exp_start = np.zeros(64, dtype=np.int64)
        self._exp_len = np.zeros(64, dtype=np.int64)
        self._exp_n_slots = 0
        self._flat_used = 0
        self._flat_ns = np.empty(cap, dtype=np.int64)
        self._flat_glyph = np.empty(cap, dtype=np.int32)
        # widths fit in one byte for any realistic template stack --
        # and a 1-byte key flips numpy's stable argsort to its radix
        # path, ~5x faster than int32 timsort in _scatter's
        # width-bucket grouping (values are identical either way)
        self._w_dtype = np.uint8 if self.stack.max_w < 256 else np.uint16
        self._flat_w = np.empty(cap, dtype=self._w_dtype)
        self._flat_lp = np.empty(cap, dtype=np.float64)
        self._flat_off = np.empty(cap, dtype=np.int32)
        # precomputed flat emission index per candidate: one int add at
        # scatter time replaces a 3-/4-axis fancy gather per column
        self._flat_emit = np.empty(cap, dtype=np.int64)
        self._iota = np.arange(cap, dtype=np.int64)  # 0..n ramp scratch
        W = self.stack.max_w + 1
        C = self.stack.n_chars
        self._emit_stride = (
            C * W * self.stack.n_offsets if self.explicit_offset else C * W
        )

    def _flat_append(self, ns, glyphs, widths, lps, offs) -> Tuple[int, int]:
        n = len(ns)
        need = self._flat_used + n
        if need > len(self._flat_ns):
            new_cap = max(need, 2 * len(self._flat_ns))
            for name in ("_flat_ns", "_flat_glyph", "_flat_w", "_flat_lp", "_flat_off", "_flat_emit"):
                old = getattr(self, name)
                grown = np.empty(new_cap, dtype=old.dtype)
                grown[: self._flat_used] = old[: self._flat_used]
                setattr(self, name, grown)
        a = self._flat_used
        self._flat_ns[a:need] = ns
        self._flat_glyph[a:need] = glyphs
        self._flat_w[a:need] = widths
        self._flat_lp[a:need] = lps
        W = self.stack.max_w + 1
        emit = glyphs.astype(np.int64) * W + widths
        if offs is not None:
            self._flat_off[a:need] = offs
            emit = emit * self.stack.n_offsets + offs
        self._flat_emit[a:need] = emit
        self._flat_used = need
        return a, n

    def _ensure_slot(self, s: int) -> int:
        slot = self._exp_slot.get(s)
        if slot is None:
            ns, lps = self.tm.forward_transitions(s)
            glyphs = self.tm.glyph_char_of_states(ns)
            idx, widths = _expand_by_widths(glyphs, self.stack.allowed_w_list)
            if self.explicit_offset:
                offs = (
                    self.tm.offset_of_states(ns).astype(np.int32) + MAX_OFFSET
                )[idx]
            else:
                offs = None
            start, n = self._flat_append(ns[idx], glyphs[idx], widths, lps[idx], offs)
            slot = self._exp_n_slots
            if slot >= len(self._exp_start):
                self._exp_start = np.concatenate(
                    [self._exp_start, np.zeros(len(self._exp_start), dtype=np.int64)]
                )
                self._exp_len = np.concatenate(
                    [self._exp_len, np.zeros(len(self._exp_len), dtype=np.int64)]
                )
            self._exp_start[slot] = start
            self._exp_len[slot] = n
            self._exp_n_slots += 1
            self._exp_slot[s] = slot
        return slot

    def _gather_expansions(self, states_u: np.ndarray):
        """Batched CSR gather of every beam state's pre-expanded
        transitions: returns flat-buffer row indices plus per-state
        expansion lengths (for np.repeat of scores/prev)."""
        slot_map = self._exp_slot
        slots = np.array(
            [
                slot_map[s] if s in slot_map else self._ensure_slot(s)
                for s in map(int, states_u)
            ],
            dtype=np.int64,
        )
        starts = self._exp_start[slots]
        lens = self._exp_len[slots]
        n = int(lens.sum())
        cum = np.cumsum(lens)
        # one fused repeat of (start - block_offset) instead of two
        # (r4): idx[i] = i + repeat(starts - cum + lens)[i], and the
        # 0..n ramp comes from a grown-once scratch buffer rather
        # than a fresh arange every column
        if n > len(self._iota):
            self._iota = np.arange(max(n, 2 * len(self._iota)), dtype=np.int64)
        idx = self._iota[:n] + np.repeat(starts - cum + lens, lens)
        return idx, lens

    def _full_expansion(self, s: int):
        """(next_states, glyphs, widths, trans_logps[, offset_idx]) for
        all forward transitions of state s, pre-expanded over widths."""
        cached = self._full_exp.get(s)
        if cached is None:
            ns, lps = self.tm.forward_transitions(s)
            glyphs = self.tm.glyph_char_of_states(ns)
            idx, widths = _expand_by_widths(glyphs, self.stack.allowed_w_list)
            if self.explicit_offset:
                offs = (
                    self.tm.offset_of_states(ns).astype(np.int32) + MAX_OFFSET
                )
                cached = (ns[idx], glyphs[idx], widths, lps[idx], offs[idx])
            else:
                cached = (ns[idx], glyphs[idx], widths, lps[idx], None)
            self._full_exp[s] = cached
        return cached

    def _self_expansion(self, s: int):
        """(glyph, widths, offset_idx) for emitting state s itself."""
        cached = self._self_exp.get(s)
        if cached is None:
            arr = np.array([s], dtype=np.int64)
            g = int(self.tm.glyph_char_of_states(arr)[0])
            off = (
                int(self.tm.offset_of_states(arr)[0]) + MAX_OFFSET
                if self.explicit_offset
                else 0
            )
            cached = (g, self.stack.allowed_w_list[g], off)
            self._self_exp[s] = cached
        return cached

    def decode_document(self, lines: Sequence[np.ndarray]) -> Tuple[List[LineDecode], float]:
        """lines: list of (T, LINE_HEIGHT) uint8 arrays. Returns per-line
        decodes and the document joint log-prob (final-line cumulative
        best score, matching decodeSingleThread :76-95)."""
        tm = self.tm
        beam_size = self.beam_size
        start_states: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
        all_columns: List[List[dict]] = []
        caches: List[EmissionCache] = []
        final_log_prob = NEG_INF

        for line_obs in lines:
            if self.explicit_offset:
                cache = build_emission_cache_explicit(line_obs, self.stack)
            else:
                cache = build_emission_cache(line_obs, self.stack)
            caches.append(cache)
            betas = coarse_backward(cache, self.stack, self.bigram)
            T = cache.T

            # per-column candidate buffers
            buffers: List[List[Tuple[np.ndarray, ...]]] = [[] for _ in range(T + 1)]
            columns: List[dict] = [dict() for _ in range(T + 1)]

            lp_flat = (
                cache.log_probs4.reshape(-1)
                if self.explicit_offset
                else cache.log_probs.reshape(-1)
            )
            if start_states is None or len(start_states[0]) == 0:
                s0, lp0 = tm.start_states()
                prev0 = np.full(len(s0), -1, dtype=np.int64)
                start_states = (s0, lp0, prev0)
            s0, sc0, prev0 = start_states
            self._expand_start(s0, sc0, prev0, buffers, lp_flat)

            for t in range(1, T + 1):
                if not buffers[t]:
                    continue
                entries = buffers[t]
                states = np.concatenate([b[0] for b in entries])
                scores = np.concatenate([b[1] for b in entries])
                prev_ts = np.repeat(
                    np.array([b[2] for b in entries], dtype=np.int32),
                    np.array([len(b[0]) for b in entries]),
                )
                prev_states = np.concatenate([b[3] for b in entries])
                buffers[t] = []

                # EXACT O(n) prefilter before the O(n log n) dedup sort:
                # keep only candidates whose beam priority (score +
                # coarse-backward bound) ties-or-beats the M-th largest.
                # Instances of one state share its betas addend, so each
                # surviving state keeps its max-score instance, and the
                # >=kth mask (not argpartition's arbitrary tie subset)
                # plus flatnonzero preserves original order — dedup/prune
                # tie-breaking below is bit-identical.  If duplicates
                # collapse the kept set under beam_size distinct states
                # the prefilter could have dropped a needed state, so
                # fall back to the full arrays.
                n_cand = len(states)
                full = None
                if n_cand > 4 * _PREFILTER_M:
                    glyphs_all = tm.glyph_char_of_states(states)
                    prio_all = scores + betas[t, glyphs_all]
                    kth = np.partition(prio_all, n_cand - _PREFILTER_M)[
                        n_cand - _PREFILTER_M
                    ]
                    keep_idx = np.flatnonzero(prio_all >= kth)
                    if len(keep_idx) < n_cand:
                        # dedup below doubles as the distinct-state
                        # count the acceptance test needs, so run it
                        # on the kept set and fall back to the full
                        # arrays only if too few distinct states
                        # survive (replaces an unconditional
                        # np.unique sort per prefiltered column)
                        full = (states, scores, prev_ts, prev_states)
                        states, scores = states[keep_idx], scores[keep_idx]
                        prev_ts, prev_states = (
                            prev_ts[keep_idx], prev_states[keep_idx]
                        )

                # dedup by state, keep max score (stable: lowest state id first)
                states_u, scores_u, prev_t_u, prev_s_u = _dedup_by_state(
                    states, scores, prev_ts, prev_states
                )
                if full is not None and len(states_u) < beam_size:
                    states_u, scores_u, prev_t_u, prev_s_u = _dedup_by_state(
                        *full
                    )

                # beam prune by score + coarse-backward heuristic.
                # O(n) exact top-k replacing lexsort((states_u,-prio))
                # [:k] + argsort (r4 fusion): states_u is sorted
                # ascending & unique (dedup emits it that way), so
                # "all strictly above the k-th priority, plus the
                # first `need` ties in index order" is EXACTLY the
                # lexsort set (ties at the boundary go to smallest
                # state), and a boolean mask keeps state order — the
                # re-sort for searchsorted falls away too.
                if len(states_u) > beam_size:
                    glyphs_u = tm.glyph_char_of_states(states_u)
                    prio = scores_u + betas[t, glyphs_u]
                    kth = np.partition(prio, len(prio) - beam_size)[
                        len(prio) - beam_size
                    ]
                    greater = prio > kth
                    need = beam_size - int(np.count_nonzero(greater))
                    tie = prio == kth
                    keep_mask = greater | (tie & (np.cumsum(tie) <= need))
                    states_u, scores_u = states_u[keep_mask], scores_u[keep_mask]
                    prev_t_u, prev_s_u = prev_t_u[keep_mask], prev_s_u[keep_mask]

                columns[t] = {
                    "states": states_u,
                    "scores": scores_u,
                    "prev_t": prev_t_u,
                    "prev_s": prev_s_u,
                }
                if t < T:
                    self._expand_beam(t, states_u, scores_u, buffers, lp_flat)

            all_columns.append(columns)
            final_col = columns[T]
            if not final_col:
                raise EmptyBeamError(
                    "No possible final states found for this line. "
                    "Consider increasing beam_size."
                )
            end_scores = final_col["scores"] + tm.end_log_probs(final_col["states"])
            if not np.isfinite(end_scores).any():
                raise EmptyBeamError(
                    "No final-state possibilities with non-zero probabilities."
                )
            final_log_prob = float(end_scores.max())

            # nextLineStartStates with accumulated scores
            next_start: Dict[int, Tuple[float, int]] = {}
            for k, s in enumerate(final_col["states"]):
                if end_scores[k] == NEG_INF:
                    continue
                ns, lps = tm.next_line_start_states(int(s))
                sc = end_scores[k] + lps
                for j in range(len(ns)):
                    if sc[j] == NEG_INF:
                        continue
                    key = int(ns[j])
                    old = next_start.get(key)
                    if old is None or sc[j] > old[0]:
                        next_start[key] = (float(sc[j]), int(s))
            keys = np.array(sorted(next_start), dtype=np.int64)
            start_states = (
                keys,
                np.array([next_start[int(k)][0] for k in keys]),
                np.array([next_start[int(k)][1] for k in keys], dtype=np.int64),
            )

        # ---- backpointer trace, last line to first (:251-303) ----
        decodes: List[LineDecode] = []
        final_state: Optional[int] = None
        for d in range(len(lines) - 1, -1, -1):
            columns = all_columns[d]
            cache = caches[d]
            T = cache.T
            col = columns[T]
            if final_state is None:
                final_scores = col["scores"] + tm.end_log_probs(col["states"])
                k = int(np.argmax(final_scores))
                cur_s = int(col["states"][k])
            else:
                cur_s = final_state
            cur_t = T
            rev_states: List[int] = []
            rev_widths: List[int] = []
            while True:
                c_idx = int(np.searchsorted(columns[cur_t]["states"], cur_s))
                rev_states.append(cur_s)
                prev_t = int(columns[cur_t]["prev_t"][c_idx])
                prev_s = int(columns[cur_t]["prev_s"][c_idx])
                rev_widths.append(cur_t - prev_t)
                cur_t, cur_s = prev_t, prev_s
                if cur_t == 0:
                    final_state = cur_s if cur_s >= 0 else None
                    break
            states = np.array(rev_states[::-1], dtype=np.int64)
            widths = np.array(rev_widths[::-1], dtype=np.int32)
            start_cols = np.concatenate([[0], np.cumsum(widths)[:-1]]).astype(np.int32)
            glyphs = tm.glyph_char_of_states(states)
            lm_chars = tm.lm_char_of_states(states)
            types = tm.type_of_states(states)
            glyph_types = tm.glyph_type_of_states(states)
            langs = tm.lang_of_states(states)
            if self.explicit_offset:
                offsets = tm.offset_of_states(states)
                oi = offsets.astype(np.int32) + MAX_OFFSET
                exposures, _, pads = recover_emission_args(
                    cache, self.stack, start_cols, glyphs, widths, off_idx=oi
                )
            else:
                exposures, offsets, pads = recover_emission_args(
                    cache, self.stack, start_cols, glyphs, widths
                )
            decodes.append(
                LineDecode(
                    states, widths, start_cols, glyphs, lm_chars, types,
                    exposures, offsets, pads, glyph_types, langs,
                )
            )
        decodes.reverse()
        return decodes, final_log_prob

    def _scatter(
        self,
        t: int,
        cand_states: np.ndarray,
        cand_widths: np.ndarray,
        cand_scores: np.ndarray,
        cand_prev: np.ndarray,
        cand_emit: np.ndarray,
        buffers: List[List[Tuple[np.ndarray, ...]]],
        lp_flat: np.ndarray,
    ) -> None:
        """Add emissions and append candidates to target-column buffers.

        No explicit (t + w) <= T bounds filter: the emission cache is
        populated only for start columns where the glyph+pad fits
        (lim = T - w + 1 in build_emission_cache), so any candidate
        whose span would overrun the line scores NEG_INF and dies in
        the single liveness mask below."""
        emit = lp_flat[t * self._emit_stride + cand_emit]
        total = cand_scores + emit
        live = total > NEG_INF
        if not live.all():
            cand_states, cand_widths = cand_states[live], cand_widths[live]
            total, cand_prev = total[live], cand_prev[live]
        if len(total) == 0:
            return
        if cand_widths.dtype != self._w_dtype:  # start-expansion path
            cand_widths = cand_widths.astype(self._w_dtype)
        order = np.argsort(cand_widths, kind="stable")
        sw = cand_widths[order]
        s_states = cand_states[order]
        s_total = total[order]
        s_prev = cand_prev[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(sw)) + 1, [len(sw)]])
        for k in range(len(starts) - 1):
            a, b = int(starts[k]), int(starts[k + 1])
            tgt = t + int(sw[a])
            # prev_t is a scalar per buffer entry; expanded at finalize
            buffers[tgt].append((s_states[a:b], s_total[a:b], t, s_prev[a:b]))

    def _expand_start(self, s0, sc0, prev0, buffers, lp_flat) -> None:
        """Line-start expansion: start states emit themselves
        (BeamingSemiMarkovDP.java:143-164)."""
        W = self.stack.max_w + 1
        parts_s, parts_g, parts_w, parts_sc, parts_p, parts_e = [], [], [], [], [], []
        for k in range(len(s0)):
            if sc0[k] == NEG_INF:
                continue
            g, widths, off = self._self_expansion(int(s0[k]))
            n = len(widths)
            parts_s.append(np.full(n, s0[k], dtype=np.int64))
            parts_g.append(np.full(n, g, dtype=np.int32))
            parts_w.append(widths)
            parts_sc.append(np.full(n, sc0[k], dtype=np.float64))
            parts_p.append(np.full(n, prev0[k], dtype=np.int64))
            emit = np.int64(g) * W + widths
            if self.explicit_offset:
                emit = emit * self.stack.n_offsets + off
            parts_e.append(emit.astype(np.int64))
        if not parts_s:
            return
        self._scatter(
            0,
            np.concatenate(parts_s),
            np.concatenate(parts_w),
            np.concatenate(parts_sc),
            np.concatenate(parts_p),
            np.concatenate(parts_e),
            buffers,
            lp_flat,
        )

    def _expand_beam(self, t, states_u, scores_u, buffers, lp_flat) -> None:
        idx, lens = self._gather_expansions(states_u)
        self._scatter(
            t,
            self._flat_ns[idx],
            self._flat_w[idx],
            np.repeat(scores_u, lens) + self._flat_lp[idx],
            np.repeat(states_u, lens),
            self._flat_emit[idx],
            buffers,
            lp_flat,
        )


class EmptyBeamError(RuntimeError):
    """model/em/EmptyBeamException.java"""
