"""recover_emission_args must reproduce the retired per-(t,c,w) int8
argmax tables EXACTLY — including float32 tie behavior — because the
recovered (exposure, offset, pad) feed EM emission counts (A3/A5).

This test rebuilds the old tables with an independent naive reference
(explicit loops over template width / pad / exposure / offset in
populate order, float32 association preserved) and checks the
recovery on every finite (t, c, w) triple of several noisy lines."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from ocular_spark.decoder import (
    LINE_HEIGHT,
    MAX_OFFSET,
    N_EXPOSURES,
    NEG_INF,
    build_emission_cache,
    recover_emission_args,
)
from ocular_spark.fixtures import add_noise, build_models, render_text_line
from ocular_spark.font import Font


@pytest.fixture(scope="module")
def stack_and_lines(sf_dir):
    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    bundle, char_strs = build_models(documents)
    from ocular_spark.decoder import Decoder

    dec = Decoder(
        Font.from_bytes(bundle.font_bytes), bundle.lm,
        transition_model=bundle.transition_model,
    )
    lines = [
        add_noise(render_text_line("the cat sat"), 0.0, 1),
        add_noise(render_text_line("a man ran far"), 0.03, 7),
        add_noise(render_text_line("on a mat"), 0.08, 42),
    ]
    return dec.stack, lines


def _naive_tables(obs, stack):
    """Independent reference for the retired argmax tables: explicit
    populate-order loops, float32 association exactly as the old
    build_emission_cache computed it."""
    T = obs.shape[0]
    C = stack.n_chars
    from ocular_spark.decoder import BLACK, WHITE

    white = (obs == WHITE).astype(np.float32)
    black = (obs == BLACK).astype(np.float32)
    ws_col = white @ stack.ws_white.T + black @ stack.ws_black.T
    ws_cum = np.vstack([np.zeros((1, N_EXPOSURES), np.float32), np.cumsum(ws_col, axis=0)])

    W = stack.max_w + 1
    best = np.full((T, C, W), NEG_INF, dtype=np.float32)
    b_e = np.zeros((T, C, W), dtype=np.int8)
    b_off = np.zeros((T, C, W), dtype=np.int8)
    b_pad = np.zeros((T, C, W), dtype=np.int8)
    n_off = stack.n_offsets
    sp = stack.space_idx
    plp = np.float32(stack.pad_log_prob)

    # space (analytic, first allowed tw wins)
    sp_wlp = stack.width_log_probs[sp]
    for w in range(1 + stack.pad_min, W):
        best_tw = None
        for tw in range(max(1, w - stack.pad_max), w - stack.pad_min + 1):
            if tw in stack.space_allowed_tw:
                best_tw = tw
                break
        if best_tw is None:
            continue
        lim = min(T - w + 1, T - best_tw - stack.pad_min + 1)
        for t in range(max(0, lim)):
            tot = (ws_cum[t + w] - ws_cum[t]) + np.float32(sp_wlp[best_tw] + stack.pad_log_prob)
            e = int(tot.argmax())
            best[t, sp, w] = tot[e]
            b_e[t, sp, w] = e
            b_off[t, sp, w] = -MAX_OFFSET
            b_pad[t, sp, w] = w - best_tw

    for tw in stack.widths:
        if tw + stack.pad_min > T:
            continue
        whiteT, blackT, chars_tw, wlp = stack.stacks[tw]
        nT = T - tw + 1
        w_win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(white, (tw, LINE_HEIGHT))[:, 0]
            .reshape(nT, tw * LINE_HEIGHT)
        )
        b_win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(black, (tw, LINE_HEIGHT))[:, 0]
            .reshape(nT, tw * LINE_HEIGHT)
        )
        scores = w_win @ whiteT + b_win @ blackT
        sc = scores.reshape(nT, len(chars_tw), N_EXPOSURES, n_off)
        for pw in range(stack.pad_min, stack.pad_max + 1):
            w = tw + pw
            lim = min(T - w + 1, T - tw - stack.pad_min + 1, nT)
            for t in range(max(0, lim)):
                pad_lp = (ws_cum[t + tw + pw] - ws_cum[t + tw]) + plp  # (E,)
                for ci, c in enumerate(chars_tw):
                    off_arg = sc[t, ci].argmax(axis=1)  # per-e argmax on raw
                    tmpl = sc[t, ci][np.arange(N_EXPOSURES), off_arg] + wlp[ci]
                    tot = tmpl + pad_lp
                    e = int(tot.argmax())
                    val = tot[e]
                    if val > best[t, c, w]:
                        best[t, c, w] = val
                        b_e[t, c, w] = e
                        b_off[t, c, w] = int(off_arg[e]) - MAX_OFFSET
                        b_pad[t, c, w] = pw
    return best, b_e, b_off, b_pad


TIE_ULPS = 64  # measured flips on a kernel change: <= 12 ulps


def _assert_args_tie_equivalent(
    stack, obs, best, b_e, b_off, b_pad, ts, cs, ws, e_got, off_got, pad_got
):
    """Recovery parity, stated as the actual production contract.

    Bitwise (e, off, pad) parity with the naive populate is NOT
    portable: recover_emission_args recomputes the per-offset scores
    in a GEMM whose row count is the query's distinct-start-column
    count, and OpenBLAS (DYNAMIC_ARCH) picks a different kernel —
    hence a different float32 reduction order, off by O(10) ulps —
    at that shape.  On zero-noise lines many (offset) candidates over
    blank columns are genuinely tied to within that noise, and the
    argmax flips between sandbox hosts (observed when this repo moved
    CPU generations mid-round: 26/41457 offset flips, values and
    exposures bit-equal).

    So: exact equality where the argmax is well-separated, and where
    it differs, the recovered triple must ACHIEVE the naive best
    score within TIE_ULPS float32 ulps — recomputed in one 1-row
    GEMM so the comparison itself is reduction-order-consistent."""
    from ocular_spark.decoder import BLACK, WHITE

    naive_e, naive_off, naive_pad = b_e[ts, cs, ws], b_off[ts, cs, ws], b_pad[ts, cs, ws]
    mism = np.nonzero(
        (e_got != naive_e) | (off_got != naive_off) | (pad_got != naive_pad)
    )[0]
    if len(mism) == 0:
        return
    # flips must be rare (ties over blank columns, not systematic)
    assert len(mism) <= 0.01 * len(ts), f"{len(mism)}/{len(ts)} arg flips"
    white = (obs == WHITE).astype(np.float32)
    black = (obs == BLACK).astype(np.float32)
    ws_col = white @ stack.ws_white.T + black @ stack.ws_black.T
    ws_cum = np.vstack(
        [np.zeros((1, N_EXPOSURES), np.float32), np.cumsum(ws_col, axis=0)]
    )
    plp = np.float32(stack.pad_log_prob)
    for i in mism:
        t, c, w = int(ts[i]), int(cs[i]), int(ws[i])
        assert c != stack.space_idx  # space args are analytic, no GEMM
        pw, e = int(pad_got[i]), int(e_got[i])
        tw = w - pw
        whiteT, blackT, chars_tw, wlp = stack.stacks[tw]
        ci = list(chars_tw).index(c)
        sc = (
            white[t : t + tw].reshape(1, -1) @ whiteT
            + black[t : t + tw].reshape(1, -1) @ blackT
        ).reshape(len(chars_tw), N_EXPOSURES, stack.n_offsets)
        pad_lp = (ws_cum[t + tw + pw] - ws_cum[t + tw]) + plp
        got_score = sc[ci, e, int(off_got[i]) + MAX_OFFSET] + np.float32(wlp[ci]) + pad_lp[e]
        tol = TIE_ULPS * np.spacing(np.abs(best[t, c, w]))
        assert abs(float(got_score) - float(best[t, c, w])) <= tol, (
            f"(t={t},c={c},w={w}): recovered args score {got_score} vs "
            f"best {best[t, c, w]} — beyond a reduction-order tie"
        )


def test_recovery_matches_naive_tables_everywhere(stack_and_lines):
    stack, lines = stack_and_lines
    for obs in lines:
        cache = build_emission_cache(obs, stack)
        best, b_e, b_off, b_pad = _naive_tables(obs, stack)
        # cache values agree with the naive populate (same GEMM shapes
        # on both sides -> bit-exact is portable here)
        np.testing.assert_array_equal(cache.log_probs, best)
        ts, cs, ws = np.nonzero(best > NEG_INF)
        # every finite triple, not just path entries
        e_got, off_got, pad_got = recover_emission_args(
            cache, stack, ts.astype(np.int32), cs.astype(np.int32),
            ws.astype(np.int32),
        )
        _assert_args_tie_equivalent(
            stack, obs, best, b_e, b_off, b_pad,
            ts, cs, ws, e_got, off_got, pad_got,
        )


def _path_shaped_subset(best):
    """Greedy left-to-right walk mimicking a decode path: at each start
    column take the WIDEST finite span (raw-logprob argmax favors the
    narrowest span — fewer columns, larger sum — which is not what a
    real path looks like) and the best char at that width.  Yields a
    SMALL set of entries with few distinct start columns — the
    production shape recover_emission_args sees (the full-triple test
    above uses ~every column, i.e. the same GEMM row count as the
    cache build, and so cannot catch an M-dependent BLAS kernel
    change)."""
    T = best.shape[0]
    ts, cs, ws = [], [], []
    t = 0
    while t < T:
        finite_w = np.nonzero(np.isfinite(best[t]).any(axis=0))[0]
        if len(finite_w) == 0:
            t += 1
            continue
        w = int(finite_w[-1])
        c = int(np.argmax(best[t, :, w]))
        ts.append(t)
        cs.append(c)
        ws.append(w)
        t += max(w, 1)
    return (
        np.asarray(ts, dtype=np.int32),
        np.asarray(cs, dtype=np.int32),
        np.asarray(ws, dtype=np.int32),
    )


def test_recovery_on_path_shaped_sparse_subset(stack_and_lines):
    """ADVICE r3: the production recovery runs GEMMs whose row count is
    the ~|path| distinct start columns, far smaller than the cache
    build's nT rows.  Bitwise parity must hold at THAT shape too (a
    BLAS that picks a different kernel by M could flip ulp-ties)."""
    stack, lines = stack_and_lines
    for obs in lines:
        cache = build_emission_cache(obs, stack)
        best, b_e, b_off, b_pad = _naive_tables(obs, stack)
        ts, cs, ws = _path_shaped_subset(best)
        assert 1 <= len(ts) < best.shape[0] // 2  # genuinely sparse
        e_got, off_got, pad_got = recover_emission_args(cache, stack, ts, cs, ws)
        # path-shaped entries are well-separated: exact parity holds
        # (and must — these are the triples EM actually consumes)
        np.testing.assert_array_equal(e_got, b_e[ts, cs, ws])
        np.testing.assert_array_equal(off_got, b_off[ts, cs, ws])
        np.testing.assert_array_equal(pad_got, b_pad[ts, cs, ws])
        # ... and a scattered every-7th-finite-triple subset (small M,
        # multiple chars/widths per start column); includes blank-column
        # near-ties, so tie-equivalence applies (see helper docstring)
        fts, fcs, fws = np.nonzero(best > NEG_INF)
        sel = np.arange(0, len(fts), 7)
        ts2, cs2, ws2 = (
            fts[sel].astype(np.int32),
            fcs[sel].astype(np.int32),
            fws[sel].astype(np.int32),
        )
        e2, o2, p2 = recover_emission_args(cache, stack, ts2, cs2, ws2)
        _assert_args_tie_equivalent(
            stack, obs, best, b_e, b_off, b_pad, ts2, cs2, ws2, e2, o2, p2
        )


def _naive_tables_explicit(obs, stack):
    """Independent reference for the EXPLICIT-OFFSET cache
    (build_emission_cache_explicit) and its (exposure, pad) argmaxes:
    per-offset populate loops in the same order (template widths
    ascending, strictly-greater replacement), float32 association
    preserved."""
    T = obs.shape[0]
    C = stack.n_chars
    from ocular_spark.decoder import BLACK, WHITE

    white = (obs == WHITE).astype(np.float32)
    black = (obs == BLACK).astype(np.float32)
    ws_col = white @ stack.ws_white.T + black @ stack.ws_black.T
    ws_cum = np.vstack(
        [np.zeros((1, N_EXPOSURES), np.float32), np.cumsum(ws_col, axis=0)]
    )

    W = stack.max_w + 1
    n_off = stack.n_offsets
    best4 = np.full((T, C, W, n_off), NEG_INF, dtype=np.float32)
    be4 = np.zeros((T, C, W, n_off), dtype=np.int8)
    bpad4 = np.zeros((T, C, W, n_off), dtype=np.int8)
    sp = stack.space_idx
    plp = np.float32(stack.pad_log_prob)

    sp_wlp = stack.width_log_probs[sp]
    for w in range(1 + stack.pad_min, W):
        best_tw = None
        for tw in range(max(1, w - stack.pad_max), w - stack.pad_min + 1):
            if tw in stack.space_allowed_tw:
                best_tw = tw
                break
        if best_tw is None:
            continue
        lim = min(T - w + 1, T - best_tw - stack.pad_min + 1)
        for t in range(max(0, lim)):
            tot = (ws_cum[t + w] - ws_cum[t]) + np.float32(
                sp_wlp[best_tw] + stack.pad_log_prob
            )
            e = int(tot.argmax())
            best4[t, sp, w, :] = tot[e]
            be4[t, sp, w, :] = e
            bpad4[t, sp, w, :] = w - best_tw

    for tw in stack.widths:
        if tw + stack.pad_min > T:
            continue
        whiteT, blackT, chars_tw, wlp = stack.stacks[tw]
        nT = T - tw + 1
        w_win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(white, (tw, LINE_HEIGHT))[:, 0]
            .reshape(nT, tw * LINE_HEIGHT)
        )
        b_win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(black, (tw, LINE_HEIGHT))[:, 0]
            .reshape(nT, tw * LINE_HEIGHT)
        )
        scores = w_win @ whiteT + b_win @ blackT
        sc = scores.reshape(nT, len(chars_tw), N_EXPOSURES, n_off)
        for pw in range(stack.pad_min, stack.pad_max + 1):
            w = tw + pw
            lim = min(T - w + 1, T - tw - stack.pad_min + 1, nT)
            for t in range(max(0, lim)):
                pad_lp = (ws_cum[t + tw + pw] - ws_cum[t + tw]) + plp  # (E,)
                for ci, c in enumerate(chars_tw):
                    tot = sc[t, ci] + wlp[ci] + pad_lp[:, None]  # (E, n_off)
                    for off in range(n_off):
                        e = int(tot[:, off].argmax())
                        val = tot[e, off]
                        if val > best4[t, c, w, off]:
                            best4[t, c, w, off] = val
                            be4[t, c, w, off] = e
                            bpad4[t, c, w, off] = pw
    return best4, be4, bpad4


def test_explicit_offset_recovery_vs_naive(stack_and_lines):
    """ADVICE r3: the off_idx recovery path (markov-offset decoding)
    had no naive-reference coverage.  Check the 4-D cache values AND
    the recovered (exposure, pad) at fixed offsets against an
    independent per-offset populate, on a sparse subset (small-M GEMM
    shape, like production)."""
    from ocular_spark.decoder import build_emission_cache_explicit

    stack, lines = stack_and_lines
    for obs in lines:
        cache = build_emission_cache_explicit(obs, stack)
        best4, be4, bpad4 = _naive_tables_explicit(obs, stack)
        np.testing.assert_array_equal(cache.log_probs4, best4)
        np.testing.assert_array_equal(cache.log_probs, best4.max(axis=3))
        fts, fcs, fws, foffs = np.nonzero(best4 > NEG_INF)
        sel = np.arange(0, len(fts), 23)  # sparse, deterministic
        ts, cs, ws, offs = (
            fts[sel].astype(np.int32),
            fcs[sel].astype(np.int32),
            fws[sel].astype(np.int32),
            foffs[sel].astype(np.int32),
        )
        e_got, off_got, pad_got = recover_emission_args(
            cache, stack, ts, cs, ws, off_idx=offs
        )
        np.testing.assert_array_equal(e_got, be4[ts, cs, ws, offs])
        np.testing.assert_array_equal(pad_got, bpad4[ts, cs, ws, offs])
        np.testing.assert_array_equal(off_got, offs - MAX_OFFSET)
