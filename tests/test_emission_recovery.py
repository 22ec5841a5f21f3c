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


def test_recovery_matches_naive_tables_everywhere(stack_and_lines):
    stack, lines = stack_and_lines
    for obs in lines:
        cache = build_emission_cache(obs, stack)
        best, b_e, b_off, b_pad = _naive_tables(obs, stack)
        # cache values agree with the naive populate
        np.testing.assert_array_equal(cache.log_probs, best)
        ts, cs, ws = np.nonzero(best > NEG_INF)
        # every finite triple, not just path entries
        e_got, off_got, pad_got = recover_emission_args(
            cache, stack, ts.astype(np.int32), cs.astype(np.int32),
            ws.astype(np.int32),
        )
        np.testing.assert_array_equal(e_got, b_e[ts, cs, ws])
        np.testing.assert_array_equal(off_got, b_off[ts, cs, ws])
        np.testing.assert_array_equal(pad_got, b_pad[ts, cs, ws])
