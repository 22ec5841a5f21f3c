#!/usr/bin/env python
"""Freeze driver-checkable goldens for the non-SQL-expressible queries.

The OCR-core queries (transcribe_spans*, transcribe_metrics,
em_font_counts, lm_perplexity) are beam semi-Markov Viterbi decodes —
DuckDB cannot recompute them.  Their outputs ARE deterministic
functions of the sf0.01 fixture, so we freeze expected results into
`SELECT * FROM (VALUES ...)` oracles that the driver's
rows/schema/value-hash gate can check like any other query.

PROVENANCE (the point of this tool): every golden is computed by the
IN-PROCESS single-machine oracle path — plain pandas/NumPy loops over
`ocular_spark.fixtures.oracle_transcribe_pandas`, direct
`Decoder.decode_document` calls, and `DensePplTables.score_batch` —
with NO SparkSession anywhere in this file.  The driver gate therefore
checks Spark-pipeline-vs-independent-execution-path, not
Spark-vs-itself (round-2 versions of this tool collected the Spark
query's own output, which made the driver rows regression pins only).
The decoder/LM KERNELS are still shared between both paths (the
reference jar is unbuildable, so no third implementation exists);
kernel-level independence is covered one layer down by
tests/test_micro_lattice.py (beam decoder == exact enumerable Viterbi)
and the ported reference test vectors.

Regenerate after any intentional decode-semantics change:

    python tools/freeze_goldens.py          # writes golden_oracles.py
"""

from __future__ import annotations

import math
import os
import sys
from typing import List, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.01")

SPAN_COLS = ["doc_id", "kind", "text", "media_ref", "offset"]
SPAN_TYPES = ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "INTEGER"]


def _sql_literal(v, duck_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {duck_type})"
    if duck_type == "VARCHAR":
        s = str(v).replace("'", "''")
        # newlines survive python->file->duckdb fine, but keep the
        # generated file greppable: encode them as CHR(10) concats
        if "\n" in s:
            parts = s.split("\n")
            return "(" + " || CHR(10) || ".join(f"'{p}'" for p in parts) + ")"
        return f"'{s}'"
    if duck_type == "DOUBLE":
        if isinstance(v, float) and math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    return f"CAST({v!r} AS {duck_type})"


def _values_sql(cols: List[str], duck_types: List[str], rows: List[tuple]) -> str:
    if not rows:
        raise RuntimeError("empty result, refusing to freeze")
    values = ",\n                ".join(
        "(" + ", ".join(_sql_literal(v, t) for v, t in zip(row, duck_types)) + ")"
        for row in rows
    )
    collist = ", ".join(f'"{c}"' for c in cols)  # "offset" etc. are reserved
    return (
        f"SELECT * FROM (VALUES\n                {values}\n"
        f"            ) AS t({collist})"
    )


def _flatten_spans(out_docs) -> List[tuple]:
    rows = []
    for r in out_docs.itertuples():
        for s in r.spans:
            rows.append(
                (r.doc_id, s["kind"], s["text"], s["media_ref"], s["offset"])
            )
    return rows


def _documents():
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pandas()


def freeze_transcribe_spans() -> Tuple[List[str], List[str], List[tuple]]:
    from ocular_spark.fixtures import (
        build_models,
        derive_docs_and_media,
        oracle_transcribe_pandas,
    )

    documents = _documents()
    docs, media = derive_docs_and_media(documents, n_docs=8, max_pages_per_doc=2)
    bundle, char_strs = build_models(documents)
    out = oracle_transcribe_pandas(docs, media, bundle, char_strs)
    return SPAN_COLS, SPAN_TYPES, _flatten_spans(out)


def freeze_transcribe_spans_cs() -> Tuple[List[str], List[str], List[tuple]]:
    from ocular_spark.fixtures import (
        build_models_cs,
        derive_docs_and_media_cs,
        oracle_transcribe_pandas,
    )

    documents = _documents()
    docs, media = derive_docs_and_media_cs(documents, n_docs=3)
    bundle, char_strs = build_models_cs(documents)
    out = oracle_transcribe_pandas(docs, media, bundle, char_strs)
    return SPAN_COLS, SPAN_TYPES, _flatten_spans(out)


def freeze_transcribe_spans_offset() -> Tuple[List[str], List[str], List[tuple]]:
    from ocular_spark.fixtures import (
        build_models_offset,
        derive_docs_and_media_offset,
        oracle_transcribe_pandas,
    )

    documents = _documents()
    docs, media = derive_docs_and_media_offset(documents, n_docs=4)
    bundle, char_strs = build_models_offset(documents)
    out = oracle_transcribe_pandas(docs, media, bundle, char_strs)
    return SPAN_COLS, SPAN_TYPES, _flatten_spans(out)


def freeze_transcribe_metrics() -> Tuple[List[str], List[str], List[tuple]]:
    """Lineage metrics projection: (doc_id, media_ref, offset, n_lines)
    for every media span — derivable by a pandas join, no decode."""
    from ocular_spark.fixtures import build_models, derive_docs_and_media

    documents = _documents()
    docs, media = derive_docs_and_media(documents, n_docs=8, max_pages_per_doc=2)
    n_lines_by_ref = {r.media_ref: int(r.n_lines) for r in media.itertuples()}
    rows = []
    for r in docs.itertuples():
        for s in r.spans:
            if s["kind"] == "media":
                rows.append(
                    (r.doc_id, s["media_ref"], s["offset"],
                     n_lines_by_ref[s["media_ref"]])
                )
    cols = ["doc_id", "media_ref", "offset", "n_lines"]
    return cols, ["VARCHAR", "VARCHAR", "INTEGER", "INTEGER"], rows


def freeze_em_font_counts() -> Tuple[List[str], List[str], List[tuple]]:
    """One E-step's per-character template width-count table, computed
    by a plain Python loop over the fixture pages (decode + count), no
    Spark, no treeAggregate."""
    from ocular_spark.em import CountsBundle, accumulate_page_counts
    from ocular_spark.fixtures import build_models, derive_docs_and_media
    from ocular_spark.pipeline import get_decoder, unpack_line

    documents = _documents()
    docs, media = derive_docs_and_media(documents, n_docs=8, max_pages_per_doc=2)
    bundle, char_strs = build_models(documents)
    decoder = get_decoder(bundle)
    space_idx = decoder.tm.space
    counts = CountsBundle(bundle.lm.get_max_order())
    media_by_ref = {r.media_ref: list(r.lines) for r in media.itertuples()}
    for r in docs.itertuples():
        for s in r.spans:
            if s["kind"] != "media":
                continue
            imgs = [unpack_line(raw) for raw in media_by_ref[s["media_ref"]]]
            decodes, _ = decoder.decode_document(imgs)
            accumulate_page_counts(counts, decodes, imgs, space_idx)
    rows = [
        (char_strs[c], int(w), float(n))
        for c, wd in sorted(counts.width.items())
        for w, n in sorted(wd.items())
    ]
    return ["char", "template_width", "count"], ["VARCHAR", "BIGINT", "DOUBLE"], rows


def freeze_train_font_step() -> Tuple[List[str], List[str], List[tuple]]:
    """Serial single-machine EM iteration: decode every fixture page
    in a plain loop, accumulate font counts, run the driver M-step —
    no Spark.  Pins q_train_font_step's distributed E-step + M-step."""
    from __spark_entry__ import font_summary_rows
    from ocular_spark.em import (
        CountsBundle,
        accumulate_page_counts,
        apply_font_mstep,
    )
    from ocular_spark.fixtures import build_models, derive_docs_and_media
    from ocular_spark.font import Font
    from ocular_spark.pipeline import get_decoder, unpack_line

    documents = _documents()
    docs, media = derive_docs_and_media(documents, n_docs=8, max_pages_per_doc=2)
    bundle, char_strs = build_models(documents)
    decoder = get_decoder(bundle)
    counts = CountsBundle(bundle.lm.get_max_order())
    media_by_ref = {r.media_ref: list(r.lines) for r in media.itertuples()}
    for r in docs.itertuples():
        for s in r.spans:
            if s["kind"] != "media":
                continue
            imgs = [unpack_line(raw) for raw in media_by_ref[s["media_ref"]]]
            decodes, _ = decoder.decode_document(imgs)
            accumulate_page_counts(counts, decodes, imgs, decoder.tm.space)
    font = Font.from_bytes(bundle.font_bytes)
    trained = apply_font_mstep(font, counts, char_strs)
    rows = [
        (r["char"], r["width"], r["width_lp"], r["tw_sum"])
        for r in font_summary_rows(trained, char_strs)
    ]
    cols = ["char", "width", "width_lp", "tw_sum"]
    return cols, ["VARCHAR", "BIGINT", "DOUBLE", "DOUBLE"], rows


def freeze_train_font_step_cs() -> Tuple[List[str], List[str], List[tuple]]:
    """Serial single-machine MULTILINGUAL EM iteration: decode every
    bilingual code-switch fixture page in a plain loop with the
    code-switch + GSM transition model, accumulate font + per-language
    LM + GSM counts, then run all THREE driver M-steps (width/template
    refit, per-language KN re-interpolation, GSM factory make) — no
    Spark.  Pins q_train_font_step_cs's one-pass distributed E-step
    and every M-step output surface."""
    from __spark_entry__ import cs_train_summary_rows
    from ocular_spark.em import (
        CountsBundle,
        accumulate_gsm_counts,
        accumulate_lm_counts,
        accumulate_page_counts,
        apply_font_mstep,
        reestimate_cslm,
    )
    from ocular_spark.fixtures import build_models_cs, derive_docs_and_media_cs
    from ocular_spark.font import Font
    from ocular_spark.gsm import BasicGlyphSubstitutionModelFactory
    from ocular_spark.pipeline import get_decoder, unpack_line

    documents = _documents()
    docs, media = derive_docs_and_media_cs(documents, n_docs=3)
    bundle, char_strs = build_models_cs(documents)
    cslm = bundle.lm
    ci = cslm.get_character_indexer()
    n_langs = cslm.num_languages()
    actives = [cslm.get(k).get_active_characters() for k in range(n_langs)]
    gsm_factory = BasicGlyphSubstitutionModelFactory(
        1.0, 100.0, list(cslm.lang_names), ci, actives, gsm_power=1.0
    )
    decoder = get_decoder(bundle)
    max_order = max(cslm.get(k).get_max_order() for k in range(n_langs))
    counts = CountsBundle(max_order)
    media_by_ref = {r.media_ref: list(r.lines) for r in media.itertuples()}
    for r in docs.itertuples():
        for s in r.spans:
            if s["kind"] != "media":
                continue
            imgs = [unpack_line(raw) for raw in media_by_ref[s["media_ref"]]]
            decodes, _ = decoder.decode_document(imgs)
            accumulate_page_counts(counts, decodes, imgs, decoder.tm.space)
            accumulate_lm_counts(counts, decodes, char_strs, n_langs)
            accumulate_gsm_counts(counts, decodes, char_strs, n_langs)
    font = Font.from_bytes(bundle.font_bytes)
    trained_font = apply_font_mstep(font, counts, char_strs)
    trained_lm = reestimate_cslm(cslm, counts)
    trained_gsm = gsm_factory.make(counts.gsm_counts)
    rows = [
        (r["section"], r["lang"], r["key"], r["value"])
        for r in cs_train_summary_rows(
            trained_font, trained_lm, trained_gsm, char_strs
        )
    ]
    cols = ["section", "lang", "key", "value"]
    return cols, ["VARCHAR", "VARCHAR", "VARCHAR", "DOUBLE"], rows


def freeze_lm_perplexity() -> Tuple[List[str], List[str], List[tuple]]:
    import numpy as np

    from ocular_spark.fixtures import build_models
    from ocular_spark.lm import DensePplTables

    documents = _documents()
    bundle, _ = build_models(documents)
    tables = DensePplTables(bundle.transition_model)
    subset = documents[documents["doc_id"] < 100]
    n_chars, ppl = tables.score_batch([str(t) for t in subset["text"]])
    rows = [
        (int(d), int(n), float(p))
        for d, n, p in zip(subset["doc_id"], n_chars, np.round(ppl, 4))
    ]
    return ["doc_id", "n_scored", "perplexity"], ["BIGINT", "INTEGER", "DOUBLE"], rows


def freeze_transcribe_spans_crop() -> Tuple[List[str], List[str], List[tuple]]:
    from ocular_spark.fixtures import (
        build_models_crop,
        derive_docs_and_media_crop,
        oracle_transcribe_pandas,
    )

    documents = _documents()
    docs, pages = derive_docs_and_media_crop(documents, n_docs=2)
    bundle, char_strs = build_models_crop(documents)
    out = oracle_transcribe_pandas(docs, pages, bundle, char_strs)
    return SPAN_COLS, SPAN_TYPES, _flatten_spans(out)


# --------------------------------------------------------------- BPE
# INDEPENDENT implementation of the BPE determinism contract
# (ocular_spark/functions/bpe.py docstring): this is the Sennrich
# learn_bpe/apply_bpe FORMULATION — words as space-joined symbol
# strings, merges applied by lookaround-anchored regex substitution —
# structurally different from the production tuple-based kernel, so
# the frozen golden is a genuine two-implementation gate.  Symbol
# sequences are injective images of words (their concatenation always
# equals word + '</w>'), so the dict comprehensions cannot collapse
# two vocab keys.

_BPE_EOW = "</w>"
_BPE_MERGES_N = 24
_BPE_MAX_VOCAB = 10000


def _bpe_pat(a: str, b: str):
    import re

    return re.compile(r"(?<!\S)" + re.escape(a) + r" " + re.escape(b) + r"(?!\S)")


def _bpe_train_regex(word_counts, n_merges):
    import collections

    vocab = {
        " ".join(list(w)) + " " + _BPE_EOW: c for w, c in word_counts.items() if w
    }
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for s, c in vocab.items():
            syms = s.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pat = _bpe_pat(*best)
        vocab = {pat.sub(best[0] + best[1], s): c for s, c in vocab.items()}
    return merges


def _bpe_encode_regex(word, merges):
    s = " ".join(list(word)) + " " + _BPE_EOW
    while True:
        syms = s.split(" ")
        present = set(zip(syms, syms[1:]))
        hit = next((p for p in merges if p in present), None)
        if hit is None:
            return syms
        s = _bpe_pat(*hit).sub(hit[0] + hit[1], s)


def _bpe_reference():
    import collections

    df = _documents()
    counts = collections.Counter()
    doc_words = {}
    for r in df.itertuples():
        ws = [w for w in r.text.split(" ") if w]
        if ws:
            doc_words[int(r.doc_id)] = ws
        counts.update(ws)
    capped = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_MAX_VOCAB]
    )
    merges = _bpe_train_regex(capped, _BPE_MERGES_N)
    return merges, doc_words


def freeze_bpe_train() -> Tuple[List[str], List[str], List[tuple]]:
    merges, _ = _bpe_reference()
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return (
        ["rank", "left", "right", "merged"],
        ["BIGINT", "VARCHAR", "VARCHAR", "VARCHAR"],
        rows,
    )


def freeze_bpe_encode() -> Tuple[List[str], List[str], List[tuple]]:
    import hashlib

    merges, doc_words = _bpe_reference()
    enc = {}
    rows = []
    for doc_id in sorted(doc_words):
        ws = doc_words[doc_id]
        for w in ws:
            if w not in enc:
                enc[w] = _bpe_encode_regex(w, merges)
        token_str = " ".join(" ".join(enc[w]) for w in ws)
        n_tokens = sum(len(enc[w]) for w in ws)
        rows.append(
            (
                doc_id,
                len(ws),
                n_tokens,
                hashlib.md5(token_str.encode()).hexdigest(),
            )
        )
    return (
        ["doc_id", "n_words", "n_tokens", "tokens_hash"],
        ["BIGINT", "BIGINT", "BIGINT", "VARCHAR"],
        rows,
    )


def freeze_transcribe_confidence() -> Tuple[List[str], List[str], List[tuple]]:
    """Serial no-Spark loop over the SAME fixture as transcribe_spans:
    per media page, decode -> diplomatic text -> avg per-char joint
    log-prob -> accept/review route against CONFIDENCE_THRESHOLD.
    Float discipline: the gate carries floor(avg_lp) integer buckets
    (min fixture distance to a boundary 6e-3 vs ~2e-6 BLAS-environment
    drift) and the route (margin >8 units); raw doubles never enter
    the hash (see pipeline.decode_confidence)."""
    from ocular_spark.fixtures import build_models, derive_docs_and_media
    from ocular_spark.pipeline import (
        CONFIDENCE_THRESHOLD,
        get_decoder,
        unpack_line,
    )
    from ocular_spark.transcriptions import diplomatic_text

    import __spark_entry__ as entry_mod

    documents = _documents()
    docs, media = derive_docs_and_media(
        documents, n_docs=entry_mod._N_PIPELINE_DOCS, max_pages_per_doc=2
    )
    bundle, char_strs = build_models(documents)
    decoder = get_decoder(bundle)
    media_by_ref = {r.media_ref: list(r.lines) for r in media.itertuples()}
    rows = []
    for r in docs.itertuples():
        for s in r.spans:
            if s["kind"] != "media":
                continue
            imgs = [unpack_line(raw) for raw in media_by_ref[s["media_ref"]]]
            decodes, lp = decoder.decode_document(imgs)
            n = len(diplomatic_text(decodes, char_strs))
            avg = lp / n if n else None
            bucket = math.floor(avg) if avg is not None else None
            route = (
                "accept" if avg is not None and avg >= CONFIDENCE_THRESHOLD
                else "review"
            )
            rows.append(
                (r.doc_id, s["media_ref"], s["offset"], n, bucket, route)
            )
    return (
        ["doc_id", "media_ref", "offset", "n_chars", "conf_bucket", "route"],
        ["VARCHAR", "VARCHAR", "INTEGER", "BIGINT", "BIGINT", "VARCHAR"],
        rows,
    )


def _xy_cut_reference(blocks):
    """INDEPENDENT recursive implementation of the XY-cut spec in
    ocular_spark/functions/layout.py (plain Python lists + sorted(),
    vs the kernel's iterative NumPy stack) — the two-implementation
    gate for layout_reading_order.  Only the page SYNTHESIS
    (synth_page_blocks) is shared, like fixtures.py for the OCR rows;
    the ordering algorithm is re-derived here from the spec."""
    from ocular_spark.functions.layout import MIN_GAP

    def gaps(iv):
        iv = sorted(iv)
        best = None  # (width, pos); topmost/leftmost on same-axis tie
        run = iv[0][1]
        for s, e in iv[1:]:
            w = s - run
            if w >= MIN_GAP and (best is None or w > best[0]):
                best = (w, run)
            run = max(run, e)
        return best

    def rec(its):
        if len(its) <= 1:
            return [b for b, _ in its]
        gy = gaps([(b[1], b[3]) for _, b in its])
        gx = gaps([(b[0], b[2]) for _, b in its])
        if gy is None and gx is None:
            return [
                b
                for b, _ in sorted(
                    its, key=lambda t: (t[1][1], t[1][0], t[1][3], t[1][2], t[0])
                )
            ]
        if gx is None or (gy is not None and gy[0] >= gx[0]):
            pos = gy[1]
            a = [t for t in its if t[1][3] <= pos]
            b = [t for t in its if t[1][3] > pos]
        else:
            pos = gx[1]
            a = [t for t in its if t[1][2] <= pos]
            b = [t for t in its if t[1][2] > pos]
        return rec(a) + rec(b)

    return rec(list(enumerate(blocks)))


def freeze_layout_reading_order() -> Tuple[List[str], List[str], List[tuple]]:
    from ocular_spark.functions.layout import synth_page_blocks

    documents = _documents()
    rows = []
    for did in sorted(int(d) for d in documents["doc_id"] if int(d) % 5 == 0):
        blocks = synth_page_blocks(did)
        for rank, bid in enumerate(_xy_cut_reference(blocks)):
            x0, y0, x1, y1 = blocks[bid]
            rows.append((did, bid, rank, x0, y0, x1, y1))
    return (
        ["doc_id", "block_id", "rank", "x0", "y0", "x1", "y1"],
        ["BIGINT"] * 7,
        rows,
    )


FREEZERS = {
    "transcribe_spans": freeze_transcribe_spans,
    "transcribe_spans_crop": freeze_transcribe_spans_crop,
    "transcribe_spans_cs": freeze_transcribe_spans_cs,
    "transcribe_spans_offset": freeze_transcribe_spans_offset,
    "transcribe_metrics": freeze_transcribe_metrics,
    "em_font_counts": freeze_em_font_counts,
    "train_font_step": freeze_train_font_step,
    "train_font_step_cs": freeze_train_font_step_cs,
    "lm_perplexity": freeze_lm_perplexity,
    "bpe_train": freeze_bpe_train,
    "bpe_encode": freeze_bpe_encode,
    "layout_reading_order": freeze_layout_reading_order,
    "transcribe_confidence": freeze_transcribe_confidence,
}


def main() -> None:
    # --only NAME...: recompute just the named goldens, preserving the
    # rest byte-for-byte from the existing module (decode goldens
    # carry float near-ties whose argmax can legitimately differ
    # across CPU generations — never re-freeze them as a side effect
    # of adding an unrelated golden)
    only = sys.argv[2:] if len(sys.argv) > 2 and sys.argv[1] == "--only" else None
    out = {}
    if only:
        from golden_oracles import GOLDEN_ORACLES as _existing

        for name, sql in _existing.items():
            out[name] = sql.strip()
    for name, fn in FREEZERS.items():
        if only is not None and name not in only:
            continue
        cols, types, rows = fn()
        out[name] = _values_sql(cols, types, rows)
        print(f"froze {name}: {len(rows)} rows", file=sys.stderr)

    path = os.path.join(REPO, "golden_oracles.py")
    with open(path, "w") as f:
        f.write('"""FROZEN golden oracles — generated by tools/freeze_goldens.py.\n\n')
        f.write("Deterministic expected outputs of the non-SQL-expressible\n")
        f.write(f"OCR-core queries at {SF_DIR}, as DuckDB VALUES selects.\n")
        f.write("Computed by the IN-PROCESS pandas/NumPy oracle path (no\n")
        f.write("SparkSession): the driver gate checks the Spark pipeline\n")
        f.write("against an independent execution path, not against itself.\n")
        f.write('Do not edit by hand; regenerate via the tool."""\n\n')
        f.write("GOLDEN_ORACLES = {\n")
        for name, sql in out.items():
            f.write(f'    "{name}": """\n            {sql}\n        """,\n')
        f.write("}\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
